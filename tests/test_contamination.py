"""ngram_contamination: planted leaks, short docs, pure-Python parity on
the real corpus, and the broadcast plan shape."""

import re

import pytest

from pyspark.sql import functions as F

from fsst_spark.pipeline.contamination import ngram_contamination, word_ngrams

SF = "/root/testdata/sf0.001"


def _py_grams(text: str, n: int) -> set:
    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def test_word_ngrams_matches_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    got = docs.select("doc_id", word_ngrams(F.col("text"), 8).alias("g")) \
              .collect()
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in got:
        assert set(r["g"]) == _py_grams(raw[r["doc_id"]], 8), r["doc_id"]


def test_planted_leak_and_short_doc(spark):
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog tonight",)],
        "text string")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely unrelated words about compression engines and "
             "columnar formats for the web"),
         (3, "too short"),
         # half-overlap: first 9 words shared -> 2 of its grams hit
         (4, "the quick brown fox jumps over the lazy dog differently "
             "now with more original content here")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           ngram_contamination(docs, bench, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["overlap_frac"] == 1.0
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]
    assert out[3]["overlap_frac"] == 0.0
    assert 0 < out[4]["n_overlap"] < out[4]["n_grams"]


def test_corpus_parity_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 25 == 0)
    got = {r["doc_id"]: r for r in
           ngram_contamination(docs, bench, n=8, threshold=0.5).collect()}
    raw = [(r["doc_id"], r["text"]) for r in docs.collect()]
    bgrams = set()
    for did, t in raw:
        if did % 25 == 0:
            bgrams |= _py_grams(t, 8)
    n_contam = 0
    for did, t in raw:
        g = _py_grams(t, 8)
        hits = len(g & bgrams)
        assert got[did]["n_grams"] == len(g)
        assert got[did]["n_overlap"] == hits, did
        n_contam += bool(g) and hits / len(g) >= 0.5
    assert sum(r["contaminated"] for r in got.values()) == n_contam
    assert n_contam >= 20  # every benchmark member self-overlaps


@pytest.mark.parametrize("broadcast_bench", [True, False])
def test_join_modes_agree(spark, broadcast_bench):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    bench = docs.where(F.col("doc_id") % 25 == 0)
    out = ngram_contamination(docs, bench, n=8,
                              broadcast_bench=broadcast_bench)
    rows = sorted((r["doc_id"], r["n_overlap"]) for r in out.collect())
    if broadcast_bench:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
    test_join_modes_agree.results = getattr(
        test_join_modes_agree, "results", {})
    test_join_modes_agree.results[broadcast_bench] = rows
    if len(test_join_modes_agree.results) == 2:
        a, b = test_join_modes_agree.results.values()
        assert a == b
