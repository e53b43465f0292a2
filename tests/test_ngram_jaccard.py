"""ngram_jaccard_pairs: exact prefix-filtered similarity self-join."""

import itertools
import random

import pytest
from pyspark.sql import Row, functions as F

from fsst_spark.pipeline.dedup import ngram_jaccard_pairs


def _grams(text: str, n: int) -> frozenset:
    toks = text.split(" ")
    if len(toks) < n:
        return frozenset([" ".join(toks)])
    return frozenset(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))


def _brute(docs: list[tuple[int, str]], n: int, t: float):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        a, b = _grams(ta, n), _grams(tb, n)
        j = len(a & b) / len(a | b)
        if j >= t:
            out[(min(ia, ib), max(ia, ib))] = j
    return out


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 18))))
            for i in range(80)]
    # planted near-dup: doc 100 = doc 0 with one word changed
    base = docs[0][1].split(" ")
    base[len(base) // 2] = "zz"
    docs.append((100, " ".join(base)))
    docs.append((101, docs[3][1]))  # exact dup of doc 3
    return docs


@pytest.mark.parametrize("t", [0.3, 0.5, 0.8, 1.0])
def test_matches_brute_force(spark, corpus, t):
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, n=3, threshold=t).collect()}
    want = _brute(corpus, 3, t)
    assert set(got) == set(want), (set(got) ^ set(want))
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_exact_dup_and_planted_neardup_found(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()}
    assert pairs[(3, 101)] == 1.0
    assert (0, 100) in pairs and pairs[(0, 100)] < 1.0


def test_short_docs_single_gram(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b"), Row(doc_id=2, text="a b"),
         Row(doc_id=3, text="c d")])
    got = ngram_jaccard_pairs(df, n=5, threshold=1.0).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in got] == [(1, 2, 1.0)]


def test_gram_doc_cap_bounds_boilerplate(spark):
    # 60 docs all sharing a boilerplate sentence, plus one genuine pair
    # whose overlap is carried by RARE grams
    rows = [Row(doc_id=i,
                text=f"common one two three four five unique{i} tail{i}")
            for i in range(60)]
    rows.append(Row(doc_id=200, text="rare alpha beta gamma delta epsilon"))
    rows.append(Row(doc_id=201, text="rare alpha beta gamma delta zeta"))
    df = spark.createDataFrame(rows)
    got = ngram_jaccard_pairs(df, n=3, threshold=0.5,
                              gram_doc_cap=10).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    assert (200, 201) in found
    # boilerplate-only overlaps are below threshold anyway; the cap must
    # not invent pairs
    assert all(a >= 200 for a, b in found), found


def test_threshold_guard(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(df, threshold=0.0)
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(df, n=0)
