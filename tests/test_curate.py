"""End-to-end curation pipeline: stage composition and monotonicity."""

import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.curate import curate, curation_report


@pytest.fixture(scope="module")
def corpus(spark):
    good = ("the quick brown fox jumps over the lazy dog and it runs to "
            "the barn for a nap in the hay that is warm ") * 3
    rows = []
    for i in range(60):
        rows.append((i, f"dom{i % 3}", good + f" unique tail {i}"))
    rows += [(100 + i, "dom0", rows[i][2]) for i in range(5)]   # exact dups
    rows += [(200 + i, "dom1", "junk") for i in range(5)]       # fails quality
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_curate_stages_monotone_and_correct(corpus):
    stages = curate(corpus, cap_n=10, sample_fraction=0.5, salt="t")
    n = {name: frame.count() for name, frame in stages.items()}
    assert n["quality"] == 65          # junk docs dropped, dups pass quality
    assert n["deduped"] == 60          # 5 exact dups collapsed to originals
    assert n["capped"] == 30           # 3 domains x cap 10
    assert 0 < n["sampled"] <= n["capped"]
    # survivors of dedup are the min-id representatives
    ids = {r["doc_id"] for r in stages["deduped"].collect()}
    assert all(i < 100 or i >= 200 for i in ids)


def test_curation_report_single_row(corpus):
    rep = curation_report(corpus, cap_n=10, sample_fraction=0.5, salt="t").collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_input"] == 70
    assert r["n_quality"] == 65 and r["n_deduped"] == 60 and r["n_capped"] == 30
    assert r["n_sampled"] <= 30 and r["sum_final_ids"] is not None


def test_curate_pii_and_para_stages(spark):
    """pii=True scrubs before fingerprinting (PII-only differences dedup
    together); para=True drops repeated paragraphs and empty survivors."""
    good = ("the quick brown fox jumps over the lazy dog and it runs to "
            "the barn for a nap in the hay that is warm ") * 3
    rows = [
        (1, "d0", good + "alpha beta gamma contact a@b.com now"),
        # identical to doc 1 except the email address: must dedup together
        (2, "d0", good + "alpha beta gamma contact x@y.org now"),
        # distinct page sharing doc 1's text as a paragraph-scale repeat
        (3, "d1", good + "alpha beta gamma entirely different ending here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    stages = curate(df, cap_n=10, neardup=False, pii=True, para=False)
    assert stages["scrubbed"].count() == 3
    deduped = {r["doc_id"] for r in stages["deduped"].collect()}
    assert deduped == {1, 3}  # 2 collapsed into 1 only BECAUSE of the scrub
    texts = dict(stages["scrubbed"].select("doc_id", "text").collect())
    assert "@" not in texts[1] and "[EMAIL]" in texts[1]

    stages2 = curate(df, cap_n=10, pii=True, para=True, words_per_para=15)
    para_texts = dict(stages2["para"].select("doc_id", "text").collect())
    # post-scrub doc 2 is an exact copy of doc 1: every paragraph loses
    # first-occurrence and the empty survivor is dropped entirely; doc 3
    # loses only its shared boilerplate paragraphs
    assert 2 not in para_texts
    assert 0 < len(para_texts[3]) < len(para_texts[1])
    n_keys = set(stages2)
    assert n_keys == {"quality", "scrubbed", "para",
                      "deduped", "capped", "sampled"}


def test_curate_decontam_stage(spark):
    """bench!=None drops every doc whose 8-gram overlap with the bench
    set is >= threshold — AFTER dedup (survivors only), BEFORE capping."""
    good = ("the quick brown fox jumps over the lazy dog and it runs to "
            "the barn for a nap in the hay that is warm ") * 3
    rows = [(i, f"dom{i % 3}", good + (f"unique words tail number {i} "
                                       "with plenty of extra filler "
                                       "content appended here") * 3)
            for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    # benchmark = doc 7's full text: doc 7 itself is a total leak; every
    # other doc shares only the `good` prefix grams (well under half its
    # distinct grams at threshold 0.9)
    bench = docs.where(F.col("doc_id") == 7).select("text")
    stages = curate(docs, cap_n=100, bench=bench, contam_threshold=0.9)
    assert "decontam" in stages
    kept = {r["doc_id"] for r in stages["decontam"].collect()}
    assert 7 not in kept
    assert len(kept) == 19
    # final stages flow from the decontaminated set
    assert stages["sampled"].count() == 19
