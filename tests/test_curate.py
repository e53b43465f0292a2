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
