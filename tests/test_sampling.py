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
