"""Persistent MinHash dedup index: build once, probe new batches with
join-only plans, append survivors so ingestion is inductive."""

import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.dedup_index import (
    dedup_against_index,
    flag_against_index,
    minhash_index_write,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    """Index over the EVEN half of the corpus."""
    path = str(tmp_path_factory.mktemp("mh_index"))
    minhash_index_write(docs.where("doc_id % 2 = 0"), path)
    return path


def test_planted_copies_are_flagged(spark, docs, index):
    """New batch = odd docs + exact copies of every 10th even doc: every
    copy must flag (identical signature collides in every band), no
    surviving planted copy."""
    planted = (docs.where("doc_id % 20 = 0")
               .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000)))
    batch = docs.where("doc_id % 2 = 1").unionByName(planted)
    out = flag_against_index(batch, index)
    n_planted = planted.count()
    assert n_planted > 0
    flagged_planted = out.where(
        (F.col("doc_id") >= 10_000_000) & F.col("index_dup")).count()
    assert flagged_planted == n_planted


def test_probe_is_join_only(spark, docs, index):
    """The corpus side of a probe must contribute NO Python UDF — only
    parquet scans of the postings/signature tables (the new batch runs
    the one signature UDF)."""
    batch = docs.where("doc_id % 2 = 1").limit(50)
    plan = flag_against_index(batch, index)._jdf.queryExecution().executedPlan().toString()
    # one signature UDF evaluation subtree (new batch), not two
    assert plan.count("ArrowEvalPython") <= 2  # sig_new persisted + reuse
    assert "CartesianProduct" not in plan


def test_append_survivors_induction(spark, docs, index, tmp_path):
    """After dedup_against_index(append_survivors=True), re-probing the
    SAME batch flags every row (each survivor now self-matches; each
    dropped row still matches what dropped it)."""
    import shutil

    path = str(tmp_path / "idx2")
    shutil.copytree(index, path)
    batch = docs.where("doc_id % 2 = 1").limit(40)
    survivors = dedup_against_index(batch, path, append_survivors=True)
    assert survivors.count() > 0
    again = flag_against_index(batch, path)
    assert again.where(~F.col("index_dup")).count() == 0


def test_missing_index_raises(spark, docs, tmp_path):
    with pytest.raises(FileNotFoundError, match="minhash index"):
        flag_against_index(docs.limit(5), str(tmp_path / "nope"))
