"""LIMIT pushdown (``decode_head``): n rows out, only the chunks the
limit needs read — plus the filtered/tombstoned retry path."""

import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.decode import decode_head
from fsst_spark.jobs.encode import encode_job

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )


@pytest.fixture(scope="module")
def store(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("head_store"))
    # small Arrow batches so chunk_bytes actually splits the partition
    # into many chunks (the limit needs a prefix to choose from)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        encode_job(spark, docs, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    return out


def _chunks_read(df):
    return df.select("pid", "chunk_id").distinct().count()


def test_head_exact_and_bounded(spark, docs, store):
    """Unfiltered head: exactly n rows, and the scan touches only the
    metadata-selected chunk prefix, not the store."""
    total_chunks = (
        spark.read.parquet(f"{store}/chunks")
        .where("column = 'doc_id'").count())
    assert total_chunks >= 4  # the bound below needs something to prune
    n = 10
    df = decode_head(spark, store, n)
    rows = df.collect()
    assert len(rows) == n
    # provenance proves the scan stayed inside the selected chunk prefix
    assert _chunks_read(df) < total_chunks
    # re-derive the selection bound: chunks whose cumulative n_rows cover n
    meta = (spark.read.parquet(f"{store}/chunks")
            .where("column = 'doc_id'").select("pid", "chunk_id", "n_rows")
            .orderBy("pid", "chunk_id").collect())
    need, got = 0, 0
    for r in meta:
        need += 1
        got += r["n_rows"]
        if got >= n:
            break
    assert need < total_chunks


def test_head_returns_valid_rows(spark, docs, store):
    got = {r["doc_id"] for r in decode_head(spark, store, 25).collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert len(got) == 25 and got <= all_ids


def test_head_with_filter(spark, docs, store):
    n = 30
    df = decode_head(spark, store, n, filters=[("lang", "==", "de")])
    rows = df.collect()
    n_de = docs.where("lang = 'de'").count()
    assert len(rows) == min(n, n_de)
    assert all(r["lang"] == "de" for r in rows)


def test_head_filter_exhausts_survivors(spark, docs, store):
    """Limit larger than the match count: every matching row comes back."""
    n_de = docs.where("lang = 'de'").count()
    rows = decode_head(spark, store, n_de + 10_000,
                       filters=[("lang", "==", "de")]).collect()
    assert len(rows) == n_de


def test_head_larger_than_store(spark, docs, store):
    total = docs.count()
    assert decode_head(spark, store, total + 99).count() == total


def test_head_respects_tombstones(spark, docs, tmp_path):
    from fsst_spark.jobs.deletes import delete_where

    out = str(tmp_path / "tomb")
    encode_job(spark, docs, out, chunk_bytes=1 << 10, resume=False,
               pre_partitioned=True, unique_col="doc_id").collect()
    delete_where(spark, out, "lang", "==", "de")
    rows = decode_head(spark, out, 40).collect()
    assert len(rows) == 40 and all(r["lang"] != "de" for r in rows)


def test_head_column_subset_and_guards(spark, docs, store):
    df = decode_head(spark, store, 5, columns=["doc_id"],
                     filters=[("lang", "==", "de")])
    assert set(df.columns) - {"pid", "chunk_id"} == {"doc_id"}
    assert df.count() == 5
    with pytest.raises(ValueError, match="n > 0"):
        decode_head(spark, store, 0)
