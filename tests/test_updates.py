"""Merge-on-read UPDATE: append new versions + tombstone originals."""

import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.decode import decode_job
from fsst_spark.jobs.encode import encode_job
from fsst_spark.jobs.updates import update_where

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "source", "n_chars")
    )


def _expected(docs, set_sql: str, cond: str):
    return docs.selectExpr(
        "doc_id",
        f"CASE WHEN {cond} THEN {set_sql} ELSE lang END AS lang",
        "source",
        "n_chars",
    )


def test_update_job_store(spark, docs, tmp_path):
    store = str(tmp_path / "job_store")
    encode_job(spark, docs, store, chunk_bytes=8 << 10, resume=False,
               pre_partitioned=False, num_partitions=2,
               unique_col="doc_id").collect()
    n_de = docs.where("lang = 'de'").count()
    res = update_where(spark, store, {"n_chars": "n_chars + 1000"},
                       "lang", "==", "de", chunk_bytes=8 << 10)
    assert res["updated"] == n_de
    assert res["appended_pids"]
    dec = decode_job(spark, store).drop("pid", "chunk_id")
    assert dec.count() == docs.count()  # same cardinality: update, not insert
    want = docs.selectExpr(
        "doc_id", "lang", "source",
        "CASE WHEN lang = 'de' THEN n_chars + 1000 ELSE n_chars END AS n_chars")
    a = dec.select(*sorted(dec.columns)).orderBy("doc_id").collect()
    b = want.select(*sorted(want.columns)).orderBy("doc_id").collect()
    assert a == b


def test_update_datasource_store_and_new_versions_survive(spark, docs, tmp_path):
    from fsst_spark.sources.fsst_source import register

    register(spark)
    store = str(tmp_path / "ds_store")
    docs.write.format("fsst").mode("append") \
        .option("chunk_bytes", 8 << 10).save(store)
    # the SET keeps the predicate true for new versions — the pid-
    # restricted tombstone pass must NOT delete them
    res = update_where(spark, store, {"n_chars": "n_chars * 2"},
                       "lang", "==", "fr", chunk_bytes=8 << 10)
    assert res["updated"] == docs.where("lang = 'fr'").count()
    back = spark.read.format("fsst").load(store)
    assert back.count() == docs.count()
    got = back.where("lang = 'fr'").agg(F.sum("n_chars")).collect()[0][0]
    want = docs.where("lang = 'fr'").agg(F.sum(F.col("n_chars") * 2)) \
        .collect()[0][0]
    assert got == want


def test_update_guards(spark, docs, tmp_path):
    store = str(tmp_path / "g_store")
    encode_job(spark, docs, store, chunk_bytes=8 << 10, resume=False,
               pre_partitioned=False, num_partitions=2,
               unique_col="doc_id").collect()
    with pytest.raises(KeyError, match="nope"):
        update_where(spark, store, {"nope": "1"}, "lang", "==", "de")
    with pytest.raises(TypeError, match="type"):
        update_where(spark, store, {"n_chars": "'abc'"}, "lang", "==", "de")
    with pytest.raises(ValueError, match="set_exprs"):
        update_where(spark, store, {}, "lang", "==", "de")


def test_update_twice_compounds(spark, docs, tmp_path):
    store = str(tmp_path / "twice_store")
    encode_job(spark, docs, store, chunk_bytes=8 << 10, resume=False,
               pre_partitioned=False, num_partitions=2,
               unique_col="doc_id").collect()
    update_where(spark, store, {"n_chars": "n_chars + 1"},
                 "lang", "==", "de", chunk_bytes=8 << 10)
    update_where(spark, store, {"n_chars": "n_chars + 1"},
                 "lang", "==", "de", chunk_bytes=8 << 10)
    dec = decode_job(spark, store)
    got = dec.agg(F.sum("n_chars")).collect()[0][0]
    want = docs.agg(F.sum(
        F.when(F.col("lang") == "de", F.col("n_chars") + 2)
        .otherwise(F.col("n_chars")))).collect()[0][0]
    assert got == want
    assert dec.count() == docs.count()
