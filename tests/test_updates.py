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


def test_merge_upsert_job_store(spark, docs, tmp_path):
    store = str(tmp_path / "merge_store")
    encode_job(spark, docs, store, chunk_bytes=8 << 10, resume=False,
               pre_partitioned=False, num_partitions=2,
               unique_col="doc_id").collect()
    from fsst_spark.jobs.updates import merge_upsert

    # source: replace every doc_id % 10 == 0 row, insert 5 new keys
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    replaced = (docs.where("doc_id % 10 = 0")
                .withColumn("n_chars", F.col("n_chars") + 7))
    inserted = (docs.limit(5)
                .withColumn("doc_id", F.col("doc_id") + max_id + 1))
    source = replaced.unionByName(inserted)
    res = merge_upsert(spark, store, source, "doc_id", chunk_bytes=8 << 10)
    assert res["tombstoned"] == replaced.count()
    dec = decode_job(spark, store).drop("pid", "chunk_id")
    want = (docs.join(source, "doc_id", "left_anti").unionByName(source))
    assert dec.count() == want.count() == docs.count() + 5
    a = dec.select(*sorted(dec.columns)).orderBy("doc_id").collect()
    b = want.select(*sorted(want.columns)).orderBy("doc_id").collect()
    assert a == b


def test_merge_guards(spark, docs, tmp_path):
    from fsst_spark.jobs.updates import merge_upsert

    store = str(tmp_path / "mg_store")
    encode_job(spark, docs, store, chunk_bytes=8 << 10, resume=False,
               pre_partitioned=False, num_partitions=2,
               unique_col="doc_id").collect()
    with pytest.raises(ValueError, match="repeats key"):
        merge_upsert(spark, store,
                     docs.limit(3).unionByName(docs.limit(3)), "doc_id")
    with pytest.raises(ValueError, match="schema"):
        merge_upsert(spark, store, docs.drop("source"), "doc_id")


def test_delete_matching_broadcast_tier(spark, docs, tmp_path):
    """Force the broadcast is_in tier (pushdown cap 3) and check it
    tombstones exactly the keyed rows, idempotently."""
    from fsst_spark.jobs.deletes import delete_matching

    store = str(tmp_path / "dm_store")
    encode_job(spark, docs, store, chunk_bytes=8 << 10, resume=False,
               pre_partitioned=False, num_partitions=2,
               unique_col="doc_id").collect()
    keys = [r["doc_id"] for r in
            docs.where("doc_id % 7 = 0").select("doc_id").collect()]
    assert len(keys) > 3
    res = delete_matching(spark, store, "doc_id",
                          spark.createDataFrame([(k,) for k in keys], ["k"]),
                          max_pushdown_keys=3)
    assert res["deleted_now"] == len(keys)
    again = delete_matching(spark, store, "doc_id", keys[:5] + [keys[0]],
                            max_pushdown_keys=3)
    assert again["deleted_now"] == 0  # already tombstoned: idempotent
    dec = decode_job(spark, store)
    assert dec.count() == docs.count() - len(keys)
    # string-key broadcast tier
    res2 = delete_matching(spark, store, "lang",
                           spark.createDataFrame([("de",), ("fr",)], ["k"]),
                           max_pushdown_keys=1)
    want2 = docs.where("doc_id % 7 <> 0 AND lang IN ('de','fr')").count()
    assert res2["deleted_now"] == want2
