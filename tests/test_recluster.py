"""recluster_store: re-layout an ingest-ordered store so zones prune on
the new key; content must survive the decode->re-encode round bit-exactly."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.compact import recluster_store
from fsst_spark.jobs.decode import decode_job
from fsst_spark.jobs.encode import encode_job


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("recluster")
    src = str(base / "ingest_ordered")
    dst = str(base / "key_clustered")
    rng = np.random.default_rng(5)
    ids = rng.permutation(20000).tolist()  # ingest order ⟂ key order
    df = (
        spark.createDataFrame([(int(i),) for i in ids], "doc_id bigint")
        .repartition(4)
        .withColumn("key", F.concat(
            F.lit("net.d"), F.lpad(F.col("doc_id") % 40, 2, "0"),
            F.lit("/p/"), F.col("doc_id").cast("string")))
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "500")
    try:
        encode_job(spark, df, src, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
        recluster_store(spark, src, dst, "key", num_partitions=4,
                        chunk_bytes=16 << 10).collect()
    finally:
        spark.conf.set(key, old)
    return src, dst, df


def _n_chunks(frame):
    return frame.select("pid", "chunk_id").distinct().count()


def test_content_identical(spark, stores):
    src, dst, df = stores
    got = sorted((r["doc_id"], r["key"]) for r in
                 decode_job(spark, dst).collect())
    want = sorted((r["doc_id"], r["key"]) for r in df.collect())
    assert got == want


def test_recluster_makes_key_zones_selective(spark, stores):
    src, dst, _ = stores
    flt = ("key", "prefix", "net.d07/")
    src_kept = _n_chunks(decode_job(spark, src, zone_filter=flt))
    src_all = _n_chunks(decode_job(spark, src))
    dst_kept = _n_chunks(decode_job(spark, dst, zone_filter=flt))
    dst_all = _n_chunks(decode_job(spark, dst))
    # ingest-ordered: every chunk spans the keyspace -> nothing prunes
    assert src_kept == src_all
    # clustered: the 1/40 slice decodes a small fraction
    assert dst_kept <= max(1, dst_all // 4), (dst_kept, dst_all)


def test_recluster_front_codes_the_key(spark, stores):
    _, dst, _ = stores
    codecs = {r["codec"] for r in
              spark.read.parquet(f"{dst}/chunks")
              .where(F.col("column") == "key")
              .select("codec").distinct().collect()}
    assert "str_front" in codecs, codecs


def test_recluster_lineage_records_source(spark, stores):
    src, dst, _ = stores
    import json

    man = spark.read.parquet(f"{dst}/manifest").limit(1).collect()[0]
    lin = json.loads(man["lineage"])
    assert lin["recluster_from"] == src
    assert lin["sort_key"]


def test_callable_sort_key(spark, stores, tmp_path):
    src, _, df = stores
    out = str(tmp_path / "expr_clustered")
    recluster_store(spark, src, out,
                    [lambda d: F.col("key")], num_partitions=2).collect()
    got = decode_job(spark, out).count()
    assert got == df.count()
