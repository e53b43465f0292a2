"""Exact min/max from an encoded store by decoding only zone-boundary
chunks (string/float columns, whose zones are conservative bounds)."""

import math

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.encode import encode_job
from fsst_spark.jobs.stats import encoded_column_minmax


def _encode_small_chunks(spark, df, out, **kw):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "200")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, **kw).collect()
    finally:
        spark.conf.set(key, old)


def test_minmax_decodes_only_boundary_chunks(spark, tmp_path):
    df = (
        spark.range(0, 2000, 1, 4)  # contiguous sorted partitions
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 6, "0"))
            .alias("key"),
            (F.col("id") * 0.25 + 100.0).alias("price"),
        )
    )
    out = str(tmp_path / "enc")
    _encode_small_chunks(spark, df, out, unique_col="doc_id")

    s = encoded_column_minmax(spark, out, "key")
    assert (s["min"], s["max"]) == ("k000000", "k001999")
    assert s["n_rows"] == 2000
    assert s["n_chunks_total"] >= 10, s
    # sorted store: the extremes live in the first/last chunk (plus prefix
    # ties, none here — 7-char keys fit the 8-byte prefix exactly)
    assert s["n_chunks_decoded"] <= 3, s

    p = encoded_column_minmax(spark, out, "price")
    assert (p["min"], p["max"]) == (100.0, 100.0 + 1999 * 0.25)
    assert p["n_chunks_decoded"] <= 3, p

    # int columns answer from zones alone: nothing decoded
    d = encoded_column_minmax(spark, out, "doc_id")
    assert (d["min"], d["max"]) == (0, 1999)
    assert d["n_chunks_decoded"] == 0


def test_minmax_float_nan_sorts_greatest(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 1.0), (1, float("nan")), (2, 2.0)], "doc_id long, x double")
    out = str(tmp_path / "enc")
    encode_job(spark, df.coalesce(1), out, resume=False,
               pre_partitioned=True, unique_col="doc_id").collect()
    r = encoded_column_minmax(spark, out, "x")
    assert r["min"] == 1.0
    assert math.isnan(r["max"])  # Spark/DuckDB: NaN sorts above all values


def test_minmax_all_null_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, None), (1, None)], "doc_id long, s string")
    out = str(tmp_path / "enc")
    encode_job(spark, df.coalesce(1), out, resume=False,
               pre_partitioned=True, unique_col="doc_id").collect()
    r = encoded_column_minmax(spark, out, "s")
    assert r["min"] is None and r["max"] is None
    assert r["n_chunks_decoded"] == 0


def test_encoded_column_sum_metadata_and_decode_arms(spark, tmp_path):
    from pyspark.sql import functions as F

    from fsst_spark.jobs.encode import encode_job
    from fsst_spark.jobs.stats import encoded_column_sum

    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 23 == 0, F.lit(None)).otherwise(
            (F.col("id") * 7 - 1000).cast("long")).alias("n"),
        (F.col("id") % 5).cast("long").alias("clean"))
    out = str(tmp_path / "store")
    encode_job(spark, docs, out, num_partitions=6, chunk_bytes=8 << 10,
               resume=False, unique_col="doc_id").collect()
    r = encoded_column_sum(spark, out, "n")
    exp = docs.agg(F.sum("n"), F.count("n"), F.avg("n")).collect()[0]
    assert (r["sum"], r["n_values"]) == (exp[0], exp[1])
    assert r["avg"] == pytest.approx(exp[2])
    assert r["n_chunks_decoded"] > 0  # null-bearing chunks decode
    rc = encoded_column_sum(spark, out, "clean")
    expc = docs.agg(F.sum("clean"), F.count("clean")).collect()[0]
    assert (rc["sum"], rc["n_values"]) == (expc[0], expc[1])
    assert rc["n_chunks_decoded"] == 0  # null-free store: pure metadata


def test_encoded_column_sum_delete_aware_and_guards(spark, tmp_path):
    from pyspark.sql import functions as F

    from fsst_spark.jobs.deletes import delete_where
    from fsst_spark.jobs.encode import encode_job
    from fsst_spark.jobs.stats import encoded_column_sum

    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 11).cast("long").alias("v"),
        F.col("id").cast("string").alias("s"))
    out = str(tmp_path / "store")
    encode_job(spark, docs, out, num_partitions=4, chunk_bytes=8 << 10,
               resume=False, unique_col="doc_id").collect()
    delete_where(spark, out, "doc_id", "<", 1500)
    r = encoded_column_sum(spark, out, "v")
    exp = docs.filter("doc_id >= 1500").agg(F.sum("v"), F.count("v")).collect()[0]
    assert (r["sum"], r["n_values"]) == (exp[0], exp[1])
    assert r["n_chunks_decoded"] > 0  # tombstoned chunks decode
    with pytest.raises(ValueError, match="int column"):
        encoded_column_sum(spark, out, "s")
    with pytest.raises(KeyError):
        encoded_column_sum(spark, out, "nope")


def test_encoded_column_sum_pre_zsum_store_raises(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from fsst_spark.jobs.encode import encode_job
    from fsst_spark.jobs.stats import encoded_column_sum

    docs = spark.range(0, 500).select(F.col("id").alias("doc_id"),
                                      (F.col("id") % 7).alias("v"))
    out = str(tmp_path / "store")
    encode_job(spark, docs, out, num_partitions=2, chunk_bytes=8 << 10,
               resume=False, unique_col="doc_id").collect()
    # simulate a store written before per-chunk sums existed
    for f in glob.glob(f"{out}/chunks/*.parquet"):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["zsum_long"]), f)
    with pytest.raises(ValueError, match="pre-zsum"):
        encoded_column_sum(spark, out, "v")


def test_zone_sum_overflow_guard():
    import numpy as np
    import pyarrow as pa

    from fsst_spark.jobs.encode import _zone_sum
    from fsst_spark.kernel.codecs import chunk_stats

    big = pa.array(np.full(4, (1 << 62), dtype=np.int64))
    assert _zone_sum(big, chunk_stats(big)) is None  # 2^64 overflows int64
    ok = pa.array(np.full(4, (1 << 60), dtype=np.int64))
    assert _zone_sum(ok, chunk_stats(ok)) == 4 << 60
    withnull = pa.array([1, None, 3], pa.int64())
    assert _zone_sum(withnull, chunk_stats(withnull)) is None
