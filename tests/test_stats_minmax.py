"""Exact min/max from an encoded store by decoding only zone-boundary
chunks (string/float columns, whose zones are conservative bounds)."""

import math

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
