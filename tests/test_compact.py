"""Store compaction: many small chunk files -> few, payloads copied
verbatim (no decode), checksums/zones preserved, decode/verify unchanged."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.compact import compact_store
from fsst_spark.jobs.decode import decode_job
from fsst_spark.jobs.encode import encode_job
from fsst_spark.jobs.verify import roundtrip_summary


@pytest.fixture(scope="module")
def small_file_store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("frag_store"))
    df = (
        spark.range(0, 4000, 1, 16)  # 16 contiguous sorted partitions
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat(F.lit("body number "),
                                     F.col("doc_id").cast("string")))
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "200")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)
    return out


def test_compact_preserves_rows_checksums_and_zones(spark, small_file_store,
                                                    tmp_path):
    n_in = len(glob.glob(os.path.join(small_file_store, "chunks", "*.parquet")))
    assert n_in == 16
    out = str(tmp_path / "compacted")
    metrics = compact_store(spark, small_file_store, out,
                            target_files=3).collect()
    assert len(metrics) == 3
    assert sum(m["n_rows"] for m in metrics) == 4000
    assert len(glob.glob(os.path.join(out, "chunks", "*.parquet"))) == 3

    # bit-identical content through the untouched decode path
    fp = F.sum(F.pmod(F.xxhash64("doc_id", "text"), F.lit(1 << 31)))
    assert decode_job(spark, out).agg(fp).first()[0] == \
        decode_job(spark, small_file_store).agg(fp).first()[0]

    # per-column-chunk checksums were copied verbatim: verify is a true gate
    ver = roundtrip_summary(spark, out).collect()
    assert ver and all(r["all_ok"] for r in ver)

    # zone maps survive: the sorted layout still prunes selectively
    full = decode_job(spark, out).select("pid", "chunk_id").distinct().count()
    sel = decode_job(spark, out, zone_filter=("doc_id", ">=", 3900)) \
        .select("pid", "chunk_id").distinct().count()
    assert full >= 10
    assert sel < full / 2, (sel, full)


def test_compact_guards(spark, small_file_store, tmp_path):
    with pytest.raises(ValueError, match="must differ"):
        compact_store(spark, small_file_store, small_file_store)
    with pytest.raises(FileNotFoundError):
        compact_store(spark, str(tmp_path / "nope"), str(tmp_path / "x"))
