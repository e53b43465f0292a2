"""HyperLogLog sketches: kernel accuracy/merge laws and the metadata-only
encoded_ndv job (no payload reads, honest refusal on sketch-less chunks)."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from fsst_spark.kernel.hll import hll_build, hll_estimate, hll_merge

# ---------------------------------------------------------------- kernel


@pytest.mark.parametrize("ndv", [1, 10, 100, 1000, 50_000])
def test_estimate_within_5pct(ndv):
    blob = hll_build(pa.array([f"value-{i}" for i in range(ndv)],
                              pa.large_string()))
    est = hll_estimate(blob)
    assert abs(est - ndv) <= max(2, 0.05 * ndv), (est, ndv)


def test_duplicates_do_not_inflate():
    blob = hll_build(pa.array(["x"] * 100_000 + ["y"], pa.large_string()))
    assert hll_estimate(blob) == 2


def test_merge_equals_build_on_union():
    a = pa.array([f"k{i}" for i in range(0, 3000)], pa.large_string())
    b = pa.array([f"k{i}" for i in range(1500, 5000)], pa.large_string())
    u = pa.array([f"k{i}" for i in range(0, 5000)], pa.large_string())
    assert hll_merge([hll_build(a), hll_build(b)]) == hll_build(u)


def test_merge_is_commutative_and_idempotent():
    a = hll_build(pa.array(["p", "q"], pa.large_string()))
    b = hll_build(pa.array(["q", "r"], pa.large_string()))
    assert hll_merge([a, b]) == hll_merge([b, a])
    assert hll_merge([a, a]) == a


def test_merge_poisons_on_missing_or_mismatched():
    a = hll_build(pa.array(["p"], pa.large_string()))
    assert hll_merge([a, None]) is None
    assert hll_merge([]) is None
    b = hll_build(pa.array(["p"], pa.large_string()), p=8)
    assert hll_merge([a, b]) is None  # different register counts


def test_int_float_timestamp_paths():
    assert abs(hll_estimate(hll_build(
        pa.array(range(10_000), pa.int64()))) - 10_000) < 500
    rng = np.random.default_rng(0)
    assert abs(hll_estimate(hll_build(
        pa.array(rng.normal(size=10_000)))) - 10_000) < 500
    assert abs(hll_estimate(hll_build(
        pa.array(range(10_000), pa.timestamp("us")))) - 10_000) < 500


def test_all_null_estimates_zero_and_merges_as_noop():
    z = hll_build(pa.array([None, None], pa.large_string()))
    assert hll_estimate(z) == 0
    a = hll_build(pa.array(["x"], pa.large_string()))
    assert hll_merge([a, z]) == a


def test_nested_type_unsupported():
    assert hll_build(pa.array([[1], [2]])) is None


def test_estimate_rejects_junk():
    with pytest.raises(ValueError):
        hll_estimate(b"JUNKJUNK")


# ------------------------------------------------------------ spark job


@pytest.fixture(scope="module")
def ndv_store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hll_store"))
    df = (
        spark.range(0, 5000, 1, 4).withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.when(F.col("doc_id") % 3 == 0, "en")
                    .when(F.col("doc_id") % 3 == 1, "de").otherwise("fr"))
        .withColumn("url", F.concat(F.lit("https://h"),
                                    (F.col("doc_id") % 500).cast("string"),
                                    F.lit(".net/x")))
        .withColumn("price", F.col("doc_id").cast("double") * 0.25)
    )
    from fsst_spark.jobs.encode import encode_job

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "500")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)
    return out


def test_encoded_ndv_across_types_and_chunks(spark, ndv_store):
    from fsst_spark.jobs.stats import encoded_ndv

    est = encoded_ndv(spark, ndv_store, ["doc_id", "lang", "url", "price"])
    for col, true in (("doc_id", 5000), ("lang", 3),
                      ("url", 500), ("price", 5000)):
        assert abs(est[col] - true) <= max(2, 0.06 * true), (col, est[col])


def test_encoded_ndv_unknown_column_raises(spark, ndv_store):
    from fsst_spark.jobs.stats import encoded_ndv

    with pytest.raises(KeyError):
        encoded_ndv(spark, ndv_store, ["nope"])


def test_encoded_ndv_refuses_sketchless_store(spark, tmp_path):
    from fsst_spark.jobs.encode import encode_job
    from fsst_spark.jobs.stats import encoded_ndv

    out = str(tmp_path / "no_hll")
    df = spark.range(0, 200, 1, 2).withColumnRenamed("id", "doc_id")
    encode_job(spark, df, out, chunk_bytes=64 << 10, resume=False,
               pre_partitioned=True, unique_col="doc_id",
               hll_p=0).collect()
    with pytest.raises(ValueError, match="HLL"):
        encoded_ndv(spark, out, ["doc_id"])


def test_encoded_ndv_refuses_pre_sketch_store(spark, ndv_store, tmp_path):
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from fsst_spark.jobs.stats import encoded_ndv

    old_dir = str(tmp_path / "pre_hll")
    shutil.copytree(ndv_store, old_dir)
    for f in glob.glob(os.path.join(old_dir, "chunks", "*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["hll", "bloom"]), f)
    with pytest.raises(ValueError, match="sketch"):
        encoded_ndv(spark, old_dir, ["doc_id"])
