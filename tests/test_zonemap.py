"""Zone-map chunk pruning: selective decode must be exact AND provably
skip chunks whose min/max excludes the predicate."""

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.decode import decode_filtered, decode_job
from fsst_spark.jobs.encode import encode_job


@pytest.fixture(scope="module")
def encoded(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("zm_enc"))
    df = (
        spark.range(0, 4000, 1, 4)  # 4 ordered contiguous partitions
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat(F.lit("document body number "),
                                     F.col("doc_id").cast("string")))
    )
    # chunk flushes happen at Arrow-batch boundaries; shrink the batches so
    # each partition yields several chunks with disjoint doc_id ranges
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "200")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)
    return out


def test_zone_filtered_decode_is_exact(spark, encoded):
    got = {
        (r["doc_id"], r["text"])
        for r in decode_filtered(spark, encoded, "doc_id", ">=", 3900).collect()
    }
    expect = {(i, f"document body number {i}") for i in range(3900, 4000)}
    assert got == expect


@pytest.mark.parametrize("op,val,lo,hi", [
    ("<", 150, 0, 149), ("<=", 150, 0, 150),
    (">", 3849, 3850, 3999), ("==", 2000, 2000, 2000),
])
def test_zone_ops_exact(spark, encoded, op, val, lo, hi):
    ids = sorted(r["doc_id"] for r in
                 decode_filtered(spark, encoded, "doc_id", op, val,
                                 columns=["doc_id"]).collect())
    assert ids == list(range(lo, hi + 1))


def test_zone_pruning_skips_chunks(spark, encoded):
    full = decode_job(spark, encoded)
    pruned = decode_job(spark, encoded, zone_filter=("doc_id", ">=", 3900))
    n_full = full.select("pid", "chunk_id").distinct().count()
    n_pruned = pruned.select("pid", "chunk_id").distinct().count()
    assert n_full >= 8, f"corpus produced too few chunks ({n_full}) to test pruning"
    assert n_pruned < n_full / 2, (n_pruned, n_full)


def test_zone_keep_filter_pushed_to_scan(spark, encoded):
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decode_job(spark, encoded,
                   zone_filter=("doc_id", ">=", 3900)).explain("formatted")
    plan = buf.getvalue()
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    # the zone predicate must reach the keep-side parquet scan itself
    assert any("GreaterThanOrEqual(zmax_long,3900)" in p for p in pushed), pushed
    # and that scan must be payload-free (narrow zone projection only)
    scans = re.findall(r"ReadSchema: struct<[^>]*>", plan)
    assert any("payload" not in s and "zmax_long" in s for s in scans), scans


def test_zone_filter_unknown_column_raises(spark, encoded):
    with pytest.raises(KeyError):
        decode_job(spark, encoded, zone_filter=("nope", ">=", 1)).collect()


def test_zone_pack8_is_order_preserving():
    from fsst_spark.jobs.encode import zone_pack8

    vals = ["", "a", "ab", "ab\x00", "abc", "abcdefgh", "abcdefghZZZ",
            "b", "zz", "\x7f", "éclair", "￿" * 3]
    import functools
    svals = sorted(vals, key=functools.cmp_to_key(
        lambda x, y: (x.encode() > y.encode()) - (x.encode() < y.encode())))
    packed = [zone_pack8(v) for v in svals]
    assert packed == sorted(packed)  # non-strict monotone in byte order


def test_zone_string_prefix_pruning_exact_and_effective(spark, tmp_path):
    out = str(tmp_path / "zs")
    # scheme-stripped keys: full URLs would share the constant 'https://'
    # 8-byte prefix and collapse every zone (correct but never prunes)
    rows = [(i, f"site{i // 1000}.example/page/{i:06d}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, url string").repartition(4, "doc_id")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "200")
    try:
        # url prefixes correlate with encode order only per-partition; sort
        # within partitions so chunks get tight url zones
        src = df.sortWithinPartitions("url")
        encode_job(spark, src, out, chunk_bytes=2 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)

    got = sorted(r["doc_id"] for r in decode_filtered(
        spark, out, "url", ">=", "site3.example/").collect())
    assert got == list(range(3000, 4000))

    pruned = decode_job(spark, out, zone_filter=("url", ">=", "site3.example/"))
    full = decode_job(spark, out)
    n_pruned = pruned.select("pid", "chunk_id").distinct().count()
    n_full = full.select("pid", "chunk_id").distinct().count()
    assert n_pruned < n_full, (n_pruned, n_full)

    # equality with a shared-prefix boundary value must stay exact
    probe = "site2.example/page/002500"
    got_eq = [r["doc_id"] for r in decode_filtered(spark, out, "url", "==", probe).collect()]
    assert got_eq == [2500]


def test_zone_pack8_property_order_preserving():
    """Property: zone_pack8 is non-strict monotone under bytewise order
    for arbitrary byte strings (the exact invariant pruning relies on)."""
    from hypothesis import given, settings, strategies as st

    from fsst_spark.jobs.encode import zone_pack8

    @settings(max_examples=500, deadline=None)
    @given(st.binary(max_size=24), st.binary(max_size=24))
    def check(a, b):
        pa_, pb = zone_pack8(a), zone_pack8(b)
        if a <= b:
            assert pa_ <= pb
        else:
            assert pa_ >= pb

    check()


def test_zone_timestamp_filter(spark, tmp_path):
    """Timestamp columns carry exact int64 zones in their storage unit;
    decode_filtered takes the threshold in microseconds."""
    out = str(tmp_path / "zt")
    base = 1_700_000_000_000_000  # us
    df = (
        spark.range(0, 2000, 1, 2)
        .withColumnRenamed("id", "doc_id")
        .withColumn("ts", F.timestamp_micros(F.lit(base) + F.col("doc_id") * 1_000_000))
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "200")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)
    cutoff = base + 1900 * 1_000_000
    got = decode_job(spark, out, zone_filter=("ts", ">=", cutoff))
    full = decode_job(spark, out)
    assert got.select("pid", "chunk_id").distinct().count() \
        < full.select("pid", "chunk_id").distinct().count()
    ids = sorted(r["doc_id"] for r in
                 got.where(F.unix_micros("ts") >= cutoff).collect())
    assert ids == list(range(1900, 2000))
