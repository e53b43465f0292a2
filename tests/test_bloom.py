"""Per-chunk Bloom filters: point-predicate (==/IN) chunk pruning on
high-NDV columns where zone maps collapse (unclustered URLs) and exact
min/max zones can't exclude (shuffled ints). Pruning must be provable
(chunk counts) and NEVER lossy (decoded rows == plain filter).

Reference tie: the reference is a codec kernel with no metadata layer
(spiraldb/fsst src/lib.rs:14-17); blooms follow the public Parquet/ORC
column-index bloom design.
"""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from fsst_spark.kernel.bloom import (
    MAX_BITS,
    MIN_BITS,
    _geometry,
    _probe_hash,
    _value_hashes,
    bloom_build,
    bloom_might_contain,
)

# ---------------------------------------------------------------- kernel


def test_no_false_negatives_strings():
    vals = [f"https://d{i:03d}.example.net/p/{i * 7}" for i in range(500)]
    blob = bloom_build(pa.array(vals, pa.large_string()), 500, 10)
    assert all(bloom_might_contain(blob, [v]) for v in vals)


def test_false_positive_rate_reasonable():
    vals = [f"https://d{i:03d}.example.net/p/{i * 7}" for i in range(500)]
    blob = bloom_build(pa.array(vals, pa.large_string()), 500, 10)
    absent = [f"https://zz{i}.other.org/x" for i in range(2000)]
    fp = sum(bloom_might_contain(blob, [a]) for a in absent)
    assert fp / 2000 < 0.05, fp  # 10 bits/value -> ~1% expected


def test_vectorized_and_scalar_hashes_agree():
    # short, exactly-2W, and >2W values all round through both paths
    vals = ["", "a", "x" * 64, "y" * 200, "héllo wörld", "\0\x01bin"]
    h_vec = _value_hashes(pa.array(vals, pa.large_string()))
    assert [int(h) for h in h_vec] == [_probe_hash(v) for v in vals]


def test_int_roundtrip_and_negative_values():
    arr = pa.array(range(-100, 100), pa.int64())
    blob = bloom_build(arr, 200, 10)
    assert all(bloom_might_contain(blob, [i]) for i in range(-100, 100))
    fp = sum(bloom_might_contain(blob, [i]) for i in range(10_000, 12_000))
    assert fp / 2000 < 0.05, fp


def test_long_values_hash_head_tail_len_conservatively():
    long1 = "a" * 100 + "MID1" + "b" * 100
    long2 = "a" * 100 + "MID2" + "b" * 100  # same (head, tail, len)
    blob = bloom_build(pa.array([long1], pa.large_string()), 1, 10)
    assert bloom_might_contain(blob, [long1])  # never a false negative
    # the coarse hash may collide — that only costs pruning power
    assert bloom_might_contain(blob, [long2])


def test_all_null_chunk_prunes_every_probe():
    blob = bloom_build(pa.array([None, None], pa.large_string()), 2, 10)
    assert not bloom_might_contain(blob, ["anything"])


def test_nulls_skipped_values_kept():
    blob = bloom_build(pa.array(["x", None, "y"], pa.large_string()), 2, 10)
    assert bloom_might_contain(blob, ["x"])
    assert bloom_might_contain(blob, ["y"])
    assert not bloom_might_contain(blob, ["zqw"])


def test_multi_value_probe_any_semantics():
    blob = bloom_build(pa.array(["a", "b"], pa.large_string()), 2, 10)
    assert bloom_might_contain(blob, ["nope", "b"])  # one hit keeps chunk
    assert not bloom_might_contain(blob, ["nope", "nada"])


def test_unsupported_types_build_none():
    assert bloom_build(pa.array([1.0, 2.0]), 2, 10) is None
    assert bloom_build(pa.array([[1], [2]]), 2, 10) is None


def test_corrupt_or_foreign_blobs_are_conservative():
    blob = bloom_build(pa.array(["v"], pa.large_string()), 1, 10)
    assert bloom_might_contain(b"", ["v"])
    assert bloom_might_contain(b"JUNKJUNKJUNK", ["v"])
    assert bloom_might_contain(blob[:-1], ["v"])  # truncated bitmap
    assert bloom_might_contain(None, ["v"])


def test_geometry_bounds():
    for ndv in (0, 1, 10, 10_000, 10_000_000):
        m_bits, k = _geometry(ndv, 10)
        assert MIN_BITS <= m_bits <= MAX_BITS
        assert m_bits & (m_bits - 1) == 0  # power of two
        assert 1 <= k <= 8


def test_timestamp_values_hash_as_ticks():
    ticks = [1_700_000_000_000_000 + i for i in range(50)]
    arr = pa.array(ticks, pa.timestamp("us"))
    blob = bloom_build(arr, 50, 10)
    assert all(bloom_might_contain(blob, [t]) for t in ticks)
    assert not bloom_might_contain(blob, [1])


# ------------------------------------------------------------ spark jobs


def _n_chunks(df):
    return df.select("pid", "chunk_id").distinct().count()


@pytest.fixture(scope="module")
def url_store(spark, tmp_path_factory):
    """UNCLUSTERED high-NDV URL store: every chunk's 8-byte string zone
    collapses to the shared 'https://' prefix, so only blooms can prune a
    point probe. Rows are shuffled so value order never correlates with
    layout."""
    out = str(tmp_path_factory.mktemp("bloom_url"))
    rng = np.random.default_rng(7)
    ids = rng.permutation(4000).tolist()
    df = (
        spark.createDataFrame([(int(i),) for i in ids], "doc_id bigint")
        .repartition(4)
        .withColumn("url", F.concat(
            F.lit("https://h"), (F.col("doc_id") % 97).cast("string"),
            F.lit(".example.net/d/"), F.col("doc_id").cast("string")))
    )
    from fsst_spark.jobs.encode import encode_job

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "250")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)
    return out


def test_url_point_probe_exact(spark, url_store):
    from fsst_spark.jobs.decode import decode_filtered

    url = "https://h13.example.net/d/1274"
    rows = decode_filtered(spark, url_store, "url", "==", url).collect()
    assert [(r["doc_id"], r["url"]) for r in rows] == [(1274, url)]


def test_url_point_probe_prunes_chunks(spark, url_store):
    from fsst_spark.jobs.decode import decode_job

    full = _n_chunks(decode_job(spark, url_store))
    pruned = _n_chunks(decode_job(
        spark, url_store,
        zone_filter=("url", "==", "https://h13.example.net/d/1274")))
    assert full >= 8, full
    # zones are useless here (shared prefix); the bloom must carry it
    assert pruned <= max(2, full // 4), (pruned, full)


def test_url_in_list_probe_exact_and_pruned(spark, url_store):
    from fsst_spark.jobs.decode import decode_filtered, decode_job

    urls = [f"https://h{i % 97}.example.net/d/{i}" for i in (5, 901, 3777)]
    got = sorted(r["doc_id"] for r in decode_filtered(
        spark, url_store, "url", "in", urls).collect())
    assert got == [5, 901, 3777]
    full = _n_chunks(decode_job(spark, url_store))
    pruned = _n_chunks(decode_job(spark, url_store,
                                  zone_filter=("url", "in", urls)))
    assert pruned < full, (pruned, full)


def test_absent_value_decodes_near_zero_chunks(spark, url_store):
    from fsst_spark.jobs.decode import decode_filtered, decode_job

    probe = "https://nowhere.invalid/x"
    assert decode_filtered(spark, url_store, "url", "==", probe).count() == 0
    pruned = _n_chunks(decode_job(spark, url_store,
                                  zone_filter=("url", "==", probe)))
    assert pruned <= 1, pruned  # fp budget: ~1% of ~16 chunks


def test_shuffled_int_point_probe_pruned_by_bloom(spark, tmp_path):
    """Shuffled ints: every chunk's exact min/max zone spans ~the full
    range, so `doc_id == v` survives zone pruning everywhere; the bloom
    must cut it to ~1 chunk."""
    from fsst_spark.jobs.decode import decode_filtered, decode_job
    from fsst_spark.jobs.encode import encode_job

    out = str(tmp_path / "bloom_int")
    rng = np.random.default_rng(11)
    ids = rng.permutation(4000).tolist()
    df = spark.createDataFrame([(int(i),) for i in ids],
                               "doc_id bigint").repartition(4)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "250")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)
    assert [r["doc_id"] for r in
            decode_filtered(spark, out, "doc_id", "==", 2718).collect()] == [2718]
    full = _n_chunks(decode_job(spark, out))
    pruned = _n_chunks(decode_job(spark, out,
                                  zone_filter=("doc_id", "==", 2718)))
    assert full >= 8 and pruned <= max(2, full // 4), (pruned, full)


def test_bloom_disabled_still_exact_no_pruning(spark, tmp_path):
    from fsst_spark.jobs.decode import decode_filtered, decode_job
    from fsst_spark.jobs.encode import encode_job

    out = str(tmp_path / "bloom_off")
    df = (spark.range(0, 800, 1, 2).withColumnRenamed("id", "doc_id")
          .withColumn("url", F.concat(F.lit("https://x.net/"),
                                      F.col("doc_id").cast("string"))))
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "200")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id",
                   bloom_bits_per_value=0).collect()
    finally:
        spark.conf.set(key, old)
    chunks = spark.read.parquet(f"{out}/chunks")
    assert chunks.filter(F.col("bloom").isNotNull()).count() == 0
    rows = decode_filtered(spark, out, "url", "==",
                           "https://x.net/500").collect()
    assert [r["doc_id"] for r in rows] == [500]
    # unclustered string ==: without blooms nothing can prune
    full = _n_chunks(decode_job(spark, out))
    kept = _n_chunks(decode_job(spark, out,
                                zone_filter=("url", "==", "https://x.net/500")))
    assert kept == full


def test_pre_bloom_store_backward_compat(spark, url_store, tmp_path):
    """A store written before the bloom column existed must still decode
    and zone-filter — simulated by rewriting chunk files without the
    column (exactly the on-disk shape of an r4 store)."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from fsst_spark.jobs.decode import decode_filtered

    old_dir = str(tmp_path / "pre_bloom")
    shutil.copytree(url_store, old_dir)
    for f in glob.glob(os.path.join(old_dir, "chunks", "*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["bloom"]), f)
    url = "https://h13.example.net/d/1274"
    rows = decode_filtered(spark, old_dir, "url", "==", url).collect()
    assert [(r["doc_id"], r["url"]) for r in rows] == [(1274, url)]


def test_dict_coded_chunks_have_no_bloom(spark, tmp_path):
    """Low-NDV strings go dict codec whose dictionary already prunes
    exactly — the encoder must not spend bytes on a bloom there."""
    from fsst_spark.jobs.encode import encode_job

    out = str(tmp_path / "bloom_dict")
    df = (spark.range(0, 2000, 1, 2).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en")
                      .otherwise("de")))
    encode_job(spark, df, out, chunk_bytes=256 << 10, resume=False,
               pre_partitioned=True, unique_col="doc_id").collect()
    chunks = spark.read.parquet(f"{out}/chunks")
    assert chunks.filter((F.col("column") == "lang")
                         & (F.col("codec") == "str_dict")
                         & F.col("bloom").isNotNull()).count() == 0


def test_bloom_bytes_are_small_fraction_of_raw(spark, url_store):
    # vs RAW bytes, not encoded payload: a better codec (front coding)
    # shrinking the payload must not fail the bloom-overhead budget.
    # At real (MB) chunk sizes blooms are ~0.1%; these 1 KiB test chunks
    # sit near the 128 B bloom floor, so allow 20%.
    chunks = spark.read.parquet(f"{url_store}/chunks").select(
        F.sum("raw_bytes").alias("raw"),
        F.sum(F.octet_length("bloom")).alias("bloom")).collect()[0]
    assert chunks["bloom"] < chunks["raw"] * 0.2, dict(chunks.asDict())
