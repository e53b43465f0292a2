"""Front coding (str_front, the Parquet DELTA_BYTE_ARRAY shape): exact
round-trips on every edge, selection only when prefixes pay, and a real
ratio win on a url_sort_key-clustered encode.

Reference tie: engine-side codec surface beyond the reference kernel
(spiraldb/fsst src/lib.rs:14-17); design from the public Parquet/ORC
incremental-encoding layout.
"""

import random

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from fsst_spark.kernel.codecs import (
    _arrow_bytes_buffers,
    chunk_stats,
    decode_column,
    decode_str_front,
    encode_column,
    encode_str_front,
    front_prefix_lens,
)

# ---------------------------------------------------------------- kernel


def _roundtrip(vals, typ=pa.large_string()):
    arr = pa.array(vals, typ)
    buf, off = _arrow_bytes_buffers(arr)
    enc = encode_str_front(buf, off)
    b, o = decode_str_front(enc)
    out = [bytes(b[o[i]:o[i + 1]]) for i in range(len(o) - 1)]
    want = [v.encode() if isinstance(v, str) else v for v in vals]
    assert out == want
    return enc


def test_sorted_urls_roundtrip_and_shrink():
    urls = sorted(f"net.example{i % 37:02d}.h{i % 97:02d}/p/{i}"
                  for i in range(5000))
    enc = _roundtrip(urls)
    raw = sum(len(u) for u in urls)
    assert raw / len(enc["payload"]) > 4.0


@pytest.mark.parametrize("vals", [
    [""], ["", "", ""], ["aaa"] * 10, ["a"],
    ["abc", "abd", "x", "xy", "xyz", ""],        # shrinking + empty mid-run
    ["a" * 300, "a" * 300 + "b", "a" * 310],     # beyond the 255 prefix cap
    ["éclair", "éclat", "é"],     # multi-byte utf-8 prefixes
])
def test_edge_roundtrips(vals):
    _roundtrip(vals)


def test_binary_with_zero_bytes():
    _roundtrip([b"\x00\x00a", b"\x00\x00b", b"\x00\x01"], pa.large_binary())


def test_prefix_lens_exact():
    vals = ["", "ab", "abc", "abd", "xyz", "xyz"]
    arr = pa.array(vals, pa.large_string())
    buf, off = _arrow_bytes_buffers(arr)
    assert front_prefix_lens(buf, off).tolist() == [0, 0, 2, 2, 0, 3]


def test_prefix_cap_bounds_stored_lens():
    vals = ["a" * 400, "a" * 400 + "z"]
    arr = pa.array(vals, pa.large_string())
    buf, off = _arrow_bytes_buffers(arr)
    assert front_prefix_lens(buf, off).max() <= 255


def test_hypothesis_style_random_roundtrips():
    rng = random.Random(7)
    alphabet = "abz/.:0"
    for _ in range(25):
        n = rng.randrange(1, 60)
        vals = ["".join(rng.choices(alphabet, k=rng.randrange(0, 30)))
                for _ in range(n)]
        if rng.random() < 0.5:
            vals.sort()
        _roundtrip(vals)


def test_selection_picks_front_only_when_prefixes_pay():
    urls = sorted(f"net.example{i % 37:02d}.h{i % 97:02d}/p/{i}"
                  for i in range(4000))
    sel = encode_column(pa.array(urls, pa.large_string()))
    assert sel["codec"] == "str_front"
    rng = random.Random(1)
    words = "the quick brown fox jumps over lazy dog".split()
    texts = [" ".join(rng.choices(words, k=30)) for _ in range(2000)]
    sel2 = encode_column(pa.array(texts, pa.large_string()))
    assert sel2["codec"] != "str_front"


def test_selection_roundtrips_with_nulls():
    urls = sorted(f"net.example{i % 37:02d}.h{i % 97:02d}/p/{i}"
                  for i in range(3000))
    vals = [None if i % 17 == 0 else u for i, u in enumerate(urls)]
    arr = pa.array(vals, pa.large_string())
    enc = encode_column(arr, chunk_stats(arr))
    assert enc["codec"] == "str_front"
    assert decode_column(enc).to_pylist() == vals


def test_long_values_fall_back_to_fsst():
    vals = sorted("prefix-shared-" + "x" * 4000 + str(i) for i in range(50))
    enc = encode_column(pa.array(vals, pa.large_string()))
    assert enc["codec"] != "str_front"  # FRONT_MAX_LEN guard
    assert decode_column(enc).to_pylist() == vals


# ------------------------------------------------------------ spark jobs


def test_clustered_encode_front_codes_and_roundtrips(spark, tmp_path):
    """A url_sort_key-clustered encode should front-code the key column,
    shrink it vs the same store unclustered, and stay bit-identical."""
    from fsst_spark.jobs.decode import decode_job
    from fsst_spark.jobs.encode import encode_job

    df = (spark.range(0, 6000, 1, 4).withColumnRenamed("id", "doc_id")
          .withColumn("url_key", F.concat(
              F.lit("net.d"), (F.col("doc_id") % 41).cast("string"),
              F.lit("/path/"), F.col("doc_id").cast("string"))))
    stores = {}
    for name, sort in (("clustered", "url_key"), ("plain", None)):
        out = str(tmp_path / name)
        encode_job(spark, df, out, num_partitions=4, chunk_bytes=32 << 10,
                   resume=False, unique_col="doc_id", sort_key=sort).collect()
        chunks = spark.read.parquet(f"{out}/chunks").where(
            F.col("column") == "url_key")
        agg = chunks.agg(F.sum("enc_bytes").alias("b")).collect()[0]
        codecs = {r["codec"] for r in chunks.select("codec").distinct().collect()}
        stores[name] = (out, agg["b"], codecs)
    assert "str_front" in stores["clustered"][2], stores["clustered"][2]
    assert stores["clustered"][1] < stores["plain"][1] * 0.8, stores
    got = sorted((r["doc_id"], r["url_key"]) for r in
                 decode_job(spark, stores["clustered"][0]).collect())
    want = sorted((r["doc_id"], r["url_key"]) for r in df.collect())
    assert got == want


# ---------------------------------------------------------- property test

try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        vals=st.lists(st.binary(min_size=0, max_size=40), min_size=1,
                      max_size=80),
        sort=st.booleans(),
    )
    def test_front_roundtrip_property(vals, sort):
        if sort:
            vals = sorted(vals)
        arr = pa.array(vals, pa.large_binary())
        buf, off = _arrow_bytes_buffers(arr)
        enc = encode_str_front(buf, off)
        b, o = decode_str_front(enc)
        assert [bytes(b[o[i]:o[i + 1]]) for i in range(len(o) - 1)] == vals
except ImportError:  # pragma: no cover
    pass
