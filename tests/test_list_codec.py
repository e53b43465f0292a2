"""Nested list codec: array<T> columns round-trip bit-identically.

The reference kernel compresses flat byte streams only (src/lib.rs); the
list codec is the engine's extension for embedding / token-id columns:
per-row lengths through the int codec selector, flattened child values
recursively through the standard column selector (kernel/codecs.encode_list).
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from fsst_spark.kernel.codecs import chunk_stats, decode_column, encode_column


def _roundtrip(arr: pa.Array) -> pa.Array:
    enc = encode_column(arr, chunk_stats(arr))
    assert enc["codec"] == "list"
    dec = decode_column(enc)
    assert dec.type == arr.type
    assert dec.equals(arr)
    return dec


CASES = {
    "float32_fixed_dim": pa.array([[1.5, 2.5, 3.5], [0.1, 0.2, 0.3]] * 50,
                                  type=pa.list_(pa.float32())),
    "float64_alp": pa.array([[1.25, 2.5], [3.125]] * 30, type=pa.list_(pa.float64())),
    "ints_ragged": pa.array([[1, 2, 3], [4], [5, 6, 7, 8, 9]] * 40,
                            type=pa.list_(pa.int64())),
    "strings": pa.array([["ab", "cd"], ["hello world spark"]] * 40,
                        type=pa.list_(pa.string())),
    "null_lists": pa.array([[1, 2], None, [3], None, []] * 20, type=pa.list_(pa.int32())),
    "null_elements": pa.array([[1.0, None, 2.0], [None]] * 25, type=pa.list_(pa.float64())),
    "all_empty": pa.array([[], [], []] * 10, type=pa.list_(pa.int64())),
    "nested_list_of_list": pa.array([[[1, 2], [3]], [[4]]] * 20,
                                    type=pa.list_(pa.list_(pa.int64()))),
    "fixed_size_list": pa.array([[1.0, 2.0], [3.0, 4.0]] * 30,
                                type=pa.list_(pa.float32(), 2)),
    "large_list": pa.array([[b"xy"], [b"z", b"w"]] * 20,
                           type=pa.large_list(pa.binary())),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_kernel_roundtrip(name):
    _roundtrip(CASES[name])


def test_nan_and_negzero_bits_survive():
    vals = [[float("nan"), -0.0, float("inf")], [-float("inf"), 0.0]]
    arr = pa.array(vals, type=pa.list_(pa.float64()))
    dec = decode_column(encode_column(arr, chunk_stats(arr)))
    got = np.concatenate([np.asarray(x, dtype=np.float64) for x in dec.to_pylist()])
    want = np.concatenate([np.asarray(x, dtype=np.float64) for x in vals])
    assert got.tobytes() == want.tobytes()  # bit-identical incl. NaN payload, -0.0


def test_lengths_stream_compresses_fixed_dims():
    # a fixed-dimension embedding column: lengths are one run -> the list
    # overhead must be tiny (RLE'd lengths), payload ~= child payload
    arr = pa.array(np.arange(400, dtype=np.float32).reshape(100, 4).tolist(),
                   type=pa.list_(pa.float32()))
    enc = encode_column(arr, chunk_stats(arr))
    assert enc["params"]["len_bytes"] <= 16


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.lists(st.one_of(st.none(), st.integers(-2**40, 2**40)),
                     max_size=6),
        ),
        max_size=50,
    )
)
def test_property_int_lists(rows):
    arr = pa.array(rows, type=pa.list_(pa.int64()))
    if arr.null_count == len(arr):  # all-null chunks take the validity-only path
        enc = encode_column(arr, chunk_stats(arr))
        assert decode_column(enc).equals(arr)
        return
    _roundtrip(arr)


def test_canonical_checksum_distinguishes_structure():
    # [1,2],[3] vs [1],[2,3]: same flattened child, different lengths
    from fsst_spark.jobs.encode import canonical_bytes

    a = pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))
    b = pa.array([[1], [2, 3]], type=pa.list_(pa.int64()))
    assert canonical_bytes(a) != canonical_bytes(b)
    assert canonical_bytes(a) == canonical_bytes(
        pa.array([[1, 2], [3]], type=pa.list_(pa.int64())))


def test_store_roundtrip_embeddings(spark, tmp_path):
    """encode_job -> decode_job over the real embeddings table (array<float>)
    + verify_chunks checksum gate over the list-codec store."""
    from fsst_spark.jobs.decode import decode_job
    from fsst_spark.jobs.encode import encode_job
    from fsst_spark.jobs.verify import verify_chunks

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = str(tmp_path / "emb_store")
    encode_job(spark, src, out, unique_col="vec_id", num_partitions=3,
               chunk_bytes=64 << 10, resume=False).collect()

    bad = verify_chunks(spark, out).filter("NOT ok").count()
    assert bad == 0

    dec = decode_job(spark, out).select("vec_id", "embedding", "label")
    assert dict(dec.dtypes)["embedding"] == "array<float>"
    a = {r.vec_id: (r.embedding, r.label) for r in src.collect()}
    b = {r.vec_id: (r.embedding, r.label) for r in dec.collect()}
    assert a == b

    # the fsst data source reads the same store with an array<float> schema
    from fsst_spark.sources.fsst_source import register

    register(spark)
    via_source = spark.read.format("fsst").load(out)
    assert dict(via_source.dtypes)["embedding"] == "array<float>"
    c = {r.vec_id: (r.embedding, r.label)
         for r in via_source.select("vec_id", "embedding", "label").collect()}
    assert a == c


def test_filter_on_array_column_raises(spark, tmp_path):
    from fsst_spark.jobs.decode import decode_filtered
    from fsst_spark.jobs.encode import encode_job

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = str(tmp_path / "guard_store")
    encode_job(spark, src, out, unique_col="vec_id", num_partitions=2,
               resume=False).collect()
    with pytest.raises(ValueError, match="nested column"):
        decode_filtered(spark, out, "embedding", "==", [1.0])
