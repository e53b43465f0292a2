"""Property tests: vectorized FSST kernels == scalar oracle.

Mirrors the reference fuzz targets (fuzz/fuzz_targets/fuzz_compress.rs:5-11:
round-trip under a fixed trained table for arbitrary bytes)."""

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fsst_spark.kernel.fsst import train
from fsst_spark.kernel.fsst_vec import EncoderTables, decode_chunk, encode_chunk

DECL = (
    b"We hold these truths to be self-evident, that all men are created "
    b"equal, that they are endowed by their Creator with certain "
    b"unalienable Rights, that among these are Life, Liberty and the "
    b"pursuit of Happiness."
)


def to_buffers(values: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    data = np.frombuffer(b"".join(values), dtype=np.uint8)
    offsets = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum([len(v) for v in values], out=offsets[1:])
    return data, offsets


def from_buffers(data: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    raw = data.tobytes()
    return [raw[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)]


def check_corpus(values: list[bytes], seg: int = 2048) -> None:
    c = train(values)
    t = EncoderTables.from_compressor(c)
    data, offsets = to_buffers(values)
    d = c.decompressor()
    encoded = {}
    for force_numpy in (True, False):  # numpy wavefront AND native C kernel
        enc, enc_off = encode_chunk(data, offsets, t, seg=seg, force_numpy=force_numpy)
        encoded[force_numpy] = (enc.tobytes(), enc_off.tolist())
        enc_rows = from_buffers(enc, enc_off)
        # 1. whole-row encodes must match the scalar encoder byte-for-byte
        #    (both kernels lane-split at seg, so this holds when seg covers
        #    every row)
        if seg >= max((len(v) for v in values), default=0):
            for v, er in zip(values, enc_rows):
                assert er == c.compress(v), f"vector encode != scalar for {v[:40]!r}"
        # 2. both decoders must invert exactly
        for fn2 in (True, False):
            dec, dec_off = decode_chunk(enc, enc_off, t.sym_mat, t.sym_lens, force_numpy=fn2)
            assert from_buffers(dec, dec_off) == values
        # 3. scalar decode of each row must also round-trip
        for v, er in zip(values, enc_rows):
            assert d.decompress(er) == v
    # 4. kernels are byte-identical (deterministic re-encode on mixed clusters)
    assert encoded[True] == encoded[False], "numpy and native encodes differ"


def test_exact_match_with_scalar_prose():
    check_corpus([DECL] * 8 + [b"", b"x", DECL[:7], DECL[:8], DECL[:9]])


def test_segmented_lanes_roundtrip():
    vals = [DECL * 50, b"", DECL, DECL * 3, b"\x00" * 5000, bytes(range(256)) * 30]
    check_corpus(vals, seg=512)
    check_corpus(vals, seg=64)


def test_binary_with_nuls_and_escapes():
    rng = random.Random(7)
    vals = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 600))) for _ in range(80)]
    vals += [b"\xff" * 100, b"\x00" * 100, b"\xff\x00" * 64]
    check_corpus(vals)
    check_corpus(vals, seg=97)


def test_empty_table_all_escape_paths():
    c = train([])
    t = EncoderTables.from_compressor(c)
    vals = [b"hello", b"", b"\xff\xff\xff", bytes(range(256))]
    data, offsets = to_buffers(vals)
    enc, enc_off = encode_chunk(data, offsets, t)
    assert list(enc_off[1:] - enc_off[:-1]) == [2 * len(v) for v in vals]
    dec, dec_off = decode_chunk(enc, enc_off, t.sym_mat, t.sym_lens)
    assert from_buffers(dec, dec_off) == vals


def test_interleaved_lane_boundaries():
    """The native kernel interleaves 4 lanes when n >= 8 and runs the
    sequential walk below that: pin byte-identity with the scalar oracle on
    lane counts straddling the cutoff and on refill-heavy mixes (empties,
    one-byte rows, escape-heavy rows, 8/9-byte tails)."""
    rng = random.Random(13)
    pieces = [b"", b"x", b"\xff", DECL[:8], DECL[:9], b"\xff\x00" * 7,
              DECL, DECL * 2,
              bytes(rng.randrange(256) for _ in range(37))]
    for n in (6, 7, 8, 9, 11, 40):
        vals = [pieces[i % len(pieces)] for i in range(n)]
        check_corpus(vals)
    # many short lanes: constant refill churn in the interleaved loop
    check_corpus([pieces[rng.randrange(len(pieces))] for _ in range(500)])


def test_all_empty_rows():
    c = train([DECL])
    t = EncoderTables.from_compressor(c)
    data, offsets = to_buffers([b"", b"", b""])
    enc, enc_off = encode_chunk(data, offsets, t)
    assert len(enc) == 0 and list(enc_off) == [0, 0, 0, 0]
    dec, dec_off = decode_chunk(enc, enc_off, t.sym_mat, t.sym_lens)
    assert list(dec_off) == [0, 0, 0, 0]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=400), min_size=0, max_size=30),
    st.sampled_from([64, 512, 2048]),
)
def test_hypothesis_roundtrip(values, seg):
    if not values:
        return
    check_corpus(values, seg=seg)


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_hypothesis_single_value_under_prose_table(v):
    c = train([DECL] * 4)
    t = EncoderTables.from_compressor(c)
    data, offsets = to_buffers([v])
    enc, enc_off = encode_chunk(data, offsets, t)
    assert from_buffers(enc, enc_off)[0] == c.compress(v)
    dec, dec_off = decode_chunk(enc, enc_off, t.sym_mat, t.sym_lens)
    assert from_buffers(dec, dec_off)[0] == v


@pytest.mark.parametrize("seg", [8, 16, 2048])
def test_long_row_heavy_tail(seg):
    vals = [DECL * 200, b"a", DECL, b"bb"]  # one 40KB row + tiny rows (skew)
    check_corpus(vals, seg=seg)


@pytest.mark.parametrize("force_numpy", [True, False])
def test_corrupt_stream_rejected(force_numpy):
    """Decode must raise on corrupt input rather than emit garbage
    (reference asserts table sanity on load, src/lib.rs:245-248)."""
    c = train([DECL] * 4)
    t = EncoderTables.from_compressor(c)
    data, offsets = to_buffers([DECL, DECL[:50]])
    enc, enc_off = encode_chunk(data, offsets, t)

    # (a) escape byte at end of a row
    bad = np.concatenate([enc[: enc_off[1]], np.array([255], dtype=np.uint8)])
    bad_off = np.array([0, enc_off[1] + 1], dtype=np.int64)
    with pytest.raises(ValueError, match="corrupt"):
        decode_chunk(bad, bad_off, t.sym_mat, t.sym_lens, force_numpy=force_numpy)

    # (b) code outside the symbol table (n_symbols < 255 here)
    assert t.n_symbols < 250
    bad2 = enc.copy()
    # find a non-escape, non-literal position: position 0 is always a code
    bad2[0] = 250
    with pytest.raises(ValueError, match="corrupt"):
        decode_chunk(bad2, enc_off, t.sym_mat, t.sym_lens, force_numpy=force_numpy)
