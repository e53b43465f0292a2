"""Per-chunk HyperLogLog sketches for mergeable, metadata-only NDV.

A chunk's exact NDV never composes: distinct counts can't be added across
chunks, so answering ``approx n distinct url`` over an encoded store
would otherwise decode every payload. The classic warehouse answer
(Flajolet et al. 2007; HLL++'s 64-bit variant, Heule et al. 2013) is a
small register sketch per chunk whose MERGE is an elementwise register
max — associative and commutative, so a 100 TB store's NDV is a
metadata-only tree reduction: partial max per executor partition, a few
KB to the driver, one estimate. p=10 (1024 one-byte registers, ~1 KiB
per chunk per column) gives ~3.2% standard error.

Blob layout (self-describing, stored in the chunk table's ``hll`` column):

    magic  b"FSH1"   4 B
    p      uint8     register-index bits (m = 2**p registers)
    pad    3 B zero
    regs   m B       one rho byte per register

Values hash exactly like the Bloom filter's (``kernel.bloom``) so the
two sketches share one vectorized hashing pass at encode time; floats
additionally hash their raw IEEE bits (bit-distinct NDV — fine for a
cardinality estimate, deliberately NOT offered for bloom equality
probes where NaN/-0.0 identity is a trap).

Reference tie: engine-side scale surface; the reference is a codec kernel
with no metadata layer (spiraldb/fsst src/lib.rs:14-17).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pyarrow as pa

from .bloom import _splitmix64_vec, _value_hashes

_MAGIC = b"FSH1"
_HEADER = struct.Struct("<4sB3x")
DEFAULT_P = 10


def _hashes_for_ndv(arr: pa.Array) -> np.ndarray | None:
    """64-bit value hashes: bloom's paths plus raw-bit float hashing."""
    h = _value_hashes(arr)
    if h is not None:
        return h
    dense = arr.drop_null() if arr.null_count else arr
    t = dense.type
    if pa.types.is_floating(t):
        bits = dense.cast(pa.float64()).to_numpy(zero_copy_only=False)
        return _splitmix64_vec(bits.view(np.uint64))
    return None


def _bit_length_vec(x: np.ndarray) -> np.ndarray:
    """Exact integer bit_length per uint64 (binary-search shifts — no
    float log2, whose rounding can cross a power-of-two boundary)."""
    x = x.copy()
    n = np.zeros(x.shape, np.uint8)
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= np.uint64(1 << shift)
        n[big] += shift
        x = np.where(big, x >> np.uint64(shift), x)
    n += (x > 0).astype(np.uint8)
    return n


def hll_build(arr: pa.Array, p: int = DEFAULT_P,
              hashes: np.ndarray | None = None) -> bytes | None:
    """HLL blob over a chunk's non-null values, or None for types without
    a hash path (nested). An all-null chunk gets all-zero registers —
    merging it is a no-op, as it should be. ``hashes`` shares the
    encoder's bloom hashing pass (floats still hash here — the bloom has
    no float path, so its shared hashes are None for float chunks)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = _hashes_for_ndv(arr) if hashes is None else hashes
    if h is None and len(arr) != arr.null_count:
        return None
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if h is not None and len(h):
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - p)) - 1)
        rho = (64 - p) - _bit_length_vec(w) + 1  # 1..64-p+1
        np.maximum.at(regs, idx, rho.astype(np.uint8))
    return _HEADER.pack(_MAGIC, p) + regs.tobytes()


def hll_merge(blobs) -> bytes | None:
    """Elementwise register max over same-p blobs; None/unknown blobs
    poison the merge to None (the caller must fall back to decoding —
    a partial NDV silently under-counts, which is worse than no answer)."""
    out = None
    p_out = None
    for blob in blobs:
        regs = _registers(blob)
        if regs is None:
            return None
        p, r = regs
        if out is None:
            out, p_out = r.copy(), p
        elif p != p_out:
            return None
        else:
            np.maximum(out, r, out=out)
    if out is None:
        return None
    return _HEADER.pack(_MAGIC, p_out) + out.tobytes()


def _registers(blob) -> tuple[int, np.ndarray] | None:
    if blob is None or len(blob) < _HEADER.size:
        return None
    magic, p = _HEADER.unpack_from(blob)
    if magic != _MAGIC or len(blob) != _HEADER.size + (1 << p):
        return None
    return p, np.frombuffer(blob, np.uint8, offset=_HEADER.size)


def hll_estimate(blob: bytes) -> int:
    """Bias-corrected cardinality estimate (integer, deterministic):
    linear counting while registers are sparse, the standard harmonic
    estimator otherwise. 64-bit hashes need no large-range correction
    (Heule et al. 2013 dropped it for exactly this reason)."""
    regs = _registers(blob)
    if regs is None:
        raise ValueError("not an FSH1 HLL blob")
    p, r = regs
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -r.astype(np.int64))))
    zeros = int(np.count_nonzero(r == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(round(est))
