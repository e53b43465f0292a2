"""Per-chunk quantile sketches: sorted equi-spaced value samples.

Each numeric chunk stores its own ``k``-point equi-depth summary — the
chunk's values sorted, then sampled at ``k`` evenly spaced ranks (always
including min and max). Two properties make this the right store-side
sketch:

- **Exact when small**: a chunk with ≤ k non-null values stores ALL of
  them sorted, so merged quantiles over small chunks are exact (this is
  what the driver gate pins against DuckDB).
- **Bounded when big**: stored point i sits at true rank i·(n-1)/(k-1)
  but is modeled as covering the weight interval (i·n/k, (i+1)·n/k] — at
  most one sample spacing apart — so a merged weighted-rank query answers
  any quantile within ±2·(total_n/k) ranks (one spacing + one interval),
  independent of how many chunks merge.

Merging happens in ``jobs.stats.encoded_quantiles`` as a distributed
weighted-rank selection (each stored point carries weight n_chunk/k);
this module only builds and parses the blobs.

Blob layout (little-endian, self-describing like kernel.bloom/hll):
  u8 version=1 | u8 dtype (1=int64-exact, 2=float64) |
  u64 n_nonnull | u32 k | k × 8-byte values
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_HDR = struct.Struct("<BBQI")
_VERSION = 1
_DT_INT = 1
_DT_FLOAT = 2


def qsample_build(arr: pa.Array, k: int = 256) -> bytes | None:
    """Sketch one chunk's column values, or None for unsupported types
    (strings/binary — rank selection over bytes belongs to the dict/zone
    paths) and all-null chunks. Timestamps sketch as their int64 storage
    ticks. NaNs sort last (numpy sort), matching Spark/DuckDB
    NaN-greatest ordering."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_timestamp(t):
        vals = arr.drop_null().cast(pa.int64()).to_numpy(zero_copy_only=False)
        dtype = _DT_INT
    elif pa.types.is_integer(t):
        vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        dtype = _DT_INT
    elif pa.types.is_floating(t):
        vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        dtype = _DT_FLOAT
    else:
        return None
    n = len(vals)
    if n == 0 or k <= 0:
        return None
    vals = np.sort(vals, kind="stable")
    kk = min(k, n)
    # ranks 0 .. n-1 at kk evenly spaced points, endpoints included
    idx = np.round(np.linspace(0, n - 1, kk)).astype(np.int64)
    pts = vals[idx]
    return _HDR.pack(_VERSION, dtype, n, kk) + pts.tobytes()


def qsample_parse(blob: bytes) -> tuple[bool, int, np.ndarray]:
    """(is_int, n_nonnull, points) from a sketch blob."""
    ver, dtype, n, k = _HDR.unpack_from(blob, 0)
    if ver != _VERSION:
        raise ValueError(f"unknown qsample version {ver}")
    pts = np.frombuffer(blob, dtype=np.int64 if dtype == _DT_INT
                        else np.float64, offset=_HDR.size, count=k)
    return dtype == _DT_INT, n, pts
