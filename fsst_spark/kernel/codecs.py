"""Lightweight column codecs: dictionary, RLE, frame-of-reference,
bit-packing, FSST, plain — plus the stats-driven auto-selector.

These are the per-column-chunk codecs the north rule mandates alongside
FSST (cf. FSST paper sec 1, which positions FSST next to dict/RLE for
string columns; dict/RLE/FOR/bit-pack semantics follow the standard
Parquet/ORC encodings). All kernels are vectorized numpy/pyarrow — no
per-row Python.

An encoded chunk is a plain dict (JSON-able params + one binary payload):

    {"codec": str, "params": {...}, "payload": bytes}

Nested codecs (e.g. dict codes bit-packed, dict values FSST'd) embed the
child payload as a section of the parent payload, with the child
descriptor in the parent's params. ``encode_column`` auto-selects the
codec from chunk stats (NDV, run count, value range — per north rule);
``decode_column`` is driven purely by the descriptor, so a manifest row is
all that is needed to decode.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .fsst import deserialize_table, table_to_numpy, train
from .fsst_vec import EncoderTables, decode_chunk, decoded_lengths, encode_chunk

Encoded = dict[str, Any]

# --- selector thresholds (tunable; recorded here, not in manifests) --------
DICT_NDV_RATIO = 0.1  # dictionary-encode when ndv/n below this
RLE_RUN_RATIO = 0.25  # RLE when runs/n below this
FSST_MIN_GAIN = 1.05  # store plain if FSST sample ratio below this
FSST_TRAIN_ROWS = 4096  # rows handed to the 16KiB-capped trainer


# ---------------------------------------------------------------------------
# payload section helpers
# ---------------------------------------------------------------------------
def _pack_sections(params: dict, *bufs: bytes) -> bytes:
    params["sections"] = [len(b) for b in bufs]
    return b"".join(bufs)


def _split_sections(params: dict, payload: bytes) -> list[bytes]:
    out = []
    pos = 0
    for ln in params["sections"]:
        out.append(payload[pos : pos + ln])
        pos += ln
    return out


# ---------------------------------------------------------------------------
# integer kernels (operate on uint64/int64 numpy arrays)
# ---------------------------------------------------------------------------
def bitpack(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into ``width`` bits each, little-endian."""
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    v = vals.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def bitunpack(payload: bytes, n: int, width: int) -> np.ndarray:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8), bitorder="little")
    bits = bits[: n * width].reshape(n, width).astype(np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        out |= bits[:, j] << np.uint64(j)
    return out


def _width_for(max_delta: int) -> int:
    return int(max_delta).bit_length()


def encode_int_for(vals: np.ndarray) -> Encoded:
    """Frame-of-reference: subtract min, bit-pack the deltas."""
    n = len(vals)
    if n == 0:
        return {"codec": "int_for", "params": {"n": 0, "ref": 0, "width": 0}, "payload": b""}
    v = vals.astype(np.int64, copy=False)
    ref = int(v.min())
    deltas = (v - ref).astype(np.uint64)
    width = _width_for(int(deltas.max()))
    return {
        "codec": "int_for",
        "params": {"n": n, "ref": ref, "width": width},
        "payload": bitpack(deltas, width),
    }


def decode_int_for(enc: Encoded) -> np.ndarray:
    p = enc["params"]
    deltas = bitunpack(enc["payload"], p["n"], p["width"])
    return (deltas.astype(np.int64) + np.int64(p["ref"])).astype(np.int64)


def encode_int_rle(vals: np.ndarray) -> Encoded:
    """Run-length encode; run values and run lengths are each FOR+bit-packed."""
    v = vals.astype(np.int64, copy=False)
    n = len(v)
    if n == 0:
        runs_v = v
        runs_l = np.zeros(0, dtype=np.int64)
    else:
        starts = np.concatenate(([0], np.flatnonzero(v[1:] != v[:-1]) + 1))
        runs_v = v[starts]
        runs_l = np.diff(np.concatenate((starts, [n])))
    ev = encode_int_for(runs_v)
    el = encode_int_for(runs_l)
    params = {"n": n, "values": {"codec": ev["codec"], "params": ev["params"]},
              "lengths": {"codec": el["codec"], "params": el["params"]}}
    return {"codec": "int_rle", "params": params,
            "payload": _pack_sections(params, ev["payload"], el["payload"])}


def decode_int_rle(enc: Encoded) -> np.ndarray:
    p = enc["params"]
    sv, sl = _split_sections(p, enc["payload"])
    runs_v = decode_int_for({**p["values"], "payload": sv})
    runs_l = decode_int_for({**p["lengths"], "payload": sl})
    return np.repeat(runs_v, runs_l)


def encode_int_delta(vals: np.ndarray) -> Encoded:
    """Delta + FOR + bit-pack: near-zero bits for sorted/sequential ints."""
    v = vals.astype(np.int64, copy=False)
    n = len(v)
    first = int(v[0]) if n else 0
    deltas = np.diff(v) if n else v
    ed = encode_int_for(deltas)
    params = {"n": n, "first": first,
              "deltas": {"codec": ed["codec"], "params": ed["params"]}}
    return {"codec": "int_delta", "params": params, "payload": ed["payload"]}


def decode_int_delta(enc: Encoded) -> np.ndarray:
    p = enc["params"]
    n = p["n"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    deltas = decode_int_for({**p["deltas"], "payload": enc["payload"]})
    out = np.empty(n, dtype=np.int64)
    out[0] = p["first"]
    np.cumsum(deltas, out=out[1:]) if n > 1 else None
    out[1:] += p["first"]
    return out


def encode_int_plain(vals: np.ndarray) -> Encoded:
    v = vals.astype(np.int64, copy=False)
    return {"codec": "int_plain", "params": {"n": len(v)}, "payload": v.tobytes()}


def decode_int_plain(enc: Encoded) -> np.ndarray:
    return np.frombuffer(enc["payload"], dtype=np.int64).copy()


def select_int_codec(vals: np.ndarray) -> Encoded:
    """Stats-driven selection for integer chunks (run count, value range)."""
    n = len(vals)
    if n == 0:
        return encode_int_for(vals)
    v = vals.astype(np.int64, copy=False)
    n_runs = 1 + int(np.count_nonzero(v[1:] != v[:-1]))
    if n_runs <= n * RLE_RUN_RATIO:
        return encode_int_rle(v)
    rng = int(v.max()) - int(v.min())
    width = _width_for(rng)
    if n > 1:
        deltas = np.diff(v)
        dmin, dmax = int(deltas.min()), int(deltas.max())
        dwidth = _width_for(dmax - dmin)
        if dwidth < min(width, 63) and dwidth < 63:
            return encode_int_delta(v)
    if width >= 63:
        return encode_int_plain(v)
    return encode_int_for(v)


# ---------------------------------------------------------------------------
# byte-string kernels (operate on (uint8 buffer, int64 offsets))
# ---------------------------------------------------------------------------
def _lens_from_offsets(offsets: np.ndarray) -> np.ndarray:
    return (offsets[1:] - offsets[:-1]).astype(np.int64)


def _offsets_from_lens(lens: np.ndarray) -> np.ndarray:
    out = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out[1:])
    return out


def encode_str_plain(buf: np.ndarray, offsets: np.ndarray) -> Encoded:
    el = encode_int_for(_lens_from_offsets(offsets))
    params = {"n": len(offsets) - 1, "lengths": {"codec": el["codec"], "params": el["params"]}}
    data = buf[offsets[0] : offsets[-1]].tobytes()
    return {"codec": "str_plain", "params": params,
            "payload": _pack_sections(params, data, el["payload"])}


def decode_str_plain(enc: Encoded) -> tuple[np.ndarray, np.ndarray]:
    p = enc["params"]
    data, lp = _split_sections(p, enc["payload"])
    lens = decode_int_for({**p["lengths"], "payload": lp})
    return np.frombuffer(data, dtype=np.uint8), _offsets_from_lens(lens)


def encode_str_fsst(buf: np.ndarray, offsets: np.ndarray, tables: EncoderTables | None = None,
                    table_blob: bytes | None = None,
                    cache: dict | None = None) -> Encoded:
    """FSST-encode a string chunk. If no pre-trained table is supplied, one
    is trained on a <=16KiB sample of the first FSST_TRAIN_ROWS values
    (training cost is O(1) per chunk — reference src/builder.rs:524).

    ``cache`` shares one trained table across chunks: an empty dict trains
    on THIS chunk and stashes (tables, blob); a populated one reuses them.
    This is the reference's own usage shape — a static symbol table built
    once serves a whole column (src/builder.rs:604-628 trains one
    Compressor per corpus, not per block) — and drops per-chunk training
    from the hot loop. Callers keep the per-chunk min-gain fallback, so a
    chunk the shared table fits poorly degrades to plain, never to a
    worse-than-raw encode."""
    if cache is not None and tables is None and "tables" in cache:
        tables, table_blob = cache["tables"], cache["blob"]
    if tables is None:
        head = min(len(offsets) - 1, FSST_TRAIN_ROWS)
        vals = [buf[offsets[i] : offsets[i + 1]].tobytes() for i in range(head)]
        comp = train(vals)
        tables = EncoderTables.from_compressor(comp)
        table_blob = comp.table_bytes()
        if cache is not None:
            cache["tables"], cache["blob"] = tables, table_blob
    assert table_blob is not None
    enc_buf, enc_off = encode_chunk(buf, offsets, tables)
    el = encode_int_for(_lens_from_offsets(enc_off))
    params = {"n": len(offsets) - 1, "lengths": {"codec": el["codec"], "params": el["params"]}}
    return {"codec": "str_fsst", "params": params,
            "payload": _pack_sections(params, table_blob, enc_buf.tobytes(), el["payload"])}


def decode_str_fsst(enc: Encoded) -> tuple[np.ndarray, np.ndarray]:
    p = enc["params"]
    table_blob, data, lp = _split_sections(p, enc["payload"])
    lens = decode_int_for({**p["lengths"], "payload": lp})
    enc_off = _offsets_from_lens(lens)
    symbols, lengths, _ = deserialize_table(table_blob)
    sym_mat, sym_lens = table_to_numpy(symbols, lengths)
    return decode_chunk(np.frombuffer(data, dtype=np.uint8), enc_off, sym_mat, sym_lens)


FRONT_MAX_PREFIX = 255  # cap stored prefix length: bounds the decode loop
FRONT_MAX_LEN = 2048  # front-code only short-string chunks (urls, keys)
FRONT_MIN_SHARE = 0.25  # choose front when prefixes cover >=25% of bytes
_FRONT_BLOCK = 1 << 16  # rows per prefix-computation block (bounds memory)


def front_prefix_lens(buf: np.ndarray, offsets: np.ndarray,
                      cap: int = FRONT_MAX_PREFIX) -> np.ndarray:
    """Common-prefix length of each value with its predecessor (first value
    0), capped at ``cap``. Vectorized: per block, gather both neighbors
    into (rows, cap) zero-padded matrices and argmax the first mismatch —
    O(n·cap) numpy, no per-byte Python. This is the analysis pass AND the
    encode pass of front coding (Parquet DELTA_BYTE_ARRAY's shape)."""
    n = len(offsets) - 1
    plens = np.zeros(n, np.int64)
    if n <= 1:
        return plens
    lens = _lens_from_offsets(offsets)
    minlen = np.minimum(lens[:-1], lens[1:])
    cap_eff = min(cap, int(minlen.max())) if n > 1 else 0
    if cap_eff == 0:
        return plens
    col = np.arange(cap_eff, dtype=np.int64)
    for lo in range(0, n - 1, _FRONT_BLOCK):
        hi = min(lo + _FRONT_BLOCK, n - 1)
        m = np.minimum(minlen[lo:hi], cap_eff)
        mask = col[None, :] < m[:, None]
        a = np.zeros((hi - lo, cap_eff), np.uint8)
        b = np.zeros_like(a)
        a[mask] = buf[(offsets[lo:hi, None] + col[None, :])[mask]]
        b[mask] = buf[(offsets[lo + 1:hi + 1, None] + col[None, :])[mask]]
        neq = (a != b) | ~mask
        first = np.where(neq.any(axis=1), neq.argmax(axis=1), m)
        plens[lo + 1:hi + 1] = first
    return plens


def encode_str_front(buf: np.ndarray, offsets: np.ndarray,
                     plens: np.ndarray | None = None) -> Encoded:
    """Front coding (incremental encoding): store each value as (shared
    prefix length with the previous value, suffix bytes); suffixes FSST'd.
    The classic layout for SORTED short strings — Parquet DELTA_BYTE_ARRAY,
    ORC/LevelDB key blocks — and the payoff of clustering an encode by
    ``url_sort_key``: adjacent reversed-host URLs share long prefixes that
    FSST's 8-byte symbols cannot capture alone."""
    lens = _lens_from_offsets(offsets)
    if plens is None:
        plens = front_prefix_lens(buf, offsets)
    slens = lens - plens
    base = offsets[:-1] + plens
    total = int(slens.sum())
    src = np.repeat(base - _offsets_from_lens(slens)[:-1], slens) \
        + np.arange(total, dtype=np.int64)
    sbuf = buf[src] if total else np.zeros(0, np.uint8)
    soff = _offsets_from_lens(slens)
    ep = select_int_codec(plens)
    if int(soff[-1]) >= 4096:
        es = encode_str_fsst(sbuf, soff)
    else:
        es = encode_str_plain(sbuf, soff)
    params = {"n": len(lens),
              "plens": {"codec": ep["codec"], "params": ep["params"]},
              "suffix": {"codec": es["codec"], "params": es["params"]}}
    return {"codec": "str_front", "params": params,
            "payload": _pack_sections(params, ep["payload"], es["payload"])}


def decode_str_front(enc: Encoded) -> tuple[np.ndarray, np.ndarray]:
    """Reconstruct front-coded values without per-value Python: suffix
    bytes scatter directly; prefix byte (row i, col j) comes from the
    LATEST row k <= i with plen[k] <= j (its suffix holds column j), found
    per column with a running maximum — O(max_prefix) vectorized passes,
    bounded by the encode-time FRONT_MAX_PREFIX cap."""
    p = enc["params"]
    pp, sp = _split_sections(p, enc["payload"])
    plens = decode_bytes_like({**p["plens"], "payload": pp}, kind="int")
    sbuf, soff = decode_bytes_like({**p["suffix"], "payload": sp}, kind="str")
    slens = _lens_from_offsets(soff)
    lens = plens + slens
    out_off = _offsets_from_lens(lens)
    total = int(out_off[-1])
    out = np.zeros(total, np.uint8)
    n = len(lens)
    if total == 0 or n == 0:
        return out, out_off
    # suffix bytes land at out_off[i] + plen[i] + t
    dst = np.repeat(out_off[:-1] + plens - soff[:-1], slens) \
        + np.arange(int(soff[-1]), dtype=np.int64)
    out[dst] = sbuf
    idx = np.arange(n, dtype=np.int64)
    maxp = int(plens.max())
    for j in range(maxp):
        origin = np.maximum.accumulate(np.where(plens <= j, idx, -1))
        need = plens > j  # rows whose byte j is inherited
        rows = idx[need]
        org = origin[rows]
        out[out_off[rows] + j] = sbuf[soff[org] + j - plens[org]]
    return out, out_off


def encode_str_dict(arr: pa.Array) -> Encoded:
    """Dictionary-encode via Arrow (C++ hash kernel), then bit-pack the
    codes (RLE'd first when runny) and FSST the dictionary values."""
    denc = pc.dictionary_encode(arr)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = denc.dictionary
    ec = select_int_codec(codes)
    ubuf, uoff = _arrow_bytes_buffers(uniq)
    if int(uoff[-1] - uoff[0]) >= 4096:
        eu = encode_str_fsst(ubuf, uoff)
    else:
        eu = encode_str_plain(ubuf, uoff)
    params = {"n": len(arr),
              "codes": {"codec": ec["codec"], "params": ec["params"]},
              "values": {"codec": eu["codec"], "params": eu["params"]}}
    return {"codec": "str_dict", "params": params,
            "payload": _pack_sections(params, ec["payload"], eu["payload"])}


def decode_str_dict(enc: Encoded) -> tuple[np.ndarray, np.ndarray]:
    p = enc["params"]
    cp, up = _split_sections(p, enc["payload"])
    codes = decode_bytes_like({**p["codes"], "payload": cp}, kind="int")
    ubuf, uoff = decode_bytes_like({**p["values"], "payload": up}, kind="str")
    lens = _lens_from_offsets(uoff)
    out_lens = lens[codes]
    out_off = _offsets_from_lens(out_lens)
    total = int(out_off[-1])
    src = np.repeat(uoff[:-1][codes] - out_off[:-1], out_lens) + np.arange(total, dtype=np.int64)
    return ubuf[src], out_off


_INT_DECODERS = {"int_for": decode_int_for, "int_rle": decode_int_rle,
                 "int_plain": decode_int_plain, "int_delta": decode_int_delta}
_STR_DECODERS = {"str_plain": decode_str_plain, "str_fsst": decode_str_fsst,
                 "str_dict": decode_str_dict, "str_front": decode_str_front}


def _strlens_of(enc: Encoded) -> np.ndarray:
    """Per-row DECODED byte length of a bytes-like encoded section, without
    materializing any decoded bytes. Every string codec stores (or implies)
    lengths more cheaply than values:

      str_plain  — the lengths stream is stored outright
      str_fsst   — parse phase of the decoder only (fsst_vec.decoded_lengths):
                   roles + symbol-length gather + cumsum, no byte scatter
      str_dict   — dictionary VALUE lengths (tiny, recursive) gathered by code
      str_front  — stored prefix lens + recursive suffix lens

    Recursion mirrors the nested-codec layout (`_pack_sections`)."""
    codec, p = enc["codec"], enc["params"]
    if codec == "str_plain":
        _, lp = _split_sections(p, enc["payload"])
        return decode_int_for({**p["lengths"], "payload": lp})
    if codec == "str_fsst":
        table_blob, data, lp = _split_sections(p, enc["payload"])
        enc_off = _offsets_from_lens(
            decode_int_for({**p["lengths"], "payload": lp}))
        symbols, lengths, _ = deserialize_table(table_blob)
        _, sym_lens = table_to_numpy(symbols, lengths)
        return decoded_lengths(np.frombuffer(data, dtype=np.uint8), enc_off,
                               sym_lens)
    if codec == "str_dict":
        cp, up = _split_sections(p, enc["payload"])
        codes = decode_bytes_like({**p["codes"], "payload": cp}, kind="int")
        return _strlens_of({**p["values"], "payload": up})[codes]
    if codec == "str_front":
        pp, sp = _split_sections(p, enc["payload"])
        plens = decode_bytes_like({**p["plens"], "payload": pp}, kind="int")
        return plens + _strlens_of({**p["suffix"], "payload": sp})
    raise NotImplementedError(f"decoded_strlens: not a string codec: {codec}")


def decoded_strlens(enc: Encoded) -> tuple[np.ndarray, np.ndarray | None]:
    """Decode-free ``octet_length`` of a string/binary column chunk.

    Returns ``(lens, mask)``: ``lens`` is int64 per NON-NULL row in order;
    ``mask`` is the validity bool array over all rows (None when the chunk
    has no nulls). Aggregates over an encoded store (sum/avg/min/max of
    value sizes, token-budget accounting) use this instead of
    :func:`decode_column` — same chunk payload read, but the decoder's
    byte-scatter passes and the Arrow string build are skipped entirely."""
    params = enc["params"]
    payload = enc["payload"]
    mask = None
    if "n_total" in params:
        vlen = params["validity_len"]
        payload, vbits = payload[:vlen], payload[vlen:]
        mask = np.unpackbits(np.frombuffer(vbits, dtype=np.uint8),
                             bitorder="little")[: params["n_total"]].astype(bool)
    return _strlens_of({**enc, "payload": payload}), mask


# ---------------------------------------------------------------------------
# float kernels
# ---------------------------------------------------------------------------
ALP_MAX_EXP = 14
ALP_MIN_HIT = 0.95  # below this exact-hit rate the chunk is not decimal data
# Exact 10^e doubles (10^e is exactly representable in float64 for e <= 22,
# and int->float conversion is correctly rounded by IEEE 754). Runtime
# ``10.0 ** e`` goes through libm pow, which is NOT guaranteed correctly
# rounded on every platform — a chunk encoded under one libm could decode
# 1 ulp off under another, breaking bit-identity on mixed clusters. Both
# encoder and decoder read this table instead.
_EXACT_POW10 = tuple(float(10 ** e) for e in range(ALP_MAX_EXP + 1))


def _alp_roundtrip_ok(v: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(exact-hit mask, scaled ints) for exponent e — verification replays
    the decoder's exact arithmetic (int64 -> float64 -> * 10^-e), so a hit
    is bit-identical by construction."""
    with np.errstate(invalid="ignore", over="ignore"):
        cand = np.round(v * _EXACT_POW10[e])
        ok = np.isfinite(cand) & (np.abs(cand) < 2.0 ** 53)
        ints = np.where(ok, cand, 0.0).astype(np.int64)
        # Decode divides by the EXACT double 10^e (exactly representable
        # for e <= 22): IEEE division is correctly rounded, so k/10^e is
        # the nearest double to the rational — exactly what parsing the
        # decimal string produced. Multiplying by the inexact 10^-e would
        # miss by 1 ulp on ~30% of real decimal data.
        recon = ints.astype(np.float64) / _EXACT_POW10[e]
    ok &= recon.view(np.uint64) == v.view(np.uint64)
    return ok, ints


def encode_float_alp(v: np.ndarray) -> Encoded | None:
    """ALP-style decimal encoding for float64 chunks (Afroozeh & Boncz,
    VLDB 2023 — public): scale by 10^e so values become exact int64s,
    delegate the ints to the integer codec stack, and keep the few
    non-decimal values (NaN/inf/noise) as raw 8-byte exceptions scattered
    back by position at decode. Returns None when the chunk is not
    decimal-like (probed on a 1024-value sample first, so random doubles
    cost one cheap pass, not 15)."""
    if v.dtype != np.float64 or len(v) == 0:
        return None
    sample = v[:1024]
    best_e, best_hits = None, -1
    for e in range(ALP_MAX_EXP + 1):
        ok, _ = _alp_roundtrip_ok(sample, e)
        hits = int(ok.sum())
        if hits > best_hits:
            best_e, best_hits = e, hits
        if hits == len(sample):
            break
    if best_hits < len(sample) * ALP_MIN_HIT:
        return None
    ok, ints = _alp_roundtrip_ok(v, best_e)
    if int(ok.sum()) < len(v) * ALP_MIN_HIT:
        return None
    exc_pos = np.flatnonzero(~ok).astype(np.int64)
    ei = select_int_codec(ints[ok])
    ep = select_int_codec(exc_pos)
    params = {
        "n": len(v), "exp": best_e,
        "ints": {"codec": ei["codec"], "params": ei["params"]},
        "exc": {"codec": ep["codec"], "params": ep["params"]},
    }
    return {"codec": "float_alp", "params": params,
            "payload": _pack_sections(params, ei["payload"], ep["payload"],
                                      v[~ok].tobytes())}


def decode_float_alp(enc: Encoded) -> np.ndarray:
    p = enc["params"]
    b_ints, b_exc, exc_raw = _split_sections(p, enc["payload"])
    ints = _INT_DECODERS[p["ints"]["codec"]]({**p["ints"], "payload": b_ints})
    exc_pos = _INT_DECODERS[p["exc"]["codec"]]({**p["exc"], "payload": b_exc})
    out = np.empty(p["n"], dtype=np.float64)
    mask = np.ones(p["n"], dtype=bool)
    mask[exc_pos] = False
    out[mask] = ints.astype(np.float64) / _EXACT_POW10[p["exp"]]  # see encoder note
    out[~mask] = np.frombuffer(exc_raw, dtype=np.float64)
    return out


def decode_bytes_like(enc: Encoded, kind: str):
    if kind == "int":
        return _INT_DECODERS[enc["codec"]](enc)
    return _STR_DECODERS[enc["codec"]](enc)


# ---------------------------------------------------------------------------
# arrow-level column chunk encode/decode with auto-selection
# ---------------------------------------------------------------------------
def _arrow_bytes_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(values uint8 buffer, rebased int64 offsets) for string/binary arrays."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    width = 8 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else 4
    odt = np.int64 if width == 8 else np.int32
    offsets = np.frombuffer(bufs[1], dtype=odt, count=arr.offset + len(arr) + 1)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return data, offsets


def chunk_stats(arr: pa.Array) -> dict[str, Any]:
    """Per-chunk stats that drive codec selection (NDV, runs, range, sizes)."""
    t = arr.type
    n = len(arr)
    stats: dict[str, Any] = {"n": n, "nulls": arr.null_count, "type": str(t)}
    if n == 0:
        return stats
    if pa.types.is_integer(t) or pa.types.is_timestamp(t):
        v = _int_values(arr)
        stats["min"] = int(v.min()) if len(v) else 0
        stats["max"] = int(v.max()) if len(v) else 0
        stats["n_runs"] = 1 + int(np.count_nonzero(v[1:] != v[:-1])) if len(v) else 0
    elif pa.types.is_string(t) or pa.types.is_binary(t) or pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        _, offsets = _arrow_bytes_buffers(arr)
        stats["total_bytes"] = int(offsets[-1] - offsets[0])
        # Strided sample, not the head: value-clustered chunks (sorted or
        # encode-order-correlated columns) have unrepresentative heads —
        # 2048 rows of one domain would dict-route a high-NDV chunk (or
        # vice versa). Every ceil(n/2048)-th row costs the same and stays
        # unbiased under clustering. Correctness never depends on this
        # (every codec round-trips); only size/speed of the choice does.
        if n <= 2048:
            sample = arr.drop_null()
        else:
            idx = np.arange(0, n, -(-n // 2048), dtype=np.int64)
            sample = arr.take(pa.array(idx)).drop_null()
        ndv_s = len(pc.unique(sample))
        stats["ndv_est"] = ndv_s if n <= 2048 else int(ndv_s / max(len(sample), 1) * n)
        stats["ndv_ratio"] = ndv_s / max(len(sample), 1)
    return stats


def _int_values(arr: pa.Array) -> np.ndarray:
    a = arr.drop_null() if arr.null_count else arr
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.int64())
    return a.to_numpy(zero_copy_only=False).astype(np.int64)


def _validity_mask(arr: pa.Array) -> np.ndarray:
    return np.asarray(arr.is_valid())


def encode_list(arr: pa.Array, fsst_cache: dict | None = None) -> Encoded:
    """Nested list codec: array<T> columns (e.g. ``embedding:
    array<float>``) split into a per-row LENGTHS stream and a flattened
    CHILD VALUES stream, each encoded by the standard selectors.

    Lengths go through :func:`select_int_codec` — fixed-dimension
    embeddings are a single run, so the lengths stream costs ~bytes of
    RLE; ragged token-id lists get FOR/bitpack. The flattened child array
    recurses through :func:`encode_column`, so array<int> gets
    FOR/bitpack/RLE, array<string> gets dict/FSST (sharing the column's
    per-partition FSST table), array<double> gets ALP, and nested
    array<array<T>> recurses again. Null LISTS are handled by
    ``encode_column``'s generic validity wrapper; null ELEMENTS by the
    child's own recursion. Round-trip is bit-identical (the engine's gate);
    no zone/bloom/HLL sketches are built for nested chunks."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    assert arr.null_count == 0, "encode_list expects the dense (null-free) array"
    if pa.types.is_fixed_size_list(t):
        lengths = np.full(len(arr), t.list_size, dtype=np.int64)
        child = arr.flatten()
    else:
        lengths = pc.list_value_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False)
        child = arr.flatten()
    len_enc = select_int_codec(lengths)
    params: dict[str, Any] = {
        "n": len(arr),
        "len": {"codec": len_enc["codec"], "params": len_enc["params"]},
        "len_bytes": len(len_enc["payload"]),
    }
    if len(child):
        child_enc = encode_column(child, fsst_cache=fsst_cache)
        params["child"] = {"codec": child_enc["codec"], "params": child_enc["params"]}
        payload = len_enc["payload"] + child_enc["payload"]
    else:  # every list empty: lengths alone reconstruct the chunk
        payload = len_enc["payload"]
    return {"codec": "list", "params": params, "payload": payload}


def decode_list(enc: Encoded, t: pa.DataType) -> pa.Array:
    """Decode a ``list`` chunk back to a dense (null-free) array of ``t``."""
    params = enc["params"]
    payload = enc["payload"]
    ln = params["len_bytes"]
    len_enc = {"codec": params["len"]["codec"], "params": params["len"]["params"],
               "payload": payload[:ln]}
    lengths = _INT_DECODERS[len_enc["codec"]](len_enc)
    if "child" in params:
        child_enc = {"codec": params["child"]["codec"],
                     "params": params["child"]["params"], "payload": payload[ln:]}
        child = decode_column(child_enc)
    else:
        child = pa.array([], type=t.value_type)
    if pa.types.is_fixed_size_list(t):
        out = pa.FixedSizeListArray.from_arrays(child, t.list_size)
        return out if out.type == t else out.cast(t)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    out = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), child)
    return out.cast(t)


def encode_column(arr: pa.Array, stats: dict | None = None,
                  fsst_cache: dict | None = None) -> Encoded:
    """Encode one Arrow column chunk with stats-driven codec selection.

    Selection rules (north rule: NDV, run-length, value-range per chunk):
      ints/timestamps: runny -> RLE; narrow range -> FOR+bitpack; else plain
      strings/binary:  low NDV -> dict(+bitpacked codes, FSST'd values);
                       else FSST; FSST falls back to plain when the trained
                       table gains < FSST_MIN_GAIN on the chunk
      floats/other:    plain

    ``fsst_cache`` (one dict per column per partition) shares a single
    trained FSST table across the partition's chunks — see
    :func:`encode_str_fsst`; the min-gain fallback still applies per chunk.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    stats = stats or chunk_stats(arr)
    nulls = arr.null_count
    values = arr.drop_null() if nulls else arr

    if pa.types.is_integer(t) or pa.types.is_timestamp(t):
        enc = select_int_codec(_int_values(values))
    elif pa.types.is_string(t) or pa.types.is_binary(t) or pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        if stats.get("ndv_ratio", 1.0) <= DICT_NDV_RATIO:
            enc = encode_str_dict(values)
        else:
            buf, offsets = _arrow_bytes_buffers(values)
            raw = int(offsets[-1] - offsets[0])
            lens = _lens_from_offsets(offsets)
            enc = None
            if len(lens) > 1 and raw and int(lens.max()) <= FRONT_MAX_LEN:
                # sorted/clustered short strings (url_sort_key layouts):
                # adjacent values sharing >=25% of their bytes as prefixes
                # front-code; the suffix stream still goes through FSST
                plens = front_prefix_lens(buf, offsets)
                if int(plens.sum()) >= FRONT_MIN_SHARE * raw:
                    enc = encode_str_front(buf, offsets, plens=plens)
            if enc is None:
                enc = encode_str_fsst(buf, offsets, cache=fsst_cache)
            if raw and raw / max(len(enc["payload"]), 1) < FSST_MIN_GAIN:
                enc = encode_str_plain(buf, offsets)
    elif pa.types.is_floating(t):
        v = values.to_numpy(zero_copy_only=False)
        enc = encode_float_alp(v) if v.dtype == np.float64 else None
        if enc is not None and len(enc["payload"]) >= v.nbytes:
            enc = None  # decimal but incompressible: plain is smaller
        if enc is None:
            enc = {"codec": "float_plain",
                   "params": {"n": len(v), "np_dtype": str(v.dtype)}, "payload": v.tobytes()}
    elif pa.types.is_boolean(t):
        v = values.to_numpy(zero_copy_only=False).astype(np.uint64)
        enc = {"codec": "bool_pack", "params": {"n": len(v)}, "payload": bitpack(v, 1)}
    elif pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        enc = encode_list(values, fsst_cache=fsst_cache)
    else:
        raise NotImplementedError(f"no codec for arrow type {t}")

    enc["params"]["arrow_type"] = str(t)
    if pa.types.is_nested(t):
        # str(t) for nested types is display-only; a serialized Arrow
        # schema recovers the exact type (child field names, fixed sizes)
        import base64

        enc["params"]["arrow_schema_b64"] = base64.b64encode(
            pa.schema([pa.field("c", t)]).serialize().to_pybytes()).decode("ascii")
    if nulls:
        mask = _validity_mask(arr)
        enc["params"]["n_total"] = len(arr)
        enc["params"]["validity_len"] = len(enc["payload"])
        enc["payload"] = enc["payload"] + np.packbits(mask, bitorder="little").tobytes()
    return enc


_ARROW_TYPES = {
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "float": pa.float32(), "double": pa.float64(), "bool": pa.bool_(),
}


def parse_arrow_type(name: str) -> pa.DataType:
    if name in _ARROW_TYPES:
        return _ARROW_TYPES[name]
    if name.startswith("timestamp["):
        inner = name[len("timestamp[") : -1]
        if ", tz=" in inner:
            unit, tz = inner.split(", tz=")
            return pa.timestamp(unit, tz=tz)
        return pa.timestamp(inner)
    raise KeyError(name)


def decode_column(enc: Encoded) -> pa.Array:
    """Decode a chunk descriptor back to an Arrow array (original type)."""
    params = enc["params"]
    if "arrow_schema_b64" in params:  # nested types: exact type via IPC schema
        import base64

        t = pa.ipc.read_schema(
            pa.py_buffer(base64.b64decode(params["arrow_schema_b64"]))).field(0).type
    else:
        t = parse_arrow_type(params["arrow_type"])
    payload = enc["payload"]
    mask = None
    if "n_total" in params:
        vlen = params["validity_len"]
        payload, vbits = payload[:vlen], payload[vlen:]
        mask = np.unpackbits(np.frombuffer(vbits, dtype=np.uint8), bitorder="little")[: params["n_total"]].astype(bool)
        enc = {**enc, "payload": payload}

    codec = enc["codec"]
    if codec in _INT_DECODERS:
        vals = _INT_DECODERS[codec](enc)
        out = _with_validity_int(vals, mask, t)
    elif codec in _STR_DECODERS:
        buf, offsets = _STR_DECODERS[codec](enc)
        out = _bytes_to_arrow(buf, offsets, t, mask)
    elif codec == "float_plain":
        vals = np.frombuffer(payload, dtype=params["np_dtype"])
        out = _with_validity_np(vals, mask, t)
    elif codec == "float_alp":
        vals = decode_float_alp({**enc, "payload": payload})
        out = _with_validity_np(vals, mask, t)
    elif codec == "bool_pack":
        vals = bitunpack(payload, params["n"], 1).astype(bool)
        out = _with_validity_np(vals, mask, t)
    elif codec == "list":
        dense = decode_list({**enc, "payload": payload}, t)
        out = _expand_nulls_take(dense, mask, t) if mask is not None else dense
    else:
        raise NotImplementedError(codec)
    return out


def _with_validity_int(vals: np.ndarray, mask: np.ndarray | None, t: pa.DataType) -> pa.Array:
    if pa.types.is_timestamp(t):
        base = pa.array(vals, type=pa.int64())
        if mask is not None:
            base = _expand_nulls(base, mask, pa.int64())
        return base.cast(t)
    arr = pa.array(vals, type=t)
    return _expand_nulls(arr, mask, t) if mask is not None else arr


def _with_validity_np(vals: np.ndarray, mask: np.ndarray | None, t: pa.DataType) -> pa.Array:
    arr = pa.array(vals, type=t)
    return _expand_nulls(arr, mask, t) if mask is not None else arr


def _expand_nulls_take(dense: pa.Array, mask: np.ndarray, t: pa.DataType) -> pa.Array:
    """Null expansion for nested types: a take with null indices scatters
    nulls without pc.if_else (which needs flat types)."""
    if len(dense) == 0:
        return pa.nulls(len(mask), t)
    idx = np.cumsum(mask) - 1
    idx_arr = pa.array(np.where(mask, idx, 0), type=pa.int64(), mask=~mask)
    return dense.take(idx_arr)


def _expand_nulls(dense: pa.Array, mask: np.ndarray, t: pa.DataType) -> pa.Array:
    """Scatter non-null values back into a nullable array by validity mask."""
    if len(dense) == 0:
        return pa.nulls(len(mask), t)
    idx = np.cumsum(mask) - 1
    idx_arr = pa.array(np.where(mask, idx, 0), type=pa.int64())
    taken = dense.take(idx_arr)
    return pc.if_else(pa.array(mask), taken, pa.nulls(len(mask), t))


def _bytes_to_arrow(buf: np.ndarray, offsets: np.ndarray, t: pa.DataType, mask: np.ndarray | None) -> pa.Array:
    wide = pa.large_string() if (pa.types.is_large_string(t) or pa.types.is_string(t)) else pa.large_binary()
    arr = pa.Array.from_buffers(
        wide,
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64).tobytes()), pa.py_buffer(buf.tobytes())],
    )
    if mask is not None:
        arr = _expand_nulls(arr, mask, arr.type)
    return arr.cast(t)
