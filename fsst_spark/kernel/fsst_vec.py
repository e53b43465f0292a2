"""Vectorized (numpy) FSST encode/decode over Arrow-style column buffers.

This is the hot path of the engine: it runs inside ``mapInArrow`` tasks on
executors, operating on a whole column chunk at a time with no per-row
Python. Semantics are identical to the scalar kernel in ``fsst.py`` (which
mirrors reference src/lib.rs:366-529 greedy longest-match + escape format);
the two are property-tested against each other.

Encode strategy — "wavefront over lanes":
  The greedy match has a sequential data dependency within one string
  (advance depends on the current match, reference src/lib.rs:466-476), so
  we vectorize across *strings*: every row is split into lanes of at most
  ``SEG`` bytes; each wavefront step gathers the current 8-byte window of
  every live lane (one unaligned uint64 view gather), performs the 3-probe
  match (2-byte fast path -> lossy PHT -> 1/2-byte-or-escape fallback,
  reference src/lib.rs:366-413) as vectorized gathers, scatters the output
  code (+ optional escape literal), and advances all cursors. Iteration
  count is bounded by SEG, work per step is O(live lanes) — total
  elementwise work equals the number of emitted codes. The PHT probe runs
  only on the lanes that miss the 2-byte fast path.

  Lane splitting is seam-safe: FSST streams are self-delimiting, so the
  concatenation of independently-encoded segments decodes to the
  concatenation of the plaintexts. The only cost is a forced symbol break
  every SEG bytes (< 8/SEG worst-case size overhead).

Decode strategy — fully data-parallel:
  Which bytes are escape markers follows from run-parity of 0xFF runs
  (every maximal 0xFF run starts at a code position), so escape/literal/code
  roles and output offsets (cumsum of symbol lengths) are single numpy
  passes; output bytes are written per symbol-byte-position (8 strided
  scatter passes), not per byte.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .fsst import (
    CODE_MASK,
    CODE_UNUSED,
    LEN_SHIFT,
    PHT_MASK,
    Compressor,
)

SEG = 2048  # lane size: bounds wavefront iterations; <0.4% worst-case ratio cost

import os as _os

_NO_NATIVE = _os.environ.get("FSST_SPARK_NO_NATIVE", "") == "1"

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_HASH_MUL = np.uint64(2971215073)
_H15 = np.uint64(15)
_U0XFFFF = np.uint64(0xFFFF)
_U0XFFFFFF = np.uint64(0xFFFFFF)
_U0XFF = np.uint64(0xFF)
_U1 = np.uint64(1)
_U8 = np.uint64(8)
_PHT_MASK64 = np.uint64(PHT_MASK)


def _hash_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized fsst_hash (reference src/builder.rs:590-592)."""
    return (v * _HASH_MUL) ^ (v >> _H15)


@dataclass
class EncoderTables:
    """Numpy lookup tables extracted from a finalized scalar Compressor."""

    # uint32[65536]: emit-code | adv_in<<8 | adv_out<<16 for the 2-byte index
    tb_packed: np.ndarray
    has_suffix_code: np.uint32
    pht_sym: np.ndarray  # uint64[2048]
    pht_mask: np.ndarray  # uint64[2048] compare mask (0 when unused)
    # uint32[2048]: code | len<<8 | used<<16
    pht_packed: np.ndarray
    sym_mat: np.ndarray  # uint8[256, 8] decode matrix (column-major friendly)
    sym_lens: np.ndarray  # uint8[256]
    n_symbols: int

    @classmethod
    def from_compressor(cls, c: Compressor) -> "EncoderTables":
        two = np.asarray(c.codes_two_byte, dtype=np.uint32)
        tb_code = two & 0xFF
        tb_adv_in = two >> LEN_SHIFT
        tb_adv_out = 1 + ((two & CODE_MASK) >> 8)
        tb_packed = (tb_code | (tb_adv_in << 8) | (tb_adv_out << 16)).astype(np.uint32)

        pht_code_raw = np.asarray(c.pht_code, dtype=np.uint32)
        pht_used = (pht_code_raw != CODE_UNUSED).astype(np.uint32)
        pht_packed = ((pht_code_raw & 0xFF) | ((pht_code_raw >> LEN_SHIFT) << 8) | (pht_used << 16)).astype(np.uint32)
        pht_ign = np.asarray(c.pht_ign, dtype=np.uint64)
        pht_mask = np.where(
            pht_used.astype(bool), _U64_MAX >> np.minimum(pht_ign, np.uint64(63)), np.uint64(0)
        )
        sym_mat = np.zeros((256, 8), dtype=np.uint8)
        sym_lens = np.zeros(256, dtype=np.uint8)  # len 0 marks unused codes
        for code, (s, ln) in enumerate(zip(c.symbols, c.lengths)):
            sym_mat[code] = np.frombuffer(s.to_bytes(8, "little"), dtype=np.uint8)
            sym_lens[code] = ln
        return cls(
            tb_packed=tb_packed,
            has_suffix_code=np.uint32(c.has_suffix_code),
            pht_sym=np.asarray(c.pht_sym, dtype=np.uint64),
            pht_mask=pht_mask,
            pht_packed=pht_packed,
            sym_mat=sym_mat,
            sym_lens=sym_lens,
            n_symbols=c.n_symbols,
        )


def _exclusive_cumsum(a: np.ndarray) -> np.ndarray:
    out = np.empty(len(a) + 1, dtype=np.int64)
    out[0] = 0
    np.cumsum(a, out=out[1:])
    return out


def encode_chunk(
    data: np.ndarray, offsets: np.ndarray, t: EncoderTables, seg: int = SEG,
    force_numpy: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Encode ``n`` strings stored as a contiguous uint8 buffer + int64
    offsets[n+1]. Returns (encoded uint8 buffer, encoded offsets[n+1]).

    Dispatches to the native C kernel when available (identical output to
    the scalar reference semantics, no lane splitting); the numpy wavefront
    below is the portable fallback and the property-test cross-check."""
    from ..env import madvise_hugepages

    madvise_hugepages()
    if not force_numpy and not _NO_NATIVE:
        from .native import encode_chunk_native

        res = encode_chunk_native(data, offsets, t, seg=seg)
        if res is not None:
            return res
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    total_in = int(offsets[-1])
    if total_in == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(n + 1, dtype=np.int64)

    # --- lane construction: split rows into <=seg-byte segments ------------
    row_len = offsets[1:] - offsets[:-1]
    nseg = (row_len + (seg - 1)) // seg
    row_of_lane = np.repeat(np.arange(n, dtype=np.int64), nseg)
    lane_cum = _exclusive_cumsum(nseg)
    nlanes = int(lane_cum[-1])
    seg_idx = np.arange(nlanes, dtype=np.int64) - lane_cum[row_of_lane]
    lane_start = offsets[:-1][row_of_lane] + seg_idx * seg
    lane_end = np.minimum(lane_start + seg, offsets[1:][row_of_lane])
    lane_out_base = _exclusive_cumsum(2 * (lane_end - lane_start))[:-1]

    # Zero-padded buffer + unaligned little-endian u64 view at every offset.
    buf = np.empty(total_in + 8, dtype=np.uint8)
    buf[:total_in] = data[:total_in]
    buf[total_in:] = 0
    words_view = np.ndarray(shape=(total_in + 1,), dtype="<u8", buffer=buf.data, strides=(1,))

    outbuf = np.empty(2 * total_in, dtype=np.uint8)
    opos_final = np.empty(nlanes, dtype=np.int64)

    # --- wavefront ----------------------------------------------------------
    ipos = lane_start.copy()
    iend = lane_end.copy()
    opos = lane_out_base.copy()
    idx = np.arange(nlanes, dtype=np.int64)
    tb_packed = t.tb_packed
    pht_sym, pht_mask, pht_packed = t.pht_sym, t.pht_mask, t.pht_packed
    has_suffix = t.has_suffix_code
    u255 = np.uint32(0xFF)

    while len(ipos):
        w = words_view[ipos]  # fancy indexing returns a fresh array
        valid = iend - ipos
        short = valid < 8
        if short.any():
            vshort = valid[short].astype(np.uint64)
            w[short] &= (_U1 << (_U8 * vshort)) - _U1

        tbp = tb_packed[(w & _U0XFFFF).astype(np.int64)]
        code = tbp & u255

        # Branchless PHT probe (reference src/lib.rs:383-394): lanes on the
        # 2-byte fast path (code < has_suffix_code) ignore the probe result.
        slot = (_hash_vec(w & _U0XFFFFFF) & _PHT_MASK64).astype(np.int64)
        pp = pht_packed[slot]
        pmatch = (code >= has_suffix) & (pp >> 16 != 0) & ((w & pht_mask[slot]) == pht_sym[slot])

        out_b1 = np.where(pmatch, pp, tbp).astype(np.uint8)  # low byte = code
        adv_in = (np.where(pmatch, pp, tbp) >> 8 & u255).astype(np.int64)
        adv_out = np.where(pmatch, np.uint32(1), tbp >> 16).astype(np.int64)

        outbuf[opos] = out_b1
        esc = adv_out == 2
        if esc.any():
            outbuf[opos[esc] + 1] = (w[esc] & _U0XFF).astype(np.uint8)

        ipos += adv_in
        opos += adv_out
        done = ipos >= iend
        if done.any():
            opos_final[idx[done]] = opos[done]
            live = ~done
            ipos, iend, opos, idx = ipos[live], iend[live], opos[live], idx[live]

    # --- compact lane outputs into one contiguous row-ordered buffer -------
    lane_len = opos_final - lane_out_base
    out_total = int(lane_len.sum())
    dst_cum = _exclusive_cumsum(lane_len)
    src = np.repeat(lane_out_base - dst_cum[:-1], lane_len) + np.arange(out_total, dtype=np.int64)
    out = outbuf[src]

    row_out_len = np.zeros(n, dtype=np.int64)
    np.add.at(row_out_len, row_of_lane, lane_len)
    out_offsets = _exclusive_cumsum(row_out_len)
    return out, out_offsets


def decode_chunk(
    codes: np.ndarray, offsets: np.ndarray, sym_mat: np.ndarray, sym_lens: np.ndarray,
    force_numpy: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode ``n`` FSST streams (contiguous uint8 buffer + int64 offsets).

    Mirrors reference src/lib.rs:255-303, vectorized: escape/literal/code
    roles from 0xFF run parity, output offsets from a cumsum, output bytes
    via 8 per-symbol-byte-position scatter passes. Returns (out, offsets)."""
    from ..env import madvise_hugepages

    madvise_hugepages()
    if not force_numpy and not _NO_NATIVE:
        from .native import decode_chunk_native

        res = decode_chunk_native(codes, offsets, sym_mat, sym_lens)
        if res is not None:
            return res
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    nbytes = int(offsets[-1])
    if nbytes == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(n + 1, dtype=np.int64)
    b = np.asarray(codes[:nbytes], dtype=np.uint8)

    e = b == 255
    row_starts = offsets[:-1][offsets[:-1] < nbytes]
    if e.any():
        prev_e = np.empty_like(e)
        prev_e[0] = False
        prev_e[1:] = e[:-1]
        prev_e[row_starts] = False  # runs never span row boundaries
        run_start = e & ~prev_e
        run_start_pos = np.flatnonzero(run_start)
        run_id = np.cumsum(run_start) - 1
        off_in_run = np.arange(nbytes, dtype=np.int64) - run_start_pos[run_id]
        is_escape = e & ((off_in_run & 1) == 0)
        is_literal = np.zeros(nbytes, dtype=bool)
        is_literal[1:] = is_escape[:-1]
        is_literal[row_starts] = False
        is_code = ~(is_escape | is_literal)
    else:
        is_escape = e  # all False
        is_literal = e
        is_code = None  # everything is a code

    # Corrupt-stream defense (reference asserts table sanity on load,
    # src/lib.rs:245-248): every code byte must name a real symbol
    # (sym_lens > 0) and no escape may sit at the end of its row.
    row_last = offsets[1:] - 1
    row_last = row_last[row_last >= offsets[:-1]]
    if is_escape[row_last].any():
        raise ValueError("corrupt FSST stream: escape byte at end of input")

    out_len = np.empty(nbytes, dtype=np.int64)
    if is_code is None:
        out_len[:] = sym_lens[b]
        if not out_len.all():
            raise ValueError("corrupt FSST stream: code outside the symbol table")
        code_pos = None
        code_vals = b
        code_lens = out_len
    else:
        out_len[:] = 0
        out_len[is_literal] = 1
        code_pos = np.flatnonzero(is_code)
        code_vals = b[code_pos]
        code_lens = sym_lens[code_vals].astype(np.int64)
        if not code_lens.all():
            raise ValueError("corrupt FSST stream: code outside the symbol table")
        out_len[code_pos] = code_lens
    cum = _exclusive_cumsum(out_len)
    total = int(cum[-1])
    out = np.empty(total, dtype=np.uint8)

    if is_code is None:
        code_out = cum[:-1]
    else:
        out[cum[:-1][is_literal]] = b[is_literal]
        code_out = cum[:-1][code_pos]

    # Per-byte-position scatter: pass j writes byte j of every symbol whose
    # length exceeds j. Lengths are descending-filtered so later passes
    # touch geometrically fewer elements.
    for j in range(8):
        live = code_lens > j
        if not live.any():
            break
        if j == 0:
            out[code_out] = sym_mat[code_vals, 0]
        else:
            out[code_out[live] + j] = sym_mat[code_vals[live], j]

    row_out = cum[offsets[1:]] - cum[offsets[:-1]]
    return out, _exclusive_cumsum(row_out)


def decoded_lengths(
    codes: np.ndarray, offsets: np.ndarray, sym_lens: np.ndarray,
) -> np.ndarray:
    """Per-row DECODED byte length of ``n`` FSST streams — the parse phase
    of :func:`decode_chunk` (escape-run parity -> roles, gather symbol
    lengths, cumsum) with the byte-scatter passes skipped entirely.

    This is what length/size aggregates over an encoded store need: a
    ``sum(octet_length(text))`` over 100 TB never has to materialize a
    single decoded string — it reads the code streams and does five numpy
    passes. Returns ``int64[n]``; raises on corrupt streams exactly like
    ``decode_chunk`` (mirrors the decode loop of reference
    src/lib.rs:255-303, minus the output writes)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    nbytes = int(offsets[-1])
    if nbytes == 0:
        return np.zeros(n, dtype=np.int64)
    b = np.asarray(codes[:nbytes], dtype=np.uint8)

    e = b == 255
    row_starts = offsets[:-1][offsets[:-1] < nbytes]
    out_len = np.empty(nbytes, dtype=np.int64)
    if e.any():
        prev_e = np.empty_like(e)
        prev_e[0] = False
        prev_e[1:] = e[:-1]
        prev_e[row_starts] = False  # runs never span row boundaries
        run_start = e & ~prev_e
        run_start_pos = np.flatnonzero(run_start)
        run_id = np.cumsum(run_start) - 1
        off_in_run = np.arange(nbytes, dtype=np.int64) - run_start_pos[run_id]
        is_escape = e & ((off_in_run & 1) == 0)
        is_literal = np.zeros(nbytes, dtype=bool)
        is_literal[1:] = is_escape[:-1]
        is_literal[row_starts] = False
        is_code = ~(is_escape | is_literal)
        row_last = offsets[1:] - 1
        row_last = row_last[row_last >= offsets[:-1]]
        if is_escape[row_last].any():
            raise ValueError("corrupt FSST stream: escape byte at end of input")
        out_len[:] = 0
        out_len[is_literal] = 1
        code_lens = sym_lens[b[is_code]].astype(np.int64)
        if not code_lens.all():
            raise ValueError("corrupt FSST stream: code outside the symbol table")
        out_len[is_code] = code_lens
    else:
        out_len[:] = sym_lens[b]
        if not out_len.all():
            raise ValueError("corrupt FSST stream: code outside the symbol table")
    cum = _exclusive_cumsum(out_len)
    return cum[offsets[1:]] - cum[offsets[:-1]]
