"""Optional native (C) FSST encode/decode kernels.

The greedy FSST match is a sequential byte loop — the one shape numpy
can't express at full speed. This module compiles a ~100-line C kernel at
first use (gcc is a stock toolchain; the .so is cached by source hash) and
falls back to the numpy wavefront kernels when no compiler is available.
Semantics are identical to ``fsst.py``/``fsst_vec.py`` (property-tested):
the same 2-byte-table -> lossy-PHT -> escape greedy match as reference
src/lib.rs:366-413, re-implemented from the published algorithm.

Workspaces are process-cached and grown geometrically so steady-state
executor tasks allocate nothing (first-touch page faults are the dominant
cost on virtualized hosts).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

static inline uint64_t load_word(const uint8_t* p, int64_t remaining) {
    uint64_t w = 0;
    if (remaining >= 8) { memcpy(&w, p, 8); }
    else if (remaining > 0) { memcpy(&w, p, (size_t)remaining); }
    return w;
}

/* Greedy FSST encode of n strings (data + offsets) into out/out_offsets.
   tb: uint32[65536] packed (code | adv_in<<8 | adv_out<<16).
   pht_packed: uint32[2048] packed (code | len<<8 | used<<16).
   Returns total encoded bytes.

   The match body is a macro shared by every loop so semantics stay
   identical everywhere: 2-byte fast path, lossy-PHT probe, 1-byte code or
   escape. The greedy walk is a serial dependency chain (load -> table
   probe -> variable advance), so for bulk inputs four independent lanes
   are interleaved in one loop — four dependency chains in flight per
   core. Each lane writes into a private slot at out + 2*offsets[lane]
   (worst case exactly 2 output bytes per input byte, so slots never
   collide and 2*total is the caller's existing allocation); a final
   compaction pass restores the contiguous lane order, leaving output
   bytes identical to the sequential walk. */
#define FSST_STEP_W(w, ink, opk)                                             \
    {                                                                        \
        uint32_t t = tb[(w) & 0xFFFF];                                       \
        uint32_t code = t & 0xFF;                                            \
        if (code < has_suffix) {            /* 2-byte fast path */           \
            out[opk++] = (uint8_t)code;                                      \
            ink += 2;                                                        \
        } else {                                                             \
            uint64_t v = (w) & 0xFFFFFF;    /* lossy PHT probe */            \
            uint32_t slot = (uint32_t)(((v * 2971215073ULL) ^ (v >> 15)) & 2047);\
            uint32_t p = pht_packed[slot];                                   \
            if ((p >> 16) && ((w) & pht_mask[slot]) == pht_sym[slot]) {      \
                out[opk++] = (uint8_t)(p & 0xFF);                            \
                ink += (p >> 8) & 0xFF;                                      \
            } else {                                                         \
                out[opk++] = (uint8_t)code; /* 1/2-byte code or escape */    \
                if ((t >> 16) == 2) out[opk++] = (uint8_t)(w); /* literal */ \
                ink += (t >> 8) & 0xFF;                                      \
            }                                                                \
        }                                                                    \
    }

int64_t fsst_encode_bulk(
    const uint8_t* data, const int64_t* offsets, int64_t n,
    const uint32_t* tb, uint32_t has_suffix,
    const uint64_t* pht_sym, const uint64_t* pht_mask,
    const uint32_t* pht_packed,
    uint8_t* out, int64_t* out_offsets)
{
    out_offsets[0] = 0;
    if (n <= 0) return 0;
    if (n < 8) {                       /* few lanes: plain sequential walk */
        int64_t opos = 0;
        for (int64_t r = 0; r < n; r++) {
            int64_t in = offsets[r], end = offsets[r + 1];
            int64_t end_main = end - 8;
            while (in <= end_main) {
                uint64_t wm;
                memcpy(&wm, data + in, 8);
                FSST_STEP_W(wm, in, opos)
            }
            while (in < end) {
                uint64_t wt = load_word(data + in, end - in);
                FSST_STEP_W(wt, in, opos)
            }
            out_offsets[r + 1] = opos;
        }
        return opos;
    }

    int64_t lane[4], in[4], end[4], op[4];
    int64_t next = 0;
    int n_active = 0;
    for (int k = 0; k < 4; k++) {
        lane[k] = next; in[k] = offsets[next]; end[k] = offsets[next + 1];
        op[k] = 2 * offsets[next];
        next++; n_active++;
    }
    while (n_active == 4) {
        int64_t em0 = end[0] - 8, em1 = end[1] - 8;
        int64_t em2 = end[2] - 8, em3 = end[3] - 8;
        while (in[0] <= em0 && in[1] <= em1 && in[2] <= em2 && in[3] <= em3) {
            uint64_t w0, w1, w2, w3;
            memcpy(&w0, data + in[0], 8);
            memcpy(&w1, data + in[1], 8);
            memcpy(&w2, data + in[2], 8);
            memcpy(&w3, data + in[3], 8);
            FSST_STEP_W(w0, in[0], op[0])
            FSST_STEP_W(w1, in[1], op[1])
            FSST_STEP_W(w2, in[2], op[2])
            FSST_STEP_W(w3, in[3], op[3])
        }
        for (int k = 0; k < 4; k++) {        /* lanes now in their tail */
            if (in[k] > end[k] - 8) {
                while (in[k] < end[k]) {
                    uint64_t wt = load_word(data + in[k], end[k] - in[k]);
                    FSST_STEP_W(wt, in[k], op[k])
                }
                /* stash the lane's LENGTH; compaction turns it cumulative */
                out_offsets[lane[k] + 1] = op[k] - 2 * offsets[lane[k]];
                if (next < n) {
                    lane[k] = next; in[k] = offsets[next];
                    end[k] = offsets[next + 1]; op[k] = 2 * offsets[next];
                    next++;
                } else {
                    lane[k] = -1; n_active--;
                }
            }
        }
    }
    for (int k = 0; k < 4; k++) {            /* drain the last <4 lanes */
        if (lane[k] < 0) continue;
        int64_t i = in[k], e = end[k], o = op[k];
        int64_t em = e - 8;
        while (i <= em) {
            uint64_t wm;
            memcpy(&wm, data + i, 8);
            FSST_STEP_W(wm, i, o)
        }
        while (i < e) {
            uint64_t wt = load_word(data + i, e - i);
            FSST_STEP_W(wt, i, o)
        }
        out_offsets[lane[k] + 1] = o - 2 * offsets[lane[k]];
    }
    int64_t pos = 0;                         /* compact slots -> contiguous */
    for (int64_t r = 0; r < n; r++) {
        int64_t len = out_offsets[r + 1];
        memmove(out + pos, out + 2 * offsets[r], (size_t)len);
        pos += len;
        out_offsets[r + 1] = pos;
    }
    return pos;
}

/* One training generation of CompressorBuilder.compress_count over the
   selected sample lines: greedy longest-match walk in BUILDING code space
   (one/two-byte indexes + lossy PHT), tallying counts1[512] and
   counts2[512*512]. Exactly mirrors the Python loop (same word loads,
   same tail handling) so the resulting counters — and therefore the
   trained symbol table — are identical. */
void fsst_count_bulk(
    const uint8_t* data, const int64_t* starts, const int64_t* ends,
    int64_t n_lines,
    const uint32_t* codes_one,   /* 256 packed building codes */
    const uint32_t* codes_two,   /* 65536 */
    const uint64_t* pht_sym, const uint32_t* pht_code,
    const uint8_t* pht_ign,      /* 2048 each */
    const uint64_t* symbols,     /* 511: escapes 0..255 + building 256.. */
    uint32_t* counts1, uint32_t* counts2)
{
    const uint64_t M64 = ~0ULL;
    const uint32_t CODE_UNUSED = 511u + (1u << 12);
    for (int64_t r = 0; r < n_lines; r++) {
        int64_t pos = starts[r], end = ends[r];
        if (pos >= end) continue;
        uint32_t prev = 511;
        int64_t end_main = end - 8;
        uint64_t word;
        while (pos < end_main) {
            memcpy(&word, data + pos, 8);
            uint64_t v = word & 0xFFFFFF;
            uint32_t slot = (uint32_t)(((v * 2971215073ULL) ^ (v >> 15)) & 2047);
            uint32_t code, pcode = pht_code[slot];
            if (pcode != CODE_UNUSED
                    && (word & (M64 >> pht_ign[slot])) == pht_sym[slot]) {
                code = pcode;
            } else {
                uint32_t two = codes_two[word & 0xFFFF];
                code = ((two & 511u) >= 256u) ? two : codes_one[word & 0xFF];
            }
            uint32_t ext = code & 511u, ln = code >> 12;
            counts1[ext]++; counts2[prev * 512u + ext]++;
            if (ln > 1) {
                uint32_t fb = (uint32_t)(symbols[ext] & 0xFF);
                counts1[fb]++; counts2[prev * 512u + fb]++;
            }
            pos += ln;
            prev = ext;
        }
        int64_t rem = end - pos;
        word = load_word(data + pos, rem);
        while (rem > 0) {
            uint64_t v = word & 0xFFFFFF;
            uint32_t slot = (uint32_t)(((v * 2971215073ULL) ^ (v >> 15)) & 2047);
            uint32_t code, pcode = pht_code[slot];
            if (pcode != CODE_UNUSED
                    && (word & (M64 >> pht_ign[slot])) == pht_sym[slot]) {
                code = pcode;
            } else {
                uint32_t two = codes_two[word & 0xFFFF];
                code = ((two & 511u) >= 256u) ? two : codes_one[word & 0xFF];
            }
            uint32_t ext = code & 511u, ln = code >> 12;
            counts1[ext]++; counts2[prev * 512u + ext]++;
            if (ln > 1) {
                uint32_t fb = (uint32_t)(symbols[ext] & 0xFF);
                counts1[fb]++; counts2[prev * 512u + fb]++;
            }
            rem -= ln;
            word >>= 8 * ln;
            prev = ext;
        }
    }
}

/* Decode n FSST streams. out must have 8 bytes of slack beyond worst case.
   Returns total decoded bytes, or -1 on a corrupt stream (escape byte at
   end of input, or a code >= n_symbols) — matching the reference's
   table-sanity assertion on load (reference src/lib.rs:245-248). */
int64_t fsst_decode_bulk(
    const uint8_t* codes, const int64_t* offsets, int64_t n,
    const uint8_t* sym_bytes /* 256*8 */, const uint8_t* lens /* 256 */,
    uint32_t n_symbols,
    uint8_t* out, int64_t* out_offsets)
{
    int64_t opos = 0;
    out_offsets[0] = 0;
    for (int64_t r = 0; r < n; r++) {
        int64_t in = offsets[r], end = offsets[r + 1];
        while (in < end) {
            uint8_t c = codes[in++];
            if (c == 255) {
                if (in >= end) return -1;   /* truncated escape */
                out[opos++] = codes[in++];
            } else {
                if (c >= n_symbols) return -1;  /* code outside the table */
                memcpy(out + opos, sym_bytes + ((size_t)c << 3), 8);
                opos += lens[c];
            }
        }
        out_offsets[r + 1] = opos;
    }
    return opos;
}
"""

_lib = None
_tried = False


def _compile() -> ctypes.CDLL | None:
    tag = hashlib.blake2b(_C_SRC.encode(), digest_size=8).hexdigest()
    cache = os.path.join(tempfile.gettempdir(), f"fsst_native_{tag}.so")
    if not os.path.exists(cache):
        src = cache + f".{os.getpid()}.c"
        with open(src, "w") as f:
            f.write(_C_SRC)
        tmp_so = cache + f".{os.getpid()}.so"
        try:
            subprocess.run(
                ["gcc", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", tmp_so],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, cache)
        except Exception:
            return None
        finally:
            for p in (src, tmp_so):
                try:
                    os.remove(p)
                except OSError:
                    pass
    lib = ctypes.CDLL(cache)
    i64, u32 = ctypes.c_int64, ctypes.c_uint32
    p = ctypes.c_void_p
    lib.fsst_encode_bulk.restype = i64
    lib.fsst_encode_bulk.argtypes = [p, p, i64, p, u32, p, p, p, p, p]
    lib.fsst_decode_bulk.restype = i64
    lib.fsst_decode_bulk.argtypes = [p, p, i64, p, p, u32, p, p]
    lib.fsst_count_bulk.restype = None
    lib.fsst_count_bulk.argtypes = [p, p, p, i64, p, p, p, p, p, p, p, p]
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _compile()
        except Exception:
            _lib = None
    return _lib


class _Workspace:
    """Grow-only process-local buffers: steady-state tasks allocate nothing."""

    def __init__(self) -> None:
        self.enc_out = np.empty(0, dtype=np.uint8)
        self.dec_out = np.empty(0, dtype=np.uint8)

    def enc(self, n: int) -> np.ndarray:
        if len(self.enc_out) < n:
            self.enc_out = np.empty(int(n * 1.3), dtype=np.uint8)
        return self.enc_out

    def dec(self, n: int) -> np.ndarray:
        if len(self.dec_out) < n:
            self.dec_out = np.empty(int(n * 1.3), dtype=np.uint8)
        return self.dec_out


_ws = _Workspace()


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def encode_chunk_native(data: np.ndarray, offsets: np.ndarray, t,
                        seg: int = 2048) -> tuple[np.ndarray, np.ndarray] | None:
    """Native encode; returns None when no compiler is available.

    Rows longer than ``seg`` are split into the SAME <=seg-byte lanes the
    numpy wavefront uses (symbol matches never span a lane boundary), so
    encoded output is byte-identical across kernels — a mixed cluster
    (some executors without gcc) re-encoding a partition produces the same
    bytes, keeping resume/audit checksums deterministic."""
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    total = int(offsets[-1]) - int(offsets[0])
    if offsets[0] != 0:
        data = data[offsets[0]:]
        offsets = offsets - offsets[0]
    data = np.ascontiguousarray(data[: int(offsets[-1]) + 1] if len(data) > int(offsets[-1]) else data, dtype=np.uint8)

    row_len = offsets[1:] - offsets[:-1]
    if n and int(row_len.max(initial=0)) > seg:
        # lane-split exactly like fsst_vec.encode_chunk
        nseg = (row_len + (seg - 1)) // seg
        row_of_lane = np.repeat(np.arange(n, dtype=np.int64), nseg)
        lane_cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(nseg, out=lane_cum[1:])
        nlanes = int(lane_cum[-1])
        seg_idx = np.arange(nlanes, dtype=np.int64) - lane_cum[row_of_lane]
        lane_start = offsets[:-1][row_of_lane] + seg_idx * seg
        lane_end = np.minimum(lane_start + seg, offsets[1:][row_of_lane])
        enc_offsets = np.empty(nlanes + 1, dtype=np.int64)
        enc_offsets[0] = 0
        enc_offsets[1:] = lane_end
    else:
        row_of_lane = None
        enc_offsets, nlanes = offsets, n

    nt = _native_tables(t)
    out = _ws.enc(2 * total + 8)
    out_off = np.empty(nlanes + 1, dtype=np.int64)
    sz = lib.fsst_encode_bulk(
        _ptr(data), _ptr(enc_offsets), nlanes, _ptr(nt["tb"]), int(t.has_suffix_code),
        _ptr(nt["pht_sym"]), _ptr(nt["pht_mask"]), _ptr(nt["pht_packed"]),
        _ptr(out), _ptr(out_off),
    )
    if row_of_lane is not None:
        lane_out_len = out_off[1:] - out_off[:-1]
        row_out_len = np.zeros(n, dtype=np.int64)
        np.add.at(row_out_len, row_of_lane, lane_out_len)
        out_off = np.empty(n + 1, dtype=np.int64)
        out_off[0] = 0
        np.cumsum(row_out_len, out=out_off[1:])
    return out[:sz].copy(), out_off


def decode_chunk_native(codes: np.ndarray, offsets: np.ndarray, sym_mat: np.ndarray,
                        sym_lens: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    lib = get_lib()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if len(offsets) and offsets[0] != 0:
        codes = codes[offsets[0]:]
        offsets = offsets - offsets[0]
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    total_codes = int(offsets[-1])
    sym_c = np.ascontiguousarray(sym_mat, dtype=np.uint8)
    lens_c = np.ascontiguousarray(sym_lens, dtype=np.uint8)
    # sym_lens is dense (codes 0..n_symbols-1 have len>=1, rest 0).
    n_symbols = int((sym_lens > 0).sum())
    out = _ws.dec(8 * total_codes + 8)
    out_off = np.empty(n + 1, dtype=np.int64)
    sz = lib.fsst_decode_bulk(_ptr(codes), _ptr(offsets), n, _ptr(sym_c), _ptr(lens_c),
                              n_symbols, _ptr(out), _ptr(out_off))
    if sz < 0:
        raise ValueError(
            "corrupt FSST stream: escape at end of input or code outside the symbol table"
        )
    return out[:sz].copy(), out_off


class NativeCounter:
    """Per-training-run native ``compress_count`` driver.

    Holds the concatenated sample buffer plus per-line (start, end) spans;
    ``run_generation`` exports the builder's CURRENT building-code state
    (it changes after every ``optimize``) as contiguous arrays, runs one
    generation of greedy counting in C, and returns dense count arrays.
    ``None`` from :func:`make_native_counter` means no compiler —
    callers fall back to the scalar Python loop."""

    def __init__(self, lib, sample: "list[bytes]") -> None:
        self.lib = lib
        self.data = np.frombuffer(b"".join(sample), dtype=np.uint8) \
            if sample else np.empty(0, np.uint8)
        lens = np.fromiter((len(s) for s in sample), dtype=np.int64,
                           count=len(sample))
        bounds = np.zeros(len(sample) + 1, dtype=np.int64)
        np.cumsum(lens, out=bounds[1:])
        self.starts_all = bounds[:-1]
        self.ends_all = bounds[1:]
        self.counts1 = np.zeros(512, dtype=np.uint32)
        self.counts2 = np.zeros(512 * 512, dtype=np.uint32)

    def run_generation(self, builder, line_mask: np.ndarray):
        starts = np.ascontiguousarray(self.starts_all[line_mask])
        ends = np.ascontiguousarray(self.ends_all[line_mask])
        codes_one = np.array(builder.codes_one_byte, dtype=np.uint32)
        codes_two = np.ascontiguousarray(builder.codes_two_byte,
                                         dtype=np.uint32)
        pht_sym = np.array(builder.pht_sym, dtype=np.uint64)
        pht_code = np.array(builder.pht_code, dtype=np.uint32)
        pht_ign = np.array(builder.pht_ign, dtype=np.uint8)
        symbols = np.array(builder.symbols[:511], dtype=np.uint64)
        self.counts1[:] = 0
        self.counts2[:] = 0
        self.lib.fsst_count_bulk(
            _ptr(self.data), _ptr(starts), _ptr(ends), len(starts),
            _ptr(codes_one), _ptr(codes_two), _ptr(pht_sym),
            _ptr(pht_code), _ptr(pht_ign), _ptr(symbols),
            _ptr(self.counts1), _ptr(self.counts2))
        return self.counts1, self.counts2.reshape(512, 512)


def make_native_counter(sample: "list[bytes]") -> "NativeCounter | None":
    lib = get_lib()
    if lib is None:
        return None
    return NativeCounter(lib, sample)


def _native_tables(t) -> dict:
    """Contiguous ctypes-ready views of EncoderTables (cached on the object)."""
    cached = getattr(t, "_native_cache", None)
    if cached is not None:
        return cached
    cached = {
        "tb": np.ascontiguousarray(t.tb_packed, dtype=np.uint32),
        "pht_sym": np.ascontiguousarray(t.pht_sym, dtype=np.uint64),
        "pht_mask": np.ascontiguousarray(t.pht_mask, dtype=np.uint64),
        "pht_packed": np.ascontiguousarray(t.pht_packed, dtype=np.uint32),
    }
    object.__setattr__(t, "_native_cache", cached)
    return cached
