"""Adversarial fuzz of the native C kernel's buffer math.

Mirrors the reference's cargo-fuzz targets (fuzz/fuzz_targets/
fuzz_compress.rs) with distributions aimed at the native kernel's offset
arithmetic: the 4-lane interleaved encode writes into per-lane slots at
``2*offsets[lane]`` whose capacity (2 bytes out per input byte) is hit
EXACTLY by all-escape lanes, and the lane-split path kicks in for rows
longer than ``seg``. Each trial checks native == numpy wavefront
byte-identity and a bit-identical round-trip. Run the full 400-trial
sweep manually with FSST_FUZZ_TRIALS=400 (optionally under
PYTHONMALLOC=debug); CI keeps it to a fast subset.
"""

import os
import random

import numpy as np
import pytest

from fsst_spark.kernel.fsst import train
from fsst_spark.kernel.fsst_vec import EncoderTables, decode_chunk, encode_chunk

TRIALS = int(os.environ.get("FSST_FUZZ_TRIALS", "64"))


def to_buffers(values):
    data = np.frombuffer(b"".join(values), dtype=np.uint8)
    offsets = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum([len(v) for v in values], out=offsets[1:])
    return data, offsets


def _corpus(rng: random.Random, mode: int):
    if mode == 0:  # all-escape exact slot fill: empty table, n >= 8
        vals = [bytes(rng.randrange(128, 256) for _ in range(rng.randrange(0, 64)))
                for _ in range(rng.randrange(8, 40))]
        return vals, train([])
    if mode == 1:  # rows longer than seg -> lane-split path
        vals = [bytes(rng.randrange(256) for _ in range(rng.randrange(2000, 9000)))
                for _ in range(rng.randrange(3, 12))]
        return vals, train(vals[:256])
    if mode == 2:  # tails straddling the 8-byte main/tail boundary
        vals = [bytes(rng.randrange(256) for _ in range(rng.choice([0, 1, 7, 8, 9, 15, 16, 17])))
                for _ in range(rng.randrange(8, 80))]
        return vals, train(vals[:256])
    if mode == 3:  # texty with binary tails
        base = b"the quick brown fox jumps over https://example.com/path?q=1 "
        vals = [base * rng.randrange(0, 40)
                + bytes(rng.randrange(256) for _ in range(rng.randrange(0, 10)))
                for _ in range(rng.randrange(8, 60))]
        return vals, train(vals[:256])
    if mode == 4:  # NUL floods (real zeros vs the zero-padded tail load)
        vals = [b"\x00" * rng.randrange(0, 300)
                + bytes(rng.randrange(3) for _ in range(rng.randrange(0, 50)))
                for _ in range(rng.randrange(8, 50))]
        return vals, train(vals[:256])
    if mode == 5:  # empties interleaved with giant rows (refill churn)
        vals = []
        for _ in range(rng.randrange(8, 30)):
            r = rng.random()
            vals.append(b"" if r < 0.3 else (
                b"ab" * 5000 if r < 0.4 else
                bytes(rng.randrange(256) for _ in range(rng.randrange(1, 100)))))
        return vals, train([v for v in vals if v][:256] or [b"x"])
    if mode == 6:  # 0xFF escape-byte floods under a trained table
        vals = [b"\xff" * rng.randrange(0, 200) for _ in range(rng.randrange(8, 40))]
        return vals, train([b"\xff\xff\xff\xff"] * 10)
    vals = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 700)))
            for _ in range(rng.randrange(0, 100))]
    return vals, train(vals[:512])


@pytest.mark.parametrize("trial", range(TRIALS))
def test_native_buffer_math_fuzz(trial):
    rng = random.Random(1000 + trial)
    vals, c = _corpus(rng, trial % 8)
    t = EncoderTables.from_compressor(c)
    data, offs = to_buffers(vals)
    segs = (2048, 512, 64) if trial % 8 == 1 else (2048, 64)
    for seg in segs:
        en, eo = encode_chunk(data, offs, t, seg=seg)
        rn, ro = encode_chunk(data, offs, t, seg=seg, force_numpy=True)
        assert np.array_equal(en, rn) and np.array_equal(eo, ro), \
            f"native != numpy (seg={seg})"
        de, do = decode_chunk(en, eo, t.sym_mat, t.sym_lens)
        assert de.tobytes() == data.tobytes() and np.array_equal(do, offs), \
            f"round-trip failed (seg={seg})"
