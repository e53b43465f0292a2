"""The native (C) training counter must produce the IDENTICAL symbol table
to the scalar compress_count oracle — the table defines the compressed
bytes, so any divergence would break size parity and resume checksums."""
import random

import pytest

from fsst_spark.kernel import fsst as FS
from fsst_spark.kernel.native import get_lib


def scalar_train(values):
    builder = FS.CompressorBuilder()
    if not values:
        return builder.build()
    counter = FS._Counter()
    sample = FS.make_sample(values)
    for frac in FS.GENERATIONS:
        for i, line in enumerate(sample):
            if frac < 128 and (FS.fsst_hash(i) & 127) > frac:
                continue
            builder.compress_count(line, counter)
        builder.optimize(counter, frac)
        counter.clear()
    return builder.build()


def corpora():
    random.seed(11)
    out = []
    for _ in range(8):
        vals = []
        for _ in range(random.randint(1, 120)):
            kind, ln = random.random(), random.randint(0, 2500)
            if kind < 0.3:
                vals.append(bytes(random.getrandbits(8) for _ in range(ln)))
            elif kind < 0.6:
                vals.append(b"https://example.com/p/%d?q=a " % random.randint(0, 99)
                            * (ln // 28 + 1))
            elif kind < 0.8:
                vals.append(b"ab" * (ln // 2))
            else:
                vals.append(b"")
        out.append(vals)
    out.append([])  # empty corpus
    out.append([b""])  # single empty value
    out.append([b"x"])  # sub-word value
    return out


@pytest.mark.skipif(get_lib() is None, reason="no C compiler available")
@pytest.mark.parametrize("idx", range(11))
def test_native_train_matches_scalar(idx):
    vals = corpora()[idx]
    a = FS.train(vals)
    b = scalar_train(vals)
    assert a.symbols == b.symbols
    assert a.lengths == b.lengths
    assert a.n_symbols == b.n_symbols
    assert a.has_suffix_code == b.has_suffix_code
    assert list(a.codes_two_byte) == list(b.codes_two_byte)
    assert list(a.pht_code) == list(b.pht_code)
    # and the table produces identical bytes through the scalar encoder
    for v in vals[:5]:
        assert a.compress(v) == b.compress(v)
