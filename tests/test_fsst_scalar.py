"""Golden-vector and round-trip tests for the scalar FSST kernel.

Mirrors the reference test suite:
  * escape-format golden vector ... reference src/builder.rs:858-893
  * manual 1-symbol tables ........ reference tests/correctness.rs:37-47,
                                    src/lib.rs:434-449 (doctest)
  * empty corpus / empty input .... reference tests/correctness.rs:26-34
  * binary with NULs .............. reference tests/correctness.rs:50-55
  * large cycled corpus ........... reference tests/correctness.rs:58-71
  * CJK multi-byte UTF-8 .......... reference tests/correctness.rs:74-82
"""

import hashlib
import random

import pytest

from fsst_spark.kernel.fsst import (
    ESCAPE_CODE,
    CompressorBuilder,
    deserialize_table,
    make_sample,
    serialize_table,
    sym_from_bytes,
    train,
)

DECLARATION = (
    b"When in the Course of human events, it becomes necessary for one "
    b"people to dissolve the political bands which have connected them "
    b"with another, and to assume among the powers of the earth, the "
    b"separate and equal station to which the Laws of Nature and of "
    b"Nature's God entitle them, a decent respect to the opinions of "
    b"mankind requires that they should declare the causes which impel "
    b"them to the separation."
)

CJK = (
    "孫子曰：兵者，國之大事，死生之地，存亡之道，不可不察也。"
    "故經之以五事，校之以計，而索其情：一曰道，二曰天，三曰地，四曰將，五曰法。"
).encode("utf-8")


def roundtrip(corpus: list[bytes], probe: bytes | None = None) -> None:
    c = train(corpus)
    d = c.decompressor()
    for v in corpus if probe is None else [probe]:
        assert d.decompress(c.compress(v)) == v


def test_escape_golden_vector():
    text = b"hello hello hello hello hello"
    table = train([text] * 5)
    compressed = table.compress(text)
    assert all(b != ESCAPE_CODE for b in compressed)
    assert len(compressed) < len(text)
    out = table.compress(b"xyz123")
    expected = bytes(
        [ESCAPE_CODE, ord("x"), ESCAPE_CODE, ord("y"), ESCAPE_CODE, ord("z"),
         ESCAPE_CODE, ord("1"), ESCAPE_CODE, ord("2"), ESCAPE_CODE, ord("3")]
    )
    assert out == expected
    assert table.decompressor().decompress(out) == b"xyz123"


def test_one_symbol_manual_table():
    b = CompressorBuilder()
    assert b.insert(sym_from_bytes(b"hello"), 5)
    c = b.build()
    assert c.compress(b"hello") == bytes([0])

    b = CompressorBuilder()
    assert b.insert(sym_from_bytes(b"aaaaaaaa"), 8)
    c = b.build()
    assert c.compress(b"aaaaaaaa") == bytes([0])

    b = CompressorBuilder()
    assert b.insert(sym_from_bytes(b"\x01"), 1)
    c = b.build()
    assert c.compress(b"\x01") == bytes([0])


def test_empty_corpus_roundtrips_via_escapes():
    c = train([])
    assert c.n_symbols == 0
    assert c.compress(b"") == b""
    data = b"anything at all \x00\xff"
    out = c.compress(data)
    assert len(out) == 2 * len(data)
    assert c.decompressor().decompress(out) == data


def test_zeros_and_binary():
    corpus = [bytes([0, 1, 2, 3, 4, 0])]
    roundtrip(corpus)
    roundtrip([b"\x00" * 100, b"\xff" * 100, b"\x00\xff" * 50])


def test_declaration_roundtrip_and_ratio():
    corpus = [DECLARATION] * 10
    c = train(corpus)
    enc = c.compress(DECLARATION)
    assert c.decompressor().decompress(enc) == DECLARATION
    # The reference achieves ~2-3x on English prose (FSST paper sec 6).
    assert len(enc) * 2 < len(DECLARATION), f"ratio too weak: {len(DECLARATION)/len(enc):.2f}"


def test_cjk_roundtrip():
    roundtrip([CJK] * 4)


def test_large_cycled_corpus():
    big = (DECLARATION * (1 << 14 // len(DECLARATION) + 1))[: 1 << 14]
    big = big * 64  # ~1 MiB single value: exercises tail + long-input paths
    c = train([big])
    enc = c.compress(big)
    assert c.decompressor().decompress(enc) == big
    assert len(enc) < len(big) // 2


def test_make_sample_deterministic_and_bounded():
    vals = [bytes([i % 251]) * (37 * (i % 13) + 1) for i in range(500)]
    s1 = make_sample(vals)
    s2 = make_sample(vals)
    assert s1 == s2
    assert sum(len(x) for x in s1) < (1 << 15)
    # small corpora are used whole
    assert make_sample([b"abc"]) == [b"abc"]


def test_random_roundtrip_fuzz():
    rng = random.Random(42)
    corpus = []
    for _ in range(200):
        n = rng.randrange(0, 300)
        corpus.append(bytes(rng.randrange(256) for _ in range(n)))
    c = train(corpus)
    d = c.decompressor()
    for v in corpus:
        assert d.decompress(c.compress(v)) == v


def test_table_serialization_roundtrip():
    c = train([DECLARATION] * 3)
    blob = c.table_bytes()
    syms, lens, hs = deserialize_table(blob)
    assert syms == c.symbols
    assert lens == c.lengths
    assert hs == c.has_suffix_code
    assert serialize_table(syms, lens, hs) == blob


def test_training_deterministic():
    corpus = [DECLARATION, CJK, b"", b"aaa", DECLARATION * 5]
    h1 = hashlib.sha256(train(corpus).table_bytes()).hexdigest()
    h2 = hashlib.sha256(train(corpus).table_bytes()).hexdigest()
    assert h1 == h2


@pytest.mark.parametrize("n", [1, 2, 3, 7, 8, 9, 15, 16, 17, 511, 512, 513])
def test_boundary_lengths(n):
    v = (DECLARATION * 3)[:n]
    c = train([v] * 3)
    assert c.decompressor().decompress(c.compress(v)) == v
