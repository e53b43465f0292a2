"""split_docs (training-window document splitting) and BPE training
(distributed word-frequency reduction + merge loop)."""

import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.textprep import (
    bpe_pair_counts,
    bpe_reference_merges,
    bpe_train,
    split_docs,
    word_freqs,
)


def _py_split(text: str, max_words: int, stride: int | None = None):
    words = [w for w in text.split() if w]
    step = stride or max_words
    if not words:
        return []
    pieces = []
    i = 0
    pid = 0
    while i < len(words):
        chunk = words[i:i + max_words]
        pieces.append((pid, " ".join(chunk), min(max_words, len(words) - i)))
        pid += 1
        i += step
    return pieces


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "a b c d e f g"),
        (1, "one"),
        (2, ""),
        (3, "   "),
        (4, "  x   y\tz\n w  "),
        (5, " ".join(f"w{i}" for i in range(25))),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_split_docs_matches_python_reference(spark, tiny):
    got = {(r["doc_id"], r["piece_id"]): (r["piece_text"], r["piece_words"])
           for r in split_docs(tiny, max_words=3).collect()}
    want = {}
    for did, text in tiny.collect():
        for pid, pt, pw in _py_split(text, 3):
            want[(did, pid)] = (pt, pw)
    assert got == want
    # zero-word docs produce no pieces
    assert not any(k[0] in (2, 3) for k in got)


def test_split_docs_overlapping_stride(spark, tiny):
    got = {(r["doc_id"], r["piece_id"]): (r["piece_text"], r["piece_words"])
           for r in split_docs(tiny, max_words=4, stride=2).collect()}
    want = {}
    for did, text in tiny.collect():
        for pid, pt, pw in _py_split(text, 4, 2):
            want[(did, pid)] = (pt, pw)
    assert got == want


def test_split_docs_reassembles_original(spark, tiny):
    # disjoint windows: concatenating pieces restores the normalized text
    pieces = (split_docs(tiny, max_words=3)
              .orderBy("doc_id", "piece_id").collect())
    joined: dict = {}
    for r in pieces:
        joined[r["doc_id"]] = (joined.get(r["doc_id"], "") + " "
                               + r["piece_text"]).strip()
    for did, text in tiny.collect():
        norm = " ".join(w for w in text.split() if w)
        if norm:
            assert joined[did] == norm


def test_split_docs_validation(spark, tiny):
    with pytest.raises(ValueError):
        split_docs(tiny, max_words=0)
    with pytest.raises(ValueError):
        split_docs(tiny, max_words=4, stride=5)
    with pytest.raises(ValueError):
        split_docs(tiny, max_words=4, stride=0)


def test_word_freqs_and_pair_counts(spark):
    df = spark.createDataFrame(
        [(0, "low low lower ab"), (1, "low b ab")],
        "doc_id bigint, text string")
    wf = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
    assert wf == {"low": 3, "lower": 1, "ab": 2, "b": 1}
    pc = {(r["left"], r["right"]): r["freq"]
          for r in bpe_pair_counts(df).collect()}
    # 1-char words contribute nothing; pairs weighted by word freq
    assert pc[("l", "o")] == 4 and pc[("o", "w")] == 4
    assert pc[("w", "e")] == 1 and pc[("a", "b")] == 2
    assert ("b", None) not in pc


def test_bpe_reference_classic_example():
    # Sennrich et al. 2016 running example: es -> est -> lo -> low
    merges = bpe_reference_merges(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 4)
    assert [(a, b) for a, b, _ in merges] == [
        ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    assert [f for _, _, f in merges] == [9, 9, 7, 7]


def test_bpe_train_matches_reference_loop(spark):
    rows = [(0, "low low low low low lower lower newest newest newest "
                "newest newest newest widest widest widest")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [(r["left"], r["right"], r["freq"])
           for r in bpe_train(df, n_merges=4, vocab_cap=100).collect()]
    want = bpe_reference_merges(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 4)
    assert got == want


def test_bpe_train_exhausts_gracefully(spark):
    df = spark.createDataFrame([(0, "ab ab")], "doc_id bigint, text string")
    got = bpe_train(df, n_merges=10, vocab_cap=100).collect()
    # only one pair exists; after merging it there is nothing left
    assert len(got) == 1 and (got[0]["left"], got[0]["right"]) == ("a", "b")


def test_bpe_first_merge_agrees_with_pair_counts(spark):
    df = spark.createDataFrame(
        [(0, "spark spark spark batch batch stream")],
        "doc_id bigint, text string")
    top = bpe_pair_counts(df, k=1).collect()[0]
    first = bpe_train(df, n_merges=1, vocab_cap=100).collect()[0]
    assert (top["left"], top["right"], top["freq"]) == \
        (first["left"], first["right"], first["freq"])
