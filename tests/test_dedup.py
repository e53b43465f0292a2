"""Unit tests for near-dup resolution (connected components + survivor
selection) and the memory-bounded rolling shingle hash."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.dedup import (
    _batch_shingle_hashes,
    _shingle_hashes,
    _window_hashes,
    connected_components,
    neardup_dedup,
)


# ---------------------------------------------------------------------------
# rolling hash: k-pass accumulation must equal the naive windowed spec
# ---------------------------------------------------------------------------
def _spec_window_hashes(buf: np.ndarray, k: int) -> np.ndarray:
    """The O(8k B/window) sliding_window_view formulation the production
    k-pass version replaced (kept here as the spec)."""
    win = np.lib.stride_tricks.sliding_window_view(buf, k).astype(np.uint64)
    mul = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    h = (win * mul).sum(axis=1, dtype=np.uint64)
    return (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)


@pytest.mark.parametrize("k", [2, 5, 9])
def test_window_hashes_match_spec(k):
    rng = np.random.default_rng(7)
    for n in (k, k + 1, 100, 4096):
        buf = rng.integers(0, 256, n, dtype=np.uint8)
        assert (_window_hashes(buf, k) == _spec_window_hashes(buf, k)).all()


def test_batch_shingle_hashes_match_per_doc():
    rng = np.random.default_rng(11)
    datas = [bytes(rng.integers(0, 256, int(n), dtype=np.uint8))
             for n in rng.integers(0, 2000, 40)]
    h, bounds = _batch_shingle_hashes(datas, 5)
    for i, d in enumerate(datas):
        seg = np.unique(h[bounds[i]:bounds[i + 1]])
        assert (seg == _shingle_hashes(d, 5)).all(), i


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------
def test_connected_components_chain_clique_pair(spark):
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_path_converges(spark):
    # a 64-node path exercises the pointer-jumping acceleration: plain
    # neighbor-min would need 63 rounds, far beyond max_rounds
    edges = [(i, i + 1) for i in range(63)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in connected_components(pairs, max_rounds=12).collect()}
    assert got == {i: 0 for i in range(64)}


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


# ---------------------------------------------------------------------------
# neardup_dedup
# ---------------------------------------------------------------------------
def test_neardup_dedup_with_prebuilt_pairs(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 5), (5, 7), (2, 3)], "id_a long, id_b long")
    surv = sorted(r["doc_id"] for r in neardup_dedup(df, pairs=pairs).collect())
    # clusters {1,5,7} -> keep 1; {2,3} -> keep 2; singletons kept
    assert surv == [0, 1, 2, 4, 6]


def test_neardup_dedup_minhash_drops_exact_dups(spark):
    base = [(i, f"the quick brown fox jumps over the lazy dog number {i} "
                f"with plenty of shingle material to hash " * 3) for i in range(20)]
    dups = [(100 + i, base[i][1]) for i in range(0, 20, 4)]  # 5 exact copies
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    surv = neardup_dedup(df, method="minhash", threshold=0.7)
    ids = sorted(r["doc_id"] for r in surv.collect())
    assert all(i < 100 for i in ids), ids  # every injected copy dropped
    texts = [r["text"] for r in surv.collect()]
    assert len(set(texts)) == len(texts)  # survivors pairwise distinct


def test_neardup_dedup_simhash_method(spark):
    # genuinely dissimilar token streams (near-identical templates would
    # legitimately land within hamming<=3 of each other — that's SimHash
    # working, not a bug)
    rng = np.random.default_rng(3)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26, 8)) for _ in range(400)]
    base = [(i, " ".join(words[i * 40:(i + 1) * 40])) for i in range(10)]
    dups = [(200, base[0][1]), (201, base[3][1])]
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    surv = sorted(r["doc_id"] for r in neardup_dedup(df, method="simhash").collect())
    assert 200 not in surv and 201 not in surv
    assert set(range(10)) <= set(surv)


def test_neardup_dedup_bad_method(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        neardup_dedup(df, method="nope")


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------
def _spec_winnow(h: np.ndarray, window: int) -> np.ndarray:
    """Naive per-window min loop — the published winnowing selection."""
    if len(h) == 0:
        return h
    if len(h) <= window:
        return np.unique(np.array([h.min()], dtype=h.dtype))
    mins = [h[i:i + window].min() for i in range(len(h) - window + 1)]
    return np.unique(np.array(mins, dtype=h.dtype))


@pytest.mark.parametrize("window", [1, 4, 8])
def test_winnow_select_matches_spec(window):
    from fsst_spark.pipeline.dedup import _winnow_select

    rng = np.random.default_rng(13)
    for n in (0, 1, window, window + 1, 100, 3000):
        h = rng.integers(0, 2**63, n, dtype=np.uint64)
        assert (_winnow_select(h, window) == _spec_winnow(h, window)).all(), n


def test_winnow_guarantee_shared_substring():
    """Winnowing guarantee (SIGMOD'03): docs sharing a substring of at
    least window+k-1 bytes share at least one selected hash."""
    from fsst_spark.pipeline.dedup import _batch_shingle_hashes, _winnow_select

    k, w = 5, 8
    rng = np.random.default_rng(17)
    shared = bytes(rng.integers(97, 123, w + k - 1, dtype=np.uint8))
    a = bytes(rng.integers(65, 91, 300, dtype=np.uint8)) + shared
    b = shared + bytes(rng.integers(48, 58, 300, dtype=np.uint8))
    h, bounds = _batch_shingle_hashes([a, b], k)
    fa = set(_winnow_select(h[bounds[0]:bounds[1]], w).tolist())
    fb = set(_winnow_select(h[bounds[1]:bounds[2]], w).tolist())
    assert fa & fb


def test_winnow_neardup_pairs_overlap_vs_disjoint(spark):
    from fsst_spark.pipeline.dedup import winnow_neardup_pairs

    rng = np.random.default_rng(23)
    mk = lambda n: "".join(chr(97 + c) for c in rng.integers(0, 26, n))
    shared = mk(120)
    rows = [
        (1, mk(200) + shared),          # contains shared block
        (2, shared + mk(200)),          # contains shared block
        (3, mk(400)),                   # unrelated
        (4, ""),                        # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in
           winnow_neardup_pairs(df, min_shared=2).collect()}
    assert (1, 2) in got
    assert all(p == (1, 2) for p in got), got


def test_connected_components_warns_on_nonconvergence(spark):
    """Exhausting max_rounds with changes still pending must WARN (silent
    partial labels under-deduplicate)."""
    # a long path graph: 0-1-2-...-19; one round of propagation + one
    # pointer-jump hop cannot reach the min label at the far end
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(pairs, max_rounds=1).collect()
