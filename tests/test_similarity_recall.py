"""Measured-recall gates for the ANN paths against exact cosine.

IVF (the primary scale ANN) carries a hard recall floor; the driver
oracle asserts recall >= 0.5, this pins >= 0.6 at nprobe=6/16 (measured
0.7-1.0) so a quantizer/probe regression is caught before it erodes
toward the oracle floor. Sign-LSH recall is structurally weak on this
corpus (near-uniform 64-dim vectors: top-10 cosine ~0.3 vs median 0.0),
so its gate is structural: bucket probing + pool expansion must return k
valid results.
"""

import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.similarity import (
    build_ivf_index,
    build_lsh_index,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def ivf(spark, emb):
    idx, cents = build_ivf_index(emb, n_centroids=16)
    idx = idx.cache()
    idx.count()
    return idx, cents


@pytest.mark.parametrize("query_id", [0, 1, 2])
def test_ivf_recall_at_10(spark, emb, ivf, query_id):
    idx, cents = ivf
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == query_id).select("embedding").first()[0]]
    corpus_idx = idx.filter(F.col("vec_id") != query_id)
    approx = {r["vec_id"] for r in
              ivf_topk(corpus_idx, cents, q, k=10, nprobe=6).collect()}
    exact = {r["vec_id"] for r in
             cosine_topk(emb.filter(F.col("vec_id") != query_id), q, k=10).collect()}
    assert len(approx) == 10
    recall = len(approx & exact) / 10
    assert recall >= 0.6, f"query {query_id}: recall {recall}"


def test_ivf_full_probe_is_exact(spark, emb, ivf):
    """nprobe = n_centroids degenerates to exact brute force."""
    idx, cents = ivf
    q = [float(x) for x in emb.select("embedding").first()[0]]
    approx = {r["vec_id"] for r in ivf_topk(idx, cents, q, k=10, nprobe=16).collect()}
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    assert approx == exact


def test_lsh_probe_pool_expansion_reaches_k(spark, emb):
    q = [float(x) for x in emb.select("embedding").first()[0]]
    idx = build_lsh_index(emb, dim=len(q), n_planes=8)
    res = lsh_topk(idx, q, k=10, n_planes=8, indexed=True, min_candidates=10).collect()
    assert len(res) == 10
    assert len({r["vec_id"] for r in res}) == 10


def test_embedding_neardup_pairs_exact_dups_and_threshold(spark):
    from fsst_spark.pipeline.similarity import embedding_neardup_pairs
    import numpy as np

    rng = np.random.default_rng(31)
    base = rng.normal(size=(40, 16)).astype("float32")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(40)]
    # exact duplicates of vectors 0 and 7
    rows += [(100, base[0].tolist()), (107, base[7].tolist())]
    # a near-dup of vector 3 (tiny perturbation, cosine ~0.9999)
    near = base[3] + 0.001 * rng.normal(size=16).astype("float32")
    rows.append((103, (near / np.linalg.norm(near)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_neardup_pairs(df, threshold=0.95, n_centroids=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # random unit 16-dim vectors essentially never reach cosine 0.95, so the
    # result must be exactly the injected duplicates/near-dup
    assert got == {(0, 100), (7, 107), (3, 103)}, got


def test_cosine_topk_k_guard():
    """k is metadata-scale by contract (the rank step collects top-k into
    one aggregate row); a silent k=10^7 request must raise instead."""
    import pytest

    from fsst_spark.pipeline.similarity import cosine_topk

    with pytest.raises(ValueError, match="ivf_topk_batch"):
        cosine_topk(None, [1.0, 0.0], k=10_001)


def test_lsh_multitable_recall_at_10(spark, emb):
    """Multi-table LSH recall gate (promoted from structural, r4 verdict
    #9): 8 independent tables, candidate pool capped at ~30% of the
    corpus, MEAN recall@10 over 3 queries >= 0.5 vs exact cosine.
    Deterministic: fixed seeds, fixed corpus. Single-table multi-probe
    measured ~0.43 at a larger pool on these structure-free embeddings —
    the union of independent tables is what crosses the bar (IVF remains
    the primary ANN; it reaches higher recall on a smaller pool)."""
    n = emb.count()
    idx = build_lsh_index(emb, dim=64, n_planes=10, n_tables=8).cache()
    idx.count()
    recalls = []
    for query_id in (0, 1, 2):
        q = [float(x) for x in
             emb.filter(F.col("vec_id") == query_id).select("embedding").first()[0]]
        corpus_idx = idx.filter(F.col("vec_id") != query_id)
        approx = {r["vec_id"] for r in
                  lsh_topk(corpus_idx, q, k=10, n_planes=10, n_tables=8,
                           indexed=True,
                           min_candidates=int(0.3 * n)).collect()}
        exact = {r["vec_id"] for r in
                 cosine_topk(emb.filter(F.col("vec_id") != query_id),
                             q, k=10).collect()}
        assert len(approx) == 10
        recalls.append(len(approx & exact) / 10)
    idx.unpersist()
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, recalls
