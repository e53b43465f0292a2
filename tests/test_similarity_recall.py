"""Measured-recall gate for the multi-probe LSH ANN against exact cosine.

The driver oracle asserts recall >= 0.5; this pins the measured number
higher (>= 0.8) so a probe-ordering or pool-expansion regression is
caught before it erodes toward the oracle floor.
"""

import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.similarity import build_lsh_index, cosine_topk, lsh_topk

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.mark.parametrize("query_id", [0, 1, 2])
def test_multiprobe_recall_at_10(spark, emb, query_id):
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == query_id).select("embedding").first()[0]]
    corpus = emb.filter(F.col("vec_id") != query_id)
    idx = build_lsh_index(corpus, dim=len(q), n_planes=8).cache()
    approx = lsh_topk(idx, q, k=10, n_planes=8, indexed=True)
    exact = {r["vec_id"] for r in cosine_topk(corpus, q, k=10).collect()}
    got = {r["vec_id"] for r in approx.collect()}
    assert len(got) == 10
    recall = len(got & exact) / 10
    assert recall >= 0.8, f"query {query_id}: recall {recall}"


def test_probe_pool_expansion_reaches_k(spark, emb):
    """Even a tiny min_candidates must return k results (pool expands)."""
    q = [float(x) for x in emb.select("embedding").first()[0]]
    idx = build_lsh_index(emb, dim=len(q), n_planes=8)
    res = lsh_topk(idx, q, k=10, n_planes=8, indexed=True, min_candidates=1).collect()
    # pool stops at the first non-empty bucket >= 1 candidate; re-rank may
    # return fewer than k only if the probed buckets hold fewer rows
    assert 1 <= len(res) <= 10
    res2 = lsh_topk(idx, q, k=10, n_planes=8, indexed=True, min_candidates=10).collect()
    assert len(res2) == 10
