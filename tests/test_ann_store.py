"""ANN over the encoded store: IVF-cell-clustered layout where the chunk
zone maps are the inverted index (pipeline/ann_store.py). Gates: full
probe == exact cosine, recall floor at partial probe, and REAL chunk
pruning (probed cells decode a strict subset of chunks)."""

import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.ann_store import (ann_store_topk, build_ann_store,
                                           load_centroids)
from fsst_spark.pipeline.similarity import cosine_topk

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def store(spark, emb, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "store")
    build_ann_store(spark, emb, out, n_cells=16, num_partitions=8,
                    chunk_bytes=8 << 10)
    return out


def test_full_probe_is_exact(spark, emb, store):
    q = [float(x) for x in emb.select("embedding").first()[0]]
    got = [(r["vec_id"], r["rank"])
           for r in ann_store_topk(spark, store, q, k=10, nprobe=16).collect()]
    want = [(r["vec_id"], r["rank"])
            for r in cosine_topk(emb, q, k=10).collect()]
    assert got == want


@pytest.mark.parametrize("query_id", [0, 1, 2])
def test_recall_at_10(spark, emb, store, query_id):
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == query_id).select("embedding").first()[0]]
    approx = {r["vec_id"] for r in
              ann_store_topk(spark, store, q, k=10, nprobe=6).collect()}
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    assert len(approx) == 10
    recall = len(approx & exact) / 10
    assert recall >= 0.6, f"query {query_id}: recall {recall}"


def test_probe_prunes_chunks(spark, store):
    """The IVF probe must be a selective decode, not a scan: probing 2/16
    cells reads a strict minority of the store's chunks."""
    from fsst_spark.jobs.decode import decode_filtered, decode_job

    total = decode_job(spark, store).select("pid", "chunk_id").distinct().count()
    probed = (decode_filtered(spark, store, "ivf_cell", "in", [0, 1])
              .select("pid", "chunk_id").distinct().count())
    assert total >= 6, total  # enough chunks for the claim to mean something
    assert probed < total / 2, (probed, total)


def test_sidecar_roundtrip(store):
    C, side = load_centroids(store)
    assert C.shape[0] == side["n_cells"] == 16
    assert side["vec_col"] == "embedding" and side["id_col"] == "vec_id"
    # unit-norm centroids (spherical k-means invariant)
    import numpy as np

    norms = np.linalg.norm(C, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_store_is_a_normal_encoded_table(spark, emb, store):
    """Clustering is a layout decision, not a format fork: the ANN store
    decodes bit-identically (vec_id/label exact, embeddings equal) via the
    ordinary decode path."""
    from fsst_spark.jobs.decode import decode_job

    dec = decode_job(spark, store).select("vec_id", "embedding", "label")
    a = {r.vec_id: (r.embedding, r.label) for r in emb.collect()}
    b = {r.vec_id: (r.embedding, r.label) for r in dec.collect()}
    assert a == b


def test_batch_knn_full_probe_exact(spark, emb, store):
    """Batch k-NN at nprobe = n_cells == exact cosine top-k per query."""
    from fsst_spark.pipeline.ann_store import ann_store_topk_batch

    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = {(r["query_id"], r["vec_id"], r["rank"])
           for r in ann_store_topk_batch(
               spark, store, queries, k=5, nprobe=16).collect()}
    want = set()
    for qid in (0, 1, 2):
        q = [float(x) for x in
             emb.filter(F.col("vec_id") == qid).select("embedding").first()[0]]
        want |= {(qid, r["vec_id"], r["rank"])
                 for r in cosine_topk(emb, q, k=5).collect()}
    assert got == want


def test_batch_knn_matches_single_probe(spark, emb, store):
    """At partial nprobe the batch join must agree with the single-query
    path per query (same probe rule, same tie rule)."""
    from fsst_spark.pipeline.ann_store import (ann_store_topk,
                                               ann_store_topk_batch)

    queries = (emb.filter(F.col("vec_id") < 2)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = {(r["query_id"], r["vec_id"], r["rank"])
           for r in ann_store_topk_batch(
               spark, store, queries, k=5, nprobe=4).collect()}
    want = set()
    for qid in (0, 1):
        q = [float(x) for x in
             emb.filter(F.col("vec_id") == qid).select("embedding").first()[0]]
        want |= {(qid, r["vec_id"], r["rank"])
                 for r in ann_store_topk(spark, store, q, k=5,
                                         nprobe=4).collect()}
    assert got == want


def test_cli_ann_build_and_query(tmp_path):
    """spark-submit surface: ann-build then ann-query in fresh processes."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    def _run(*args):
        env = dict(os.environ, SPARK_GRAFT_CPUS="4")
        out = subprocess.run(
            [sys.executable, "-m", "fsst_spark.jobs.cli", *args],
            capture_output=True, text=True, timeout=420, env=env,
            cwd="/root/repo")
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    store = str(tmp_path / "annstore")
    r = _run("ann-build", "--input", f"{SF_DIR}/embeddings.parquet",
             "--out", store, "--cells", "8", "--partitions", "4")
    assert r["n_cells"] == 8 and r["rows"] > 0

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qvec = tbl.column("embedding")[0].as_py()
    # --vec=... form: a leading negative component would otherwise be
    # parsed as an option flag
    got = _run("ann-query", "--data", store,
               "--vec=" + ",".join(str(float(x)) for x in qvec),
               "-k", "5", "--nprobe", "8")
    assert len(got) == 5
    assert got[0]["rank"] == 1
    assert got[0]["vec_id"] == tbl.column("vec_id")[0].as_py()  # self is #1


def test_compaction_preserves_ann_probes(spark, emb, store, tmp_path):
    """compact_store preserves layout exactly, so the centroid sidecar
    travels with it and probes answer identically on the compacted store."""
    from fsst_spark.jobs.compact import compact_store

    out2 = str(tmp_path / "compacted_ann")
    compact_store(spark, store, out2, target_files=2).collect()
    q = [float(x) for x in emb.select("embedding").first()[0]]
    a = [(r["vec_id"], r["rank"])
         for r in ann_store_topk(spark, store, q, k=5, nprobe=4).collect()]
    b = [(r["vec_id"], r["rank"])
         for r in ann_store_topk(spark, out2, q, k=5, nprobe=4).collect()]
    assert a == b


@pytest.fixture(scope="module")
def qstore(spark, emb, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann_q") / "store")
    build_ann_store(spark, emb, out, n_cells=16, num_partitions=8,
                    chunk_bytes=8 << 10, quantize=True)
    return out


@pytest.mark.parametrize("query_id", [0, 3])
def test_sq8_refine_recall(spark, emb, qstore, query_id):
    """Two-stage SQ8 scan: int8 candidate pool + exact float re-rank. At
    full probe the only approximation is the pool, so recall@10 with a
    4x pool must be near-exact, and the self-query is always rank 1."""
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == query_id).select("embedding").first()[0]]
    rows = ann_store_topk(spark, qstore, q, k=10, nprobe=16,
                          refine=4).collect()
    got = {r["vec_id"] for r in rows}
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    assert len(rows) == 10
    assert rows[0]["vec_id"] == query_id  # self-similarity survives SQ8
    assert len(got & exact) >= 9, f"recall {len(got & exact)}/10"


def test_sq8_payload_is_smaller(spark, qstore):
    """The scan-bandwidth claim: the int8 vec_q payload must be well under
    half the float embedding payload (FOR/bitpack lands near 1 byte/dim
    vs 4 for floats)."""
    chunks = spark.read.parquet(f"{qstore}/chunks")
    sizes = {r["column"]: r["b"] for r in
             chunks.groupBy("column").agg(F.sum("enc_bytes").alias("b"))
             .collect()}
    assert sizes["vec_q"] < 0.4 * sizes["embedding"], sizes


def test_refine_requires_quantized_store(spark, emb, store):
    q = [float(x) for x in emb.select("embedding").first()[0]]
    with pytest.raises(ValueError, match="quantize"):
        ann_store_topk(spark, store, q, k=5, refine=4)


def test_quantized_store_still_roundtrips(spark, emb, qstore):
    """quantize=True adds a column; it must not disturb the float
    embeddings' bit-identical round-trip."""
    from fsst_spark.jobs.decode import decode_job

    dec = decode_job(spark, qstore, ["vec_id", "embedding"])
    joined = dec.withColumnRenamed("embedding", "emb2").join(emb, "vec_id")
    n_bad = joined.filter(F.col("emb2") != F.col("embedding")).count()
    assert n_bad == 0
    assert dec.count() == emb.count()
