"""Similarity search over the ENCODED store: IVF-clustered layout.

``build_ann_store`` physically clusters an embedding table by IVF cell at
encode time (the same k-means coarse quantizer as ``similarity.build_ivf_
index``), so each encoded chunk covers a tight ``ivf_cell`` range and the
store's ordinary int zone maps ARE the inverted index: probing ``nprobe``
cells is one ``decode_filtered('ivf_cell', 'in', cells)`` — non-probed
chunks' embedding payloads are never read. This is the faiss IVF shape
(Johnson et al., "Billion-scale similarity search with GPUs") re-expressed
as a layout decision over this engine's existing machinery: no bespoke
index files beyond a tiny centroid sidecar, and the store remains a
normal encoded table (round-trips bit-identically, supports every other
pushdown).

At 10^12 vectors: the quantizer trains on a driver-side sample (metadata
scale), assignment is one vectorized pandas-UDF pass, the range shuffle
on ``ivf_cell`` is the one clustering shuffle any IVF build pays, and a
query decodes ``nprobe / n_cells`` of the corpus. Exactness knob:
``nprobe = n_cells`` probes everything — brute-force-exact, which is what
the DuckDB oracle checks; recall at small nprobe is gated in tests.

Reference tie: the reference kernel (spiraldb/fsst, src/lib.rs) has no
vector search; this module exists for the north rule's training-data
pipeline scope (embedding similarity over the compressed corpus).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .similarity import _spherical_kmeans, cosine_topk, ivf_topk_batch

CELL_COL = "ivf_cell"
QCOL = "vec_q"
_SIDECAR = "ann/centroids.json"


def build_ann_store(spark, df: DataFrame, out_dir: str, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_cells: int = 16, sample_rows: int = 4096,
                    seed: int = 5, num_partitions: int | None = None,
                    chunk_bytes: int = 32 << 20,
                    quantize: bool = False) -> np.ndarray:
    """Encode ``df`` as an IVF-clustered store; returns the centroid matrix.

    Adds an ``ivf_cell`` int column (nearest spherical-k-means centroid by
    cosine), range-clusters the layout on it via ``encode_job(sort_key=
    ...)``, and persists the centroids as a JSON sidecar under
    ``<out>/ann/`` (driver-side, a few KB — read back by every query).

    ``quantize=True`` additionally stores a ``vec_q: array<tinyint>``
    SQ8 column (faiss ScalarQuantizer shape: per-vector symmetric int8,
    ``round(127 * v / max|v|)``). Cosine is scale-invariant, so the
    per-vector scale needs no storage at all — the int8 vector ranks by
    ``cos(vec_q, q)`` directly. The child int8 stream FOR/bit-packs to
    ~1 byte/dim vs 4 for the float payload, so a quantized candidate
    scan reads ~4x fewer payload bytes; queries that pass ``refine``
    re-rank the approximate pool against the exact float vectors of just
    those ids (bloom/zone point-probe decode), keeping the float payload
    out of the hot path entirely."""
    from pyspark.sql.functions import pandas_udf

    from ..jobs.encode import encode_job

    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float32)
    if len(sample) == 0:
        raise ValueError("cannot build an ANN store over an empty frame")
    C = _spherical_kmeans(sample, n_cells, seed=seed)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float32)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    clustered = df.withColumn(CELL_COL, assign(F.col(vec_col)))
    if quantize:
        @pandas_udf("array<tinyint>")
        def sq8(vecs: pd.Series) -> pd.Series:
            M = np.stack(vecs.to_numpy()).astype(np.float32)
            scale = np.maximum(np.abs(M).max(axis=1, keepdims=True), 1e-12)
            q = np.rint(M * (127.0 / scale)).astype(np.int8)
            return pd.Series(list(q))

        clustered = clustered.withColumn(QCOL, sq8(F.col(vec_col)))
    encode_job(spark, clustered, out_dir, sort_key=CELL_COL,
               unique_col=id_col, num_partitions=num_partitions,
               chunk_bytes=chunk_bytes, resume=False).collect()

    os.makedirs(os.path.join(out_dir, "ann"), exist_ok=True)
    side = {"vec_col": vec_col, "id_col": id_col, "seed": seed,
            "n_cells": int(len(C)), "centroids": C.astype(float).tolist(),
            "quantized": bool(quantize)}
    tmp = os.path.join(out_dir, _SIDECAR + ".tmp")
    with open(tmp, "w") as f:
        json.dump(side, f)
    os.replace(tmp, os.path.join(out_dir, _SIDECAR))
    return C


def load_centroids(out_dir: str) -> tuple[np.ndarray, dict]:
    with open(os.path.join(out_dir, _SIDECAR)) as f:
        side = json.load(f)
    return np.asarray(side["centroids"], dtype=np.float32), side


def ann_store_topk(spark, out_dir: str, query: list[float], k: int = 10,
                   nprobe: int = 4, refine: int | None = None) -> DataFrame:
    """Top-k cosine over an IVF-clustered encoded store.

    Ranks cells by centroid-query cosine, selectively decodes ONLY the
    chunks whose ``ivf_cell`` zone intersects the probed cells (IN-list
    zone + dict + bloom pruning — the store's standard path), then exact
    cosine over the decoded candidates. ``nprobe >= n_cells`` degrades
    gracefully to exact brute force.

    ``refine=m`` (quantized stores only) switches to the two-stage SQ8
    scan: the probed cells decode just the int8 ``vec_q`` payload (~4x
    fewer bytes than the floats), the approximate cosine keeps a pool of
    ``k*m`` candidates, and ONLY those ids decode their float vectors
    (``decode_semijoin`` — bloom/zone point probes) for the exact
    re-rank. Recall depends on m like faiss SQ8+refine: the pool must
    contain the true top-k; m=4 is ~exact on real embeddings and the
    recall gate in tests pins it."""
    from ..jobs.decode import decode_filtered, decode_job, decode_semijoin

    C, side = load_centroids(out_dir)
    q = np.asarray(query, dtype=np.float32)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    order = np.argsort(-(C @ q), kind="stable")
    probe = [int(x) for x in order[: max(int(nprobe), 1)]]
    full_probe = len(probe) >= len(C)

    def cells_decode(columns):
        # full probe == every cell: the IN-list filter (and its whole
        # zone/dict/bloom pruning stack) can prune nothing and every row
        # passes — decode the projection directly and skip the ivf_cell
        # column entirely (§1.2: don't compute what you throw away)
        if full_probe:
            return decode_job(spark, out_dir, columns)
        return decode_filtered(spark, out_dir, CELL_COL, "in", probe,
                               columns=columns)
    if refine is not None:
        if not side.get("quantized"):
            raise ValueError(
                "refine= needs a quantized store; rebuild with "
                "build_ann_store(quantize=True)")
        pool = cells_decode([side["id_col"], QCOL])
        approx = cosine_topk(pool, query, k=int(k) * max(int(refine), 1),
                             vec_col=QCOL, id_col=side["id_col"])
        ids = [r[side["id_col"]] for r in approx.collect()]  # <= k*m rows
        exact = decode_semijoin(spark, out_dir, side["id_col"], ids,
                                columns=[side["id_col"], side["vec_col"]])
        return cosine_topk(exact, query, k=k,
                           vec_col=side["vec_col"], id_col=side["id_col"])
    cand = cells_decode([side["id_col"], side["vec_col"]])
    return cosine_topk(cand, query, k=k,
                       vec_col=side["vec_col"], id_col=side["id_col"])


def ann_store_topk_batch(spark, out_dir: str, queries: DataFrame,
                         k: int = 10, nprobe: int = 4,
                         q_id_col: str = "query_id",
                         q_vec_col: str = "embedding") -> DataFrame:
    """Batch k-NN join over an IVF-clustered encoded store.

    Each query's nprobe cells come from one vectorized pandas-UDF pass;
    the UNION of probed cells (<= n_cells ints, tiny at any query-batch
    size) drives ONE selective decode — chunks outside every query's
    probe set never read their embedding payloads — and the decoded
    candidates feed ``similarity.ivf_topk_batch`` (broadcast probe join on
    the cell column, shuffle-free per-partition top-k combine, final
    per-query rank window). Returns (query_id, id, rank). ``nprobe >=
    n_cells`` decodes everything = exact brute-force k-NN join."""
    from ..jobs.decode import decode_filtered, decode_job

    C, side = load_centroids(out_dir)
    np_eff = max(1, min(int(nprobe), len(C)))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float32)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(M @ C.T), axis=1, kind="stable")[:, :np_eff]
        return pd.Series(list(order.astype(np.int32)))

    if np_eff >= len(C):
        # every query probes every cell: skip the probe-union collect AND
        # the IN-list pruning stack — nothing can be pruned
        cand = decode_job(spark, out_dir,
                          [side["id_col"], side["vec_col"], CELL_COL])
    else:
        cells = (queries.select(
            F.explode(probes(F.col(q_vec_col))).alias("c"))
            .distinct().collect())
        probe = sorted(int(r["c"]) for r in cells)
        cand = decode_filtered(
            spark, out_dir, CELL_COL, "in", probe,
            columns=[side["id_col"], side["vec_col"], CELL_COL])
    cand = cand.withColumnRenamed(CELL_COL, "centroid")
    return ivf_topk_batch(cand, C, queries, k=k, nprobe=np_eff,
                          vec_col=side["vec_col"], id_col=side["id_col"],
                          q_id_col=q_id_col, q_vec_col=q_vec_col)
