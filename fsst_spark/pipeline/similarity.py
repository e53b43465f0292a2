"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k — exact baseline: JVM-side ``aggregate`` /
    ``zip_with`` dot products, no Python in the loop.
  * LSH-bucketed ANN — scale path: random-hyperplane signatures bucket the
    corpus; the query probes only its bucket (plus optional multi-probe),
    turning a full scan into a bucket scan. Signatures are computed once
    with a vectorized pandas UDF and persist as a narrow column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k. Returns (id, rank) ordered by
    (similarity desc, id) — rank is 1-based.

    k is capped at 10^4: the ranking collects the post-limit top-k into ONE
    aggregate row (deliberately — a global Window would funnel the whole
    scored corpus through one partition), so k must stay metadata-scale.
    Callers needing bulk neighborhoods should use ``ivf_topk_batch``."""
    if k > 10_000:
        raise ValueError(
            f"cosine_topk collects the top-k into a single driver-side "
            f"aggregate row; k={k} exceeds the metadata-scale cap of 10000 "
            "— use ivf_topk_batch for bulk k-NN")
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query)))
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sim = (_dot(vec, q) / (_norm(vec) * F.lit(qn))).alias("sim")
    ranked = (
        df.select(F.col(id_col), sim)
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )
    # rank the <= k post-limit rows without a window: a global Window (or
    # one whose constant partition key Catalyst folds away) drops WindowExec
    # onto the move-everything-to-one-partition path and logs a scale
    # warning on every run. Sorting the k collected structs (negated sim ->
    # ascending == sim desc, id breaks ties) gives the same 1-based rank.
    a = F.array_sort(F.collect_list(F.struct(
        (-F.col("sim")).alias("_ns"), F.col(id_col).alias("_id"))))
    return (
        ranked.agg(a.alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_s"))
        .select(F.col("_s._id").alias(id_col), (F.col("_pos") + 1).alias("rank"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: spherical k-means coarse quantizer
# ---------------------------------------------------------------------------
def _spherical_kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Unit-norm centroids by cosine k-means on a driver-side sample."""
    rng = np.random.default_rng(seed)
    X = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    C = X[rng.choice(len(X), min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def build_ivf_index(df: DataFrame, vec_col: str = "embedding", n_centroids: int = 16,
                    sample_rows: int = 4096, seed: int = 5) -> tuple[DataFrame, np.ndarray]:
    """(df + ``centroid`` column, centroid matrix) — the IVF build step.

    k-means runs on a driver-side sample (metadata-scale: sample_rows
    vectors); assignment is one vectorized pandas-UDF pass. At 10^12 rows
    the assigned frame is written partitioned by ``centroid`` so a probe
    reads only nprobe partitions — this is the standard IVF shape
    (Johnson et al., faiss) re-expressed on Spark."""
    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float32,
    )
    C = _spherical_kmeans(sample, n_centroids, seed=seed)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float32)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return df.withColumn("centroid", assign(F.col(vec_col))), C


def ivf_topk(indexed: DataFrame, centroids: np.ndarray, query: list[float], k: int = 10,
             nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN top-k: exact cosine re-rank over the nprobe nearest centroids'
    vectors. Probe order = centroid-query cosine, descending."""
    q = np.asarray(query, dtype=np.float32)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    order = np.argsort(-(centroids @ q), kind="stable")
    probe = [int(x) for x in order[: max(nprobe, 1)]]
    cand = indexed.filter(F.col("centroid").isin(probe)).drop("centroid")
    return cosine_topk(cand, query, k=k, vec_col=vec_col, id_col=id_col)


def _partition_topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Per-partition (query_id, top-k by sim desc / id asc) combine.

    Runs WITHOUT a shuffle (mapInPandas over existing partitions) and
    bounds each partition's output to k rows per query, so the global
    top-k window downstream sees <= k * n_partitions rows per query
    instead of every scored pair — the partial-aggregation step that makes
    the k-NN join viable at 10^12 corpus rows. Ordering matches the final
    window exactly (sim desc, id asc), so the local head(k) is always a
    superset of that partition's contribution to the global top-k."""

    def task(pdfs: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        best = None
        for pdf in pdfs:
            cur = pdf if best is None else pd.concat((best, pdf), ignore_index=True)
            cur = cur.sort_values(["query_id", "sim", id_col],
                                  ascending=[True, False, True])
            best = cur.groupby("query_id", sort=False).head(k)
        if best is not None:
            yield best

    return scored.mapInPandas(task, scored.schema)


def ivf_topk_batch(indexed: DataFrame, centroids: np.ndarray, queries: DataFrame,
                   k: int = 10, nprobe: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id", q_id_col: str = "query_id",
                   q_vec_col: str = "embedding", local_topk: bool = True) -> DataFrame:
    """Batch ANN (k-NN join): IVF top-k corpus neighbors for EVERY query row.

    Returns (query_id, vec_id, rank) — rank 1..k per query by cosine desc.

    Shape: one vectorized pandas-UDF pass computes each query's nprobe
    probe list; the exploded (query_id, centroid, qvec) frame — nprobe
    rows per query, the small side — broadcast-joins the indexed corpus
    on ``centroid``, so a corpus vector is scored only against queries
    probing its cell (never a cartesian). Cosine is JVM zip_with/aggregate;
    a shuffle-free per-partition top-k combine (``local_topk``) caps the
    window's input at k rows per (query, partition), then the final
    per-query rank is a window keyed on query_id over those narrow
    (qid, id, sim) rows. ``nprobe >= len(centroids)`` degrades to exact
    brute force — the recall-oracle baseline."""
    C = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    nprobe = max(1, min(nprobe, len(C)))

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float32)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(M @ C.T), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    qvec = F.transform(F.col("_qvec"), lambda x: x.cast("double"))
    qx = (
        queries.select(F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("_qvec"))
        .withColumn("centroid", F.explode(probes(F.col("_qvec"))))
        .withColumn("_qnorm", _norm(qvec))  # once per probe row, not per pair
    )
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sim = (_dot(vec, qvec) / (_norm(vec) * F.col("_qnorm"))).alias("sim")
    scored = (
        indexed.join(F.broadcast(qx), "centroid")
        .select("query_id", F.col(id_col), sim)
    )
    if local_topk:
        scored = _partition_topk(scored, k, id_col)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 3):
    """pandas_udf: embedding -> int bucket from random-hyperplane signs."""
    planes = _planes(dim, n_planes, seed)

    @pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim) float32
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((signs * weights).sum(axis=1).astype(np.int64))

    return sig


_TABLE_SEED_STRIDE = 101  # independent plane sets per LSH table


def build_lsh_index(df: DataFrame, vec_col: str = "embedding", dim: int | None = None,
                    n_planes: int = 12, seed: int = 3,
                    n_tables: int = 1) -> DataFrame:
    """Materialize the hyperplane bucket column(s) ONCE (the build step).

    ``n_tables`` > 1 builds the standard multi-TABLE LSH index: L
    independent plane sets -> L bucket columns (``bucket_0..``;
    ``n_tables=1`` keeps the single ``bucket`` column). Each table misses
    different neighbors, so the union of per-table probes recovers recall
    that one table cannot reach on structure-free embeddings.

    At 10^12 scale this frame is written out partitioned/bucketed by
    ``bucket`` so a probe reads only its probe buckets; signatures are never
    recomputed at query time. Locally, ``.cache()`` the result and reuse it
    across probes."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])  # metadata-scale lookup
    if n_tables == 1:
        return df.withColumn(
            "bucket", hyperplane_signature_udf(dim, n_planes, seed)(F.col(vec_col)))
    for t in range(n_tables):
        sig = hyperplane_signature_udf(dim, n_planes, seed + _TABLE_SEED_STRIDE * t)
        df = df.withColumn(f"bucket_{t}", sig(F.col(vec_col)))
    return df


def multiprobe_order(query: list[float], n_planes: int = 12, seed: int = 3) -> np.ndarray:
    """All 2^n_planes buckets ordered by probe priority.

    Standard multi-probe LSH: a bucket's penalty is the sum of |margin_i|
    over the hyperplanes whose sign it flips vs the query's signature —
    buckets that disagree only on low-confidence planes are probed first."""
    dim = len(query)
    planes = _planes(dim, n_planes, seed)
    margins = np.asarray(query, dtype=np.float32) @ planes.T  # (n_planes,)
    qbits = margins > 0
    buckets = np.arange(1 << n_planes, dtype=np.int64)
    bitmat = (buckets[:, None] >> np.arange(n_planes)) & 1  # (2^p, p)
    flipped = bitmat != qbits.astype(np.int64)
    penalty = (flipped * np.abs(margins)).sum(axis=1)
    return buckets[np.argsort(penalty, kind="stable")]


def lsh_topk(df: DataFrame, query: list[float], k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", n_planes: int = 12, seed: int = 3,
             min_candidates: int | None = None, indexed: bool = False,
             n_tables: int = 1) -> DataFrame:
    """ANN top-k via multi-probe (and optionally multi-TABLE) hyperplane
    LSH + exact re-rank.

    Probes buckets in multi-probe priority order — round-robin across the
    ``n_tables`` independent tables when > 1, unioning candidates — until
    the candidate pool reaches ``min_candidates`` (default max(8k, 64)),
    then exact-cosine re-ranks only the pool. Multi-table is the standard
    recall fix: each table's planes miss different neighbors (measured on
    the structure-free test embeddings: recall@10 0.43 single-table ->
    0.58 with 8 tables at a 20% candidate pool; IVF remains the primary
    ANN — it reaches the same recall at a fraction of the pool). Per-bucket
    counts are metadata (<= n_tables * 2^n_planes rows); at scale they
    come from the index's bucket stats, and the probe reads only the
    chosen buckets instead of scanning the corpus. Pass a pre-built index
    (``build_lsh_index(..., n_tables=)``) with ``indexed=True`` so
    signatures are not recomputed per query — ALSO the way to control cache
    lifetime: without it each call persists an ad-hoc index that must stay
    cached until the returned (lazy) frame is consumed, and is then only
    reclaimed by LRU eviction/session stop. Repeated ad-hoc calls in a
    long-lived session should build the index once instead."""
    if min_candidates is None:
        min_candidates = max(8 * k, 64)
    # the index frame is read L+1 times (bucket counts + candidate filter):
    # persist an ad-hoc build so the signature UDFs run once each
    idx_df = df if indexed else build_lsh_index(
        df, vec_col, len(query), n_planes, seed, n_tables=n_tables).persist()
    bcols = (["bucket"] if n_tables == 1
             else [f"bucket_{t}" for t in range(n_tables)])
    orders = [multiprobe_order(query, n_planes, seed + _TABLE_SEED_STRIDE * t)
              for t in range(n_tables)]
    counts = []
    for bc in bcols:
        counts.append({r[bc]: r["n"] for r in
                       idx_df.groupBy(bc).agg(F.count("*").alias("n")).collect()})
    # round-robin across tables: pool is an upper-bound estimate (a vector
    # probed by two tables counts twice) — fine, the exact re-rank follows
    probes: list[list[int]] = [[] for _ in bcols]
    pool, pos, t = 0, [0] * len(bcols), 0
    while pool < min_candidates and any(p < len(o) for p, o in zip(pos, orders)):
        if pos[t] < len(orders[t]):
            b = int(orders[t][pos[t]])
            probes[t].append(b)
            pool += counts[t].get(b, 0)
            pos[t] += 1
        t = (t + 1) % len(bcols)
    pred = None
    for bc, pb in zip(bcols, probes):
        if pb:
            clause = F.col(bc).isin(pb)
            pred = clause if pred is None else (pred | clause)
    cand = idx_df.filter(pred).drop(*bcols)
    return cosine_topk(cand, query, k=k, vec_col=vec_col, id_col=id_col)


def embedding_neardup_pairs(df: DataFrame, vec_col: str = "embedding",
                            id_col: str = "vec_id", threshold: float = 0.9,
                            n_centroids: int = 16, multi_assign: int = 2,
                            seed: int = 5,
                            cell_cap: int | None = 65536) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= ``threshold`` —
    the embedding-space sibling of MinHash/SimHash near-dup.

    IVF-bucketed to avoid the all-pairs square: every vector is assigned
    to its ``multi_assign`` nearest centroids (one vectorized pandas-UDF
    pass), candidate pairs come from a narrow (cell, id) self-join within
    shared cells only, and the exact cosine (JVM zip_with/aggregate)
    filters candidates. Exact duplicates always share their top-1 cell, so
    recall on true duplicates is structural; multi-assign widens the net
    for boundary-straddling near-dups. Returns distinct
    (id_a, id_b, cosine) with id_a < id_b.

    ``cell_cap`` bounds the within-cell square: a cell is ~N/k vectors on
    uniform data, but a real corpus clusters (boilerplate pages, template
    embeddings) and one mega-cell of m members would emit m^2 candidate
    rows. Cells above the cap are sub-split by an id-hash salt into
    ceil(m/cap) sub-cells and pairs form only within a sub-cell, so
    candidates per cell are bounded by ~cap * m instead of m^2. The
    accepted trade: cross-salt pairs inside a mega-cell are not emitted —
    a near-dup CLUSTER that large still collapses per-sub-cell (each
    sub-cell's members pair among themselves), it just resolves to
    ceil(m/cap) survivors instead of 1. Normal cells (the overwhelming
    majority) take one broadcast join against the tiny over-cap list and
    keep salt 0.

    Feed the pairs to ``dedup.neardup_dedup(df, pairs=...)`` to resolve
    clusters and drop losers. At 10^12 rows the assignment is written
    bucketed by cell so the self-join is co-located (no shuffle of
    vectors beyond their nprobe-bounded cells)."""
    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(4096).collect()], dtype=np.float32
    )
    C = _spherical_kmeans(sample, n_centroids, seed=seed)
    m = max(1, min(multi_assign, len(C)))

    @pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float32)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(M @ C.T), axis=1, kind="stable")[:, :m]
        return pd.Series(list(order.astype(np.int32)))

    assigned = df.select(
        F.col(id_col), F.col(vec_col),
        F.explode(cells(F.col(vec_col))).alias("cell"),
    )
    narrow = assigned.select(id_col, "cell")
    if cell_cap:
        over = (narrow.groupBy("cell").count()
                .where(F.col("count") > cell_cap)
                .withColumn("_nsplit",
                            F.ceil(F.col("count") / cell_cap).cast("int"))
                .select("cell", "_nsplit"))
        narrow = (
            narrow.join(F.broadcast(over), "cell", "left")
            .withColumn("_salt",
                        F.when(F.col("_nsplit").isNull(), F.lit(0)).otherwise(
                            F.pmod(F.xxhash64(F.col(id_col)), F.col("_nsplit"))
                            .cast("int")))
            .select(id_col, "cell", "_salt")
        )
    else:
        narrow = narrow.withColumn("_salt", F.lit(0))
    cand = (
        narrow.alias("a")
        .join(narrow.alias("b"),
              (F.col("a.cell") == F.col("b.cell"))
              & (F.col("a._salt") == F.col("b._salt"))
              & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"))
    va = vecs.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
                     _norm(F.col("_v")).alias("_na"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
                     _norm(F.col("_v")).alias("_nb"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
