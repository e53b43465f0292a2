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
    (similarity desc, id) — rank is 1-based."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query)))
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sim = (_dot(vec, q) / (_norm(vec) * F.lit(qn))).alias("sim")
    ranked = (
        df.select(F.col(id_col), sim)
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("sim"), F.col(id_col))
    return ranked.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 3):
    """pandas_udf: embedding -> int bucket from random-hyperplane signs."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float32)

    @pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim) float32
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((signs * weights).sum(axis=1).astype(np.int64))

    return sig


def lsh_topk(df: DataFrame, query: list[float], k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", n_planes: int = 12, seed: int = 3) -> DataFrame:
    """ANN top-k: probe only the query's hyperplane bucket (scale path).

    Recall < 1 by construction; at 10^12 scale the bucketed table is
    pre-materialized and the probe reads one bucket partition instead of
    scanning the corpus.
    """
    dim = len(query)
    sig = hyperplane_signature_udf(dim, n_planes, seed)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float32)
    qsig = int(((np.asarray(query, dtype=np.float32) @ planes.T) > 0)
               @ (1 << np.arange(n_planes, dtype=np.int64)))
    bucketed = df.withColumn("_b", sig(F.col(vec_col))).filter(F.col("_b") == qsig)
    return cosine_topk(bucketed.drop("_b"), query, k=k, vec_col=vec_col, id_col=id_col)
