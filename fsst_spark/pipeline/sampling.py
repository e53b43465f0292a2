"""Reproducible sampling and per-group capping for training-data curation.

Both operators are pure JVM expressions (no UDFs, no RNG state): a
training pipeline must be able to re-run months later — or on a different
cluster size — and select the EXACT same rows. Spark's ``sample()`` is
seed-dependent on partitioning; these are content-keyed instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id",
                         salt: str = "sample") -> DataFrame:
    """Keep a reproducible ~``fraction`` of rows, keyed on content.

    Predicate: the first 8 hex chars of md5(key || ':' || salt) compared
    lexicographically against the hex threshold floor(fraction * 2^32) —
    fixed-width lowercase hex compares identically to the numeric value,
    and md5 agrees byte-for-byte across engines, so DuckDB reproduces the
    selection exactly (and so does any future re-run, independent of
    partitioning, cluster size, or row order). Changing ``salt`` draws an
    independent sample.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # fraction == 1.0 would format to 9 chars ('100000000'), which sorts
    # BELOW most 8-char hashes lexicographically; 'g' is > every lowercase
    # hex digit, so every row passes
    threshold = "g" if fraction == 1.0 else format(int(fraction * (1 << 32)), "08x")
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
              .cast("binary")),
        1, 8,
    )
    return df.where(h < F.lit(threshold))


def cap_per_group(df: DataFrame, group_col: str = "source", n: int = 10,
                  order_col: str = "doc_id") -> DataFrame:
    """Keep at most ``n`` rows per group — domain balancing for crawls
    (a handful of mega-domains otherwise dominate the corpus).

    Deterministic survivor set: rows ranked by ``order_col`` within each
    group, first ``n`` kept. One narrow-key shuffle on ``group_col``; at
    10^12 rows a skewed mega-domain lands on one reducer, so for those
    corpora pre-aggregate with a salted local cap first (each salted
    sub-partition keeps n, then the global pass re-caps — survivors of the
    global rank are always survivors of the local one, so the result is
    identical).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
