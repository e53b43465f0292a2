"""Sequence packing: assign documents to fixed token-budget training bins.

LLM pre-training consumes the corpus as fixed-length sequences; the
pipeline step before tokenized-shard writing is "concatenate documents in
a deterministic order, cut every ``budget`` tokens" (GPT-style document
packing). The load-bearing primitive is an EXACT GLOBAL cumulative sum of
token counts in corpus order — which naive Spark expresses as a window
with no ``partitionBy``, funneling 10^12 rows through ONE task. This
module does it scalably:

  1. ``repartitionByRange(order_col)`` — each partition owns a contiguous
     key range (partition ids are range-ordered by construction),
  2. per-partition prefix sums (a real windowed cumsum, but partitioned),
  3. per-partition TOTALS to the driver (#partitions rows — metadata
     scale), converted to running offsets and broadcast back.

``cum_before`` = local prefix + partition offset is boundary-independent,
so the result equals the single-task global window bit-for-bit (DuckDB
oracle) at any parallelism.

Two packing semantics, both used in practice:

- :func:`pack_chunks` — concat-then-cut: document d starts in bin
  ``floor(cum_before(d) / budget)`` and may straddle into the next bin
  (``bin_offset`` says where it starts). Exactly SQL-expressible →
  driver-oracled.
- :func:`pack_greedy` — no document straddles: greedy first-fit in order
  with a bin reset when the budget would overflow. Inherently a
  sequential recursion, so it runs per RANGE SHARD (contiguous key
  ranges, one ``applyInPandas`` group each) with globally-unique
  ``(shard, bin)`` — the shape real pipelines use (pack within output
  shards). Property-tested against a pure-Python reference.

No reference analog (the reference is a string codec kernel); packing
follows the public pre-training data literature (e.g. GPT/T5-style
example packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(df: DataFrame, val_col: str, order_col: str,
                  num_shards: int | None = None,
                  out_col: str = "cum_before") -> DataFrame:
    """``out_col`` = exact sum of ``val_col`` over all rows strictly before
    this one in ``order_col`` order (first row gets 0), plus a ``shard``
    column (the range-partition id, kept for shard-local consumers).

    ``order_col`` must be unique (ties could split across range
    partitions, making "strictly before" ambiguous). Nulls in ``val_col``
    count as 0. One range shuffle + one #shards-row collect."""
    spark = df.sparkSession
    num_shards = num_shards or spark.sparkContext.defaultParallelism
    d = (df.repartitionByRange(num_shards, F.col(order_col))
           .withColumn("shard", F.spark_partition_id()))
    w = (Window.partitionBy("shard").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    # double, not long: fractional weights (e.g. quantile-sketch n/k) must
    # not truncate; integer weights stay exact far past any token count
    # (2^53) and the final cast below restores a long when safe
    val = F.coalesce(F.col(val_col).cast("double"), F.lit(0.0))
    d = d.withColumn("_local_before",
                     F.coalesce(F.sum(val).over(w), F.lit(0.0)))
    # per-shard totals: #shards rows — metadata-scale by construction.
    # RangePartitioner ids are ordered by key range, so a running sum over
    # ids IS the global prefix at each shard boundary.
    totals = (d.groupBy("shard").agg(F.sum(val).alias("_tot"))
              .orderBy("shard").collect())
    offsets, run = [], 0.0
    for r in totals:
        offsets.append((r["shard"], run))
        run += r["_tot"] or 0.0
    off = F.broadcast(
        spark.createDataFrame(offsets, "shard int, _shard_offset double"))
    return (
        d.join(off, "shard")
        .withColumn(out_col, (F.col("_local_before") + F.col("_shard_offset")))
        .drop("_local_before", "_shard_offset")
    )


def pack_chunks(df: DataFrame, token_col: str, order_col: str,
                budget: int, num_shards: int | None = None) -> DataFrame:
    """Concat-then-cut packing: adds ``bin`` (the budget-sized sequence
    this document STARTS in) and ``bin_offset`` (token position within
    it). Documents longer than the remaining space straddle into the
    following bin(s) — the GPT-style packing where sequences are cut
    mid-document. Deterministic given unique ``order_col``."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    d = global_cumsum(df, token_col, order_col, num_shards)
    # integer token counts make cum_before integral (doubles are exact to
    # 2^53): cast back to long so bin/bin_offset are exact integers
    cum = F.col("cum_before").cast("long")
    return (
        d.withColumn("bin", F.floor(cum / F.lit(budget)).cast("long"))
         .withColumn("bin_offset", cum % F.lit(budget))
         .drop("cum_before", "shard")
    )


def pack_greedy(df: DataFrame, token_col: str, order_col: str,
                budget: int, num_shards: int | None = None) -> DataFrame:
    """First-fit greedy packing, no straddling: within each range shard,
    walk documents in order; a document that would overflow the current
    bin's budget starts the next bin. Documents longer than ``budget``
    get a bin of their own (flagged ``oversize``). Adds ``shard``,
    ``bin`` (shard-local, so (shard, bin) is the global key) and
    ``bin_tokens`` (the document's token count, clamped into the bin).

    The recursion is inherently sequential, so it runs per shard — the
    boundary effect (a shard's last bin may be underfull) is the same one
    accepted when packing into output shards/files in practice."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    spark = df.sparkSession
    num_shards = num_shards or spark.sparkContext.defaultParallelism
    d = (df.repartitionByRange(num_shards, F.col(order_col))
           .withColumn("shard", F.spark_partition_id()))
    # copy the fields: StructType.add MUTATES (and d.schema is cached on
    # the frame — adding to it in place breaks later column resolution)
    from pyspark.sql.types import (BooleanType, LongType, StructField,
                                   StructType)

    schema = StructType(list(d.schema.fields)
                        + [StructField("bin", LongType()),
                           StructField("oversize", BooleanType())])

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col, kind="stable", ignore_index=True)
        toks = pdf[token_col].fillna(0).astype("int64")
        # rollover keys on MEMBER COUNT, not fill: zero-token docs leave
        # fill at 0, and keying on fill would let an oversize doc join
        # their bin — breaking the "oversize docs sit alone" contract
        bins, fill, members, cur = [], 0, 0, 0
        for t in toks:
            if members > 0 and fill + t > budget:
                cur += 1
                fill = members = 0
            bins.append(cur)
            fill += int(t)
            members += 1
            if fill >= budget:  # full (or oversize doc): next doc opens fresh
                cur += 1
                fill = members = 0
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["oversize"] = toks > budget
        return pdf

    return d.groupBy("shard").applyInPandas(pack, schema)
