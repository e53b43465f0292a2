"""Bounded-state streaming deduplication of a document stream.

Content dedup in the ingest path: key every document by a normalized
content fingerprint (``pipeline.textstats.normalized_fingerprint`` —
lowercase, collapse whitespace, md5) and keep the first occurrence.
Streaming mode uses ``dropDuplicatesWithinWatermark`` so the dedup state
is bounded by the event-time watermark instead of growing with the crawl
(at web scale an unbounded exact-dedup state is its own 100 TB table);
re-crawled duplicates further apart than the watermark are left for the
batch near-dup resolution pass (``pipeline.dedup.neardup_dedup``).

Works on both batch and streaming DataFrames so tests can assert
stream-vs-batch equality on the same input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..pipeline.textstats import normalized_fingerprint


def streaming_dedup(
    df: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "2 hours",
    key: Column | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Keep one row per content fingerprint (first seen, within watermark).

    ``key`` overrides the dedup key (default: normalized text fingerprint
    — catches exact and whitespace/case-trivial duplicates). Output schema
    equals input schema.

    Batch mode picks the survivor deterministically — earliest ``ts_col``,
    ties broken by min ``tie_col`` (e.g. a doc id) — using whichever of the
    two the frame actually has, so a re-run selects the same rows;
    streaming mode's survivor is arrival order (first seen), so
    stream-vs-batch equality holds on fingerprint sets and counts, and on
    selected rows exactly when event-time order matches arrival order
    (true for an in-order source). A batch frame with NEITHER column falls
    back to dropDuplicates (survivor partition-order-dependent — pass
    ``tie_col`` for reproducibility).
    """
    fp = key if key is not None else normalized_fingerprint(F.col(text_col))
    keyed = df.withColumn("_fp", fp)
    if keyed.isStreaming:
        keyed = keyed.withWatermark(ts_col, watermark)
        out = keyed.dropDuplicatesWithinWatermark(["_fp"])
    else:
        # dropDuplicates alone keeps whichever row a partition scan sees
        # first (partition-order-dependent). min_by aggregates with a
        # map-side partial (one candidate row per fingerprint per
        # partition crosses the shuffle), so even a mega-fingerprint —
        # one boilerplate page duplicated 10^8 times — never floods a
        # single reducer the way a window rank would.
        order_cols = [c for c in (ts_col, tie_col) if c and c in df.columns]
        if order_cols:
            order = (F.struct(*[F.col(c) for c in order_cols])
                     if len(order_cols) > 1 else F.col(order_cols[0]))
            out = (
                keyed.groupBy("_fp")
                .agg(F.min_by(F.struct(*df.columns), order).alias("_row"))
                .select("_row.*")
            )
            return out
        out = keyed.dropDuplicates(["_fp"])
    return out.drop("_fp")
