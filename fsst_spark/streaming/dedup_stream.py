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
) -> DataFrame:
    """Keep one row per content fingerprint (first seen, within watermark).

    ``key`` overrides the dedup key (default: normalized text fingerprint
    — catches exact and whitespace/case-trivial duplicates). Output schema
    equals input schema.
    """
    fp = key if key is not None else normalized_fingerprint(F.col(text_col))
    keyed = df.withColumn("_fp", fp)
    if keyed.isStreaming:
        keyed = keyed.withWatermark(ts_col, watermark)
        out = keyed.dropDuplicatesWithinWatermark(["_fp"])
    else:
        out = keyed.dropDuplicates(["_fp"])
    return out.drop("_fp")
