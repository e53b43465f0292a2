"""Watermarked windowed text-quality aggregation over a document stream.

The same per-language quality expressions as the batch operator
(``pipeline.textstats``), expressed as an event-time windowed aggregation
with a watermark for late data — the standard Structured Streaming shape.
The function works on both batch and streaming DataFrames (Spark resolves
``window``/``withWatermark`` in either mode), so tests can assert
stream-vs-batch equality on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..pipeline.textstats import punct_count, token_count


def streaming_quality_stats(
    df: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    lang_col: str = "lang",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (event-time window, lang) integer quality aggregates.

    Watermark bounds state: rows later than ``watermark`` behind the max
    seen event time are dropped and their window finalized — at web-crawl
    scale this is what keeps the aggregation state finite.
    """
    t = F.col(text_col)
    src = df
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.select(
            F.col(ts_col),
            F.col(lang_col),
            F.length(t).alias("_chars"),
            token_count(t).alias("_toks"),
            punct_count(t).alias("_punct"),
        )
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(lang_col))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_chars").alias("sum_chars"),
            F.sum("_toks").alias("sum_tokens"),
            F.sum("_punct").alias("sum_punct"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col(lang_col),
            "n_docs", "sum_chars", "sum_tokens", "sum_punct",
        )
    )
