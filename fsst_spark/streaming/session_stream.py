"""Session-window aggregation that works over batch AND streaming input,
aligned bit-for-bit with the batch gaps-and-islands operator.

Spark's built-in ``session_window`` merges an event into a session while
``event_ts <= last_ts + gap`` (verified empirically: an event exactly
``gap`` after its predecessor stays in the session), i.e. a new session
starts only when the inter-event gap is strictly ``> gap`` — the same
rule as the batch gaps-and-islands operator
(``pipeline.temporal.sessionize``), so the two agree on every input with
no offset fudging. The equality test (tests/test_session_stream.py) pins
the alignment, boundary case included.

In streaming mode the watermark is what keeps session state finite: a
session closes (and is emitted, in append mode) once the watermark passes
its end — exactly the built-in stateful-session machinery, no custom
``applyInPandasWithState`` needed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import TimestampNTZType

__all__ = ["session_window_stats"]


def session_window_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per (key, session) rollup via the built-in ``session_window``:
    ``(key, t_start, t_end_excl, n_events, dur_us)`` where ``t_end_excl``
    is the window's exclusive end (last event + gap) and ``dur_us``
    the exact first→last event span.

    Batch input: equals ``pipeline.temporal.session_stats`` row-for-row
    on (key, n_events, dur_us). Streaming input: watermarked stateful
    session aggregation (append mode emits closed sessions only).
    """
    if gap_us <= 0:
        raise ValueError(f"gap_us must be positive, got {gap_us}")
    src = df.where(F.col(ts_col).isNotNull())
    ts = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        # watermarks/session windows need an instant type; the session tz
        # is pinned UTC (jobs/session.py) so this cast is a reinterpretation
        src = src.withColumn(ts_col, ts.cast("timestamp"))
        ts = F.col(ts_col)
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(key_col),
            F.session_window(ts, f"{gap_us} microseconds").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            .alias("dur_us"),
        )
        .select(
            key_col,
            F.col("w.start").alias("t_start"),
            F.col("w.end").alias("t_end_excl"),
            "n_events",
            "dur_us",
        )
    )
