"""Temporal operators Spark lacks as built-ins: as-of join and
sessionization.

Both are single-shuffle plans. ``asof_join`` is deliberately JOIN-FREE:
instead of a range join (which Spark plans as a broadcast-nested-loop or
a skew-prone inequality join), both sides are unioned, shuffled ONCE on
the key, and the latest right-side row is carried forward with a
``last(ignorenulls)`` running window — O(n log n_partition) per key
group, no pair blow-up, no driver participation. That is the plan that
survives 100 TB: a web-scale crawl join (every fetch ↔ the most recent
robots.txt snapshot for its host) shuffles each side exactly once.

``sessionize`` is the gaps-and-islands pattern: one shuffle on the
entity key, two stacked windows (lag → cumulative sum of gap breaks).

Tie determinism matters for the oracle gate and for reproducible
pipelines, so both operators take an explicit tiebreak column and order
by ``(ts, side, tiebreak)`` — re-runs at any parallelism select the same
matches. (Reference parity note: the reference engine at
/root/reference is a compression kernel with no temporal ops; these
belong to the engine surface this repo adds on top.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import TimestampNTZType

__all__ = ["asof_join", "sessionize", "session_stats"]


def _micros(c: Column, is_ntz: bool) -> Column:
    """Exact integer microseconds. ``unix_micros`` rejects TIMESTAMP_NTZ;
    the engine pins the session timezone to UTC (jobs/session.py), where
    the NTZ->TIMESTAMP cast is a pure reinterpretation (no DST folds), so
    gaps and tolerances stay exact integers for either timestamp type."""
    return F.unix_micros(c.cast("timestamp") if is_ntz else c)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its ``ts_col``, per key.

    Implementation: tag sides, union, ONE hash shuffle on ``on``, sort
    within partitions by ``(ts, side[, tiebreak])``, carry the latest
    right payload with ``last(ignorenulls)`` over a running window, keep
    left rows. Right rows sort before left rows at an equal timestamp,
    so a right row at exactly ``t`` matches a left row at ``t``
    (inclusive bound, same as DuckDB/pandas ``merge_asof``).

    ``tolerance_us``: maximum staleness in MICROSECONDS (exact integer
    arithmetic on ``unix_micros``, no float rounding); matches farther
    away become NULL, like pandas ``merge_asof(tolerance=...)``.

    ``tiebreak_col``: right-side column ordering ties when several right
    rows share one timestamp (the LARGEST tiebreak value wins for
    ``backward``; smallest for ``forward``). Pass one whenever right
    timestamps may collide — without it tied matches are
    plan-dependent.

    Right payload columns come back as ``<name><suffix>`` plus
    ``<ts_col><suffix>`` for the matched timestamp. Null left
    timestamps match nothing.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != ts_col]
    bad = [c for c in right_cols if c in left.columns and not suffix]
    if bad:
        raise ValueError(f"right columns {bad} collide with left; set suffix")

    # right payload rides in ONE struct so a single last(ignorenulls)
    # carries ts + all columns atomically (no per-column window passes,
    # and no torn match if two right rows interleave)
    payload = F.struct(
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    tb = (F.col(tiebreak_col) if tiebreak_col is not None
          else F.lit(None).cast("int")).alias("__tb")
    # a null right timestamp has no place on an as-of axis — left in, it
    # would sort first and be carried into every early left row
    right = right.where(F.col(ts_col).isNotNull())
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ets"),
        F.lit(0).alias("__side"),
        tb,
        payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l_ = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__ets"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    u = r.unionByName(l_)

    if direction == "backward":
        order = [F.col("__ets").asc_nulls_first(), F.col("__side").asc(),
                 F.col("__tb").asc_nulls_first()]
    else:
        # mirror image: scan from the future backwards; at equal ts the
        # right row still sorts first so the bound stays inclusive
        order = [F.col("__ets").desc_nulls_first(), F.col("__side").asc(),
                 F.col("__tb").desc_nulls_first()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))

    # left rows with a null timestamp sort before every right row, so
    # their carried match is already null — keep them (left-join shape)
    out = u.where(F.col("__side") == 1)
    m: Column = F.col("__m")
    if tolerance_us is not None:
        if tolerance_us < 0:
            raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")
        l_ntz = isinstance(left.schema[ts_col].dataType, TimestampNTZType)
        r_ntz = isinstance(right.schema[ts_col].dataType, TimestampNTZType)
        lag = _micros(F.col("__ets"), l_ntz) - _micros(m["__ts"], r_ntz)
        if direction == "forward":
            lag = -lag
        m = F.when(lag <= F.lit(tolerance_us), m)
    return out.select(
        *[F.col(k) for k in keys],
        F.col("__ets").alias(ts_col),
        *[F.col(c) for c in left.columns if c not in keys and c != ts_col],
        m["__ts"].alias(f"{ts_col}{suffix}"),
        *[m[c].alias(f"{c}{suffix}") for c in right_cols],
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak_col: str | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign gaps-and-islands session numbers per key: a new session
    starts whenever the gap to the previous event exceeds ``gap_us``
    MICROSECONDS (exact ``unix_micros`` integer arithmetic — re-runs and
    engines agree bit-for-bit; a float `seconds` diff would not).

    ``out_col`` is 1-based and dense per key, ordered by
    ``(ts[, tiebreak])``. One shuffle on ``key_col``; the two stacked
    windows (lag, then running sum of session breaks) reuse that single
    sort — Spark plans them in one exchange. Null timestamps group into
    session 0 (sorted first, never joined to a real session).
    """
    if gap_us <= 0:
        raise ValueError(f"gap_us must be positive, got {gap_us}")
    order = [F.col(ts_col).asc_nulls_first()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc_nulls_first())
    ntz = isinstance(df.schema[ts_col].dataType, TimestampNTZType)
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(_micros(F.col(ts_col), ntz)).over(w)
    is_break = F.when(
        F.col(ts_col).isNull(), F.lit(0)
    ).otherwise(
        (prev.isNull()
         | ((_micros(F.col(ts_col), ntz) - prev) > F.lit(gap_us)))
        .cast("int")
    )
    run = (Window.partitionBy(key_col).orderBy(*order)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(out_col, F.sum(is_break).over(run))


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: event count and exact duration in
    microseconds. Sessionize (one shuffle) then a groupBy that reuses
    the same ``(key, session)`` co-location — AQE coalesces, no second
    wide exchange of the event payload."""
    s = sessionize(df, key_col, ts_col, gap_us, tiebreak_col)
    return (
        s.where(F.col("session_seq") > 0)
        .groupBy(key_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("t_start"),
            F.max(ts_col).alias("t_end"),
            (_micros(F.max(ts_col),
                     isinstance(df.schema[ts_col].dataType,
                                TimestampNTZType))
             - _micros(F.min(ts_col),
                       isinstance(df.schema[ts_col].dataType,
                                  TimestampNTZType))).alias("dur_us"),
        )
    )
