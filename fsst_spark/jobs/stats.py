"""Stats-only queries answered from encode-time metadata — no payload
reads, no decode.

The chunk table stores exact per-chunk min/max for integer and timestamp
columns (``encode._zone_bounds``) and per-chunk row counts; min/max/count
over the whole store is therefore a pure metadata aggregation over the
narrow (column, n_rows, zmin, zmax) projection — the parquet scan never
touches a payload byte. At 100 TB this answers ``SELECT count(*),
min(c), max(c)`` in seconds from footers instead of a full decode — the
standard lakehouse stats-pushdown shape, here against our own chunk
format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decode import _chunks_df, column_arrow_types

_EXACT_ZONE_TYPES = ("int8", "int16", "int32", "int64")


def encoded_column_stats(spark, out_dir: str, columns: list[str]) -> DataFrame:
    """(column, n_rows, n_nonnull_min... ) -> one row per requested column
    with exact ``n_rows``, ``min_long`` and ``max_long`` recovered from
    chunk metadata only.

    Supported for integer and timestamp columns (their zones are exact
    value bounds; timestamps report in storage-unit ticks). String prefix
    zones and float total-order keys are conservative/encoded bounds, not
    exact values — asking for such a column raises rather than returning
    a lookalike number. All-null chunks carry null zones and are excluded
    from min/max (they contribute no values), matching SQL min/max
    semantics; a store written before zone maps existed has no zone
    columns at all and also raises."""
    types = column_arrow_types(spark, out_dir)
    for c in columns:
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
        t = types[c]
        if t not in _EXACT_ZONE_TYPES and not t.startswith("timestamp["):
            raise ValueError(
                f"exact metadata stats need int/timestamp zones; column {c!r} "
                f"is {t} (string/float zones are conservative bounds only)")
    chunks = _chunks_df(spark, out_dir, list(columns))
    # column-presence check BEFORE the projection: selecting a missing
    # column raises AnalysisException first, making a post-select guard dead
    if "zmin_long" not in chunks.columns:
        raise ValueError("store has no zone maps (pre-zone encode)")
    chunks = chunks.select("column", "n_rows", "zmin_long", "zmax_long")
    return (
        chunks.groupBy("column")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("zmin_long").alias("min_long"),
            F.max("zmax_long").alias("max_long"),
        )
        .orderBy("column")
    )
