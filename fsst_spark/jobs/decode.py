"""Distributed decode job: encoded chunks -> original columns.

Reads the chunk table written by ``encode_job`` and reconstructs the
original columns, bit-identical. Decoding needs only the chunk rows (the
symbol table travels inside each FSST payload section), so this is a pure
``mapInArrow`` scan with no joins. Column pruning pushes down into the
chunk parquet: asking for a column subset filters chunk rows by the
``column`` field *at the scan* (Catalyst predicate pushdown), so unneeded
payload bytes are never read.
"""

from __future__ import annotations

import json
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..kernel.codecs import decode_column

_SPARK_TYPE = {
    "string": "string", "large_string": "string",
    "binary": "binary", "large_binary": "binary",
    "int64": "bigint", "int32": "int", "int16": "smallint", "int8": "tinyint",
    "double": "double", "float": "float", "bool": "boolean",
}


def _spark_type(arrow_name: str) -> str:
    if arrow_name.startswith("timestamp["):
        return "timestamp"
    return _SPARK_TYPE[arrow_name]


def _chunks_df(spark, out_dir: str, columns: list[str] | None) -> DataFrame:
    df = spark.read.parquet(f"{out_dir}/chunks")
    if columns:
        df = df.filter(F.col("column").isin(columns))  # pushed to parquet scan
    return df


def decoded_schema_ddl(spark, out_dir: str, columns: list[str] | None = None) -> tuple[str, list[str]]:
    """Recover the decoded schema from ONE chunk file.

    Every encode partition writes all its columns into its own chunk file,
    so any single file carries the full schema — a driver-side footer read,
    not a cluster scan (at 10^12 rows a groupBy over all chunk rows just to
    learn five column types would be a full pass over the table)."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(out_dir, "chunks", "*.parquet")))
    if files:
        import pyarrow.parquet as pq

        t = pq.read_table(files[0], columns=["column", "params"])
        cols = {
            c: json.loads(p)["arrow_type"]
            for c, p in zip(t.column("column").to_pylist(), t.column("params").to_pylist())
        }
    else:  # non-globbable store: fall back to a (pushed-down) cluster scan
        meta = (
            _chunks_df(spark, out_dir, columns)
            .select("column", "params")
            .groupBy("column").agg(F.first("params").alias("params"))
            .collect()
        )
        cols = {r["column"]: json.loads(r["params"])["arrow_type"] for r in meta}
    if columns:
        missing = [c for c in columns if c not in cols]
        if missing:
            raise KeyError(f"columns not present in encoded data: {missing}")
    ordered = columns or sorted(cols)
    ddl = ", ".join(f"{c} {_spark_type(cols[c])}" for c in ordered)
    return f"pid int, chunk_id int, {ddl}", ordered


_ZONE_OPS = {
    ">=": lambda v: F.col("zmax_long") >= v,
    ">": lambda v: F.col("zmax_long") > v,
    "<=": lambda v: F.col("zmin_long") <= v,
    "<": lambda v: F.col("zmin_long") < v,
    "==": lambda v: (F.col("zmin_long") <= v) & (F.col("zmax_long") >= v),
}

# String zones are 8-byte PREFIX bounds (zone_pack8): equal prefixes
# collapse, so s < X only implies pack(s) <= pack(X) — the strict ops must
# compare non-strictly or a shared-prefix boundary chunk would be wrongly
# pruned. Ints use exact zones and keep the strict forms above.
_ZONE_OPS_PREFIX = {
    ">=": _ZONE_OPS[">="],
    ">": _ZONE_OPS[">="],
    "<=": _ZONE_OPS["<="],
    "<": _ZONE_OPS["<="],
    "==": _ZONE_OPS["=="],
}


def _zone_prune(chunks: DataFrame, zsrc: DataFrame,
                zone_filter: tuple[str, str, int | str]) -> DataFrame:
    """Drop chunk groups whose zone map proves ``col op value`` matches no
    row. Conservative: chunks with null zones (string columns, all-null
    chunks, pre-zone-map encodes) are always kept. The zone predicate
    filters the narrow (pid, chunk_id, zmin, zmax) projection at the
    parquet scan (PushedFilters), and survivors semi-join back on the
    narrow chunk key — pruned payload bytes are never read."""
    col, op, value = zone_filter
    if op not in _ZONE_OPS:
        raise ValueError(f"zone op must be one of {sorted(_ZONE_OPS)}, got {op!r}")
    if "zmin_long" not in chunks.columns:
        return chunks  # pre-zone-map encode: nothing to prune on
    if isinstance(value, (str, bytes)):
        from .encode import zone_pack8

        zval, ops = zone_pack8(value), _ZONE_OPS_PREFIX
    else:
        zval, ops = int(value), _ZONE_OPS
    keep = (
        zsrc.filter(F.col("column") == col)
        .filter(F.col("zmin_long").isNull() | ops[op](zval))
        .select("pid", "chunk_id")
    )
    return chunks.join(keep, ["pid", "chunk_id"], "left_semi")


def decode_job(spark, out_dir: str, columns: list[str] | None = None,
               zone_filter: tuple[str, str, int | str] | None = None) -> DataFrame:
    """DataFrame of the decoded table (plus pid/chunk_id provenance cols).

    ``zone_filter=(col, op, value)`` prunes whole chunks via the encode-time
    zone maps BEFORE any payload is read or decoded — chunk-granular, so the
    result still contains non-matching rows from surviving chunks; apply the
    exact row predicate afterwards (``decode_filtered`` does both)."""
    ddl, ordered = decoded_schema_ddl(spark, out_dir, columns)
    chunks = _chunks_df(spark, out_dir, columns)
    if zone_filter is not None:
        decoded_schema_ddl(spark, out_dir, [zone_filter[0]])  # KeyError if absent
        # the zone column may be outside the requested column subset, so
        # the keep-set reads its own (narrow, zone-only) projection
        zsrc = _chunks_df(spark, out_dir, [zone_filter[0]])
        chunks = _zone_prune(chunks, zsrc, zone_filter)
    # Co-locate all column rows of one chunk in one task. Chunk rows are
    # few and fat (payload ~MBs), so the shuffle moves encoded (small)
    # bytes — decoding after the shuffle keeps shuffled volume minimal.
    chunks = chunks.repartition(F.col("pid"), F.col("chunk_id"))

    def decode_task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..env import madvise_hugepages

        madvise_hugepages()
        pending: dict[tuple[int, int], dict] = {}
        for batch in batches:
            cols = batch.to_pylist()
            for row in cols:
                key = (row["pid"], row["chunk_id"])
                slot = pending.setdefault(key, {"need": len(ordered), "cols": {}})
                slot["cols"][row["column"]] = decode_column(
                    {"codec": row["codec"], "params": json.loads(row["params"]),
                     "payload": row["payload"]}
                )
                if len(slot["cols"]) == slot["need"]:
                    yield _emit(key, slot["cols"], ordered)
                    del pending[key]
        assert not pending, f"incomplete chunks (missing column rows): {list(pending)[:4]}"

    return chunks.mapInArrow(decode_task, ddl)


def decode_filtered(spark, out_dir: str, col: str, op: str, value: int | str,
                    columns: list[str] | None = None) -> DataFrame:
    """Selective decode: zone-map chunk pruning + the exact row predicate.

    Returns exactly the rows satisfying ``col op value`` while reading and
    decoding only the chunks whose zone maps can match — on a corpus whose
    encode order correlates with ``col`` (time-partitioned crawls, sorted
    ids) this touches a small fraction of the payload bytes at 100 TB."""
    cols = columns
    if cols is not None and col not in cols:
        cols = [*cols, col]
    df = decode_job(spark, out_dir, cols, zone_filter=(col, op, value))
    row_pred = {
        ">=": F.col(col) >= value, ">": F.col(col) > value,
        "<=": F.col(col) <= value, "<": F.col(col) < value,
        "==": F.col(col) == value,
    }[op]
    df = df.where(row_pred)
    if columns is not None and col not in columns:
        df = df.drop(col)
    return df


def _emit(key: tuple[int, int], cols: dict[str, pa.Array], ordered: list[str]) -> pa.RecordBatch:
    import numpy as np

    n = len(next(iter(cols.values())))
    fixed = []
    for c in ordered:
        arr = cols[c]
        if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
            arr = arr.cast(pa.timestamp("us", tz=arr.type.tz))  # spark speaks us
        fixed.append(arr)
    arrays = [
        pa.array(np.full(n, key[0], dtype=np.int32)),
        pa.array(np.full(n, key[1], dtype=np.int32)),
    ] + fixed
    return pa.RecordBatch.from_arrays(arrays, names=["pid", "chunk_id", *ordered])
