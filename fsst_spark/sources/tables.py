"""Table sources: Iceberg-first with a parquet-directory fallback.

The north rule targets Iceberg tables of web pages. This sandbox image
ships no Iceberg runtime jar, so every Iceberg call is availability-gated:
on a production cluster (``--packages org.apache.iceberg:...`` +
catalog conf) the same entry points resolve to Iceberg scans and snapshot
metadata; locally they fall back to parquet directories with identical
semantics. Table identifiers use an ``iceberg:`` prefix
(``iceberg:catalog.db.pages``); anything else is treated as a path.

Why this layer exists:
  * ``read_table`` — DataFrame-path jobs (``encode_job``) get predicate /
    column pushdown from either source.
  * ``table_files`` — the file-granular job (``encode_files_job``) needs a
    *snapshot-consistent* file list. On Iceberg that is the ``.files``
    metadata table (no directory listing at 10^12 scale, and immune to
    concurrent writes); on a local directory it's a sorted glob.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def _is_iceberg(location: str) -> bool:
    return location.startswith(ICEBERG_PREFIX)


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """Load a table as a DataFrame (Iceberg identifier or parquet path)."""
    if _is_iceberg(location):
        ident = location[len(ICEBERG_PREFIX):]
        if not iceberg_available(spark):
            raise RuntimeError(
                f"{location}: Iceberg runtime not on the classpath; add the "
                "iceberg-spark-runtime package and catalog config"
            )
        return spark.read.format("iceberg").load(ident)
    return spark.read.parquet(location)


def table_files(spark: SparkSession, location: str) -> list[str]:
    """Snapshot-consistent data-file listing for file-granular encode.

    Iceberg: the ``<table>.files`` metadata table (file_path column) —
    the current snapshot's manifest, not a directory walk. Parquet dir:
    sorted glob (deterministic partition ids for resume).
    """
    if _is_iceberg(location):
        ident = location[len(ICEBERG_PREFIX):]
        if not iceberg_available(spark):
            raise RuntimeError(f"{location}: Iceberg runtime not available")
        rows = (
            spark.read.format("iceberg").load(f"{ident}.files")
            .select("file_path").orderBy("file_path").collect()
        )
        return [r["file_path"] for r in rows]
    files = sorted(glob.glob(os.path.join(location, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {location}")
    return files


def table_files_iter(spark: SparkSession, location: str):
    """Iterator form of ``table_files`` for stores too large to list into
    one driver-side Python list (10^9 files x ~100B path = a driver OOM).

    Iceberg: the ``.files`` metadata table is sorted CLUSTER-side and
    streamed to the driver partition-by-partition via ``toLocalIterator``
    — the driver holds one partition of paths at a time. Local parquet
    dirs return the sorted glob (path count is filesystem-bounded there).
    Pair with ``encode.encode_files_batched`` to run the encode in
    bounded-size slices."""
    if _is_iceberg(location):
        ident = location[len(ICEBERG_PREFIX):]
        if not iceberg_available(spark):
            raise RuntimeError(f"{location}: Iceberg runtime not available")
        df = (
            spark.read.format("iceberg").load(f"{ident}.files")
            .select("file_path").orderBy("file_path")
        )
        return (r["file_path"] for r in df.toLocalIterator())
    return iter(table_files(spark, location))
