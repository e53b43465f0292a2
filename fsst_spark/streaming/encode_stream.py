"""Structured-Streaming ingest -> encode: continuous column compression.

New files landing under a table location are picked up by a file-source
stream and encoded into the same chunks/ + manifest/ layout the batch
``encode_job`` writes, so batch decode/verify work unchanged on a
streaming-encoded corpus.

Exactly-once without a transactional sink: each micro-batch (epoch) gets a
disjoint partition-id range (``epoch * PID_STRIDE``), and WITHIN an epoch
pids are keyed on a stable identity — the sorted list of the epoch's input
files (pid = stride + index), which the streaming checkpoint pins exactly
per epoch. A replayed epoch therefore re-derives the identical pid->rows
mapping regardless of cluster size or session config (a partition-id-based
mapping would shift with ``maxPartitionBytes``/core count and silently
drop/duplicate rows on a resized restart); every completed pid hits the
manifest skip, so chunks are never duplicated. This is the idempotent-sink
pattern recommended for ``foreachBatch`` sinks.

At 10^12-document scale this is the "encode as data arrives" shape: the
stream runs with a processing-time trigger against the table's file feed
(or an Iceberg incremental scan), and the manifest doubles as the
streaming progress ledger.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..jobs.encode import encode_files_job, encode_job

PID_STRIDE = 1_000_000  # max partitions per micro-batch


def encode_stream_job(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    columns: list[str] | None = None,
    chunk_bytes: int = 32 << 20,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    lineage: dict | None = None,
) -> StreamingQuery:
    """Start the streaming encode; returns the StreamingQuery.

    ``available_now=True`` drains everything currently present and stops
    (the incremental-batch shape: re-running later encodes only new files,
    tracked by the stream checkpoint). With ``available_now=False`` the
    query runs continuously on the default trigger.
    """
    schema = spark.read.parquet(input_path).schema  # file source needs a schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    if columns:
        stream = stream.select(*columns)

    def sink(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lin = {**(lineage or {}), "stream_epoch": int(epoch_id), "source": input_path}
        # The epoch's file set is pinned by the stream checkpoint: encode it
        # file-granularly so pids key on (epoch, sorted-file-index) — a
        # stable identity that replays identically on any cluster/config.
        files = sorted(p.removeprefix("file://") for p in batch_df.inputFiles())
        if files:
            encode_files_job(
                spark, input_path, out_dir,
                columns=columns,
                chunk_bytes=chunk_bytes,
                resume=True,  # epoch replay -> completed-pid skip (idempotent)
                files=files,
                pid_offset=int(epoch_id) * PID_STRIDE,
                lineage=lin,
            ).collect()
        else:
            # non-file micro-batch (e.g. a transformed source): fall back to
            # partition-id keying — idempotent only under unchanged
            # parallelism/config, hence the file path above is the default
            encode_job(
                spark, batch_df, out_dir,
                columns=columns,
                chunk_bytes=chunk_bytes,
                resume=True,
                pre_partitioned=True,
                pid_offset=int(epoch_id) * PID_STRIDE,
                lineage=lin,
            ).collect()

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
