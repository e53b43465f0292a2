"""``fsst`` Spark DataSource: encoded stores as a first-class format.

Exposes the chunk stores written by ``jobs.encode`` through Spark's
Python DataSource API (PySpark 4.1), so an encoded corpus reads and
writes like any other format::

    from fsst_spark.sources.fsst_source import register
    register(spark)
    df.write.format("fsst").mode("overwrite").save("/data/corpus_enc")
    hits = (spark.read.format("fsst").load("/data/corpus_enc")
                 .where("lang = 'de' AND n_chars >= 300"))

Why this matters at 100 TB: ``pushFilters`` hands the WHERE clause to the
source during planning, and each read task prunes its chunk file with the
same metadata stack ``decode_filtered`` uses — zone maps, dictionary
membership, Bloom filters — before touching any payload bytes. A fully
pruned file costs one narrow-column footer read; payload columns of
pruned files are never fetched (columnar parquet IO). Spark re-applies
the exact row predicates on top (``pushFilters`` returns every filter as
"still needs evaluation"), so chunk-granular pruning can never change
results — the same conservative contract as parquet row-group stats.

Execution shape: ``partitions()`` is one :class:`InputPartition` per
chunk file (the encode task granularity), listed driver-side — the same
O(#files) listing Spark's own ``FileIndex`` does for parquet. All
pruning and decoding happens executor-side inside ``read()``; the driver
never reads data. The write path routes each input partition through
``jobs.encode._encode_one_partition`` — identical chunk layout, zone
maps, sketches, and atomic-rename durability as ``encode_job``, so a
store written via ``df.write.format("fsst")`` is indistinguishable from
one written by the job API.

Column pruning: the Python DataSource API has no ``pruneColumns`` hook
(Spark applies projection after the scan), so narrow reads opt in via
``.option("columns", "doc_id,lang")`` — the declared schema shrinks and
``read()`` row-filters the chunk-file scan to the selected columns'
rows, so pruned columns' payload bytes are never decompressed (and with
parquet row-group filtering, largely never read).

Streaming: ``spark.readStream.format("fsst").load(store)`` follows a
GROWING store. Each completed write appends one atomic entry to
``<store>/commits/`` naming its pids (the same manifest-commit-log
pattern as Spark's file-sink ``_spark_metadata``); the stream offset is
the monotone commit index, so a micro-batch is exactly the chunk files
of newly committed writes — restart-safe, and never tears a mid-flight
append (task files become visible only through their commit entry).
Datasource writes log the entry in ``commit()``; job-API stores become
streamable via :func:`log_commit_snapshot`.

Reference tie: the reference engine exposes compression only as a
library call (``/root/reference/src/lib.rs:505-529``); surfacing the
encoded form as a queryable Spark source with predicate pushdown is the
engine-level capability this repo adds on top.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterable, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

# narrow projection that drives pruning: everything except payload bytes
_META_COLS = ["pid", "chunk_id", "column", "codec", "params",
              "zmin_long", "zmax_long"]

_FILTER_OPS = {
    EqualTo: "==",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
    In: "in",
    StringStartsWith: "prefix",
    StringContains: "contains",
    StringEndsWith: "suffix",
}


def store_column_types(store: str) -> dict[str, str]:
    """{column: arrow type name} from ONE chunk-file footer (driver-side,
    no SparkSession — the DataSource ``schema()`` hook runs before any
    job exists). Every encode partition writes all columns, so any single
    file carries the full schema."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(store, "chunks", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no encoded chunks under {store!r}")
    t = pq.read_table(files[0], columns=["column", "params"])
    cols = {
        c: json.loads(p)["arrow_type"]
        for c, p in zip(t.column("column").to_pylist(),
                        t.column("params").to_pylist())
    }
    from ..jobs.schema import added_columns, dropped_columns

    for c in dropped_columns(store):
        cols.pop(c, None)  # metadata-only drops hide the column everywhere
    for c, t in added_columns(store).items():
        cols.setdefault(c, t)  # schema-log adds: NULL until materialized
    return cols


def _store_ddl(col_types: dict[str, str]) -> str:
    from ..jobs.decode import _spark_type

    return ", ".join(f"{c} {_spark_type(col_types[c])}" for c in sorted(col_types))


@dataclass
class _ChunkFilePartition(InputPartition):
    path: str


# ---------------------------------------------------------------------------
# commit log: <store>/commits/{idx:08d}.json, one entry per COMPLETED write
# ---------------------------------------------------------------------------

def _commits_dir(store: str) -> str:
    return os.path.join(store, "commits")


def commit_count(store: str) -> int:
    """Number of committed writes — the streaming high-watermark. O(#entries)
    listing; entries are tiny JSON files, one per WRITE (not per task)."""
    d = _commits_dir(store)
    if not os.path.isdir(d):
        return 0
    return sum(1 for f in os.listdir(d) if f.endswith(".json"))


def _read_commit(store: str, idx: int) -> dict:
    with open(os.path.join(_commits_dir(store), f"{idx:08d}.json")) as fh:
        return json.load(fh)


def commit_range_pids(store: str, since: int, until: int | None = None) -> list[int]:
    """pids named by commit entries ``since+1 .. until`` inclusive — the
    snapshot algebra of the append-only commit log. ``since=-1`` means
    "from the first entry" (so a time-travel read as of N is
    ``commit_range_pids(store, -1, N)``); ``until=None`` means the latest
    entry at call time. An INCREMENTAL read between two observed
    watermarks is ``(since=N0, until=N1)`` — exactly the rows appended by
    the writes a consumer has not yet seen. Entries are immutable, so the
    same (since, until) pair always yields the same pids even while the
    store keeps growing. ``since == until`` is a valid empty range."""
    n = commit_count(store)
    if n == 0:
        raise ValueError(
            f"store {store!r} has no commit log; commit-range reads need "
            "one (write via df.write.format('fsst') or call "
            "log_commit_snapshot after an encode job)")
    if until is None:
        until = n - 1
    if not (-1 <= since <= until < n):
        raise ValueError(
            f"commit range ({since}, {until}] out of range: store has "
            f"commit entries 0..{n - 1} and needs -1 <= since <= until")
    pids: set[int] = set()
    for i in range(since + 1, until + 1):
        pids.update(_read_commit(store, i)["pids"])
    return sorted(pids)


def log_commit(store: str, pids: list[int], mode: str,
               batch_id: int | None = None) -> int:
    """Append one commit entry naming this write's chunk-file pids; returns
    the entry index. ``os.O_EXCL`` claims the next index atomically, so two
    concurrent appends serialize instead of clobbering (the loser retries
    at idx+1). Entries are never rewritten — the log is append-only, which
    is what makes the streaming offset (a plain entry count) replayable.
    ``batch_id`` tags entries written by the streaming sink so a replayed
    epoch can be recognized and skipped (see :class:`FsstStreamWriter`)."""
    os.makedirs(_commits_dir(store), exist_ok=True)
    entry = {"pids": sorted(pids), "mode": mode}
    if batch_id is not None:
        entry["batch_id"] = batch_id
    payload = json.dumps(entry).encode()
    idx = commit_count(store)
    while True:
        path = os.path.join(_commits_dir(store), f"{idx:08d}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            idx += 1
            continue
        with os.fdopen(fd, "wb") as fh:
            fh.write(payload)
        return idx


def log_commit_snapshot(store: str) -> int | None:
    """Make a job-API store streamable: log every completed pid not named
    by an existing entry as ONE new commit (None if nothing new). Call
    after an ``encode_job``/``encode_files_job`` action finishes — never
    mid-write, since completed_pids would tear the in-flight write."""
    from ..jobs.encode import completed_pids

    logged: set[int] = set()
    for i in range(commit_count(store)):
        logged.update(_read_commit(store, i)["pids"])
    fresh = completed_pids(store) - logged
    if not fresh:
        return None
    return log_commit(store, sorted(fresh), mode="snapshot")


def _translate_filter(f: Filter, col_types: dict[str, str]):
    """One Spark Filter -> internal (col, op, value) prune tuple, or None
    when the filter can't drive chunk pruning (unsupported shape, nested
    column, or a value the zone packer rejects — e.g. a float probe on an
    int column). Returning None only skips pruning; Spark still applies
    the exact predicate because ``pushFilters`` echoes every filter back."""
    op = _FILTER_OPS.get(type(f))
    if op is None or len(f.attribute) != 1:
        return None
    col = f.attribute[0]
    if col not in col_types:
        return None
    value = list(f.value) if op == "in" else f.value
    try:
        from ..jobs.decode import _prefix_bytes, _zone_key

        if op in ("prefix", "contains", "suffix"):
            _prefix_bytes(col_types[col], value, op)
        else:
            for v in (value if op == "in" else [value]):
                _zone_key(col_types[col], v)  # type check only
    except (TypeError, ValueError):
        return None
    return (col, op, value)


def _file_survivors(path: str, filters: list[tuple],
                    col_types: dict[str, str]) -> "set[tuple[int, int]] | None":
    """(pid, chunk_id) keys in one chunk file that survive every pruning
    stage for the conjunction ``filters`` — or None for "all survive"
    (no filters), letting the caller skip the key-membership filter.

    Stage order mirrors ``pruned_chunks``: zone intervals first (needs
    only the already-read meta columns), then dictionary membership and
    Bloom probes, which read the filter column's payload/bloom cells for
    still-live chunks only. Everything here runs in the read task —
    driver-side cost stays O(#files)."""
    import pyarrow.parquet as pq

    from ..jobs.decode import _STRINGY, zone_keep

    if not filters:
        return None
    have = set(pq.read_schema(path).names)
    meta = pq.read_table(path, columns=[c for c in _META_COLS if c in have])
    n = meta.num_rows
    zmins = (meta.column("zmin_long").to_pylist() if "zmin_long" in have
             else [None] * n)  # pre-zone-map store: conservatively keep all
    zmaxs = (meta.column("zmax_long").to_pylist() if "zmax_long" in have
             else [None] * n)
    zones: dict[tuple[str, tuple[int, int]], tuple] = {}
    keys: set[tuple[int, int]] = set()
    for pid, cid, col, zmin, zmax in zip(
            meta.column("pid").to_pylist(), meta.column("chunk_id").to_pylist(),
            meta.column("column").to_pylist(), zmins, zmaxs):
        keys.add((pid, cid))
        zones[(col, (pid, cid))] = (zmin, zmax)
    live = {
        k for k in keys
        if all(zone_keep(col_types[col], op, value, *zones.get((col, k), (None, None)))
               for col, op, value in filters)
    }
    for col, op, value in filters:
        if not live:
            break
        if col_types[col] in _STRINGY and op in ("==", "in", "prefix",
                                                 "contains", "suffix"):
            live = _dict_survivors(path, meta, col, op, value, live)
        if op in ("==", "in"):
            live = _bloom_survivors(path, meta, col, value, col_types[col], live)
    return live


def _bloom_survivors(path: str, meta: "pa.Table", col: str, value,
                     arrow_name: str, live: set) -> set:
    """Drop live chunks whose Bloom filter proves every probed value
    absent — the same typing rules as ``_bloom_value_drop`` (strings
    hash natively, ints as-is, timestamps in storage-unit ticks)."""
    import pyarrow.parquet as pq

    from ..jobs.decode import _INTY, _STRINGY, _ts_ticks
    from ..kernel.bloom import bloom_might_contain

    vals = value if isinstance(value, (list, tuple, set)) else [value]
    if arrow_name in _STRINGY:
        probes = list(vals)
    elif arrow_name in _INTY:
        probes = [int(v) for v in vals]
    elif arrow_name.startswith("timestamp["):
        probes = [_ts_ticks(arrow_name, v) for v in vals]
    else:
        return live
    if "bloom" not in pq.read_schema(path).names:
        return live  # pre-bloom store
    rows = [
        i for i, c in enumerate(meta.column("column").to_pylist())
        if c == col
        and (meta.column("pid")[i].as_py(), meta.column("chunk_id")[i].as_py()) in live
    ]
    if not rows:
        return live
    blooms = pq.read_table(path, columns=["pid", "chunk_id", "bloom"])
    out = set(live)
    for i in rows:
        blob = blooms.column("bloom")[i].as_py()
        if blob is None:
            continue  # dict-coded / bloom-less chunk: conservatively keep
        key = (blooms.column("pid")[i].as_py(), blooms.column("chunk_id")[i].as_py())
        if not bloom_might_contain(blob, probes):
            out.discard(key)
    return out


def _dict_survivors(path: str, meta: "pa.Table", col: str, op: str, value,
                    live: set) -> set:
    """Drop live chunks whose str_dict dictionary provably lacks every
    probed value. Runs only when the file has live dict-coded rows for
    the filter column, and decodes only their dictionary sections (the
    payload column read is file-granular — parquet IO can't slice rows
    within a row group — but the decode cost stays dictionary-only)."""
    import pyarrow.parquet as pq

    from ..jobs.decode import _dict_probes, dict_payload_has_value

    rows = [
        i for i, (c, codec) in enumerate(zip(meta.column("column").to_pylist(),
                                             meta.column("codec").to_pylist()))
        if c == col and codec == "str_dict"
        and (meta.column("pid")[i].as_py(), meta.column("chunk_id")[i].as_py()) in live
    ]
    if not rows:
        return live
    by_len, pfx, sub, sfx = _dict_probes(value, prefix=op == "prefix",
                                         contains=op == "contains",
                                         suffix=op == "suffix")
    full = pq.read_table(path, columns=["pid", "chunk_id", "params", "payload"])
    out = set(live)
    for i in rows:
        key = (meta.column("pid")[i].as_py(), meta.column("chunk_id")[i].as_py())
        params = json.loads(full.column("params")[i].as_py())
        payload = full.column("payload")[i].as_py()
        if not dict_payload_has_value(params, payload, by_len, pfx, sub,
                                      sfx):
            out.discard(key)
    return out


class FsstReader(DataSourceReader):
    def __init__(self, store: str, col_types: dict[str, str],
                 as_of: int | None = None, since: int | None = None):
        self.store = store
        self.col_types = col_types
        self.as_of = as_of
        self.since = since
        self.pruning: list[tuple] = []

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        for f in filters:
            t = _translate_filter(f, self.col_types)
            if t is not None:
                self.pruning.append(t)
        # chunk pruning is conservative, never exact: every filter goes
        # back to Spark for row-level evaluation (the parquet model)
        return filters

    def partitions(self) -> list[InputPartition]:
        # commit-range reads, both sugar over commit_range_pids:
        #   .option("as_of", N)        → entries 0..N  (time travel — the
        #     Iceberg snapshot-id read, on the same append-only log the
        #     stream follows)
        #   .option("since_commit", N) → entries N+1..latest (incremental /
        #     CDC-style batch read: only rows appended by writes a consumer
        #     has not yet seen; compose with as_of for a closed range
        #     (since, as_of]). Entries are immutable, so the same options
        #     always return the same rows even while the store keeps
        #     growing. Row tombstones (jobs.deletes) are store-global
        #     physical state, not versioned — deletes still apply.
        if self.as_of is not None or self.since is not None:
            pids = commit_range_pids(
                self.store,
                -1 if self.since is None else self.since,
                self.as_of)
            return [
                _ChunkFilePartition(os.path.join(self.store, "chunks",
                                                 f"part-{pid:05d}.parquet"))
                for pid in sorted(pids)
            ]
        # datasource-written stores log every completed write: read exactly
        # the committed pids, so a torn/aborted append's leftover files are
        # invisible (snapshot isolation). Job-API stores (no logging
        # guarantee) keep the plain listing — their resume contract already
        # treats present files as durable.
        if commit_count(self.store):
            from ..jobs.encode import _manifest_mode

            if _manifest_mode(self.store) in ("datasource", "stream"):
                pids: set[int] = set()
                for i in range(commit_count(self.store)):
                    pids.update(_read_commit(self.store, i)["pids"])
                return [
                    _ChunkFilePartition(os.path.join(self.store, "chunks",
                                                     f"part-{pid:05d}.parquet"))
                    for pid in sorted(pids)
                ]
        files = sorted(glob.glob(os.path.join(self.store, "chunks", "*.parquet")))
        return [_ChunkFilePartition(f) for f in files]

    def read(self, partition: _ChunkFilePartition) -> Iterator["pa.RecordBatch"]:
        return _read_chunk_file(partition.path, self.col_types, self.pruning)


def _read_chunk_file(path: str, col_types: dict[str, str],
                     pruning: list[tuple]) -> Iterator["pa.RecordBatch"]:
    """Decode one chunk file into RecordBatches of ``col_types``' columns
    (shared by the batch and stream readers). When ``col_types`` is a
    projection (the ``columns`` read option), the parquet scan row-filters
    to the selected columns, so pruned columns' payloads are never
    decompressed — and pruning stages still only read the filter columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..env import madvise_hugepages
    from ..jobs.deletes import DeleteMask, has_deletes
    from ..kernel.codecs import decode_column

    madvise_hugepages()
    # row tombstones (jobs.deletes) apply here too: chunk files live under
    # <store>/chunks/, so the store root is two levels up
    store_root = os.path.dirname(os.path.dirname(path))
    dmask = DeleteMask(store_root) if has_deletes(store_root) else None
    live = _file_survivors(path, pruning, col_types)
    if live is not None and not live:
        return  # fully pruned: payload column bytes were never read
    ordered = sorted(col_types)
    target = _arrow_schema(col_types, ordered)
    from ..jobs.schema import added_columns

    all_added = set(added_columns(store_root))
    added = all_added & set(col_types)
    scan_cols = list(ordered)
    if added and set(ordered) <= added:
        # only schema-log-added columns requested: scan one column that
        # exists in EVERY chunk as the row-count carrier (dropped before
        # emit) — exclude the whole added log, since a materialized add
        # is physical in new files but absent from pre-add chunks
        phys = sorted(set(store_column_types(store_root)) - all_added)
        if phys:
            scan_cols.append(phys[0])
    tbl = pq.read_table(
        path,
        columns=["pid", "chunk_id", "column", "codec", "params", "payload"],
        filters=[("column", "in", scan_cols)])
    chunks: dict[tuple[int, int], dict] = {}
    # zip arrow scalars; .as_py() materializes a payload only for
    # chunks that survived pruning
    for pid_s, cid_s, col_s, codec_s, params_s, payload_s in zip(
            tbl.column("pid"), tbl.column("chunk_id"), tbl.column("column"),
            tbl.column("codec"), tbl.column("params"), tbl.column("payload")):
        key = (pid_s.as_py(), cid_s.as_py())
        if live is not None and key not in live:
            continue
        chunks.setdefault(key, {})[col_s.as_py()] = decode_column(
            {"codec": codec_s.as_py(), "params": json.loads(params_s.as_py()),
             "payload": payload_s.as_py()})
    for key in sorted(chunks):
        cols = chunks[key]
        n = len(next(iter(cols.values()))) if cols else 0
        # pre-add chunks lack rows for schema-log-added columns: virtual NULLs
        arrays = [(cols[c].cast(target.field(i).type) if c in cols
                   else pa.nulls(n, target.field(i).type))
                  for i, c in enumerate(ordered)]
        if dmask is not None:
            from ..jobs.deletes import apply_delete_mask

            arrays = apply_delete_mask(dmask, key[0], key[1], arrays)
            if arrays is None:
                continue  # every row of the chunk tombstoned
        yield pa.RecordBatch.from_arrays(arrays, schema=target)


def _arrow_schema(col_types: dict[str, str], ordered: list[str]) -> "pa.Schema":
    """Arrow schema Spark's converter accepts for the declared DDL types
    (decoded arrays may be large_string/large_binary — cast down; chunk
    payloads are bounded by chunk_bytes, far under the 2 GiB offset limit)."""
    import pyarrow as pa

    def t(arrow_name: str) -> "pa.DataType":
        if arrow_name.startswith("timestamp["):
            return pa.timestamp("us")
        if arrow_name.startswith(("list<", "large_list<", "fixed_size_list<")):
            # "list<element: float>": strip wrapper + child field name;
            # Spark's converter wants plain list<> whatever was stored
            inner = arrow_name[arrow_name.index("<") + 1 : arrow_name.rindex(">")]
            child = (inner.split(": ", 1)[1]
                     if ": " in inner.split("<", 1)[0] else inner)
            return pa.list_(t(child))
        return {
            "string": pa.string(), "large_string": pa.string(),
            "binary": pa.binary(), "large_binary": pa.binary(),
            "int64": pa.int64(), "int32": pa.int32(),
            "int16": pa.int16(), "int8": pa.int8(),
            "double": pa.float64(), "float": pa.float32(),
            "bool": pa.bool_(),
        }[arrow_name]

    return pa.schema([(c, t(col_types[c])) for c in ordered])


class FsstStreamReader(DataSourceStreamReader):
    """Micro-batch reader over a growing store. Offset = commit-log entry
    count, so a batch is exactly the chunk files of writes committed in
    (start, end] — replayable (entries are immutable), tear-free (files
    become visible only via their commit entry), and O(1)-sized offsets
    no matter how many pids a store accumulates."""

    def __init__(self, store: str, col_types: dict[str, str]):
        self.store = store
        self.col_types = col_types

    def initialOffset(self) -> dict:
        return {"commit": 0}

    def latestOffset(self) -> dict:
        return {"commit": commit_count(self.store)}

    def partitions(self, start: dict, end: dict) -> List[InputPartition]:
        pids: set[int] = set()
        for i in range(start["commit"], end["commit"]):
            pids.update(_read_commit(self.store, i)["pids"])
        return [
            _ChunkFilePartition(os.path.join(self.store, "chunks",
                                             f"part-{pid:05d}.parquet"))
            for pid in sorted(pids)
        ]

    def read(self, partition: _ChunkFilePartition) -> Iterator["pa.RecordBatch"]:
        # stream scans have no pushFilters hook; Spark filters rows above
        return _read_chunk_file(partition.path, self.col_types, [])

    def commit(self, end: dict) -> None:
        return None  # progress is tracked by Spark's own checkpoint


@dataclass
class _FsstCommit(WriterCommitMessage):
    pid: int
    n_rows: int


class FsstWriter(DataSourceArrowWriter):
    def __init__(self, store: str, options: dict, pid_offset: int = 0):
        self.store = store
        self.pid_offset = pid_offset
        self.chunk_bytes = int(options.get("chunk_bytes", 32 << 20))
        self.bloom_bits = int(options.get("bloom_bits_per_value", 10))
        self.hll_p = int(options.get("hll_p", 10))
        self.qsample_k = int(options.get("qsample_k", 256))
        self.lineage_json = json.dumps(
            {"mode": "datasource", "chunk_bytes": self.chunk_bytes,
             "bloom_bits_per_value": self.bloom_bits, "hll_p": self.hll_p,
             "qsample_k": self.qsample_k, "pid_offset": pid_offset})

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> _FsstCommit:
        from pyspark import TaskContext

        from ..jobs.encode import _encode_one_partition

        pid = TaskContext.get().partitionId() + self.pid_offset
        row = _encode_one_partition(
            pid, iterator, self.store, self.chunk_bytes, self.lineage_json,
            set(), self.bloom_bits, self.hll_p, self.qsample_k)
        return _FsstCommit(pid=pid, n_rows=row["n_rows"] if row else 0)

    def commit(self, messages) -> None:
        # chunk+manifest files were atomically renamed per task; publish
        # them to stream readers as ONE commit-log entry (empty partitions
        # wrote no chunk file and are excluded)
        log_commit(self.store,
                   [m.pid for m in messages if m is not None and m.n_rows > 0],
                   mode="datasource")

    def abort(self, messages) -> None:
        # no commit entry is logged, so stream readers never see this
        # write's files; a later append re-claims fresh pids past these
        return None


_STREAM_PID_BITS = 20  # pid = (epoch << 20) | taskPartitionId


class FsstStreamWriter(DataSourceStreamArrowWriter):
    """writeStream.format('fsst'): continuous encode of a stream into a
    chunk store, exactly-once.

    pid keying is EPOCH-SCOPED and deterministic: ``(batchId << 20) |
    partitionId`` (batchId read task-side from the ``streaming.sql.batchId``
    local property Spark sets on micro-batch tasks). A replayed epoch
    re-runs the same input partitions onto the same pids — the atomic
    rename overwrites with identical content — and ``commit()`` skips
    logging when an entry for that batchId already exists, so downstream
    stream readers never see a write twice. Epochs that fail before
    commit leave files no reader trusts (stream-mode stores are read
    through the commit log only)."""

    def __init__(self, store: str, options: dict):
        self.store = store
        self.chunk_bytes = int(options.get("chunk_bytes", 32 << 20))
        self.bloom_bits = int(options.get("bloom_bits_per_value", 10))
        self.hll_p = int(options.get("hll_p", 10))
        self.qsample_k = int(options.get("qsample_k", 256))

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> _FsstCommit:
        from pyspark import TaskContext

        from ..jobs.encode import _encode_one_partition

        ctx = TaskContext.get()
        batch_id = ctx.getLocalProperty("streaming.sql.batchId")
        if batch_id is None:
            raise RuntimeError(
                "streaming.sql.batchId local property missing — cannot key "
                "epoch-scoped pids; use streaming.encode_stream (foreachBatch) "
                "on this Spark build")
        part = ctx.partitionId()
        if part >= (1 << _STREAM_PID_BITS):
            raise ValueError(
                f"micro-batch has >{1 << _STREAM_PID_BITS} partitions; "
                "coalesce the stream or raise _STREAM_PID_BITS")
        pid = (int(batch_id) << _STREAM_PID_BITS) | part
        lineage_json = json.dumps(
            {"mode": "stream", "chunk_bytes": self.chunk_bytes,
             "batch_id": int(batch_id),
             "bloom_bits_per_value": self.bloom_bits, "hll_p": self.hll_p,
             "qsample_k": self.qsample_k})
        row = _encode_one_partition(
            pid, iterator, self.store, self.chunk_bytes, lineage_json,
            set(), self.bloom_bits, self.hll_p, self.qsample_k)
        return _FsstCommit(pid=pid, n_rows=row["n_rows"] if row else 0)

    def commit(self, messages, batchId: int) -> None:
        for i in range(commit_count(self.store)):
            if _read_commit(self.store, i).get("batch_id") == batchId:
                return  # replayed epoch: already published, exactly-once
        log_commit(self.store,
                   [m.pid for m in messages if m is not None and m.n_rows > 0],
                   mode="stream", batch_id=batchId)

    def abort(self, messages, batchId: int) -> None:
        # files of the failed epoch stay untrusted (no commit entry); the
        # replay overwrites them pid-for-pid
        return None


class FsstDataSource(DataSource):
    """spark.read.format("fsst") / df.write.format("fsst") over encoded
    chunk stores. ``load(path)``/``save(path)`` name the store directory."""

    @classmethod
    def name(cls) -> str:
        return "fsst"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("fsst source needs a store path: .load(path) / .save(path)")
        return path

    def _types(self) -> dict[str, str]:
        """Store column types, narrowed by the ``columns`` read option
        (comma-separated). Spark has no pruneColumns hook for Python
        sources, so narrow reads are opt-in: the declared schema shrinks
        and unselected columns' payloads are never decoded."""
        types = store_column_types(self._path())
        sel = self.options.get("columns")
        if not sel:
            return types
        wanted = [c.strip() for c in sel.split(",") if c.strip()]
        missing = [c for c in wanted if c not in types]
        if missing:
            raise ValueError(
                f"columns option names {missing} not in store "
                f"(has {sorted(types)})")
        return {c: types[c] for c in wanted}

    def schema(self) -> str:
        return _store_ddl(self._types())

    def reader(self, schema) -> FsstReader:
        as_of = self.options.get("as_of")
        since = self.options.get("since_commit")
        return FsstReader(self._path(), self._types(),
                          as_of=None if as_of is None else int(as_of),
                          since=None if since is None else int(since))

    def streamReader(self, schema) -> FsstStreamReader:
        store = self._path()
        if commit_count(store) == 0 and not os.path.isdir(_commits_dir(store)):
            raise ValueError(
                f"store {store!r} has no commit log; streaming follows "
                "committed writes only. Write it via df.write.format('fsst') "
                "or call fsst_source.log_commit_snapshot(store) after an "
                "encode job finishes.")
        return FsstStreamReader(store, self._types())

    def streamWriter(self, schema, overwrite: bool) -> FsstStreamWriter:
        from ..jobs.encode import _manifest_mode

        store = self._path()
        if overwrite:
            raise ValueError(
                "the fsst streaming sink is append-only (a store is an "
                "accumulating corpus); 'complete'/truncate output modes are "
                "not supported")
        mode = _manifest_mode(store)
        if mode not in (None, "stream"):
            raise ValueError(
                f"store {store!r} was written by encode mode {mode!r}; the "
                "streaming sink keys pids by (epoch, partition) and only "
                "composes with stream-mode stores — point writeStream at a "
                "fresh directory")
        from ..jobs.schema import added_columns, dropped_columns

        names = {f.name for f in schema.fields}
        ghost = dropped_columns(store) & names
        if ghost:
            raise ValueError(
                f"stream writes columns {sorted(ghost)} that were DROPPED "
                f"from store {store!r}; undrop_column first or drop them "
                "from the frame")
        lacking = set(added_columns(store)) - names
        if lacking:
            raise ValueError(
                f"stream lacks columns {sorted(lacking)} that were ADDED "
                f"to store {store!r}; include them (NULLs are fine) or "
                "drop_column first")
        for sub in ("chunks", "manifest"):
            os.makedirs(os.path.join(store, sub), exist_ok=True)
        return FsstStreamWriter(store, dict(self.options))

    def writer(self, schema, overwrite: bool) -> FsstWriter:
        import shutil

        store = self._path()
        pid_offset = 0
        if overwrite:
            for sub in ("chunks", "manifest", "commits"):
                shutil.rmtree(os.path.join(store, sub), ignore_errors=True)
        else:
            # append: new partitions take pids past every existing one, so
            # the store grows without touching (or re-reading) prior data —
            # incremental loads are just another write. Mode mixing is
            # refused the same way encode_job's resume guard does: pids
            # keyed by another scheme could silently collide.
            from ..jobs.encode import _manifest_mode

            mode = _manifest_mode(store)
            if mode not in (None, "datasource"):
                raise ValueError(
                    f"store {store!r} was written by encode mode {mode!r}; "
                    "append via df.write.format('fsst') only composes with "
                    "datasource-written stores — use jobs.encode APIs here")
            existing = glob.glob(os.path.join(store, "manifest", "part-*.parquet"))
            if existing:
                pid_offset = 1 + max(
                    int(os.path.basename(p)[len("part-"):-len(".parquet")])
                    for p in existing)
            from ..jobs.schema import dropped_columns

            ghost = dropped_columns(store) & {f.name for f in schema.fields}
            if ghost:
                raise ValueError(
                    f"append writes columns {sorted(ghost)} that were "
                    f"DROPPED from store {store!r}; undrop_column first "
                    "or drop them from the frame")
            from ..jobs.schema import added_columns

            # appends after ADD COLUMN must carry it: the decode readers'
            # virtual-NULL fill applies only to chunks PREDATING the add —
            # column growth stays monotone across chunk generations
            lacking = set(added_columns(store)) - {f.name for f in schema.fields}
            if lacking:
                raise ValueError(
                    f"append lacks columns {sorted(lacking)} that were "
                    f"ADDED to store {store!r}; include them (NULLs are "
                    "fine) or drop_column first")
        for sub in ("chunks", "manifest"):
            os.makedirs(os.path.join(store, sub), exist_ok=True)
        return FsstWriter(store, dict(self.options), pid_offset)


def register(spark) -> None:
    """Register the ``fsst`` format on this session (idempotent) and
    enable Python-source filter pushdown (off by default in Spark 4.1;
    without it a reader that implements ``pushFilters`` is rejected)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FsstDataSource)


def register_store_view(spark, store: str, name: str,
                        columns: str | None = None) -> None:
    """Expose an encoded store to the SQL surface: ``spark.sql("SELECT
    ... FROM name")`` runs over the fsst source with the full pushdown
    stack (zone/dict/bloom chunk pruning via pushFilters, tombstones,
    time travel via a separate registration with ``.option``). SQL
    predicates on the view reach the source's ``pushFilters`` hook, so
    ``WHERE doc_id >= X`` on a clustered store scans only matching
    chunks. ``columns`` (comma-separated) narrows the view to a column
    subset whose payloads are never decoded."""
    register(spark)
    reader = spark.read.format("fsst")
    if columns:
        reader = reader.option("columns", columns)
    reader.load(store).createOrReplaceTempView(name)


def register_stores_view(spark, stores: "list[str]", name: str,
                         columns: str | None = None) -> None:
    """Expose a FAMILY of stores (the daily-shard layout) as ONE SQL
    view: ``UNION ALL`` over per-store ``fsst`` reads. Catalyst pushes
    the view's ``WHERE`` predicates through the Union into every
    branch's ``pushFilters``, so zone/dict/bloom chunk pruning still
    applies per shard — a ``warc_ts`` range over a year of daily shards
    skips whole stores. Columns shared by several shards must agree on
    type (checked against every manifest up front — a drifted shard
    fails at registration, not mid-query); columns missing from older
    shards null-fill via ``unionByName(allowMissingColumns=True)``, the
    same semantics the engine's metadata-only ADD COLUMN gives within
    one store."""
    if not stores:
        raise ValueError("register_stores_view needs at least one store")
    register(spark)
    wanted = ([c.strip() for c in columns.split(",") if c.strip()]
              if columns else None)
    seen: dict[str, tuple[str, str]] = {}
    for s in stores:
        for c, t in store_column_types(s).items():
            if wanted is not None and c not in wanted:
                continue
            if c in seen and seen[c][0] != t:
                raise TypeError(
                    f"column {c!r} is {seen[c][0]} in {seen[c][1]} but "
                    f"{t} in {s}; shards of one logical table must agree "
                    f"— cast and re-encode the drifted store")
            seen.setdefault(c, (t, s))
    parts = []
    for s in stores:
        reader = spark.read.format("fsst")
        if wanted is not None:
            have = [c for c in wanted if c in store_column_types(s)]
            if not have:
                continue  # shard carries none of the projected columns
            reader = reader.option("columns", ",".join(have))
        parts.append(reader.load(s))
    if not parts:
        raise KeyError(
            f"no store in {stores} carries any of the requested columns "
            f"{wanted}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    out.createOrReplaceTempView(name)
