"""Row-level deletes on encoded stores: position tombstones, merge-on-read.

The shape is Iceberg v2's position deletes. ``delete_where`` never
rewrites a chunk file: it decodes only the predicate columns of the
chunks that might match (the same zone/dict/bloom pruning stack the
selective decoder uses), computes the exact row mask chunk-locally, and
appends narrow ``(pid, chunk_id, pos)`` tombstone rows under
``<store>/deletes/``. Every read that goes through ``decode_job`` /
``decode_filtered`` / the ``fsst`` DataSource then applies the
tombstones executor-side — each task reads the tombstone parquet with a
pushed ``pid`` filter once per pid it touches, so merge-on-read costs
one narrow-side lookup, never a shuffle or a driver collect.

What deletes do NOT compose with, by design: the metadata-only /
sketch-answering fast paths (``encoded_stats``, group-by pushdown,
encoded top-k/distinct/NDV/quantiles, store profiling). Their answers
come from encode-time chunk statistics, which tombstones invalidate;
each of those entry points calls :func:`require_no_deletes` and fails
fast with instructions instead of silently returning pre-delete
numbers. ``compact_store`` likewise refuses: it remaps (pid, chunk_id)
keys while copying payloads verbatim, which would orphan the tombstones.
``materialize_deletes`` (decode -> re-encode, the Iceberg
``rewrite_data_files`` analog) folds tombstones into a new store and
restores every fast path; ``recluster_store`` does too, since it reads
through the delete-aware decoder.

``verify_chunks`` stays tombstone-blind on purpose: it checks the
PHYSICAL store (per-chunk checksums of what encode wrote), which deletes
never modify.

At 100 TB: the delete scan is one pass over only the candidate chunks'
predicate columns (pruned like any selective decode), the tombstone
write is a distributed parquet append keyed and sorted by (pid,
chunk_id), and read-side application is per-task and pid-local. The
driver never sees a row.

Reference tie: engine-level surface with no reference analog
(spiraldb/fsst src/lib.rs:14-17 exports codec types only).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Iterator

import numpy as np
import pyarrow as pa

DELETES_SUBDIR = "deletes"


def _deletes_dir(store: str) -> str:
    return os.path.join(store, DELETES_SUBDIR)


def _delete_files(store: str) -> list[str]:
    return sorted(glob.glob(os.path.join(_deletes_dir(store), "*.parquet")))


def has_deletes(store: str) -> bool:
    """True when the store carries row tombstones (merge-on-read state)."""
    return bool(_delete_files(store))


def require_no_deletes(store: str, op: str) -> None:
    """Guard for metadata/sketch-answering fast paths: encode-time chunk
    statistics don't know about tombstoned rows, so answering from them
    on a store with deletes would be silently wrong. Fail fast instead."""
    if has_deletes(store):
        raise ValueError(
            f"{op} answers from encode-time chunk metadata/sketches, and "
            f"store {store!r} has row tombstones (deletes/) those stats "
            "don't reflect. Materialize them first — "
            "jobs.deletes.materialize_deletes(spark, store, new_store) or "
            "recluster_store — then retry against the new store.")


def deleted_count(store: str) -> int:
    """Total tombstoned positions — parquet row counts, no data read."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in _delete_files(store))


def load_delete_positions(store: str, pid: int) -> dict[int, np.ndarray]:
    """Executor-side: ``{chunk_id: sorted unique positions}`` tombstoned
    in one pid's chunks. A pushed-filter read of the narrow tombstone
    files; row-group stats on the sorted (pid, chunk_id) layout skip
    other pids' groups."""
    import pyarrow.dataset as ds

    files = _delete_files(store)
    if not files:
        return {}
    tbl = ds.dataset(files, format="parquet").to_table(
        filter=ds.field("pid") == pid)
    out: dict[int, np.ndarray] = {}
    if tbl.num_rows == 0:
        return out
    cids = tbl.column("chunk_id").to_numpy(zero_copy_only=False)
    poss = tbl.column("pos").to_numpy(zero_copy_only=False)
    for cid in np.unique(cids):
        out[int(cid)] = np.unique(poss[cids == cid])
    return out


class DeleteMask:
    """Per-task tombstone cache: one pushed-filter read per pid a task
    touches, then O(deleted) masking per chunk."""

    def __init__(self, store: str):
        self.store = store
        self._by_pid: dict[int, dict[int, np.ndarray]] = {}

    def positions(self, pid: int, chunk_id: int) -> np.ndarray | None:
        if pid not in self._by_pid:
            self._by_pid[pid] = load_delete_positions(self.store, pid)
        pos = self._by_pid[pid].get(chunk_id)
        return pos if pos is not None and len(pos) else None

    def keep_indices(self, pid: int, chunk_id: int, n: int) -> np.ndarray | None:
        """Surviving row indices of an n-row chunk, or None when nothing
        in the chunk is tombstoned (callers skip the take entirely)."""
        pos = self.positions(pid, chunk_id)
        if pos is None:
            return None
        mask = np.ones(n, dtype=bool)
        mask[pos[pos < n]] = False
        return np.flatnonzero(mask)


def delete_where(spark, store: str, col: str | None = None,
                 op: str | None = None, value=None,
                 filters: list[tuple] | None = None,
                 any_filters: list[tuple] | None = None,
                 pids: list[int] | None = None) -> dict:
    """Tombstone every row matching the predicate; returns
    ``{"deleted_now", "deleted_total"}``. Predicate forms mirror
    ``decode_filtered``: one ``(col, op, value)`` positionally, a
    conjunction via ``filters``, a disjunction via ``any_filters`` —
    combined as ``AND(filters) AND OR(any_filters)``.

    Plan: zone/dict/bloom pruning -> decode ONLY the predicate columns of
    surviving chunks -> exact chunk-local row mask (minus already-
    tombstoned positions, so repeated deletes are idempotent and counts
    stay exact) -> distributed append of (pid, chunk_id, pos) rows sorted
    by chunk key (read-side pid filters then prune row groups). A JSON
    entry per call under ``deletes/_log/`` records the predicate for
    lineage. ``pids`` restricts the scan to those partitions —
    ``update_where`` uses it to tombstone only pre-append writes."""
    from ..kernel.codecs import decode_column
    from .agg import _arrow_mask, _conj_mask
    from .decode import (
        chunk_repartition,
        column_arrow_types,
        pruned_chunks,
        pruned_chunks_any,
    )

    flt = list(filters or [])
    if col is not None:
        flt.insert(0, (col, op, value))
    any_flt = list(any_filters or [])
    if not flt and not any_flt:
        raise ValueError("delete_where needs (col, op, value), "
                         "filters=[...], or any_filters=[...]")
    types = column_arrow_types(spark, store)
    fcols: list[str] = []
    for f in flt + any_flt:
        if f[0] not in types:
            raise KeyError(f"column {f[0]!r} not in encoded data")
        if f[0] not in fcols:
            fcols.append(f[0])

    chunks = pruned_chunks(spark, store, fcols, flt, dict_prune=True)
    if pids is not None:
        if len(pids) <= 100_000:
            chunks = chunks.where(chunks["pid"].isin(sorted(pids)))
        else:
            from pyspark.sql import functions as F

            pdf = spark.createDataFrame([(p,) for p in sorted(pids)], "pid int")
            chunks = chunks.join(F.broadcast(pdf), "pid", "left_semi")
    if any_flt:
        any_keep = pruned_chunks_any(spark, store, fcols, list(any_flt),
                                     dict_prune=True) \
            .select("pid", "chunk_id").distinct()
        chunks = chunks.join(any_keep, ["pid", "chunk_id"], "left_semi")
    chunks = chunk_repartition(
        spark, chunks.select("pid", "chunk_id", "column", "codec",
                             "params", "payload"), store)

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        mask_cache = DeleteMask(store)
        # assemble per-chunk predicate columns WITH their keys: inline the
        # grouping loop (agg._assembled_chunks hides the (pid, chunk_id)
        # key, which the tombstone rows need)
        pending: dict[tuple[int, int], dict[str, dict]] = {}
        for batch in batches:
            for pid_s, cid_s, col_s, codec_s, params_s, payload_s in zip(
                    batch.column("pid"), batch.column("chunk_id"),
                    batch.column("column"), batch.column("codec"),
                    batch.column("params"), batch.column("payload")):
                key = (pid_s.as_py(), cid_s.as_py())
                cols = pending.setdefault(key, {})
                cols[col_s.as_py()] = {
                    "codec": codec_s.as_py(),
                    "params": json.loads(params_s.as_py()),
                    "payload": payload_s.as_py(),
                }
                if len(cols) != len(fcols):
                    continue
                del pending[key]
                decoded: dict[str, pa.Array] = {}
                mask = _conj_mask(cols, flt, types, decoded)
                if any_flt:
                    amask: np.ndarray | None = None
                    for fc, fop, fval in any_flt:
                        if fc not in decoded:
                            decoded[fc] = decode_column(cols[fc])
                        m = _arrow_mask(decoded[fc], fop, fval, types[fc])
                        amask = m if amask is None else (amask | m)
                    mask = amask if mask is None else (mask & amask)
                if mask is None or not mask.any():
                    continue
                already = mask_cache.positions(*key)
                pos = np.flatnonzero(mask).astype(np.int64)
                if already is not None:
                    pos = pos[~np.isin(pos, already)]
                if not len(pos):
                    continue
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.full(len(pos), key[0], dtype=np.int32)),
                     pa.array(np.full(len(pos), key[1], dtype=np.int32)),
                     pa.array(pos)],
                    names=["pid", "chunk_id", "pos"])
        if pending:
            raise RuntimeError(
                f"incomplete chunks (missing column rows): {sorted(pending)[:4]}")

    before = deleted_count(store)
    tomb = chunks.mapInArrow(task, "pid int, chunk_id int, pos bigint")
    # sorted layout => parquet row-group (pid, chunk_id) stats prune the
    # read-side pushed pid filter; append keeps prior tombstones intact
    (tomb.sortWithinPartitions("pid", "chunk_id", "pos")
         .write.mode("append").parquet(_deletes_dir(store)))
    total = deleted_count(store)
    _log_delete(store, {"filters": [list(f) for f in flt],
                        "any_filters": [list(f) for f in any_flt],
                        "deleted_now": total - before,
                        "deleted_total": total})
    return {"deleted_now": total - before, "deleted_total": total}


def delete_matching(spark, store: str, col: str, keys_df,
                    pids: list[int] | None = None,
                    max_pushdown_keys: int = 100_000,
                    max_broadcast_keys: int = 10_000_000) -> dict:
    """Tombstone every row whose ``col`` appears in ``keys_df`` (a
    single-column frame or a Python iterable) — the delete half of an
    upsert. Scale tiers:

    - ≤ ``max_pushdown_keys`` distinct keys: collected and routed through
      ``delete_where(col, 'in', keys)`` — the full zone/dict/bloom chunk
      pruning stack applies (the ``decode_semijoin`` runtime-filter shape).
    - ≤ ``max_broadcast_keys``: keys broadcast as a set to the scan tasks;
      every chunk's key column decodes, the mask is a vectorized
      ``is_in``. No pruning (an arbitrary key set has no zone shape), one
      pass over the key column only.
    - beyond that: raises — at that cardinality a merge is a full rewrite;
      use recluster/re-encode.
    """
    from pyspark.sql import DataFrame as SparkDataFrame

    from .agg import _packf_np
    from .decode import (
        _STRINGY,
        _zone_key,
        chunk_repartition,
        column_arrow_types,
        pruned_chunks,
    )

    if isinstance(keys_df, SparkDataFrame):
        if len(keys_df.columns) != 1:
            raise ValueError(
                f"keys frame must have exactly one column, got {keys_df.columns}")
        kdf = keys_df.toDF("_k").where("_k IS NOT NULL").distinct()
    else:
        vals = sorted(set(k for k in keys_df if k is not None))
        if not vals:
            return {"deleted_now": 0, "deleted_total": deleted_count(store)}
        import pyspark.sql.functions as F  # local: keep module numpy-only

        kdf = spark.createDataFrame([(v,) for v in vals], ["_k"])
        del F
    head = [r["_k"] for r in kdf.limit(max_pushdown_keys + 1).collect()]
    if not head:
        return {"deleted_now": 0, "deleted_total": deleted_count(store)}
    if len(head) <= max_pushdown_keys:
        return delete_where(spark, store, col, "in", head, pids=pids)

    n_keys = kdf.count()
    if n_keys > max_broadcast_keys:
        raise ValueError(
            f"delete_matching got {n_keys} distinct keys (> "
            f"{max_broadcast_keys}); at that scale a merge is a full "
            "rewrite — recluster/re-encode instead")
    types = column_arrow_types(spark, store)
    if col not in types:
        raise KeyError(f"column {col!r} not in encoded data")
    arrow_name = types[col]
    bkeys = spark.sparkContext.broadcast(
        sorted(r["_k"] for r in kdf.collect()))
    chunks = pruned_chunks(spark, store, [col], [], dict_prune=False)
    if pids is not None:
        chunks = chunks.where(chunks["pid"].isin(sorted(pids)))
    chunks = chunk_repartition(
        spark, chunks.select("pid", "chunk_id", "column", "codec",
                             "params", "payload"), store)

    def task(batches):
        import pyarrow.compute as pc

        from ..kernel.codecs import decode_column

        mask_cache = DeleteMask(store)
        keys = bkeys.value
        # probe set built ONCE per task (never per chunk — 10^7 keys)
        probe = None
        for batch in batches:
            for pid_s, cid_s, codec_s, params_s, payload_s in zip(
                    batch.column("pid"), batch.column("chunk_id"),
                    batch.column("codec"), batch.column("params"),
                    batch.column("payload")):
                key = (pid_s.as_py(), cid_s.as_py())
                arr = decode_column({"codec": codec_s.as_py(),
                                     "params": json.loads(params_s.as_py()),
                                     "payload": payload_s.as_py()})
                if arrow_name in _STRINGY:
                    if probe is None:
                        probe = pa.array(list(keys), type=arr.type)
                    mask = (pc.is_in(arr, value_set=probe).fill_null(False)
                            .to_numpy(zero_copy_only=False).astype(bool))
                else:
                    if probe is None:
                        probe = np.unique(np.array(
                            [_zone_key(arrow_name, v)[0] for v in keys],
                            dtype=np.int64))
                    valid = (pc.is_valid(arr)
                             .to_numpy(zero_copy_only=False).astype(bool))
                    if arrow_name.startswith("timestamp["):
                        lhs = (arr.cast(pa.int64()).fill_null(0)
                               .to_numpy(zero_copy_only=False))
                    elif arrow_name in ("float", "double"):
                        lhs = _packf_np(arr.cast(pa.float64()).fill_null(0.0)
                                        .to_numpy(zero_copy_only=False))
                    else:
                        lhs = (arr.cast(pa.int64()).fill_null(0)
                               .to_numpy(zero_copy_only=False))
                    mask = np.isin(lhs, probe) & valid
                if not mask.any():
                    continue
                already = mask_cache.positions(*key)
                pos = np.flatnonzero(mask).astype(np.int64)
                if already is not None:
                    pos = pos[~np.isin(pos, already)]
                if not len(pos):
                    continue
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.full(len(pos), key[0], dtype=np.int32)),
                     pa.array(np.full(len(pos), key[1], dtype=np.int32)),
                     pa.array(pos)],
                    names=["pid", "chunk_id", "pos"])

    before = deleted_count(store)
    tomb = chunks.mapInArrow(task, "pid int, chunk_id int, pos bigint")
    (tomb.sortWithinPartitions("pid", "chunk_id", "pos")
         .write.mode("append").parquet(_deletes_dir(store)))
    total = deleted_count(store)
    _log_delete(store, {"match_col": col, "n_keys": n_keys,
                        "deleted_now": total - before,
                        "deleted_total": total})
    return {"deleted_now": total - before, "deleted_total": total}


def _log_delete(store: str, entry: dict) -> None:
    """Append-only JSON lineage of delete calls (O_EXCL-claimed index,
    same protocol as the commit log)."""
    d = os.path.join(_deletes_dir(store), "_log")
    os.makedirs(d, exist_ok=True)
    payload = json.dumps(entry).encode()
    idx = sum(1 for f in os.listdir(d) if f.endswith(".json"))
    while True:
        path = os.path.join(d, f"{idx:08d}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            idx += 1
            continue
        with os.fdopen(fd, "wb") as fh:
            fh.write(payload)
        return


def compact_deletes(spark, store: str,
                    rows_per_file: int = 50_000_000) -> dict:
    """Merge the tombstone dataset into few (pid, chunk_id, pos)-sorted
    files. Every decode task runs one pushed-filter read over ALL delete
    files for each pid it touches, so after many ``delete_where`` /
    ``update_where`` calls the per-task overhead is gated by delete-file
    count and row-group ordering — this is the OPTIMIZE pass that
    restores both without touching payloads.

    Swap protocol (safe against concurrent readers AND writers): snapshot
    the current file list, write the deduped/sorted replacement files
    into the deletes dir under fresh names, THEN unlink the snapshot
    files. A reader racing the swap sees old+new together — a harmless
    superset, because tombstones are a set union and mask application
    dedupes positions (``load_delete_positions`` -> ``np.unique``). A
    delete call racing the compaction lands a new file outside the
    snapshot and survives untouched.

    At 10^9 tombstones: the sort is a normal range shuffle of narrow
    int rows split into ``rows_per_file`` slices; nothing lands whole on
    one reducer or the driver."""
    import math
    import uuid

    files = _delete_files(store)
    if len(files) <= 1:
        return {"action": "compact_deletes", "files_before": len(files),
                "files_after": len(files), "rows": deleted_count(store),
                "skipped": True}
    df = spark.read.parquet(*files)
    n = df.count()
    nfiles = max(1, math.ceil(n / rows_per_file))
    tmp = os.path.join(_deletes_dir(store), "_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    dd = df.dropDuplicates(["pid", "chunk_id", "pos"])
    dd = (dd.repartitionByRange(nfiles, "pid", "chunk_id", "pos")
          if nfiles > 1 else dd.coalesce(1))
    (dd.sortWithinPartitions("pid", "chunk_id", "pos")
       .write.mode("overwrite").parquet(tmp))
    tag = uuid.uuid4().hex[:8]
    moved = 0
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        os.replace(f, os.path.join(_deletes_dir(store),
                                   f"compact-{tag}-{i:05d}.parquet"))
        moved += 1
    for f in files:
        os.unlink(f)
    shutil.rmtree(tmp, ignore_errors=True)
    rows_after = deleted_count(store)
    entry = {"action": "compact_deletes", "files_before": len(files),
             "files_after": moved, "rows_before": n, "rows": rows_after,
             "skipped": False}
    _log_delete(store, entry)
    return entry


def materialize_deletes(spark, in_dir: str, out_dir: str,
                        unique_col: str | None = None,
                        num_partitions: int | None = None,
                        chunk_bytes: int = 16 << 20,
                        lineage: dict | None = None):
    """Fold tombstones into a NEW store (decode -> re-encode, Iceberg's
    ``rewrite_data_files`` for delete files): the output has no
    ``deletes/`` state, so every metadata/sketch fast path works again.

    By default the decode scan's partitioning is kept (``pre_partitioned``
    — a shuffle-free per-partition rewrite: each task decodes, masks, and
    re-encodes its own chunks). Pass ``unique_col`` to instead rebalance
    across ``num_partitions`` (heavily deleted stores shrink unevenly).
    Returns the encode metrics frame (lazy — ``.collect()`` runs it)."""
    from .decode import decode_job
    from .encode import encode_job

    df = decode_job(spark, in_dir).drop("pid", "chunk_id")
    lin = {**(lineage or {}), "materialized_deletes_from": in_dir,
           "tombstones_folded": deleted_count(in_dir)}
    if unique_col is None:
        return encode_job(spark, df, out_dir, chunk_bytes=chunk_bytes,
                          resume=False, pre_partitioned=True, lineage=lin)
    return encode_job(
        spark, df, out_dir, num_partitions=num_partitions,
        unique_col=unique_col, chunk_bytes=chunk_bytes, resume=False,
        lineage=lin)


def apply_delete_mask(mask: "DeleteMask | None", pid: int, chunk_id: int,
                      arrays: "list[pa.Array]") -> "list[pa.Array] | None":
    """Shared read-side hook: drop tombstoned rows from one decoded
    chunk's column arrays. Returns None when every row is tombstoned
    (callers skip the emit), the arrays unchanged when the chunk is
    clean."""
    if mask is None:
        return arrays
    n = len(arrays[0]) if arrays else 0
    keep = mask.keep_indices(pid, chunk_id, n)
    if keep is None:
        return arrays
    if not len(keep):
        return None
    idx = pa.array(keep)
    return [a.take(idx) for a in arrays]
