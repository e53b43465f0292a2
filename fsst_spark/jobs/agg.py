"""Aggregation pushdown over the encoded store: GROUP BY answered from
codec structure instead of a full decode.

The classic columnar-engine trick (cf. the FSST paper's positioning of
FSST *next to* dict/RLE precisely so queries can run on codes): a
``SELECT col, count(*) GROUP BY col`` over a dictionary-coded column
never needs the expanded strings — the per-chunk answer is a bincount of
the small integer code array plus one decode of the (tiny) dictionary
section; an RLE-coded column answers from (run value, run length) pairs
without materializing a single repeated row. Each chunk reduces to at
most NDV(chunk) partial rows inside the scan task, so the one shuffle
this job does is NDV-scale, not row-scale: at 10^12 documents a
``GROUP BY lang`` shuffles a few hundred rows per chunk, not 10^12.

``encoded_group_sum`` extends this to ``GROUP BY k, count(*), sum(v)``:
both column rows of a chunk live in the same chunk file (the encode jobs
write one file per partition), so a scan task buffers the chunk's two
descriptors, aggregates chunk-locally (int sums in exact int64 via
``np.add.at``, never float bincount weights), and emits NDV-scale
partials.

Falls back to a full chunk decode (still chunk-local partial aggregation)
for codecs with no structural shortcut (fsst/plain strings, floats).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, functions as F

from ..kernel.codecs import (
    _bytes_to_arrow,
    _split_sections,
    decode_bytes_like,
    decode_column,
    decode_int_for,
    parse_arrow_type,
)
from .decode import (
    _STRINGY,
    _chunks_df,
    _prefix_bytes,
    _prefix_zone_bounds,
    _spark_type,
    _zone_key,
    chunk_repartition,
    column_arrow_types,
    pruned_chunks,
    pruned_chunks_any,
)
_INT_LIKE = ("int8", "int16", "int32", "int64")


def _strip_validity(params: dict, payload: bytes):
    """Split off the trailing validity bitmap (if any); return the dense
    payload, the boolean validity mask (or None) and the null count."""
    if "n_total" not in params:
        return payload, None, 0
    vlen = params["validity_len"]
    dense, vbits = payload[:vlen], payload[vlen:]
    mask = np.unpackbits(
        np.frombuffer(vbits, dtype=np.uint8), bitorder="little"
    )[: params["n_total"]].astype(bool)
    return dense, mask, int(params["n_total"]) - int(mask.sum())


def _chunk_value_counts(codec: str, params: dict, payload: bytes,
                        t: pa.DataType) -> tuple[pa.Array, np.ndarray]:
    """One chunk -> (distinct values, counts). Nulls appear as a null
    value entry (SQL GROUP BY groups nulls). Dict chunks bincount the
    code array; RLE chunks aggregate (run value, run length) pairs;
    everything else decodes then counts chunk-locally."""
    dense, _mask, n_null = _strip_validity(params, payload)
    if codec == "str_dict":
        cp, up = _split_sections(params, dense)
        codes = decode_bytes_like({**params["codes"], "payload": cp}, kind="int")
        ubuf, uoff = decode_bytes_like({**params["values"], "payload": up}, kind="str")
        counts = np.bincount(codes, minlength=len(uoff) - 1).astype(np.int64)
        values = _bytes_to_arrow(ubuf, uoff, t, None)
        keep = counts > 0
        if not keep.all():
            values = values.filter(pa.array(keep))
            counts = counts[keep]
    elif codec == "int_rle":
        sv, sl = _split_sections(params, dense)
        runs_v = decode_int_for({**params["values"], "payload": sv})
        runs_l = decode_int_for({**params["lengths"], "payload": sl})
        uv, inv = np.unique(runs_v, return_inverse=True)
        counts = np.bincount(inv, weights=runs_l).astype(np.int64)
        values = pa.array(uv, type=pa.int64())
        if pa.types.is_timestamp(t):
            values = values.cast(t)
        elif values.type != t:
            values = values.cast(t)
    else:
        arr = decode_column({"codec": codec, "params": params, "payload": payload})
        dense_arr = arr.drop_null() if arr.null_count else arr
        vc = pc.value_counts(dense_arr)
        values = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        n_null = arr.null_count  # decode path re-derives nulls itself
    if n_null:
        values = pa.concat_arrays([values.cast(t), pa.nulls(1, t)])
        counts = np.concatenate([counts, [n_null]])
    return values.cast(t), counts


def _packf_np(x: np.ndarray) -> np.ndarray:
    """Vectorized ``encode.zone_packf``: order-preserving int64 keys for a
    float64 array under SQL comparison semantics (NaN above everything and
    equal to itself, -0.0 == +0.0) — both Spark and DuckDB order floats
    this way, so comparing packed keys reproduces their WHERE semantics
    exactly, where raw IEEE comparison (NaN always false) would not."""
    x = np.where(x == 0.0, 0.0, x.astype(np.float64))  # collapse -0.0
    bits = x.view(np.uint64)
    key = np.where(bits >> np.uint64(63) != 0,
                   ~bits, bits | np.uint64(1 << 63))
    key[np.isnan(x)] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return (key ^ np.uint64(1 << 63)).view(np.int64)


_NP_OPS = {">=": np.greater_equal, ">": np.greater,
           "<=": np.less_equal, "<": np.less, "==": np.equal}


def _arrow_mask(arr: pa.Array, op: str, value, arrow_name: str) -> np.ndarray:
    """Exact row mask for ``arr op value`` with SQL predicate semantics
    (null -> False, NaN greatest / NaN == NaN, -0.0 == +0.0) — must agree
    with ``decode._row_predicate``, which evaluates the same filter in
    Spark after a full decode."""
    if arrow_name in _STRINGY:
        if op == "prefix":
            _prefix_bytes(arrow_name, value)  # type check only
            pv = value.decode("utf-8") if isinstance(value, bytes) else value
            m = pc.starts_with(arr, pattern=pv)
        elif op == "contains":
            _prefix_bytes(arrow_name, value, op)  # type check only
            pv = value.decode("utf-8") if isinstance(value, bytes) else value
            m = pc.match_substring(arr, pattern=pv)
        elif op == "in":
            m = pc.is_in(arr, value_set=pa.array(list(value), type=arr.type))
        else:
            _zone_key(arrow_name, value)  # type check: raises on mismatch
            m = getattr(pc, {">=": "greater_equal", ">": "greater",
                             "<=": "less_equal", "<": "less",
                             "==": "equal"}[op])(arr, pa.scalar(value, type=arr.type))
        return m.fill_null(False).to_numpy(zero_copy_only=False).astype(bool)
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False).astype(bool)
    if arrow_name.startswith("timestamp["):
        lhs = arr.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
    elif arrow_name in ("float", "double"):
        lhs = _packf_np(arr.cast(pa.float64()).fill_null(0.0)
                        .to_numpy(zero_copy_only=False))
    else:
        lhs = arr.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
    if op == "in":
        rhs = np.array([_zone_key(arrow_name, v)[0] for v in value], dtype=np.int64)
        m = np.isin(lhs, rhs)
    else:
        m = _NP_OPS[op](lhs, np.int64(_zone_key(arrow_name, value)[0]))
    return m & valid


def _assembled_chunks(batches: Iterator[pa.RecordBatch],
                      needed: list[str],
                      with_keys: bool = False) -> Iterator:
    """Group a (pid, chunk_id)-co-located chunk-row stream back into whole
    chunks: yields {column: enc-dict} once every needed column row of a
    chunk has arrived (same pending-slot shape as decode_job's task).
    ``with_keys`` yields ``((pid, chunk_id), cols)`` instead — consumers
    that look up per-chunk side state (e.g. delete tombstones) need the
    key."""
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
            if len(cols) == len(needed):
                yield (key, cols) if with_keys else cols
                del pending[key]
    if pending:
        raise RuntimeError(
            f"incomplete chunks (missing column rows): {sorted(pending)[:4]}")


def _conj_mask(cols: dict[str, dict], filters: list[tuple],
               types: dict[str, str],
               decoded: dict[str, pa.Array]) -> np.ndarray | None:
    """AND of the exact row masks for ``filters`` over one chunk; decodes
    each filter column at most once (cached in ``decoded``)."""
    mask: np.ndarray | None = None
    for fc, fop, fval in filters:
        if fc not in decoded:
            decoded[fc] = decode_column(cols[fc])
        m = _arrow_mask(decoded[fc], fop, fval, types[fc])
        mask = m if mask is None else (mask & m)
    return mask


def _chunk_key_codes(kenc: dict, kt: pa.DataType,
                     karr: pa.Array | None) -> tuple[np.ndarray, pa.Array, int]:
    """Per-row int64 group codes for one chunk's key column -> (codes with
    K meaning null, dictionary values, K). Dict-coded null-free key chunks
    use their stored CODE array directly — the expanded key strings are
    never materialized; everything else decodes then dictionary-encodes."""
    if karr is None and kenc["codec"] == "str_dict" and "n_total" not in kenc["params"]:
        p = kenc["params"]
        cp, up = _split_sections(p, kenc["payload"])
        codes = decode_bytes_like({**p["codes"], "payload": cp}, kind="int").astype(np.int64)
        ubuf, uoff = decode_bytes_like({**p["values"], "payload": up}, kind="str")
        return codes, _bytes_to_arrow(ubuf, uoff, kt, None), len(uoff) - 1
    return _group_codes(karr if karr is not None else decode_column(kenc))


def _group_partial(kenc: dict, kt: pa.DataType, mask: np.ndarray | None,
                   karr: pa.Array | None = None,
                   venc: dict | None = None, varr: pa.Array | None = None,
                   int_sum: bool | None = None,
                   drop_pos: np.ndarray | None = None) -> pa.RecordBatch:
    """One chunk -> per-key partial rows (value, cnt[, sum_val]) under an
    optional row mask. Dict-coded null-free key chunks group on the CODE
    array — the expanded key strings are never materialized.
    ``drop_pos`` (row positions to exclude — delete tombstones) folds
    into the mask once the chunk length is known."""
    codes, dictv, k = _chunk_key_codes(kenc, kt, karr)
    if drop_pos is not None and len(drop_pos):
        keep = np.ones(len(codes), dtype=bool)
        keep[drop_pos[drop_pos < len(codes)]] = False
        mask = keep if mask is None else (mask & keep)
    mcodes = codes if mask is None else codes[mask]
    cnt = np.bincount(mcodes, minlength=k + 1).astype(np.int64)
    values = pa.concat_arrays([dictv.cast(kt), pa.nulls(1, kt)])
    keep = cnt > 0
    arrays = [values.filter(pa.array(keep)), pa.array(cnt[keep], type=pa.int64())]
    names = ["value", "cnt"]
    if venc is not None or varr is not None:
        if varr is None:
            varr = decode_column(venc)
        valid = pc.is_valid(varr).to_numpy(zero_copy_only=False).astype(bool)
        if mask is not None:
            valid &= mask
        vnp = varr.fill_null(0).to_numpy(zero_copy_only=False)
        acc = np.zeros(k + 1, dtype=np.int64 if int_sum else np.float64)
        np.add.at(acc, codes[valid],
                  vnp[valid].astype(np.int64 if int_sum else np.float64))
        arrays.append(pa.array(acc[keep], type=pa.int64() if int_sum else pa.float64()))
        names.append("sum_val")
    return pa.RecordBatch.from_arrays(arrays, names=names)


def _filtered_group_agg(spark, out_dir: str, key_col: str,
                        val_col: str | None,
                        filters: list[tuple]) -> DataFrame:
    """Shared filtered path of encoded_group_count/encoded_group_sum:
    zone/dict pruning drops definite-miss chunks before any payload read,
    surviving chunks shuffle once on the chunk key (encoded bytes, small),
    the exact row mask and the per-key partials happen chunk-locally, and
    the final shuffle is NDV-scale."""
    types = column_arrow_types(spark, out_dir)
    fcols = []
    for f in filters:
        if f[0] not in fcols:
            fcols.append(f[0])
    needed = [key_col] + ([val_col] if val_col and val_col != key_col else [])
    needed += [c for c in fcols if c not in needed]
    for c in needed:
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
    kt = parse_arrow_type(types[key_col])
    int_sum = val_col is not None and types[val_col] in _INT_LIKE
    if val_col is not None and not int_sum and types[val_col] not in ("float", "double"):
        raise ValueError(f"sum column must be int or float, got {types[val_col]}")
    chunks = pruned_chunks(spark, out_dir, needed, list(filters))
    chunks = chunk_repartition(
        spark, chunks.select("pid", "chunk_id", "column", "codec",
                             "params", "payload"), out_dir)
    from .deletes import has_deletes

    deletes_on = has_deletes(out_dir)

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .deletes import DeleteMask

        dmask = DeleteMask(out_dir) if deletes_on else None
        for key, cols in _assembled_chunks(batches, needed, with_keys=True):
            decoded: dict[str, pa.Array] = {}
            mask = _conj_mask(cols, filters, types, decoded)
            if mask is not None and not mask.any():
                continue
            yield _group_partial(
                cols[key_col], kt, mask, karr=decoded.get(key_col),
                venc=cols[val_col] if val_col else None,
                varr=decoded.get(val_col) if val_col else None,
                int_sum=int_sum,
                drop_pos=dmask.positions(*key) if dmask is not None else None)

    ddl = f"value {_spark_type(types[key_col])}, cnt bigint"
    aggs = [F.sum("cnt").alias("cnt")]
    if val_col is not None:
        ddl += f", sum_val {'bigint' if int_sum else 'double'}"
        aggs.append(F.sum("sum_val").alias("sum_val"))
    return chunks.mapInArrow(task, ddl).groupBy("value").agg(*aggs)


def encoded_group_count(spark, out_dir: str, column: str,
                        filters: list[tuple] | None = None) -> DataFrame:
    """``SELECT column AS value, count(*) AS cnt GROUP BY column`` over an
    encoded store, decoding only codec structure (dict codes +
    dictionary, RLE runs) wherever the codec allows.

    Scan tasks emit per-chunk (value, cnt) partials — the shuffle moves
    NDV-scale rows, never row-scale data.

    ``filters=[(col, op, value), ...]`` adds a conjunctive WHERE: zone maps
    and dict dictionaries prune definite-miss chunks before any payload
    read, the exact row mask applies chunk-locally, and the shuffle stays
    NDV-scale — ``SELECT col, count(*) WHERE ... GROUP BY col`` without
    ever materializing the table.

    Delete-aware: chunks carrying row tombstones group on their code
    array minus the tombstoned positions (per-task pushed-pid reads of
    the deletes parquet); tombstone-free chunks keep the pure
    codec-structural fast path."""
    if filters:
        return _filtered_group_agg(spark, out_dir, column, None, filters)
    from .deletes import has_deletes

    deletes_on = has_deletes(out_dir)
    types = column_arrow_types(spark, out_dir, [column])
    if column not in types:
        raise KeyError(f"column {column!r} not in encoded data")
    arrow_name = types[column]
    t = parse_arrow_type(arrow_name)
    chunks = _chunks_df(spark, out_dir, [column]).select(
        "pid", "chunk_id", "codec", "params", "payload")
    out_schema = pa.schema([("value", t), ("cnt", pa.int64())])

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .deletes import DeleteMask

        dmask = DeleteMask(out_dir) if deletes_on else None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            for pid, cid, codec, pjson, payload in zip(
                tbl.column("pid").to_pylist(),
                tbl.column("chunk_id").to_pylist(),
                tbl.column("codec").to_pylist(),
                tbl.column("params").to_pylist(),
                (s.as_py() for s in tbl.column("payload")),
            ):
                pos = dmask.positions(pid, cid) if dmask is not None else None
                if pos is None:
                    # tombstone-free chunk: codec-structural counts (dict
                    # codes bincount / RLE run pairs), no row expansion
                    values, counts = _chunk_value_counts(
                        codec, json.loads(pjson), payload, t)
                    yield pa.RecordBatch.from_arrays(
                        [values, pa.array(counts, type=pa.int64())],
                        schema=out_schema)
                else:
                    # tombstoned chunk: per-position mask needed — group
                    # on the (dict-fast-path) code array minus tombstones
                    yield _group_partial(
                        {"codec": codec, "params": json.loads(pjson),
                         "payload": payload}, t, None, drop_pos=pos)

    partial = chunks.mapInArrow(task, f"value {_spark_type(arrow_name)}, cnt bigint")
    return partial.groupBy("value").agg(F.sum("cnt").alias("cnt"))


def _group_codes(karr: pa.Array) -> tuple[np.ndarray, pa.Array, int]:
    """Dictionary-encode a decoded key array -> (dense int codes with K
    meaning null, dictionary values, K)."""
    denc = pc.dictionary_encode(karr)
    k = len(denc.dictionary)
    codes = denc.indices.fill_null(k).to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, denc.dictionary, k


def encoded_group_sum(spark, out_dir: str, key_col: str, val_col: str,
                      filters: list[tuple] | None = None) -> DataFrame:
    """``SELECT key, count(*) AS cnt, sum(val) AS sum_val GROUP BY key``
    over an encoded store. ``val_col`` must be an integer or float
    column; sums over ints stay in exact int64 (no float bincount
    weights). Null keys form their own group; null values count toward
    ``cnt`` but not ``sum_val`` (SQL semantics). ``filters`` adds a
    conjunctive WHERE with zone/dict chunk pruning (see
    ``encoded_group_count``).

    Both column rows of a chunk are written into the same chunk file by
    every encode job, so each scan task sees complete chunks; partial
    aggregation happens chunk-locally and the shuffle is NDV-scale. A
    dict-coded key column uses its code array directly — the expanded
    key strings are never materialized. Delete-aware: tombstoned
    positions drop out of both cnt and sum_val chunk-locally."""
    if filters:
        return _filtered_group_agg(spark, out_dir, key_col, val_col, filters)
    from .deletes import has_deletes

    deletes_on = has_deletes(out_dir)
    types = column_arrow_types(spark, out_dir, [key_col, val_col])
    for c in (key_col, val_col):
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
    vt_name = types[val_col]
    if vt_name not in _INT_LIKE and vt_name not in ("float", "double"):
        raise ValueError(f"sum column must be int or float, got {vt_name}")
    int_sum = vt_name in _INT_LIKE
    kt = parse_arrow_type(types[key_col])

    def emit(kenc: dict, venc: dict,
             drop_pos: "np.ndarray | None" = None) -> pa.RecordBatch:
        return _group_partial(kenc, kt, None, venc=venc, int_sum=int_sum,
                              drop_pos=drop_pos)

    # file-granular scan: every encode job writes ALL column rows of a
    # chunk into one chunk file, but a relational parquet scan may split
    # a file across tasks at row-group boundaries and separate them. One
    # task per file guarantees complete chunks (a chunk file is one
    # encode partition's output — tens of MB, a single task's working
    # set by design, same contract as encode_files_job).
    import glob as _glob
    import os as _os

    files = sorted(_glob.glob(_os.path.join(out_dir, "chunks", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no chunk files under {out_dir}")
    task_df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(files)], "fid int, path string"
    ).repartitionByRange(len(files), "fid")

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as _pq

        from .deletes import DeleteMask

        dmask = DeleteMask(out_dir) if deletes_on else None
        for batch in batches:
            for row in batch.to_pylist():
                tbl = _pq.read_table(
                    row["path"],
                    columns=["pid", "chunk_id", "column", "codec", "params", "payload"],
                    filters=[("column", "in", [key_col, val_col])])
                pending: dict[tuple[int, int], dict[str, dict]] = {}
                for i in range(tbl.num_rows):
                    key = (tbl.column("pid")[i].as_py(), tbl.column("chunk_id")[i].as_py())
                    enc = {"codec": tbl.column("codec")[i].as_py(),
                           "params": json.loads(tbl.column("params")[i].as_py()),
                           "payload": tbl.column("payload")[i].as_py()}
                    cols = pending.setdefault(key, {})
                    cols[tbl.column("column")[i].as_py()] = enc
                    if len(cols) == 2:
                        pos = (dmask.positions(*key)
                               if dmask is not None else None)
                        yield emit(cols[key_col], cols[val_col], pos)
                        del pending[key]
                if pending:
                    raise RuntimeError(
                        f"incomplete chunks in {row['path']}: "
                        f"{sorted(pending)[:4]}")

    ddl = (f"value {_spark_type(types[key_col])}, cnt bigint, "
           f"sum_val {'bigint' if int_sum else 'double'}")
    partial = task_df.mapInArrow(task, ddl)
    return partial.groupBy("value").agg(
        F.sum("cnt").alias("cnt"), F.sum("sum_val").alias("sum_val"))


def _zone_can_pred(arrow_name: str, op: str, value):
    """Spark Column over (zmin_long, zmax_long): True unless the zone
    bounds PROVE no row of the chunk satisfies ``op value`` — the same
    conservative keep predicate ``decode._zone_prune`` uses."""
    if op == "in":
        from .decode import zone_in_keep_pred

        # stack-safe: >16 probes run as one vectorized binary search
        # instead of a chained OR (see zone_in_keep_pred)
        return zone_in_keep_pred(arrow_name, value)
    if op == "prefix":
        lo, hi = _prefix_zone_bounds(arrow_name, value)
        return (F.col("zmax_long") >= lo) & (F.col("zmin_long") <= hi)
    if op == "contains":
        _prefix_bytes(arrow_name, value, op)  # type check only
        return F.lit(True)  # substring predicates carry no zone information
    zv, ops = _zone_key(arrow_name, value)
    if op not in ops:
        raise ValueError(
            f"zone op must be one of {sorted(ops) + ['in', 'prefix']}, got {op!r}")
    return ops[op](zv)


def _zone_all_pred(arrow_name: str, op: str, value):
    """Spark Column over (zmin_long, zmax_long): True iff the zone bounds
    PROVE every non-null row of the chunk satisfies ``op value``.

    Int/timestamp zones are exact min/max and float zones are the
    order-isomorphic total-order key (NaN greatest, matching Spark/DuckDB
    comparison semantics), so the exact table applies. String zones are
    8-byte PREFIX bounds: only STRICT pack inequalities transfer to the
    rows (pack(min) > pack(v) => min > v, but pack equality proves
    nothing), and equality is never provable from a prefix."""
    zmin, zmax = F.col("zmin_long"), F.col("zmax_long")
    from .decode import _STRINGY as _STR

    if op == "contains":
        # a zone interval can never prove every row CONTAINS a substring
        return F.lit(False)
    if arrow_name in _STR:
        if op in ("==", "in"):
            return F.lit(False)
        if op == "prefix":
            # packs are the rows' first 8 bytes: a zone interval inside
            # [lo, hi] proves every row's first len(p) bytes equal p —
            # only meaningful for prefixes that fit the 8-byte pack
            lo, hi = _prefix_zone_bounds(arrow_name, value)
            if len(_prefix_bytes(arrow_name, value)) > 8:
                return F.lit(False)
            return (zmin >= lo) & (zmax <= hi)
        zv = _zone_key(arrow_name, value)[0]
        return {">=": zmin > zv, ">": zmin > zv,
                "<=": zmax < zv, "<": zmax < zv}[op]
    if op == "in":
        vals = [_zone_key(arrow_name, v)[0] for v in value]
        return (zmin == zmax) & zmin.isin(vals)
    zv = _zone_key(arrow_name, value)[0]
    return {">=": zmin >= zv, ">": zmin > zv, "<=": zmax <= zv,
            "<": zmax < zv, "==": (zmin == zv) & (zmax == zv)}[op]


def encoded_count_filtered(spark, out_dir: str,
                           filters: list[tuple],
                           any_filters: list[tuple] | None = None) -> DataFrame:
    """``SELECT count(*) WHERE <conjunction>`` answered tri-state from the
    encoded store: chunks whose zone maps prove NO row matches are pruned
    (no payload read), chunks whose zone maps prove EVERY row matches
    contribute their metadata ``n_rows`` (no payload read — a chunk with
    nulls in a filter column never qualifies, detected from its params
    without decoding), and only BOUNDARY chunks decode — and then only the
    filter columns. On a store clustered by the filter column a range
    count touches O(1) boundary chunks regardless of table size.

    Returns one row: ``n_rows`` plus observability counts
    (chunks_total/pruned/metadata_only/decoded).

    Delete-aware (the one fast path that stays exact under row
    tombstones): full-match chunks subtract their per-chunk tombstone
    count (a narrow metadata join on the deletes parquet — still no
    payload read), boundary chunks subtract tombstoned-AND-matching
    positions in-task. Pruned chunks need no correction — zero rows
    match, deleted or not.

    ``any_filters`` adds one OR clause — the count of ``AND(filters) AND
    OR(any_filters)``, CNF like ``decode_filtered``. Tri-state logic per
    chunk: PRUNED when the conjunction prunes or EVERY branch's zones
    prune; METADATA-ONLY when the conjunction full-matches and SOME
    branch full-matches every row (a sound under-approximation — a chunk
    that satisfies the OR only as a mixture of branches is conservatively
    demoted to the decode path, which is exact); BOUNDARY otherwise."""
    any_flt = list(any_filters or [])
    if not filters and not any_flt:
        raise ValueError("encoded_count_filtered needs filters=[(col, op, "
                         "value), ...] and/or any_filters=[...]")
    types = column_arrow_types(spark, out_dir)
    fcols: list[str] = []
    for f in list(filters) + any_flt:
        if f[0] not in types:
            raise KeyError(f"column {f[0]!r} not in encoded data")
        if f[0] not in fcols:
            fcols.append(f[0])
    base = _chunks_df(spark, out_dir, fcols)
    has_zones = "zmin_long" in base.columns
    zsel = ["pid", "chunk_id", "column", "n_rows"]
    if has_zones:
        zsel += ["zmin_long", "zmax_long"]
    # null-freeness read from the params JSON string JVM-side (the key is
    # only ever written when the chunk has nulls); a false positive just
    # demotes the chunk to the decode path — conservative, never wrong
    z = base.select(*zsel, F.col("params").contains('"n_total"').alias("has_nulls"))
    joined = None

    def _pred_cols(c, op, v, tag):
        nonlocal joined
        zi = z.filter(F.col("column") == c)
        if has_zones:
            can = F.col("zmin_long").isNull() | _zone_can_pred(types[c], op, v)
            alm = (F.col("zmin_long").isNotNull() & ~F.col("has_nulls")
                   & _zone_all_pred(types[c], op, v))
        else:  # pre-zone-map store: everything is a boundary chunk
            can, alm = F.lit(True), F.lit(False)
        zi = zi.select("pid", "chunk_id", "n_rows",
                       can.alias(f"can{tag}"), alm.alias(f"all{tag}"))
        joined = zi if joined is None else joined.join(
            zi.drop("n_rows"), ["pid", "chunk_id"])

    for i, (c, op, v) in enumerate(filters):
        _pred_cols(c, op, v, str(i))
    for j, (c, op, v) in enumerate(any_flt):
        _pred_cols(c, op, v, f"o{j}")
    can_all = F.lit(True)
    alm_all = F.lit(True)
    for i in range(len(filters)):
        can_all = can_all & F.col(f"can{i}")
        alm_all = alm_all & F.col(f"all{i}")
    if any_flt:
        # OR clause: chunk can match if ANY branch can; full-matches when
        # SOME branch full-matches (sound under-approximation, see above)
        can_or = F.lit(False)
        alm_or = F.lit(False)
        for j in range(len(any_flt)):
            can_or = can_or | F.col(f"cano{j}")
            alm_or = alm_or | F.col(f"allo{j}")
        can_all = can_all & can_or
        alm_all = alm_all & alm_or
    cls = joined.select("pid", "chunk_id", "n_rows",
                        can_all.alias("can"), alm_all.alias("all_rows"))

    from .deletes import _deletes_dir, has_deletes

    deletes_on = has_deletes(out_dir)
    if deletes_on:
        # per-chunk tombstone counts: a narrow aggregation of the deletes
        # parquet (spark ignores the _log/ sidecar), broadcast-joinable
        tomb = (spark.read.parquet(_deletes_dir(out_dir))
                .groupBy("pid", "chunk_id")
                .agg(F.count("*").alias("n_del")))
        cls = (cls.join(F.broadcast(tomb), ["pid", "chunk_id"], "left")
               .na.fill({"n_del": 0}))
    else:
        cls = cls.withColumn("n_del", F.lit(0))

    meta = cls.select(
        F.when(F.col("can") & F.col("all_rows"),
               F.col("n_rows") - F.col("n_del"))
        .otherwise(F.lit(0)).cast("bigint").alias("n"))
    straddle_keys = cls.filter(F.col("can") & ~F.col("all_rows")).select("pid", "chunk_id")
    sub = (base.select("pid", "chunk_id", "column", "codec", "params", "payload")
           .join(straddle_keys, ["pid", "chunk_id"], "left_semi"))
    sub = chunk_repartition(spark, sub, out_dir)
    flt = list(filters)

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .deletes import DeleteMask

        dmask = DeleteMask(out_dir) if deletes_on else None
        for key, cols in _assembled_chunks(batches, fcols, with_keys=True):
            decoded: dict[str, pa.Array] = {}
            mask = _conj_mask(cols, flt, types, decoded)
            if any_flt:
                omask = None
                for br in any_flt:
                    m = _conj_mask(cols, [br], types, decoded)
                    omask = m if omask is None else (omask | m)
                mask = omask if mask is None else (mask & omask)
            n = int(mask.sum())
            if dmask is not None and n:
                pos = dmask.positions(*key)
                if pos is not None:
                    n -= int(mask[pos[pos < len(mask)]].sum())
            yield pa.RecordBatch.from_arrays(
                [pa.array([n], pa.int64())], names=["n"])

    straddle = sub.mapInArrow(task, "n bigint")
    total = meta.unionByName(straddle).agg(F.sum("n").alias("n_rows"))
    obs = cls.agg(
        F.count("*").alias("chunks_total"),
        F.sum(F.when(~F.col("can"), 1).otherwise(0)).alias("chunks_pruned"),
        F.sum(F.when(F.col("can") & F.col("all_rows"), 1).otherwise(0))
        .alias("chunks_metadata_only"),
        F.sum(F.when(F.col("can") & ~F.col("all_rows"), 1).otherwise(0))
        .alias("chunks_decoded"))
    return total.crossJoin(obs)


def encoded_group_strlen(spark, out_dir: str, key_col: str, str_col: str,
                         filters: list[tuple] | None = None) -> DataFrame:
    """``SELECT key, count(*) AS n_rows, count(str) AS n_values,
    sum(octet_length(str)) AS sum_bytes, avg/min/max(octet_length(str))
    GROUP BY key`` over an encoded store — the string column is NEVER
    decoded.

    Per-group size accounting is the first thing a crawl-budget or
    token-budget pipeline asks of a web corpus ("bytes of text per
    language / per host"), and it needs only the DECODED LENGTH of each
    value: ``kernel.codecs.decoded_strlens`` recovers per-row byte lengths
    from codec structure alone (str_fsst runs the decoder's parse phase
    and skips the byte-scatter passes and the Arrow string build; dict /
    front / plain read their stored length streams). The key column keeps
    the dict-code fast path of :func:`encoded_group_count`. Each chunk
    reduces to NDV-scale partial rows in the scan task, so the one shuffle
    is NDV-scale — at 10^12 documents a ``GROUP BY lang`` over text bytes
    ships a few dozen ints per chunk.

    SQL semantics throughout: null keys form their own group; null string
    values count toward ``n_rows`` but not ``n_values``; ``sum/avg/min/max``
    are NULL for a group with no non-null values. ``filters`` adds a
    conjunctive WHERE with the shared zone/dict/bloom chunk pruning.
    Delete-aware: tombstoned positions drop out of every aggregate
    chunk-locally."""
    types = column_arrow_types(spark, out_dir)
    for c in (key_col, str_col):
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
    if types[str_col] not in _STRINGY:
        raise ValueError(
            f"octet_length stats are for string/binary columns; "
            f"column {str_col!r} is {types[str_col]}")
    from ..kernel.codecs import decoded_strlens

    def strlen_values(cols, decoded, n):
        lens, vmask = decoded_strlens(cols[str_col])
        valid = np.ones(n, dtype=bool) if vmask is None else vmask
        full = np.zeros(n, dtype=np.int64)
        full[valid] = lens
        return full, valid

    return _group_value_stats(spark, out_dir, key_col, str_col,
                              list(filters or []), types, strlen_values,
                              suffix="bytes")


def _group_value_stats(spark, out_dir: str, key_col: str, val_col: str,
                       flt: list[tuple], types: dict, value_fn,
                       suffix: str) -> DataFrame:
    """Shared engine of ``encoded_group_strlen``/``encoded_group_stats``:
    per-chunk (key-code × int64 value) reduction to NDV-scale partial rows
    ``(value, n_rows, n_values, sum, min, max)``, then one NDV-scale
    shuffle. ``value_fn(cols, decoded, n) -> (int64[n], valid bool[n])``
    supplies the per-row values (decoded lengths, decoded ints, ...)."""
    kt = parse_arrow_type(types[key_col])
    needed = [key_col]
    if val_col != key_col:
        needed.append(val_col)
    for f in flt:
        if f[0] not in types:
            raise KeyError(f"column {f[0]!r} not in encoded data")
        if f[0] not in needed:
            needed.append(f[0])
    chunks = pruned_chunks(spark, out_dir, needed, flt)
    chunks = chunk_repartition(
        spark, chunks.select("pid", "chunk_id", "column", "codec",
                             "params", "payload"), out_dir)
    from .deletes import has_deletes

    deletes_on = has_deletes(out_dir)

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .deletes import DeleteMask

        dmask = DeleteMask(out_dir) if deletes_on else None
        for key, cols in _assembled_chunks(batches, needed, with_keys=True):
            decoded: dict[str, pa.Array] = {}
            mask = _conj_mask(cols, flt, types, decoded)
            if mask is not None and not mask.any():
                continue
            codes, dictv, k = _chunk_key_codes(
                cols[key_col], kt, decoded.get(key_col))
            n = len(codes)
            full, valid = value_fn(cols, decoded, n)
            keep = np.ones(n, dtype=bool) if mask is None else mask.copy()
            if dmask is not None:
                pos = dmask.positions(*key)
                if pos is not None and len(pos):
                    keep[pos[pos < n]] = False
            if not keep.any():
                continue
            sel = keep & valid
            n_rows = np.bincount(codes[keep], minlength=k + 1).astype(np.int64)
            n_vals = np.bincount(codes[sel], minlength=k + 1).astype(np.int64)
            s = np.zeros(k + 1, dtype=np.int64)
            np.add.at(s, codes[sel], full[sel])
            mn = np.full(k + 1, np.iinfo(np.int64).max, dtype=np.int64)
            mx = np.full(k + 1, np.iinfo(np.int64).min, dtype=np.int64)
            np.minimum.at(mn, codes[sel], full[sel])
            np.maximum.at(mx, codes[sel], full[sel])
            present = n_rows > 0
            has_v = n_vals > 0
            values = pa.concat_arrays([dictv.cast(kt), pa.nulls(1, kt)])
            yield pa.RecordBatch.from_arrays(
                [values.filter(pa.array(present)),
                 pa.array(n_rows[present], type=pa.int64()),
                 pa.array(n_vals[present], type=pa.int64()),
                 pa.array(s[present], type=pa.int64()),
                 pa.array([int(v) if h else None
                           for v, h in zip(mn[present], has_v[present])],
                          type=pa.int64()),
                 pa.array([int(v) if h else None
                           for v, h in zip(mx[present], has_v[present])],
                          type=pa.int64())],
                names=["value", "n_rows", "n_values", "s", "mn", "mx"])

    ddl = (f"value {_spark_type(types[key_col])}, n_rows bigint, "
           "n_values bigint, s bigint, mn bigint, mx bigint")
    part = chunks.mapInArrow(task, ddl)
    agg = part.groupBy("value").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_values").alias("n_values"),
        F.sum("s").alias("_s"),
        F.min("mn").alias(f"min_{suffix}"),
        F.max("mx").alias(f"max_{suffix}"))
    nv = F.col("n_values")
    return agg.select(
        "value", "n_rows", "n_values",
        F.when(nv > 0, F.col("_s")).alias(f"sum_{suffix}"),
        F.when(nv > 0, F.col("_s") / nv).alias(f"avg_{suffix}"),
        f"min_{suffix}", f"max_{suffix}")


def encoded_group_stats(spark, out_dir: str, key_col: str, val_col: str,
                        filters: list[tuple] | None = None) -> DataFrame:
    """``SELECT key, count(*), count(val), sum(val), avg(val), min(val),
    max(val) GROUP BY key`` over an encoded store — the complete per-group
    aggregate set for an int column in one chunk-local pass.

    Same engine as :func:`encoded_group_strlen` (dict-code key grouping,
    NDV-scale partials, one NDV-scale shuffle, exact int64 accumulation,
    SQL null semantics, delete-aware, ``filters`` WHERE with zone/dict/
    bloom pruning) with the values read by a plain int decode — cheap:
    int chunks decode with a handful of numpy passes and no string build.
    Restricted to int columns so min/max/sum have exact integer semantics
    DuckDB and Spark agree on (floats would drag NaN-ordering differences
    into min/max; use a full decode for those)."""
    types = column_arrow_types(spark, out_dir)
    for c in (key_col, val_col):
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
    if types[val_col] not in _INT_LIKE:
        raise ValueError(
            f"encoded_group_stats needs an int value column; {val_col!r} "
            f"is {types[val_col]}")

    def int_values(cols, decoded, n):
        arr = decoded.get(val_col)
        if arr is None:
            arr = decode_column(cols[val_col])
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False).astype(bool)
        full = (arr.cast(pa.int64()).fill_null(0)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        return full, valid

    return _group_value_stats(spark, out_dir, key_col, val_col,
                              list(filters or []), types, int_values,
                              suffix="val")


def _group_distinct_pairs(spark, out_dir: str, key_col: str, val_col: str,
                          filters: list[tuple] | None = None) -> DataFrame:
    """(value, val) frame of per-chunk DISTINCT key/value pairs plus one
    key-presence row (val NULL) per key per chunk — the shared partial for
    the exact-distinct group aggregates (`encoded_group_ndv`,
    `encoded_group_minmax`).

    Each scan task reduces a chunk to its DISTINCT (key, value) pairs
    before anything shuffles: both columns go through the dict-code fast
    path when available (a dict-coded chunk contributes at most
    |key dict| x |val dict| pairs and usually far fewer), others decode
    chunk-locally then unique. The shuffle therefore carries per-chunk
    distinct pairs — for a ``GROUP BY lang`` over 10^12 rows that is a
    few dozen pairs per chunk; for a genuinely high-NDV value column
    (urls) it honestly degrades toward row scale, which is what EXACT
    distinct costs on any engine.

    SQL semantics downstream: null keys form their own group; null values
    appear only as key-presence rows (ndv ignores them, min/max skip
    them). ``filters`` adds a conjunctive WHERE with zone/dict/bloom
    chunk pruning; delete tombstones drop chunk-locally."""
    types = column_arrow_types(spark, out_dir)
    for c in (key_col, val_col):
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
    kt = parse_arrow_type(types[key_col])
    vt = parse_arrow_type(types[val_col])
    flt = list(filters or [])
    needed = [key_col]
    if val_col != key_col:
        needed.append(val_col)
    for f in flt:
        if f[0] not in types:
            raise KeyError(f"column {f[0]!r} not in encoded data")
        if f[0] not in needed:
            needed.append(f[0])
    chunks = pruned_chunks(spark, out_dir, needed, flt)
    chunks = chunk_repartition(
        spark, chunks.select("pid", "chunk_id", "column", "codec",
                             "params", "payload"), out_dir)
    from .deletes import has_deletes

    deletes_on = has_deletes(out_dir)

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .deletes import DeleteMask

        dmask = DeleteMask(out_dir) if deletes_on else None
        for key, cols in _assembled_chunks(batches, needed, with_keys=True):
            decoded: dict[str, pa.Array] = {}
            mask = _conj_mask(cols, flt, types, decoded)
            if mask is not None and not mask.any():
                continue
            kcodes, kdict, k = _chunk_key_codes(
                cols[key_col], kt, decoded.get(key_col))
            if val_col == key_col:
                vcodes, vdict, kv = kcodes, kdict, k
            else:
                vcodes, vdict, kv = _chunk_key_codes(
                    cols[val_col], vt, decoded.get(val_col))
            n = len(kcodes)
            keep = np.ones(n, dtype=bool) if mask is None else mask.copy()
            if dmask is not None:
                pos = dmask.positions(*key)
                if pos is not None and len(pos):
                    keep[pos[pos < n]] = False
            if not keep.any():
                continue
            kvals = pa.concat_arrays([kdict.cast(kt), pa.nulls(1, kt)])
            # distinct (key, value) code pairs of this chunk, then expand
            # codes back to values — pairs only, never the row stream;
            # null values never count toward ndv
            sel = keep & (vcodes < kv)
            pair = kcodes[sel] * np.int64(kv) + vcodes[sel]
            upair = np.unique(pair)
            uk = (upair // kv).astype(np.int64)
            uv = (upair % kv).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [kvals.take(pa.array(uk, type=pa.int64())),
                 vdict.cast(vt).take(pa.array(uv, type=pa.int64()))],
                names=["value", "val"])
            # key-presence rows: a group whose values are all null must
            # still appear (with ndv = 0) — countDistinct ignores null val
            yield pa.RecordBatch.from_arrays(
                [kvals.take(pa.array(np.unique(kcodes[keep]), type=pa.int64())),
                 pa.nulls(int(len(np.unique(kcodes[keep]))), vt)],
                names=["value", "val"])

    ddl = (f"value {_spark_type(types[key_col])}, "
           f"val {_spark_type(types[val_col])}")
    return chunks.mapInArrow(task, ddl)


def encoded_group_ndv(spark, out_dir: str, key_col: str, val_col: str,
                      filters: list[tuple] | None = None) -> DataFrame:
    """Exact ``SELECT key, count(DISTINCT val) AS ndv GROUP BY key`` over
    an encoded store: the shared distinct-pair partials
    (:func:`_group_distinct_pairs` — dict fast path both sides, NDV-scale
    shuffle) finished by Spark's built-in two-phase distinct aggregate.
    A group with only null values reports ndv 0 (countDistinct ignores
    the key-presence NULL rows)."""
    pairs = _group_distinct_pairs(spark, out_dir, key_col, val_col, filters)
    return pairs.groupBy("value").agg(F.count_distinct("val").alias("ndv"))


def encoded_group_minmax(spark, out_dir: str, key_col: str, val_col: str,
                         filters: list[tuple] | None = None) -> DataFrame:
    """Exact ``SELECT key, min(val), max(val) GROUP BY key`` for ANY value
    column type (the string/binary sibling of ``encoded_group_stats``'s
    int-only min/max): min/max over the shared distinct-pair partials —
    a chunk's distinct values bound its min/max, so the shuffle stays
    pair-scale. SQL semantics: min/max ignore nulls; an all-null group
    survives via its key-presence row with NULL min/max."""
    pairs = _group_distinct_pairs(spark, out_dir, key_col, val_col, filters)
    return pairs.groupBy("value").agg(F.min("val").alias("min_val"),
                                      F.max("val").alias("max_val"))


def encoded_group_topk(spark, out_dir: str, key_col: str, val_col: str,
                       k: int = 10,
                       filters: list[tuple] | None = None) -> DataFrame:
    """Per-group heavy hitters over an encoded store: the top ``k`` most
    frequent ``val_col`` values within each ``key_col`` group (e.g. top
    hosts per language over a 10^12-row crawl), without decoding rows
    wherever the codecs allow.

    Scan tasks reduce each chunk to DISTINCT (key, value) code pairs WITH
    COUNTS before anything shuffles (dict-code fast path via
    ``_chunk_key_codes``): the shuffle carries per-chunk pair partials —
    dictionary-scale, never row-scale. Spark then sums partials per
    (key, value) and takes ``row_number() <= k`` per key ordered by
    (cnt DESC, val ASC) — the deterministic tie rule, so results are
    reproducible and oracle-comparable.

    SQL semantics: null keys form their own group; null values are not
    ranked (count(val) semantics). ``filters`` adds a conjunctive WHERE
    with zone/dict/bloom chunk pruning; tombstoned rows drop chunk-locally.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be a positive int")
    types = column_arrow_types(spark, out_dir)
    for c in (key_col, val_col):
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
    kt = parse_arrow_type(types[key_col])
    vt = parse_arrow_type(types[val_col])
    flt = list(filters or [])
    needed = [key_col]
    if val_col != key_col:
        needed.append(val_col)
    for f in flt:
        if f[0] not in types:
            raise KeyError(f"column {f[0]!r} not in encoded data")
        if f[0] not in needed:
            needed.append(f[0])
    chunks = pruned_chunks(spark, out_dir, needed, flt)
    chunks = chunk_repartition(
        spark, chunks.select("pid", "chunk_id", "column", "codec",
                             "params", "payload"), out_dir)
    from .deletes import has_deletes

    deletes_on = has_deletes(out_dir)

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .deletes import DeleteMask

        dmask = DeleteMask(out_dir) if deletes_on else None
        for key, cols in _assembled_chunks(batches, needed, with_keys=True):
            decoded: dict[str, pa.Array] = {}
            mask = _conj_mask(cols, flt, types, decoded)
            if mask is not None and not mask.any():
                continue
            kcodes, kdict, kk = _chunk_key_codes(
                cols[key_col], kt, decoded.get(key_col))
            if val_col == key_col:
                vcodes, vdict, kv = kcodes, kdict, kk
            else:
                vcodes, vdict, kv = _chunk_key_codes(
                    cols[val_col], vt, decoded.get(val_col))
            n = len(kcodes)
            keep = np.ones(n, dtype=bool) if mask is None else mask.copy()
            if dmask is not None:
                pos = dmask.positions(*key)
                if pos is not None and len(pos):
                    keep[pos[pos < n]] = False
            sel = keep & (vcodes < kv)  # null values are not ranked
            if not sel.any():
                continue
            pair = kcodes[sel] * np.int64(kv) + vcodes[sel]
            upair, counts = np.unique(pair, return_counts=True)
            uk = (upair // kv).astype(np.int64)
            uv = (upair % kv).astype(np.int64)
            kvals = pa.concat_arrays([kdict.cast(kt), pa.nulls(1, kt)])
            yield pa.RecordBatch.from_arrays(
                [kvals.take(pa.array(uk, type=pa.int64())),
                 vdict.cast(vt).take(pa.array(uv, type=pa.int64())),
                 pa.array(counts.astype(np.int64), type=pa.int64())],
                names=["value", "val", "cnt"])

    ddl = (f"value {_spark_type(types[key_col])}, "
           f"val {_spark_type(types[val_col])}, cnt bigint")
    partial = chunks.mapInArrow(task, ddl)
    totals = partial.groupBy("value", "val").agg(F.sum("cnt").alias("cnt"))

    def local_prune(pdfs):
        # per-partition combiner ahead of the global rank window: a row
        # can only final-rank <= k if, within its partition and key, fewer
        # than k rows have a strictly higher count — so dropping rows
        # below the in-partition k-th count is exact regardless of tie
        # order, and the window's per-key fan-in is capped at
        # ~k x shuffle-partitions instead of the key's full value-NDV
        # (the ivf_topk_batch per-partition combine, guide §2.3).
        for pdf in pdfs:
            if len(pdf) <= k:
                yield pdf
                continue
            thr = pdf.groupby("value", dropna=False)["cnt"].transform(
                lambda s: s.nlargest(min(k, len(s))).min())
            yield pdf[pdf["cnt"] >= thr]

    totals = totals.mapInPandas(local_prune, ddl)
    w = Window.partitionBy("value").orderBy(F.desc("cnt"), F.asc("val"))
    return (totals.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def encoded_histogram(spark, out_dir: str, column: str, bucket_width: int,
                      filters: list[tuple] | None = None,
                      any_filters: list[tuple] | None = None) -> DataFrame:
    """Exact equi-width histogram ``SELECT floor(col / w) AS bucket,
    count(*) AS cnt GROUP BY bucket`` over an int column of an encoded
    store, answered tri-state from zone metadata wherever possible.

    A null-free chunk whose exact zone bounds satisfy
    ``zmin // w == zmax // w`` lies ENTIRELY inside one bucket — it
    contributes ``(bucket, n_rows)`` from metadata with no payload read.
    Only bucket-straddling (or null-carrying) chunks decode, and then only
    this column. On a store clustered by ``column`` almost every chunk is
    single-bucket, so a 100 TB histogram reads a handful of boundary
    payloads — the same shape as ``encoded_count_filtered`` but for the
    whole distribution at once.

    SQL semantics: the null bucket appears as a NULL row (GROUP BY groups
    nulls); floor division rounds toward -inf (matches SQL
    ``floor(x / w)`` for positive ``w``). Delete-aware: a full-bucket
    chunk subtracts its tombstone count from metadata (every tombstoned
    row was in that same bucket); decoded chunks mask positions. With
    ``filters`` (and/or the OR clause ``any_filters``, CNF like
    ``decode_filtered``) the metadata arm is skipped (every surviving
    chunk decodes — the predicates need exact row masks anyway), but
    zone/dict/bloom CHUNK pruning still applies per branch."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive int")
    types = column_arrow_types(spark, out_dir)
    if column not in types:
        raise KeyError(f"column {column!r} not in encoded data")
    if (types[column] not in _INT_LIKE
            and not types[column].startswith("timestamp[")):
        raise ValueError(
            f"encoded_histogram needs an int or timestamp column; "
            f"{column!r} is {types[column]} (use encoded_group_count for "
            "categoricals)")
    # timestamps bucket over their storage-unit ticks (timestamp[us] with
    # w=3_600_000_000 = hourly crawl counts) — zones already store ticks
    flt = list(filters or [])
    any_flt = list(any_filters or [])
    needed = [column]
    for f in flt + any_flt:
        if f[0] not in types:
            raise KeyError(f"column {f[0]!r} not in encoded data")
        if f[0] not in needed:
            needed.append(f[0])
    chunks = pruned_chunks(spark, out_dir, needed, flt)
    if any_flt:
        any_keep = (pruned_chunks_any(spark, out_dir, needed, any_flt)
                    .select("pid", "chunk_id").distinct())
        chunks = chunks.join(any_keep, ["pid", "chunk_id"], "left_semi")
    from .deletes import _deletes_dir, has_deletes

    deletes_on = has_deletes(out_dir)
    w = int(bucket_width)

    if not flt and not any_flt and "zmin_long" in chunks.columns:
        z = chunks.filter(F.col("column") == column).select(
            "pid", "chunk_id", "n_rows", "zmin_long", "zmax_long",
            F.col("params").contains('"n_total"').alias("has_nulls"))
        # exact int64 floor division (x - pmod(x, w)) div w — Spark's `/`
        # is double division and loses integers past 2^53
        def _fdiv(col: str):
            return F.expr(f"({col} - pmod({col}, {w})) div {w}")

        full = (F.col("zmin_long").isNotNull() & ~F.col("has_nulls")
                & (_fdiv("zmin_long") == _fdiv("zmax_long")))
        cls = z.select("pid", "chunk_id", "n_rows", "zmin_long",
                       full.alias("full"))
        if deletes_on:
            tomb = (spark.read.parquet(_deletes_dir(out_dir))
                    .groupBy("pid", "chunk_id")
                    .agg(F.count("*").alias("n_del")))
            cls = (cls.join(F.broadcast(tomb), ["pid", "chunk_id"], "left")
                   .na.fill({"n_del": 0}))
        else:
            cls = cls.withColumn("n_del", F.lit(0))
        meta = (cls.filter("full")
                .select(F.expr(f"(zmin_long - pmod(zmin_long, {w})) div {w}")
                        .cast("long").alias("bucket"),
                        (F.col("n_rows") - F.col("n_del")).cast("long")
                        .alias("cnt")))
        boundary_keys = cls.filter(~F.col("full")).select("pid", "chunk_id")
        sub = (chunks.select("pid", "chunk_id", "column", "codec",
                             "params", "payload")
               .join(boundary_keys, ["pid", "chunk_id"], "left_semi"))
    else:
        meta = None
        sub = chunks.select("pid", "chunk_id", "column", "codec",
                            "params", "payload")
    sub = chunk_repartition(spark, sub, out_dir)

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .deletes import DeleteMask

        dmask = DeleteMask(out_dir) if deletes_on else None
        for key, cols in _assembled_chunks(batches, needed, with_keys=True):
            decoded: dict[str, pa.Array] = {}
            mask = _conj_mask(cols, flt, types, decoded)
            if any_flt:
                omask = None
                for br in any_flt:
                    m = _conj_mask(cols, [br], types, decoded)
                    omask = m if omask is None else (omask | m)
                mask = omask if mask is None else (mask & omask)
            arr = decoded.get(column)
            if arr is None:
                arr = decode_column(cols[column])
            n = len(arr)
            keep = np.ones(n, dtype=bool) if mask is None else mask.copy()
            if dmask is not None:
                pos = dmask.positions(*key)
                if pos is not None and len(pos):
                    keep[pos[pos < n]] = False
            if not keep.any():
                continue
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False).astype(bool)
            vals = arr.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
            sel = keep & valid
            buckets = np.floor_divide(vals[sel], np.int64(w))
            ub, cnts = np.unique(buckets, return_counts=True)
            out_b = [int(b) for b in ub]
            out_c = [int(c) for c in cnts]
            n_null = int((keep & ~valid).sum())
            if n_null:
                out_b.append(None)
                out_c.append(n_null)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_b, type=pa.int64()),
                 pa.array(out_c, type=pa.int64())],
                names=["bucket", "cnt"])

    part = sub.mapInArrow(task, "bucket bigint, cnt bigint")
    if meta is not None:
        part = part.unionByName(meta)
    return part.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
