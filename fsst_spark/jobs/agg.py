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
from .decode import _chunks_df, _spark_type, column_arrow_types

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


def encoded_group_count(spark, out_dir: str, column: str) -> DataFrame:
    """``SELECT column AS value, count(*) AS cnt GROUP BY column`` over an
    encoded store, decoding only codec structure (dict codes +
    dictionary, RLE runs) wherever the codec allows.

    Scan tasks emit per-chunk (value, cnt) partials — the shuffle moves
    NDV-scale rows, never row-scale data."""
    types = column_arrow_types(spark, out_dir, [column])
    if column not in types:
        raise KeyError(f"column {column!r} not in encoded data")
    arrow_name = types[column]
    t = parse_arrow_type(arrow_name)
    chunks = _chunks_df(spark, out_dir, [column]).select("codec", "params", "payload")
    out_schema = pa.schema([("value", t), ("cnt", pa.int64())])

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            for codec, pjson, payload in zip(
                tbl.column("codec").to_pylist(),
                tbl.column("params").to_pylist(),
                (s.as_py() for s in tbl.column("payload")),
            ):
                values, counts = _chunk_value_counts(
                    codec, json.loads(pjson), payload, t)
                yield pa.RecordBatch.from_arrays(
                    [values, pa.array(counts, type=pa.int64())],
                    schema=out_schema)

    partial = chunks.mapInArrow(task, f"value {_spark_type(arrow_name)}, cnt bigint")
    return partial.groupBy("value").agg(F.sum("cnt").alias("cnt"))


def _group_codes(karr: pa.Array) -> tuple[np.ndarray, pa.Array, int]:
    """Dictionary-encode a decoded key array -> (dense int codes with K
    meaning null, dictionary values, K)."""
    denc = pc.dictionary_encode(karr)
    k = len(denc.dictionary)
    codes = denc.indices.fill_null(k).to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, denc.dictionary, k


def encoded_group_sum(spark, out_dir: str, key_col: str, val_col: str) -> DataFrame:
    """``SELECT key, count(*) AS cnt, sum(val) AS sum_val GROUP BY key``
    over an encoded store. ``val_col`` must be an integer or float
    column; sums over ints stay in exact int64 (no float bincount
    weights). Null keys form their own group; null values count toward
    ``cnt`` but not ``sum_val`` (SQL semantics).

    Both column rows of a chunk are written into the same chunk file by
    every encode job, so each scan task sees complete chunks; partial
    aggregation happens chunk-locally and the shuffle is NDV-scale. A
    dict-coded key column uses its code array directly — the expanded
    key strings are never materialized."""
    types = column_arrow_types(spark, out_dir, [key_col, val_col])
    for c in (key_col, val_col):
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
    vt_name = types[val_col]
    if vt_name not in _INT_LIKE and vt_name not in ("float", "double"):
        raise ValueError(f"sum column must be int or float, got {vt_name}")
    int_sum = vt_name in _INT_LIKE
    kt = parse_arrow_type(types[key_col])
    sum_t = pa.int64() if int_sum else pa.float64()
    out_schema = pa.schema([("value", kt), ("cnt", pa.int64()), ("sum_val", sum_t)])

    def emit(kenc: dict, venc: dict) -> pa.RecordBatch:
        if kenc["codec"] == "str_dict" and "n_total" not in kenc["params"]:
            # code array + dictionary without expanding the strings
            p = kenc["params"]
            cp, up = _split_sections(p, kenc["payload"])
            codes = decode_bytes_like({**p["codes"], "payload": cp}, kind="int").astype(np.int64)
            ubuf, uoff = decode_bytes_like({**p["values"], "payload": up}, kind="str")
            dictv, k = _bytes_to_arrow(ubuf, uoff, kt, None), len(uoff) - 1
        else:
            codes, dictv, k = _group_codes(decode_column(kenc))
        varr = decode_column(venc)
        valid = pc.is_valid(varr).to_numpy(zero_copy_only=False).astype(bool)
        vnp = varr.fill_null(0).to_numpy(zero_copy_only=False)
        acc = np.zeros(k + 1, dtype=np.int64 if int_sum else np.float64)
        np.add.at(acc, codes[valid],
                  vnp[valid].astype(np.int64 if int_sum else np.float64))
        cnt = np.bincount(codes, minlength=k + 1).astype(np.int64)
        values = pa.concat_arrays([dictv.cast(kt), pa.nulls(1, kt)])
        keep = cnt > 0
        return pa.RecordBatch.from_arrays(
            [values.filter(pa.array(keep)),
             pa.array(cnt[keep], type=pa.int64()),
             pa.array(acc[keep], type=sum_t)],
            schema=out_schema)

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
                        yield emit(cols[key_col], cols[val_col])
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
