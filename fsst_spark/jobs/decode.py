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
import re
from typing import Iterator

import numpy as np
import pandas as pd
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
    if arrow_name.startswith(("list<", "large_list<", "fixed_size_list<")):
        # e.g. "list<element: float>", "fixed_size_list<item: float>[4]":
        # strip the wrapper and the child FIELD NAME (first ": " — field
        # names cannot contain ':' or '<'), recurse on the child type
        inner = arrow_name[arrow_name.index("<") + 1 : arrow_name.rindex(">")]
        child = inner.split(": ", 1)[1] if ": " in inner.split("<", 1)[0] else inner
        return f"array<{_spark_type(child)}>"
    return _SPARK_TYPE[arrow_name]


def _chunks_df(spark, out_dir: str, columns: list[str] | None) -> DataFrame:
    df = spark.read.parquet(f"{out_dir}/chunks")
    if columns:
        df = df.filter(F.col("column").isin(columns))  # pushed to parquet scan
    else:
        from .schema import dropped_columns

        dropped = dropped_columns(out_dir)
        if dropped:  # schema-evolved store: dropped columns' rows are
            # invisible (and their payload bytes never read)
            df = df.filter(~F.col("column").isin(sorted(dropped)))
    return df


def column_arrow_types(spark, out_dir: str, columns: list[str] | None = None,
                       include_added: bool = False) -> dict[str, str]:
    """{column: arrow type name} recovered from ONE chunk file.

    ``include_added=True`` merges columns ADDED via the schema log
    (``schema.add_column``) that no chunk carries yet — only the DECODE
    paths pass it: the metadata/sketch fast paths keep the default so an
    added-but-unmaterialized column fails fast (KeyError) instead of
    answering from per-chunk state that cannot represent virtual nulls.

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
    from .schema import added_columns, dropped_columns

    for c in dropped_columns(out_dir):
        cols.pop(c, None)  # dropped columns are not part of the schema
    if include_added:
        for c, t in added_columns(out_dir).items():
            cols.setdefault(c, t)  # physical (materialized) type wins
    if columns:
        missing = [c for c in columns if c not in cols]
        if missing:
            raise KeyError(f"columns not present in encoded data: {missing}")
    return cols


def decoded_schema_ddl(spark, out_dir: str, columns: list[str] | None = None,
                       include_added: bool = True) -> tuple[str, list[str]]:
    """(Spark DDL of the decoded frame, ordered column list). Decode
    readers see schema-log-added columns (NULL until materialized)."""
    cols = column_arrow_types(spark, out_dir, columns,
                              include_added=include_added)
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


_TS_UNIT_PER_SEC = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}


def _ts_unit(arrow_name: str) -> str:
    return arrow_name[len("timestamp["):-1].split(",")[0]


def _ts_ticks(arrow_name: str, value) -> int:
    """Coerce a timestamp filter value to the column's storage-unit ticks.

    Accepts raw int ticks, datetime/date, or an ISO-8601 string. Naive
    datetimes are taken as UTC (Spark stores timestamps as UTC micros).
    Integer arithmetic throughout — ``datetime.timestamp()`` returns float
    seconds, which is not exact at microsecond granularity."""
    import datetime as dt

    if isinstance(value, bool) or not isinstance(value, (int, str, dt.date, dt.datetime)):
        raise TypeError(
            f"timestamp filter value must be int ticks, datetime, or ISO "
            f"string, got {type(value).__name__}")
    if isinstance(value, int):
        return value
    if isinstance(value, str):
        value = dt.datetime.fromisoformat(value)
    if not isinstance(value, dt.datetime):  # plain date
        value = dt.datetime(value.year, value.month, value.day)
    if value.tzinfo is None:
        value = value.replace(tzinfo=dt.timezone.utc)
    delta = value - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    secs = delta.days * 86400 + delta.seconds
    mult = _TS_UNIT_PER_SEC[_ts_unit(arrow_name)]
    return secs * mult + delta.microseconds * mult // 10**6


_STRINGY = ("string", "large_string", "binary", "large_binary")
_INTY = ("int8", "int16", "int32", "int64")


def _zone_key(arrow_name: str, value) -> tuple[int, dict]:
    """(packed zone value, zone-op table) for a filter on a column of the
    given arrow type. Raises TypeError on a value/column type mismatch —
    silently packing e.g. an int against string-prefix zones would prune
    every chunk (ints sit below all ASCII pack8 keys) and return an empty
    result for a predicate that matches rows."""
    from .encode import zone_pack8, zone_packf

    if arrow_name in _STRINGY:
        if not isinstance(value, (str, bytes)):
            raise TypeError(
                f"column is {arrow_name} but filter value is "
                f"{type(value).__name__}; pass a str/bytes value")
        return zone_pack8(value), _ZONE_OPS_PREFIX
    if arrow_name in _INTY:
        if isinstance(value, bool) or not isinstance(value, int):
            raise TypeError(
                f"column is {arrow_name} but filter value is "
                f"{type(value).__name__}; pass an int value")
        return int(value), _ZONE_OPS
    if arrow_name.startswith("timestamp["):
        return _ts_ticks(arrow_name, value), _ZONE_OPS
    if arrow_name in ("float", "double"):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise TypeError(
                f"column is {arrow_name} but filter value is "
                f"{type(value).__name__}; pass a float value")
        return zone_packf(float(value)), _ZONE_OPS
    raise ValueError(f"no zone-map support for column type {arrow_name}")


def zone_in_keep_pred(arrow_name: str, value):
    """Spark Column over (zmin_long, zmax_long): the conservative
    chunk-keep test for ``col IN (values)`` — true iff the chunk's zone
    interval could contain ANY probed value. Shared by ``_zone_prune``
    and ``agg._zone_can_pred``.

    Small lists build the plain OR of per-value containment tests (stays
    inside codegen/pushdown). Chaining one OR per value grows the
    Catalyst tree linearly and a few thousand values overflow the JVM
    analyzer stack, so above 16 probes the test runs as one vectorized
    binary search (sorted probes, ``np.searchsorted`` per chunk group)
    in a pandas UDF over the narrow metadata frame — O(log V) per row,
    constant expression depth."""
    values = list(value)
    if not values:
        raise ValueError("'in' filter needs a non-empty value list")
    packed = [_zone_key(arrow_name, v) for v in values]
    if len(packed) <= 16:
        pred = packed[0][1]["=="](packed[0][0])
        for zv, ops in packed[1:]:
            pred = pred | ops["=="](zv)
        return pred
    probes = np.array(sorted(zv for zv, _ in packed), dtype=np.int64)

    @F.pandas_udf("boolean")
    def _contains_any(zmin: pd.Series, zmax: pd.Series) -> pd.Series:
        # null zones are kept by callers' isNull() arm; make them an
        # empty interval here so searchsorted stays typed
        lo_v = zmin.fillna(np.iinfo(np.int64).max).to_numpy(np.int64)
        hi_v = zmax.fillna(np.iinfo(np.int64).min).to_numpy(np.int64)
        lo = np.searchsorted(probes, lo_v, side="left")
        hi = np.searchsorted(probes, hi_v, side="right")
        return pd.Series(lo < hi)

    return _contains_any(F.col("zmin_long"), F.col("zmax_long"))


def _prefix_bytes(arrow_name: str, value, op: str = "prefix") -> bytes:
    """UTF-8 bytes of a ``prefix``/``contains`` filter value, typed by the
    COLUMN: the predicate is only meaningful on string/binary columns (an
    int column has no byte prefix or substring), so anything else raises
    instead of mis-pruning."""
    if arrow_name not in _STRINGY:
        raise TypeError(
            f"{op!r} filter needs a string/binary column, got {arrow_name}")
    if not isinstance(value, (str, bytes)):
        raise TypeError(
            f"{op!r} filter value must be str/bytes, got "
            f"{type(value).__name__}")
    return (value.encode("utf-8", "surrogatepass")
            if isinstance(value, str) else bytes(value))


def _prefix_zone_bounds(arrow_name: str, value) -> tuple[int, int]:
    """[lo, hi] pack8 interval covering every string that starts with
    ``value``: continuation bytes range 0x00 (lo, zero-pad is pack8's own
    padding) to 0xff (hi). Prefixes past 8 bytes collapse to a point
    interval — still a correct (conservative) chunk bound."""
    from .encode import zone_pack8

    vb = _prefix_bytes(arrow_name, value)
    return zone_pack8(vb), zone_pack8(vb[:8].ljust(8, b"\xff"))


def _zone_prune(chunks: DataFrame, zsrc: DataFrame,
                zone_filter: tuple[str, str, int | str],
                arrow_name: str) -> DataFrame:
    """Drop chunk groups whose zone map proves ``col op value`` matches no
    row. Conservative: chunks with null zones (all-null chunks,
    pre-zone-map encodes) are always kept. The zone predicate filters the
    narrow (pid, chunk_id, zmin, zmax) projection at the parquet scan
    (PushedFilters), and survivors semi-join back on the narrow chunk key
    — pruned payload bytes are never read. Dispatch is on the COLUMN's
    arrow type, never the Python type of the value (a numeric-looking
    string id must still use prefix zones)."""
    col, op, value = zone_filter
    if op in ("contains", "suffix"):
        # substring/suffix predicates carry no zone information (zones
        # are PREFIXES; any 8-byte prefix interval can hold a match);
        # dict/FSST-dictionary pruning (below, in pruned_chunks) is the
        # only chunk-level lever
        _prefix_bytes(arrow_name, value, op)  # type check only
        return chunks
    if op == "rlike":
        # regex predicates likewise carry no zone information; dictionary
        # pruning (when the pattern is Java/Python-alignment-safe) is the
        # chunk-level lever
        if arrow_name not in ("string", "large_string"):
            raise ValueError(
                f"'rlike' needs a string column; {col!r} is {arrow_name}")
        return chunks
    if op == "in":
        # set membership: a chunk can match iff it can match ANY element
        pred = zone_in_keep_pred(arrow_name, value)
    elif op == "prefix":
        # s LIKE 'p%': every match packs into [pack8(p), pack8(p padded
        # with 0xff)] — both bounds follow from bytewise order, so the
        # chunk interval test is exact on the PACKED keys (still a
        # conservative chunk bound, since zones are themselves prefixes)
        lo, hi = _prefix_zone_bounds(arrow_name, value)
        pred = (F.col("zmax_long") >= lo) & (F.col("zmin_long") <= hi)
    elif op in _ZONE_OPS:
        zval, ops = _zone_key(arrow_name, value)  # typed: raises on mismatch
        pred = ops[op](zval)
    else:
        raise ValueError(
            f"zone op must be one of {sorted(_ZONE_OPS) + ['in', 'prefix']}, "
            f"got {op!r}")
    if "zmin_long" not in chunks.columns:
        return chunks  # pre-zone-map encode: nothing to prune on
    keep = (
        zsrc.filter(F.col("column") == col)
        .filter(F.col("zmin_long").isNull() | pred)
        .select("pid", "chunk_id")
    )
    return chunks.join(keep, ["pid", "chunk_id"], "left_semi")


def _dict_probes(value: "str | bytes | list",
                 prefix: bool = False,
                 contains: bool = False,
                 suffix: bool = False):
    """(length-bucketed probe byte-sets, prefix bytes or None, substring
    bytes or None, suffix bytes or None) for a dictionary membership test
    — shared prep of ``_dict_value_drop`` and the ``fsst`` DataSource's
    executor-side pruning. At most one of ``prefix``/``contains``/
    ``suffix`` may be set; those modes are single-value."""
    vals = value if isinstance(value, (list, tuple, set)) else [value]
    probes = {v.encode("utf-8", "surrogatepass") if isinstance(v, str) else bytes(v)
              for v in vals}
    by_len: dict[int, set] = {}
    for vb in probes:
        by_len.setdefault(len(vb), set()).add(vb)
    pfx = sorted(probes)[0] if prefix else None  # prefix mode is single-value
    sub = sorted(probes)[0] if contains else None
    sfx = sorted(probes)[0] if suffix else None
    return by_len, pfx, sub, sfx


def dict_payload_has_value(params: dict, payload: bytes,
                           by_len: dict[int, set],
                           pfx: bytes | None,
                           sub: bytes | None = None,
                           sfx: bytes | None = None,
                           rx=None) -> bool:
    """True iff a ``str_dict`` chunk's DICTIONARY contains any probed value
    (with ``pfx``: any value starting with those bytes; with ``sub``: any
    value containing those bytes; with ``sfx``: any value ending with
    those bytes; with ``rx``: any value the compiled regex matches —
    partial match, Spark ``rlike`` semantics). Decodes only the
    dictionary section — codes stay encoded. ``by_len``/``pfx``/``sub``/
    ``sfx`` come from ``_dict_probes``; ``rx`` from ``_rlike_prunable``."""
    from ..kernel.codecs import _split_sections, decode_bytes_like

    if "n_total" in params:  # strip the appended validity bits
        payload = payload[: params["validity_len"]]
    _, up = _split_sections(params, payload)
    buf, off = decode_bytes_like(
        {"codec": params["values"]["codec"],
         "params": params["values"]["params"], "payload": up},
        kind="str")
    lens = off[1:] - off[:-1]
    if rx is not None:
        return any(
            rx.search(view) is not None
            for i in range(len(lens))
            for view in _java_anchor_views(
                buf[off[i]: off[i + 1]].tobytes()
                .decode("utf-8", "surrogatepass")))
    if sub is not None:
        # fast reject on the concatenated buffer, then confirm each hit
        # lies within ONE value (a match spanning two adjacent dictionary
        # entries is not a value containing the substring)
        blob = buf.tobytes()
        ls = len(sub)
        p = blob.find(sub)
        while p != -1:
            i = int(off.searchsorted(p, side="right")) - 1
            if p + ls <= off[i + 1]:
                return True
            p = blob.find(sub, p + 1)
        return False
    if sfx is not None:
        ls = len(sfx)
        return any(
            buf[off[i + 1] - ls: off[i + 1]].tobytes() == sfx
            for i in (lens >= ls).nonzero()[0])
    if pfx is not None:
        lp = len(pfx)
        return any(
            buf[off[i]: off[i] + lp].tobytes() == pfx
            for i in (lens >= lp).nonzero()[0])
    return any(
        buf[off[i]: off[i + 1]].tobytes() in vset
        for ln, vset in by_len.items()
        for i in (lens == ln).nonzero()[0]
    )


def zone_keep(arrow_name: str, op: str, value, zmin, zmax) -> bool:
    """Pure-Python chunk-survival test for one zone filter — the scalar
    twin of ``_zone_prune`` for callers outside a Spark plan (the ``fsst``
    DataSource prunes per chunk file inside ``read()``). Conservative:
    null zones always keep; string zones are 8-byte prefixes, so strict
    ops compare non-strictly (same rule as ``_ZONE_OPS_PREFIX``)."""
    if zmin is None or zmax is None:
        return True
    if op in ("contains", "suffix"):
        _prefix_bytes(arrow_name, value, op)  # type check only
        return True  # substring/suffix predicates carry no zone info
    if op == "rlike":
        return True  # regex predicates carry no zone information
    if op == "prefix":
        lo, hi = _prefix_zone_bounds(arrow_name, value)
        return zmax >= lo and zmin <= hi
    if op == "in":
        values = list(value)
        if not values:
            raise ValueError("'in' filter needs a non-empty value list")
        return any(zone_keep(arrow_name, "==", v, zmin, zmax) for v in values)
    zval, ops = _zone_key(arrow_name, value)
    exact = ops is _ZONE_OPS  # ints/timestamps/floats: exact zone bounds
    if op == "==":
        return zmin <= zval <= zmax
    if op in (">", ">="):
        return zmax > zval if (op == ">" and exact) else zmax >= zval
    if op in ("<", "<="):
        return zmin < zval if (op == "<" and exact) else zmin <= zval
    raise ValueError(f"zone op must be one of {sorted(_ZONE_OPS) + ['in', 'prefix']}, got {op!r}")


# escapes whose Java-regex meaning is BROADER than (or absent from)
# Python's: \v \h \R \H \V unicode-whitespace classes, \p{...}/\P{...}
# properties, \Q..\E quoting, \k named backrefs, \G, \X graphemes. Also
# '[a&&[b]]' class intersection (parses as literal '&'/'[' in Python,
# which can match LESS than Java) and any inline flag group enabling
# MULTILINE ('(?m)' — Java's '$' then anchors before EVERY line
# terminator incl. \r/\u0085/\u2028, which Python's does not). A pattern
# using any of them (or one Python cannot compile) disables dictionary
# pruning — conservative: the chunk decodes and Spark's own Java rlike
# decides row membership. Non-MULTILINE '$'/'\Z' divergence (Java
# matches before one FINAL terminator, Python only before a final \n)
# is handled by probing the terminator-stripped value too — see
# _java_anchor_views.
_RLIKE_DIVERGENT = re.compile(
    r"\\[vhVHRGXpPQEk]|&&|\(\?[a-zA-Z-]*m[a-zA-Z-]*[:)]")


# Java line terminators ('$'/'\Z' match just before one FINAL occurrence;
# order matters: \r\n must strip as one sequence)
_JAVA_LINE_TERM = ("\r\n", "\n", "\r", "\u0085", "\u2028", "\u2029")


def _java_anchor_views(s: str) -> "list[str]":
    """The value plus (when it ends with a line terminator) the value with
    that one final terminator stripped. Probing both makes the Python
    regex probe a SUPERSET of Java's non-MULTILINE '$'/'\\Z' match set —
    extra positives only keep more chunks, which is sound."""
    for t in _JAVA_LINE_TERM:
        if s.endswith(t):
            return [s, s[: -len(t)]]
    return [s]


def _rlike_prunable(pattern: str):
    """Compiled Python regex safe for DICTIONARY pruning of a Spark
    ``rlike`` predicate, or None when pruning must be skipped. Soundness
    rule: pruning may never drop a chunk whose dictionary contains a
    value Java's ``rlike`` would match — ``re.ASCII`` aligns
    ``\\d \\w \\s \\b`` with Java's ASCII defaults, the divergent-escape
    screen above handles the rest, and Python-only match SURPLUS (never
    deficit) is fine because a spurious has-value only keeps a chunk."""
    if _RLIKE_DIVERGENT.search(pattern):
        return None
    try:
        return re.compile(pattern, re.ASCII)
    except (re.error, ValueError):
        # ValueError: Java-valid inline flags like '(?u)' make re.compile
        # raise ('ASCII and UNICODE flags are incompatible') — skip pruning
        return None


def _dict_regex_drop(spark, out_dir: str, col: str,
                     pattern: str) -> DataFrame:
    """(pid, chunk_id) DROP-set for ``col RLIKE pattern``: ``str_dict``
    chunks whose dictionary contains NO value matching the (alignment-
    safe, see ``_rlike_prunable``) pattern. Same scan shape as
    ``_dict_value_drop`` — only dict-coded chunk rows of the filter
    column are read, only the dictionary section decodes."""
    src = (
        _chunks_df(spark, out_dir, [col])
        .filter(F.col("codec") == "str_dict")
        .select("pid", "chunk_id", "params", "payload")
    )

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        rx = re.compile(pattern, re.ASCII)
        for batch in batches:
            pids, cids = [], []
            for pid_s, cid_s, params_s, payload_s in zip(
                    batch.column("pid"), batch.column("chunk_id"),
                    batch.column("params"), batch.column("payload")):
                if not dict_payload_has_value(
                        json.loads(params_s.as_py()), payload_s.as_py(),
                        {}, None, None, rx=rx):
                    pids.append(pid_s.as_py())
                    cids.append(cid_s.as_py())
            yield pa.RecordBatch.from_arrays(
                [pa.array(pids, pa.int32()), pa.array(cids, pa.int32())],
                names=["pid", "chunk_id"])

    return src.mapInArrow(task, "pid int, chunk_id int")


def _dict_value_drop(spark, out_dir: str, col: str,
                     value: "str | bytes | list",
                     prefix: bool = False,
                     contains: bool = False,
                     suffix: bool = False) -> DataFrame:
    """(pid, chunk_id) DROP-set for ``col == value`` (or ``col IN values``
    when a list is given; ``col LIKE value%`` when ``prefix``; ``col LIKE
    %value%`` when ``contains``; ``col LIKE %value`` when ``suffix``):
    the ``str_dict`` chunks whose dictionary
    provably lacks EVERY probed value — they contain no
    matching row, so none of their columns need be read or decoded. The
    pass scans only the filter column's DICT-CODED chunk rows (both the
    ``column ==`` and ``codec == 'str_dict'`` predicates push to the chunk
    parquet scan, so non-dict payloads are never read) and decodes only
    the (tiny) dictionary section — codes stay encoded. On categorical
    columns (lang, source, content-type) this turns a value probe into a
    near-metadata scan at 100 TB; on columns with no dict chunks the scan
    matches zero rows and costs footer reads only."""
    by_len, pfx, sub, sfx = _dict_probes(value, prefix, contains, suffix)
    src = (
        _chunks_df(spark, out_dir, [col])
        .filter(F.col("codec") == "str_dict")  # pushed: plain/fsst payloads unread
        .select("pid", "chunk_id", "params", "payload")
    )

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            pids, cids = [], []
            # iterate columns directly: to_pylist() would materialize every
            # payload into a Python list of dicts before use
            for pid_s, cid_s, params_s, payload_s in zip(
                    batch.column("pid"), batch.column("chunk_id"),
                    batch.column("params"), batch.column("payload")):
                has_value = dict_payload_has_value(
                    json.loads(params_s.as_py()), payload_s.as_py(),
                    by_len, pfx, sub, sfx)
                if not has_value:
                    pids.append(pid_s.as_py())
                    cids.append(cid_s.as_py())
            yield pa.RecordBatch.from_arrays(
                [pa.array(pids, pa.int32()), pa.array(cids, pa.int32())],
                names=["pid", "chunk_id"])

    return src.mapInArrow(task, "pid int, chunk_id int")


def _bloom_value_drop(spark, out_dir: str, col: str,
                      value, arrow_name: str) -> DataFrame:
    """(pid, chunk_id) DROP-set for ``col == value`` / ``col IN values``
    from per-chunk Bloom filters (``kernel.bloom``): chunks whose bloom
    proves EVERY probed value absent contain no matching row. This is the
    point-predicate complement of zone pruning — a ``url == X`` probe over
    an UNCLUSTERED store, where every 8-byte prefix zone collapses, still
    tests ~10 bits per chunk instead of decoding payloads. The scan reads
    only the filter column's (pid, chunk_id, bloom) projection (blooms are
    ~0.1% of payload bytes); chunks without a bloom (dict-coded — dict
    pruning covers those exactly — disabled encodes, unsupported types)
    are conservatively kept."""
    vals = value if isinstance(value, (list, tuple, set)) else [value]
    if arrow_name in _STRINGY:
        probes = list(vals)  # bloom hashes str/bytes natively
    elif arrow_name in _INTY:
        probes = [int(v) for v in vals]
    elif arrow_name.startswith("timestamp["):
        # encode hashed the storage-unit int64 ticks; probe in the same unit
        probes = [_ts_ticks(arrow_name, v) for v in vals]
    else:
        return spark.createDataFrame([], "pid int, chunk_id int")
    src = (
        _chunks_df(spark, out_dir, [col])
        .filter(F.col("bloom").isNotNull())  # pushed: bloom-less rows unread
        .select("pid", "chunk_id", "bloom")
    )

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..kernel.bloom import bloom_might_contain

        for batch in batches:
            pids, cids = [], []
            for pid_s, cid_s, bloom_s in zip(
                    batch.column("pid"), batch.column("chunk_id"),
                    batch.column("bloom")):
                if not bloom_might_contain(bloom_s.as_py(), probes):
                    pids.append(pid_s.as_py())
                    cids.append(cid_s.as_py())
            yield pa.RecordBatch.from_arrays(
                [pa.array(pids, pa.int32()), pa.array(cids, pa.int32())],
                names=["pid", "chunk_id"])

    return src.mapInArrow(task, "pid int, chunk_id int")


def pruned_chunks(spark, out_dir: str, columns: list[str] | None,
                  filters: list[tuple[str, str, int | str]],
                  dict_prune: bool = True) -> DataFrame:
    """Chunk rows for ``columns``, minus every chunk a zone map or a dict
    dictionary proves cannot match the conjunction ``filters`` — the shared
    pruning front-end of ``decode_job`` and the encoded-store aggregation
    ops. No payload outside dict sections is read."""
    chunks = _chunks_df(spark, out_dir, columns)
    if filters:
        types = column_arrow_types(spark, out_dir)  # KeyError guard below
        for zf in filters:
            if zf[0] not in types:
                raise KeyError(f"columns not present in encoded data: [{zf[0]!r}]")
            # the zone column may be outside the requested column subset, so
            # each keep-set reads its own (narrow, zone-only) projection
            zsrc = _chunks_df(spark, out_dir, [zf[0]])
            chunks = _zone_prune(chunks, zsrc, zf, types[zf[0]])
            if (dict_prune and zf[1] in ("==", "in", "prefix", "contains",
                                         "suffix")
                    and types[zf[0]] in _STRINGY):
                drop = _dict_value_drop(spark, out_dir, zf[0], zf[2],
                                        prefix=zf[1] == "prefix",
                                        contains=zf[1] == "contains",
                                        suffix=zf[1] == "suffix")
                chunks = chunks.join(drop, ["pid", "chunk_id"], "left_anti")
            if (dict_prune and zf[1] == "rlike"
                    and types[zf[0]] in ("string", "large_string")
                    and _rlike_prunable(zf[2]) is not None):
                rdrop = _dict_regex_drop(spark, out_dir, zf[0], zf[2])
                chunks = chunks.join(rdrop, ["pid", "chunk_id"],
                                     "left_anti")
            if (dict_prune and zf[1] in ("==", "in")
                    and "bloom" in chunks.columns):
                bdrop = _bloom_value_drop(spark, out_dir, zf[0], zf[2],
                                          types[zf[0]])
                chunks = chunks.join(bdrop, ["pid", "chunk_id"], "left_anti")
    return chunks


def pruned_chunks_any(spark, out_dir: str, columns: list[str] | None,
                      filters: list[tuple[str, str, int | str]],
                      dict_prune: bool = True) -> DataFrame:
    """Chunk rows for ``columns``, minus every chunk that NO branch of the
    disjunction ``filters`` can match — the OR complement of
    ``pruned_chunks``. A chunk survives if any single branch's full
    pruning stack (zones, dict sections, blooms) keeps it, so the
    surviving set is exactly the union of the per-branch keep-sets; each
    branch reuses the conjunctive pruner with itself as the only filter
    (metadata-only scans, one per branch — OR fan-out is small in
    practice)."""
    chunks = _chunks_df(spark, out_dir, columns)
    if not filters:
        return chunks
    keep = None
    for zf in filters:
        k = pruned_chunks(spark, out_dir, columns, [zf], dict_prune) \
            .select("pid", "chunk_id")
        keep = k if keep is None else keep.unionByName(k)
    return chunks.join(keep.distinct(), ["pid", "chunk_id"], "left_semi")


def chunk_repartition(spark, chunks: DataFrame, out_dir: str,
                      ordered: bool = False) -> DataFrame:
    """Shuffle chunk rows so all column rows of one chunk land in one task.

    Chunk rows are few and fat (payload ~MBs), so the shuffle moves encoded
    (small) bytes — decoding after the shuffle keeps shuffled volume
    minimal. Partition count tracks the store size (one manifest file per
    encode partition — a driver-side listing, no data read): a small encode
    gets a few real tasks instead of defaultParallelism near-empty ones, a
    big store still fans out to full parallelism.

    ``ordered=True`` swaps the hash shuffle for a RANGE partition on
    (pid, chunk_id) plus an in-partition sort of the (few, fat) chunk
    rows: task i then holds chunks strictly before task i+1's, each task
    decodes its chunks in order, and the decoded output is globally
    ordered by (pid, chunk_id, row) WITHOUT any row-level sort — on a
    store clustered by ``sort_key`` that IS key order, so a sorted
    100 TB export costs the same chunk-metadata shuffle as a plain
    decode."""
    import glob as _glob
    import os as _os

    n_pids = len(_glob.glob(_os.path.join(out_dir, "manifest", "*.parquet")))
    n_part = min(spark.sparkContext.defaultParallelism * 2,
                 max(1, n_pids * 4)) if n_pids else None
    if ordered:
        rng = (chunks.repartitionByRange(n_part, "pid", "chunk_id")
               if n_part else
               chunks.repartitionByRange("pid", "chunk_id"))
        return rng.sortWithinPartitions("pid", "chunk_id")
    if n_part:
        return chunks.repartition(n_part, F.col("pid"), F.col("chunk_id"))
    # non-globbable store: keep the default-parallelism shuffle
    return chunks.repartition(F.col("pid"), F.col("chunk_id"))


def _as_of_pids(store: str, as_of: int) -> list[int]:
    """pids visible as of commit entry ``as_of`` (entries 0..as_of of the
    store's append-only commit log) — the same snapshot rule the fsst
    DataSource's ``.option('as_of', N)`` applies."""
    from ..sources.fsst_source import commit_range_pids

    return commit_range_pids(store, -1, as_of)


def decode_job(spark, out_dir: str, columns: list[str] | None = None,
               zone_filter: tuple[str, str, int | str] | None = None,
               zone_filters: list[tuple[str, str, int | str]] | None = None,
               zone_filters_any: list[tuple[str, str, int | str]] | None = None,
               dict_prune: bool = True,
               as_of: int | None = None,
               ordered: bool = False,
               _pids: list[int] | None = None,
               _chunk_keys: list[tuple[int, int]] | None = None) -> DataFrame:
    """DataFrame of the decoded table (plus pid/chunk_id provenance cols).

    ``zone_filter=(col, op, value)`` — or a conjunction via
    ``zone_filters=[(col, op, value), ...]`` (all must hold) — prunes whole
    chunks via the encode-time zone maps BEFORE any payload is read or
    decoded — chunk-granular, so the result still contains non-matching
    rows from surviving chunks; apply the exact row predicate afterwards
    (``decode_filtered`` does both). ``zone_filters_any`` instead prunes
    for a DISJUNCTION (any branch may hold; composable with the
    conjunctive filters — both prunings apply). String equality filters
    additionally prune via the dict codec's dictionary (``dict_prune``):
    chunks whose dictionary lacks the value are skipped without decoding
    any payload beyond the dictionary itself.

    ``as_of=N`` time-travels: only chunks committed by log entries 0..N
    decode (a pid filter pushed into the metadata scan — commit entries
    are immutable, so the same N always yields the same rows).

    ``ordered=True`` returns the rows globally ordered by
    (pid, chunk_id, row position) — partition i strictly precedes
    partition i+1 and rows within a partition are in chunk order — via a
    RANGE partition of the chunk metadata, never a row-level sort (see
    :func:`chunk_repartition`). On a store clustered with
    ``encode_job(sort_key=K)`` this is K-order: a sorted export for the
    price of a plain decode. Caveat: a store with UNMATERIALIZED
    schema-log-added columns buffers its pre-add chunks to end-of-stream,
    which breaks in-partition chunk order — materialize first."""
    ddl, out_cols = decoded_schema_ddl(spark, out_dir, columns)
    filters = list(zone_filters or [])
    if zone_filter is not None:
        filters.append(zone_filter)
    scan_columns = columns
    if columns is not None:
        # decoding ONLY schema-log-added columns: no physical rows would be
        # scanned at all, so the task couldn't learn chunk row counts —
        # pull one physical column through the scan as a row-count carrier
        # (dropped before emit; its decode is the price of the corner)
        from .schema import added_columns as _added

        if set(out_cols) <= set(_added(out_dir)):
            # carrier must exist in EVERY chunk: a materialized added
            # column is physical in new files but absent from pre-add
            # chunks, so exclude everything in the added log
            phys = sorted(set(column_arrow_types(spark, out_dir))
                          - set(_added(out_dir)))
            if phys:
                scan_columns = list(columns) + [phys[0]]
    # row tombstones (jobs.deletes) apply executor-side: the flag is read
    # once on the driver, each task lazily loads its pids' positions
    from .deletes import has_deletes
    from .schema import added_columns, dropped_columns

    deletes_on = has_deletes(out_dir)
    # schema-log-added columns: chunks written before the add have no row
    # for them — they fill with NULLs at end-of-stream. Chunks written
    # after the add carry the column physically and keep the streaming
    # early-emit; a store with UNMATERIALIZED adds buffers its pre-add
    # chunks per task until the task's input ends (memory ∝ the task's own
    # input share — rewrite via recluster/materialize to restore
    # chunk-at-a-time emit everywhere).
    added_types = {c: t for c, t in added_columns(out_dir).items()
                   if c in out_cols}

    def decode_task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..env import madvise_hugepages
        from ..kernel.codecs import parse_arrow_type
        from .deletes import DeleteMask

        madvise_hugepages()
        dmask = DeleteMask(out_dir) if deletes_on else None
        pending: dict[tuple[int, int], dict] = {}
        for batch in batches:
            cols = batch.to_pylist()
            for row in cols:
                key = (row["pid"], row["chunk_id"])
                slot = pending.setdefault(key, {"cols": {}})
                slot["cols"][row["column"]] = decode_column(
                    {"codec": row["codec"], "params": json.loads(row["params"]),
                     "payload": row["payload"]}
                )
                # membership, not count: the row-count-carrier column of the
                # all-added corner is scanned but not in `out_cols`
                if all(c in slot["cols"] for c in out_cols):
                    out = _emit(key, slot["cols"], out_cols, dmask)
                    if out is not None:
                        yield out
                    del pending[key]
        for key in sorted(pending):  # pre-add chunks: fill virtual NULLs
            cols = pending[key]["cols"]
            missing = set(out_cols) - set(cols)
            assert missing and missing <= set(added_types), \
                f"incomplete chunk {key}: missing non-added columns {missing}"
            n = len(next(iter(cols.values())))
            for c in missing:
                cols[c] = pa.nulls(n, parse_arrow_type(added_types[c]))
            out = _emit(key, cols, out_cols, dmask)
            if out is not None:
                yield out

    if (not filters and not zone_filters_any and as_of is None
            and _pids is None and _chunk_keys is None and not ordered):
        # FILE-GRANULAR fast path (the decode mirror of the encode-side
        # reroute): an unfiltered decode needs no chunk pruning and no
        # grouping shuffle — every (pid, chunk_id) group already lives
        # whole inside its pid's single chunk file, so one task per file
        # reads it columnar-natively with pyarrow. This removes BOTH the
        # payload shuffle (encoded bytes never cross an Exchange) and the
        # JVM->Python hop of the chunk-metadata scan (only file paths
        # cross), and reads just the six columns the decode needs —
        # zones/bloom/hll/checksum bytes stay on disk.
        import glob as _glob
        import os as _os

        files = sorted(_glob.glob(_os.path.join(out_dir, "chunks",
                                                "*.parquet")))
        if files:
            if scan_columns is not None:
                col_keep, col_drop = list(scan_columns), None
            else:
                col_keep = None
                col_drop = sorted(dropped_columns(out_dir)) or None
            from .encode import file_task_df

            task_df = file_task_df(spark, list(enumerate(files)),
                                   "i int, path string")

            def read_files(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
                import pyarrow.compute as _pc
                import pyarrow.parquet as _pq

                def file_batches():
                    for batch in batches:
                        for path in batch.column("path").to_pylist():
                            t = _pq.read_table(
                                path, columns=["pid", "chunk_id", "column",
                                               "codec", "params", "payload"])
                            if col_keep is not None:
                                t = t.filter(_pc.is_in(
                                    t.column("column"),
                                    pa.array(col_keep, pa.string())))
                            elif col_drop is not None:
                                t = t.filter(_pc.invert(_pc.is_in(
                                    t.column("column"),
                                    pa.array(col_drop, pa.string()))))
                            yield from t.to_batches()

                yield from decode_task(file_batches())

            return task_df.mapInArrow(read_files, ddl)

    chunks = pruned_chunks(spark, out_dir, scan_columns, filters, dict_prune)
    if as_of is not None and _pids is not None:
        raise ValueError("pass as_of OR a pid whitelist, not both")
    pids = _as_of_pids(out_dir, as_of) if as_of is not None else _pids
    if pids is not None:
        if not pids:  # valid empty commit range: no chunks visible
            chunks = chunks.where(F.lit(False))
        elif len(pids) <= 100_000:
            chunks = chunks.where(F.col("pid").isin(pids))
        else:  # snapshot spans many writes: semi join beats a giant IN plan
            pdf = spark.createDataFrame([(p,) for p in pids], "pid int")
            chunks = chunks.join(F.broadcast(pdf), "pid", "left_semi")
    if _chunk_keys is not None:  # LIMIT pushdown: exactly these chunks
        kdf = spark.createDataFrame(_chunk_keys, "pid int, chunk_id int")
        chunks = chunks.join(F.broadcast(kdf), ["pid", "chunk_id"],
                             "left_semi")
    if zone_filters_any:
        any_keep = pruned_chunks_any(spark, out_dir, columns,
                                     list(zone_filters_any), dict_prune) \
            .select("pid", "chunk_id").distinct()
        chunks = chunks.join(any_keep, ["pid", "chunk_id"], "left_semi")
    # sketches served their purpose at pruning time; don't shuffle them
    chunks = chunk_repartition(spark, chunks.drop("bloom", "hll"), out_dir,
                               ordered=ordered)
    return chunks.mapInArrow(decode_task, ddl)


def _row_predicate(col: str, op: str, value, arrow_name: str):
    """Exact row predicate for one zone filter, typed by the COLUMN.

    Timestamp columns compare in storage-unit ticks (``unix_micros`` for
    the us-precision Spark type) — a bare ``F.col(ts) >= int`` raises
    AnalysisException (TIMESTAMP vs BIGINT), so int/datetime/ISO-string
    values are all coerced through ``_ts_ticks``."""
    def coerce(v):
        if arrow_name.startswith("timestamp["):
            mult = _TS_UNIT_PER_SEC[_ts_unit(arrow_name)]
            return _ts_ticks(arrow_name, v) * 10**6 // mult
        _zone_key(arrow_name, v)  # type check only
        return float(v) if arrow_name in ("float", "double") else v

    lhs = (F.unix_micros(F.col(col)) if arrow_name.startswith("timestamp[")
           else F.col(col))
    if op == "rlike":
        if arrow_name not in ("string", "large_string"):
            raise ValueError(
                f"'rlike' needs a string column; {col!r} is {arrow_name}")
        return F.col(col).rlike(value)
    if op == "prefix":
        _prefix_bytes(arrow_name, value)  # type check only
        pv = value.decode("utf-8") if isinstance(value, bytes) else value
        return F.col(col).startswith(pv)
    if op == "contains":
        _prefix_bytes(arrow_name, value, op)  # type check only
        if arrow_name in ("binary", "large_binary"):
            return F.contains(F.col(col), F.lit(
                value.encode("utf-8", "surrogatepass")
                if isinstance(value, str) else bytes(value)))
        pv = value.decode("utf-8") if isinstance(value, bytes) else value
        return F.col(col).contains(pv)
    if op == "suffix":
        _prefix_bytes(arrow_name, value, op)  # type check only
        if arrow_name in ("binary", "large_binary"):
            return F.endswith(F.col(col), F.lit(
                value.encode("utf-8", "surrogatepass")
                if isinstance(value, str) else bytes(value)))
        pv = value.decode("utf-8") if isinstance(value, bytes) else value
        return F.col(col).endswith(pv)
    if op == "in":
        return lhs.isin(*[coerce(v) for v in value])
    rhs = F.lit(coerce(value))
    return {
        ">=": lhs >= rhs, ">": lhs > rhs,
        "<=": lhs <= rhs, "<": lhs < rhs, "==": lhs == rhs,
    }[op]


def decode_filtered(spark, out_dir: str, col: str | None = None, op: str | None = None,
                    value: int | str | float | None = None,
                    columns: list[str] | None = None,
                    filters: list[tuple] | None = None,
                    any_filters: list[tuple] | None = None,
                    as_of: int | None = None,
                    _pids: list[int] | None = None) -> DataFrame:
    """Selective decode: zone-map chunk pruning + the exact row predicates.

    Pass one predicate positionally (``col, op, value``), a conjunction
    via ``filters=[(col, op, value), ...]`` (all must hold), and/or a
    disjunction via ``any_filters=[...]`` (at least one must hold); when
    both are given the result is ``AND(filters) AND OR(any_filters)`` —
    SQL's conjunctive normal form with one OR clause. Returns exactly the
    matching rows while reading and decoding only the chunks whose zone
    maps (plus dict sections and blooms) can match — the OR clause prunes
    to the union of its branches' keep-sets, so ``lang == 'de' OR lang ==
    'fr'`` on a clustered corpus still skips every other language's
    chunks at 100 TB."""
    flt = list(filters or [])
    if col is not None:
        flt.insert(0, (col, op, value))
    any_flt = list(any_filters or [])
    if not flt and not any_flt:
        raise ValueError("decode_filtered needs (col, op, value), "
                         "filters=[...], or any_filters=[...]")
    fcols = [f[0] for f in flt + any_flt]
    cols = columns
    if cols is not None:
        cols = cols + [c for c in fcols if c not in cols]
    types = column_arrow_types(spark, out_dir, include_added=True)
    for fc in fcols:
        if fc in types and types[fc].startswith(
                ("list<", "large_list<", "fixed_size_list<")):
            raise ValueError(
                f"cannot filter on nested column {fc!r} ({types[fc]}): "
                "array columns have no zone maps or scalar predicates — "
                "filter on a scalar column (e.g. the ivf_cell layout key "
                "for embedding stores) instead")
    df = decode_job(spark, out_dir, cols, zone_filters=flt,
                    zone_filters_any=any_flt or None, as_of=as_of,
                    _pids=_pids)
    for fc, fop, fval in flt:
        df = df.where(_row_predicate(fc, fop, fval, types[fc]))
    if any_flt:
        pred = None
        for fc, fop, fval in any_flt:
            p = _row_predicate(fc, fop, fval, types[fc])
            pred = p if pred is None else (pred | p)
        df = df.where(pred)
    if columns is not None:
        df = df.drop(*[c for c in fcols if c not in columns])
    return df


def decode_plan(spark, out_dir: str, columns: list[str] | None = None,
                filters: list[tuple] | None = None,
                any_filters: list[tuple] | None = None,
                as_of: int | None = None) -> dict:
    """EXPLAIN for a selective decode — what :func:`decode_filtered` WOULD
    read, from metadata alone (zone/dict/bloom pruning runs for real; no
    payload chunk is ever decoded). The dry-run costs one narrow metadata
    scan per pruning stage, so planning a query against a 100 TB store is
    an interactive operation — the ops surface for "is my store clustered
    for this predicate?" before committing a cluster-hours decode, and the
    decode sibling of ``store_join_plan``.

    Returns a JSON-able dict:

    - ``chunks_total`` / ``rows_total`` / ``enc_bytes_total``: the store
      (for the selected columns, at the ``as_of`` snapshot if given);
    - ``chunks_after_zones``: survivors of zone pruning alone;
    - ``chunks_kept`` / ``rows_bound`` / ``enc_bytes_to_read``: survivors
      of the full stack (zones + dict sections + blooms) — exactly the
      chunks the real decode would scan. ``rows_bound`` is an upper bound
      on result rows (chunk pruning is chunk-granular; the exact row
      predicate trims further);
    - ``scan_fraction``: ``enc_bytes_to_read / enc_bytes_total`` — the
      headline number (0.02 = the layout serves this predicate; 1.0 =
      recluster or add a sketch);
    - ``has_deletes``: tombstoned rows are NOT subtracted from the bounds
      (merge-on-read applies them at decode time).

    Filter-column payloads decode too in the real query (the exact row
    predicate needs them), so ``columns`` here widens exactly like
    ``decode_filtered``'s scan set."""
    flt = list(filters or [])
    any_flt = list(any_filters or [])
    types = column_arrow_types(spark, out_dir, include_added=True)
    for c in list(columns or []) + [f[0] for f in flt + any_flt]:
        if c not in types:
            raise KeyError(f"column {c!r} not in encoded data")
    scan_cols = columns
    if scan_cols is not None:
        fcols = [f[0] for f in flt + any_flt]
        scan_cols = list(scan_cols) + [c for c in fcols
                                       if c not in scan_cols]

    pids = _as_of_pids(out_dir, as_of) if as_of is not None else None

    def _restrict(chunks: DataFrame) -> DataFrame:
        if pids is None:
            return chunks
        if not pids:
            return chunks.where(F.lit(False))
        return chunks.where(F.col("pid").isin(pids))

    def _measure(chunks: DataFrame) -> tuple[int, int, int]:
        """(n_chunks, n_rows, enc_bytes) — chunk count and row total are
        per (pid, chunk_id) [every column of a chunk shares n_rows]; bytes
        sum over all selected column rows (what the decode reads)."""
        r = _restrict(chunks).agg(
            F.count_distinct("pid", "chunk_id").alias("c"),
            F.sum("enc_bytes").alias("b"),
        ).collect()[0]
        rows = (_restrict(chunks)
                .select("pid", "chunk_id", "n_rows").distinct()
                .agg(F.sum("n_rows")).collect()[0][0])
        return int(r["c"] or 0), int(rows or 0), int(r["b"] or 0)

    total_c, total_r, total_b = _measure(
        _chunks_df(spark, out_dir, scan_cols))

    def _keep(dict_prune: bool) -> DataFrame:
        chunks = pruned_chunks(spark, out_dir, scan_cols, flt, dict_prune)
        if any_flt:
            any_keep = (pruned_chunks_any(spark, out_dir, scan_cols,
                                          any_flt, dict_prune)
                        .select("pid", "chunk_id").distinct())
            chunks = chunks.join(any_keep, ["pid", "chunk_id"], "left_semi")
        return chunks

    if flt or any_flt:
        zone_c, _, _ = _measure(_keep(dict_prune=False))
        kept_c, kept_r, kept_b = _measure(_keep(dict_prune=True))
    else:
        zone_c, (kept_c, kept_r, kept_b) = total_c, (total_c, total_r,
                                                     total_b)
    from .deletes import has_deletes

    return {
        "store": out_dir,
        "columns": sorted(scan_cols) if scan_cols is not None else None,
        "filters": [list(f) for f in flt],
        "any_filters": [list(f) for f in any_flt],
        "as_of": as_of,
        "chunks_total": total_c,
        "chunks_after_zones": zone_c,
        "chunks_kept": kept_c,
        "rows_total": total_r,
        "rows_bound": kept_r,
        "enc_bytes_total": total_b,
        "enc_bytes_to_read": kept_b,
        "scan_fraction": round(kept_b / total_b, 6) if total_b else 0.0,
        "has_deletes": has_deletes(out_dir),
    }


def decode_changes(spark, out_dir: str, since: int, until: int | None = None,
                   columns: list[str] | None = None,
                   filters: list[tuple] | None = None,
                   any_filters: list[tuple] | None = None) -> DataFrame:
    """Incremental (CDC-style) batch read: only the rows APPENDED by commit
    entries ``since+1 .. until`` of the store's append-only commit log
    (``since=-1`` reads from the first entry; ``until=None`` reads to the
    latest entry at call time — record ``commit_count(store) - 1`` as the
    next ``since`` watermark). The incremental-consumer loop:

        hw = -1
        while True:
            new_hw = commit_count(store) - 1
            process(decode_changes(spark, store, since=hw, until=new_hw))
            hw = new_hw

    Commit entries are immutable, so the same (since, until) pair always
    yields the same rows even while the store keeps growing — each batch
    is exactly-once with respect to appends. This is the batch sibling of
    the streaming source (``spark.readStream.format('fsst')`` follows the
    same log continuously); use this form for scheduled jobs that want one
    bounded DataFrame per run. Current row tombstones still apply
    (merge-on-read): a row appended inside the range and deleted later is
    NOT returned — deletes are store-global physical state, not versioned.

    ``filters`` / ``any_filters`` compose with the pid restriction exactly
    as in :func:`decode_filtered` — zone/dict/bloom chunk pruning plus the
    exact row predicates, so an incremental read of one language or one
    zone range decodes only the new chunks that can match.

    At 10^12 docs: the commit log is one tiny JSON per WRITE (not per
    task), the pid whitelist is metadata-scale, and the scan reads only
    the range's chunk files — incremental cost scales with the NEW data,
    never the store. Reference tie: engine-level surface with no reference
    analog (spiraldb/fsst src/lib.rs:14-17 exports codec types only)."""
    from ..sources.fsst_source import commit_range_pids

    pids = commit_range_pids(out_dir, since, until)
    if filters or any_filters:
        return decode_filtered(spark, out_dir, columns=columns,
                               filters=filters, any_filters=any_filters,
                               _pids=pids)
    return decode_job(spark, out_dir, columns, _pids=pids)


def decode_head(spark, out_dir: str, n: int,
                columns: list[str] | None = None,
                filters: list[tuple] | None = None) -> DataFrame:
    """LIMIT pushdown: return ``n`` rows while decoding only as many
    chunks as the limit needs — ``SELECT * LIMIT 100`` against a 100 TB
    store reads one chunk file, not the store.

    Chunk selection is metadata-only and deterministic: surviving chunks
    (zone/dict/bloom-pruned when ``filters`` are given) in (pid, chunk_id)
    order, taking the shortest prefix whose summed ``n_rows`` covers the
    limit. Without filters or tombstones the metadata counts are exact and
    ONE selection suffices. With row predicates (or tombstones) surviving
    chunks may yield fewer rows than their counts, so the prefix doubles
    until the limit is met or every surviving chunk is read — each retry
    costs one count() over a chunk set that is still bounded by ~2× what
    the limit ultimately needed. ``filters`` rows are exact (zone pruning
    is conservative; the row predicates re-apply), so the returned rows
    always satisfy them.

    At 10^12 docs: the selection reads only the narrow
    (pid, chunk_id, n_rows) metadata projection with a sort-limit (never
    payload, never a full collect), and the decode plan is the normal
    selective-decode plan over the selected chunk whitelist."""
    if n <= 0:
        raise ValueError(f"decode_head needs n > 0 (got {n})")
    flt = list(filters or [])
    fcols = [f[0] for f in flt]
    cols = columns
    if cols is not None:
        cols = cols + [c for c in fcols if c not in cols]
    ddl, ordered = decoded_schema_ddl(spark, out_dir, cols)
    from .deletes import has_deletes

    exact = not flt and not has_deletes(out_dir)
    types = column_arrow_types(spark, out_dir, include_added=True)
    from .schema import added_columns as _added_cols

    # the n_rows carrier must exist in EVERY chunk: exclude all added-log
    # columns (a materialized add is physical in new files only)
    phys = sorted(set(column_arrow_types(spark, out_dir))
                  - set(_added_cols(out_dir)))
    meta_col = next((c for c in ordered if c in phys), phys[0])
    scan_cols = (cols if cols is None or meta_col in cols
                 else cols + [meta_col])
    src = (pruned_chunks(spark, out_dir, scan_cols, flt) if flt
           else _chunks_df(spark, out_dir, scan_cols))
    meta = (src.where(F.col("column") == meta_col)
            .select("pid", "chunk_id", "n_rows")
            .orderBy("pid", "chunk_id"))

    def build(keys):
        df = decode_job(spark, out_dir, cols, _chunk_keys=keys)
        for fc, fop, fval in flt:
            df = df.where(_row_predicate(fc, fop, fval, types[fc]))
        if columns is not None:
            df = df.drop(*[c for c in fcols if c not in columns])
        return df

    k = 1
    while True:
        rows = meta.limit(k).collect()
        got = 0
        keys = []
        for r in rows:
            keys.append((r["pid"], r["chunk_id"]))
            got += r["n_rows"]
            if exact and got >= n:
                break
        df = build(keys)
        if exact and got >= n:
            return df.limit(n)
        exhausted = len(rows) < k
        if exhausted or df.limit(n).count() >= n:
            return df.limit(n)
        k *= 2


def decode_sample(spark, out_dir: str, target_rows: int, key_col: str,
                  columns: list[str] | None = None,
                  salt: str = "sample") -> DataFrame:
    """Uniform deterministic row sample of a store whose IO cost scales
    with the SAMPLE, not the store — "show me ~1,000 representative rows
    of 100 TB" without a full scan.

    Two-stage selection, both stages content-keyed (md5 thresholds, the
    same engine-reproducible trick as ``pipeline.sampling``):

    1. CHUNKS at fraction ``f``: keep chunks where
       ``md5(pid:chunk_id:salt)`` clears a threshold, ``f`` sized from
       metadata so the selected chunks' exact summed ``n_rows`` covers
       the target (doubling until it does — each probe is one narrow
       metadata aggregate). Only these chunks ever decode.
    2. ROWS within selected chunks at rate ``r = target_rows /
       selected_rows``: keep rows where ``md5(key_col:salt)`` clears
       ``r``'s threshold.

    Every chunk is selected with the same probability ``f`` regardless
    of size, and within a realization every row of every selected chunk
    passes at the SAME rate ``r`` — rows are weighted equally across the
    whole sample (``r`` adapts to the selected chunks' exact row count,
    so E[rows] = ``target_rows``; with strongly varying chunk sizes the
    marginal per-row inclusion probability deviates slightly from
    ``f·r``, a standard two-stage-sampling property). The set contract
    matches ``mix_sources`` / ``deterministic_sample``: the same call
    always returns the same rows, any engine, any cluster size. Rows are clumped by chunk
    (that is where the IO saving comes from) — fine for eyeballing and
    aggregate estimation; use ``pipeline.sampling`` post-decode when
    you need row-level independence. Tombstones thin the result below
    target like any decode; ``key_col`` must be a stored column with
    distinct-per-row values for the set to be well-defined."""
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    types = column_arrow_types(spark, out_dir)
    if key_col not in types:
        raise KeyError(f"key_col {key_col!r} not in encoded data")
    cols = columns
    if cols is not None:
        for c in cols:
            if c not in column_arrow_types(spark, out_dir,
                                           include_added=True):
                raise KeyError(f"column {c!r} not in encoded data")
        if key_col not in cols:
            cols = list(cols) + [key_col]
    meta = (_chunks_df(spark, out_dir, [key_col])
            .where(F.col("column") == key_col)
            .select("pid", "chunk_id", "n_rows"))
    tot = meta.agg(F.count("*"), F.sum("n_rows")).collect()[0]
    n_chunks, rows_total = int(tot[0] or 0), int(tot[1] or 0)
    if rows_total == 0:
        return decode_job(spark, out_dir, cols)

    def _hex_thr(frac: float) -> str:
        # min(): frac < 1.0 can still round up to exactly 2^32 in double
        # precision — 9 hex digits would defeat the 8-char comparison
        return ("g" if frac >= 1.0
                else format(min(int(frac * (1 << 32)), 0xffffffff), "08x"))

    chunk_hash = F.substring(
        F.md5(F.concat_ws(":", F.col("pid"), F.col("chunk_id"),
                          F.lit(salt))), 1, 8)
    # size f so the EXPECTED selected rows cover the target with slack,
    # then verify against the exact metadata counts and double on shortfall
    frac = min(1.0, 1.5 * target_rows / rows_total)
    while True:
        sel = meta.where(chunk_hash < F.lit(_hex_thr(frac)))
        selected_rows = int(sel.agg(F.sum("n_rows")).collect()[0][0] or 0)
        if selected_rows >= min(target_rows, rows_total) or frac >= 1.0:
            break
        frac = min(1.0, frac * 2)
    if frac >= 1.0:  # every chunk selected: skip the whitelist entirely
        df = decode_job(spark, out_dir, cols)
    else:
        keys = [(r["pid"], r["chunk_id"])
                for r in sel.select("pid", "chunk_id").collect()]
        df = decode_job(spark, out_dir, cols, _chunk_keys=keys)
    r_rate = min(1.0, target_rows / max(selected_rows, 1))
    row_hash = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
              .cast("binary")), 1, 8)
    out = df.where(row_hash < F.lit(_hex_thr(r_rate)))
    if columns is not None and key_col not in columns:
        out = out.drop(key_col)
    return out


def _emit(key: tuple[int, int], cols: dict[str, pa.Array], ordered: list[str],
          dmask=None) -> pa.RecordBatch | None:
    import numpy as np

    fixed = []
    for c in ordered:
        arr = cols[c]
        if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
            arr = arr.cast(pa.timestamp("us", tz=arr.type.tz))  # spark speaks us
        fixed.append(arr)
    if dmask is not None:
        from .deletes import apply_delete_mask

        fixed = apply_delete_mask(dmask, key[0], key[1], fixed)
        if fixed is None:
            return None  # every row tombstoned
    n = len(fixed[0]) if fixed else 0
    arrays = [
        pa.array(np.full(n, key[0], dtype=np.int32)),
        pa.array(np.full(n, key[1], dtype=np.int32)),
    ] + fixed
    return pa.RecordBatch.from_arrays(arrays, names=["pid", "chunk_id", *ordered])


def decode_semijoin(spark, out_dir: str, col: str, keys,
                    columns: list[str] | None = None,
                    max_pushdown_keys: int = 100_000) -> DataFrame:
    """Decode only the rows whose ``col`` appears in ``keys`` — the
    encoded-store analog of Spark's dynamic partition pruning / runtime
    bloom filters: the build side of a join prunes the probe side's SCAN,
    not just its rows.

    ``keys`` is a single-column DataFrame (or a Python list). Distinct
    keys up to ``max_pushdown_keys`` are collected to the driver — exactly
    what Spark's own InSubqueryExec runtime filter does — and pushed into
    chunk pruning: zone maps, dict-membership probes, and per-chunk Bloom
    filters all apply, so on a clustered or bloom-equipped store a semi
    join against a small key set touches a small fraction of the payload
    bytes. Rows are then filtered with a broadcast ``isin``-style semi
    join (never a driver-side loop). If the key set exceeds the cap, the
    scan-pruning step is skipped (every chunk decodes — correct, just
    unpruned) and only the broadcast semi join remains; at that
    cardinality the keys were never going to prune chunks anyway.

    Reference tie: engine-side scale surface with no reference analog
    (spiraldb/fsst src/lib.rs:14-17 exports only codec types); the design
    follows Spark AQE's runtime-filter pushdown shape.
    """
    from pyspark.sql import DataFrame as SparkDataFrame

    if isinstance(keys, SparkDataFrame):
        if len(keys.columns) != 1:
            raise ValueError(
                f"keys frame must have exactly one column, got {keys.columns}")
        # null keys never equi-join; dropping them up front keeps the
        # pushdown's zone/bloom probes typed
        keys_df = keys.toDF("_k").where(F.col("_k").isNotNull()).distinct()
    else:
        vals = sorted(set(k for k in keys if k is not None))
        if not vals:
            return decode_job(spark, out_dir, columns).limit(0)
        keys_df = spark.createDataFrame([(v,) for v in vals], ["_k"])
    # runtime-filter collect, capped: one narrow limit(cap+1) of DISTINCT
    # keys — metadata-scale by construction, and the cap keeps a
    # billion-key build side from ever landing on the driver
    head = [r["_k"] for r in keys_df.limit(max_pushdown_keys + 1).collect()]
    cols = columns
    if cols is not None and col not in cols:
        cols = cols + [col]
    if not head:  # empty build side: nothing can match, decode nothing
        df = decode_job(spark, out_dir, cols).limit(0)
    elif len(head) <= max_pushdown_keys:
        df = decode_job(spark, out_dir, cols,
                        zone_filter=(col, "in", head))
    else:
        df = decode_job(spark, out_dir, cols)
    out = df.join(F.broadcast(keys_df),
                  df[col] == keys_df["_k"], "left_semi")
    if columns is not None and col not in columns:
        out = out.drop(col)
    return out


def decode_stores(spark, out_dirs: "list[str]",
                  columns: list[str] | None = None,
                  filters: list[tuple] | None = None,
                  any_filters: list[tuple] | None = None,
                  provenance_col: str | None = None) -> DataFrame:
    """Read a FAMILY of encoded stores as one DataFrame — the daily-shard
    layout every web corpus converges on (a store per crawl day / dump).

    Each store decodes through its own selective path, so zone, dict and
    bloom pruning apply PER STORE before the union: a ``warc_ts`` range
    predicate over a year of daily shards skips whole stores' payloads,
    not just chunks. Columns shared by several stores must agree on arrow
    type (asserted against every manifest up front — a drifted shard
    fails fast, never mid-scan); columns missing from older shards
    null-fill, the same semantics the engine's metadata-only ADD COLUMN
    gives within one store. ``provenance_col`` adds each row's source
    store dir as a literal column (constant-folded, no per-row cost).

    Reference tie: engine-side scale surface with no reference analog
    (spiraldb/fsst src/lib.rs:14-17 exports only codec types); the shape
    follows Spark's own multi-path DataFrameReader + unionByName.
    """
    if not out_dirs:
        raise ValueError("decode_stores needs at least one store dir")
    # type-consistency gate across every manifest BEFORE any decode
    seen: dict[str, tuple[str, str]] = {}
    for d in out_dirs:
        for c, t in column_arrow_types(spark, d, include_added=True).items():
            if columns is not None and c not in columns:
                continue
            if c in seen and seen[c][0] != t:
                raise TypeError(
                    f"column {c!r} is {seen[c][0]} in {seen[c][1]} but "
                    f"{t} in {d}; shards of one logical table must agree "
                    f"— cast and re-encode the drifted store")
            seen.setdefault(c, (t, d))
    parts = []
    for d in out_dirs:
        have = set(column_arrow_types(spark, d, include_added=True))
        cols = None
        if columns is not None:
            cols = [c for c in columns if c in have]
            if not cols:
                # decode_job treats [] as "all columns"; a shard sharing
                # NO projected column contributes nothing — skip it
                # rather than polluting the union schema
                continue
        flt = [f for f in (filters or []) if f[0] in have]
        dropped = [f for f in (filters or []) if f[0] not in have]
        if dropped:
            # a conjunct on a column this shard lacks can only match NULL
            # semantics — which is never true — so the shard contributes
            # nothing; skip its scan entirely
            continue
        anyf = [f for f in (any_filters or []) if f[0] in have]
        if (any_filters or []) and not anyf:
            continue  # no OR branch can hold on this shard
        if flt or anyf:
            df = decode_filtered(spark, d, columns=cols,
                                 filters=flt or None,
                                 any_filters=anyf or None)
        else:
            df = decode_job(spark, d, cols)
        df = df.drop("pid", "chunk_id")
        if provenance_col is not None:
            df = df.withColumn(provenance_col, F.lit(d))
        parts.append(df)
    if not parts:
        # every shard pruned away: empty frame with the full projected schema
        base = decode_job(spark, out_dirs[0],
                          columns if columns is None else
                          [c for c in columns
                           if c in column_arrow_types(
                               spark, out_dirs[0], include_added=True)])
        base = base.drop("pid", "chunk_id").limit(0)
        if provenance_col is not None:
            base = base.withColumn(provenance_col, F.lit(out_dirs[0]))
        return base
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def decode_stores_plan(spark, out_dirs: "list[str]",
                       columns: list[str] | None = None,
                       filters: list[tuple] | None = None,
                       any_filters: list[tuple] | None = None) -> dict:
    """Family-level EXPLAIN: :func:`decode_plan` for each shard of a
    ``decode_stores`` read, mirroring its skip rules exactly — a shard
    lacking a conjunct's column (or every OR branch's column, or every
    projected column) contributes zero and is listed under
    ``stores_skipped`` with the reason, so the report shows WHOLE-STORE
    pruning (the per-shard predicate skipping a year of daily dumps)
    alongside the per-chunk kind. Totals sum over scanned shards only;
    ``scan_fraction`` is family-wide (bytes to read / family bytes,
    skipped shards' bytes included in the denominator — that is the
    fraction of the family's encoded bytes the query touches)."""
    if not out_dirs:
        raise ValueError("decode_stores_plan needs at least one store dir")
    plans, skipped = [], []
    denom_bytes = 0
    for d in out_dirs:
        have = set(column_arrow_types(spark, d, include_added=True))
        cols = None
        if columns is not None:
            cols = [c for c in columns if c in have]
            if not cols:
                # carries nothing we project: contributes 0 to numerator
                # AND denominator (its bytes were never in question)
                skipped.append({"store": d,
                                "reason": "no projected column"})
                continue
        denom_cols = cols
        if denom_cols is not None:
            # keep the denominator comparable to the numerator: filter
            # columns widen the real scan set (decode_plan does the same)
            fcols = [f[0] for f in (filters or []) + (any_filters or [])]
            denom_cols = denom_cols + [c for c in fcols
                                       if c in have and c not in denom_cols]
        full = decode_plan(spark, d, columns=denom_cols)
        denom_bytes += full["enc_bytes_total"]
        flt = [f for f in (filters or []) if f[0] in have]
        if len(flt) != len(filters or []):
            skipped.append({"store": d,
                            "reason": "conjunct on absent column"})
            continue
        anyf = [f for f in (any_filters or []) if f[0] in have]
        if (any_filters or []) and not anyf:
            skipped.append({"store": d,
                            "reason": "no OR branch column present"})
            continue
        plans.append(decode_plan(spark, d, columns=cols,
                                 filters=flt or None,
                                 any_filters=anyf or None))
    tot = lambda k: sum(p[k] for p in plans)  # noqa: E731
    return {
        "stores": len(out_dirs),
        "stores_scanned": len(plans),
        "stores_skipped": skipped,
        "chunks_total": tot("chunks_total"),
        "chunks_kept": tot("chunks_kept"),
        "rows_total": tot("rows_total"),
        "rows_bound": tot("rows_bound"),
        "enc_bytes_family": denom_bytes,
        "enc_bytes_to_read": tot("enc_bytes_to_read"),
        "scan_fraction": (round(tot("enc_bytes_to_read") / denom_bytes, 6)
                          if denom_bytes else 0.0),
        "per_store": plans,
    }
