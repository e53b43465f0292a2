"""Column-level FSST functions — direct API parity with the reference.

The reference's public surface is train / compress / decompress
(reference src/builder.rs:604-628, src/lib.rs:518-529, src/lib.rs:255-303).
These helpers expose the same three operations over Spark columns, so a
user of the Rust crate can switch 1:1:

    table = train_table(df, "text")            # <=16 KiB sample, driver-side
    out = df.withColumn("z", compress_col(table)(F.col("text")))
    back = out.withColumn("t", decompress_col(table)(F.col("z")))

Compression/decompression run as Arrow-batched pandas UDFs over the
vectorized kernels (native C when available) — no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..kernel import fsst
from ..kernel.fsst_vec import EncoderTables, decode_chunk, encode_chunk

SAMPLE_ROWS = 512  # more than enough to fill the 16 KiB training sample


def train_table(df: DataFrame, col: str, sample_rows: int = SAMPLE_ROWS) -> bytes:
    """Train a symbol table on a small sample of a column; returns the
    serialized table blob (symbols + lengths, <=2 KiB)."""
    rows = (
        df.select(F.col(col).cast("binary").alias("v"))
        .filter(F.col("v").isNotNull())
        .limit(sample_rows)
        .collect()
    )
    comp = fsst.train([bytes(r["v"]) for r in rows])
    return comp.table_bytes()


def _tables_from_blob(blob: bytes) -> tuple[EncoderTables, "object"]:
    symbols, lengths, hs = fsst.deserialize_table(blob)
    comp = fsst.compressor_from_table(symbols, lengths, hs)
    return EncoderTables.from_compressor(comp), comp


def compress_col(table_blob: bytes):
    """pandas_udf: binary/string column -> FSST-compressed binary column."""
    holder: list = []

    @pandas_udf("binary")
    def _compress(vals: pd.Series) -> pd.Series:
        if not holder:
            holder.append(_tables_from_blob(table_blob)[0])
        t = holder[0]
        import numpy as np

        # NULLs stay NULL through the round-trip (a validity mask, like the
        # chunked codec path) — never conflated with the empty string.
        nulls = [v is None for v in vals]
        data_list = [
            b"" if v is None else (v if isinstance(v, bytes) else v.encode())
            for v in vals
        ]
        buf = np.frombuffer(b"".join(data_list), dtype=np.uint8)
        offsets = np.zeros(len(data_list) + 1, dtype=np.int64)
        np.cumsum([len(v) for v in data_list], out=offsets[1:])
        enc, eoff = encode_chunk(buf, offsets, t)
        raw = enc.tobytes()
        return pd.Series(
            [None if nulls[i] else raw[eoff[i]: eoff[i + 1]] for i in range(len(data_list))]
        )

    return _compress


def decompress_col(table_blob: bytes):
    """pandas_udf: FSST-compressed binary column -> original binary column."""
    symbols, lengths, _ = fsst.deserialize_table(table_blob)
    sym_mat, sym_lens = fsst.table_to_numpy(symbols, lengths)

    @pandas_udf("binary")
    def _decompress(vals: pd.Series) -> pd.Series:
        import numpy as np

        nulls = [v is None for v in vals]
        data_list = [bytes(v) if v is not None else b"" for v in vals]
        buf = np.frombuffer(b"".join(data_list), dtype=np.uint8)
        offsets = np.zeros(len(data_list) + 1, dtype=np.int64)
        np.cumsum([len(v) for v in data_list], out=offsets[1:])
        dec, doff = decode_chunk(buf, offsets, sym_mat, sym_lens)
        raw = dec.tobytes()
        return pd.Series(
            [None if nulls[i] else raw[doff[i]: doff[i + 1]] for i in range(len(data_list))]
        )

    return _decompress
