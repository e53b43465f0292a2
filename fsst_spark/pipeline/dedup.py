"""Deduplication operators for web-scale corpora.

  * exact dedup        — hash group-by on a normalized fingerprint (built-ins)
  * MinHash + LSH      — shingle -> minhash signature (Arrow-batched pandas
                         UDF, numpy-vectorized per doc) -> banded bucket join
  * SimHash            — 64-bit weighted token-hash fingerprint
  * n-gram Jaccard     — exact similarity verification for candidate pairs

Scale notes: the LSH band join shuffles only (band, bucket, doc_id) — never
text — and bucket sizes are bounded by the band width; candidate
verification joins text back only for the (tiny) candidate set, broadcast
when small. At 10^12 docs the band join is the standard near-dup shape
(each stage is a hash shuffle on narrow keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf

from .textstats import normalized_fingerprint

M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_docs, n_distinct, n_dup_docs) by exact normalized content."""
    fp = df.select(normalized_fingerprint(F.col(text_col)).alias("fp"))
    groups = fp.groupBy("fp").agg(F.count("*").alias("cnt"))
    return groups.agg(
        F.sum("cnt").alias("n_docs"),
        F.count("*").alias("n_distinct"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("n_dup_docs"),
    )


def exact_dedup(df: DataFrame, text_col: str = "text", keep: str = "min",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative doc per exact normalized content."""
    w = df.withColumn("_fp", normalized_fingerprint(F.col(text_col)))
    agg = w.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return w.join(agg, ["_fp", id_col], "inner").drop("_fp")


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------
def _minhash_params(n_hashes: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, n_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, n_hashes, dtype=np.uint64)
    return a, b


def _shingle_hashes(data: bytes, k: int) -> np.ndarray:
    """uint64 hashes of all k-byte shingles (vectorized rolling window)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) < k:
        arr = np.frombuffer(data.ljust(k, b"\x00"), dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    mul = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    h = (win * mul).sum(axis=1, dtype=np.uint64)
    h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    return np.unique(h & M64)


def minhash_signature_udf(n_hashes: int = 64, shingle_k: int = 5, seed: int = 1):
    """pandas_udf: text -> array<bigint> MinHash signature."""
    a, b = _minhash_params(n_hashes, seed)
    prime_mask = M64

    @pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            data = (t or "").encode("utf-8", "surrogatepass")
            if not data:
                out.append(np.zeros(n_hashes, dtype=np.int64))
                continue
            sh = _shingle_hashes(data, shingle_k)
            # (a*x+b) per hash fn, take min over shingles — outer product
            vals = (sh[None, :] * a[:, None] + b[:, None]) & prime_mask
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                           n_hashes: int = 64, bands: int = 16, shingle_k: int = 5,
                           seed: int = 1) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Returns distinct (id_a, id_b) with id_a < id_b. Shuffles only narrow
    (band, bucket_hash, id) rows; text never moves.
    """
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sig = df.select(F.col(id_col), minhash_signature_udf(n_hashes, shingle_k, seed)(F.col(text_col)).alias("sig"))
    band_cols = [
        F.xxhash64(F.slice("sig", i * rows_per_band + 1, rows_per_band).cast("string"), F.lit(i)).alias("bucket")
        for i in range(bands)
    ]
    banded = sig.select(
        F.col(id_col),
        F.posexplode(F.array(*band_cols)).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", shingle_k: int = 5,
                         threshold: float = 0.7) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs; keeps pairs >= threshold."""
    texts = df.select(F.col(id_col), F.col(text_col))
    joined = (
        pairs.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed(text_col, "text_a"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed(text_col, "text_b"), "id_b")
    )

    @pandas_udf("double")
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            sa = _shingle_hashes((x or "").encode(), shingle_k)
            sb = _shingle_hashes((y or "").encode(), shingle_k)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            out[i] = inter / union if union else 1.0
        return pd.Series(out)

    return (
        joined.withColumn("jaccard", jac(F.col("text_a"), F.col("text_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_udf(seed: int = 2):
    """pandas_udf: text -> bigint 64-bit SimHash over whitespace tokens."""

    @pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        bits = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            hs = np.array(
                [hash_bytes(tok.encode("utf-8", "surrogatepass"), seed) for tok in toks],
                dtype=np.uint64,
            )
            bitmat = (hs[:, None] >> bits) & np.uint64(1)
            score = bitmat.sum(axis=0) * 2 - len(toks)
            fp = np.uint64(0)
            fp = ((score > 0).astype(np.uint64) << bits).sum(dtype=np.uint64)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    return sh


def hash_bytes(data: bytes, seed: int) -> int:
    """FNV-1a 64-bit, numpy-free scalar (used per token inside the UDF)."""
    h = 0xCBF29CE484222325 ^ (seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    for byte in data:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
