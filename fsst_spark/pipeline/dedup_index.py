"""Persistent MinHash dedup index: dedupe NEW batches against the corpus.

The batch near-dup ops (``minhash_lsh_candidates`` → ``neardup_dedup``)
re-signature the whole corpus every run. A training-data pipeline ingests
continuously: each new crawl must be deduplicated against everything
already kept WITHOUT touching the 10^12 documents already processed.
This module persists the two MinHash artifacts once —

    <index>/sigs/     (id, sig)            parquet
    <index>/buckets/  (band, bucket, id)   parquet, the LSH postings
    <index>/overcap/  (band, bucket)       boilerplate buckets, frozen
    <index>/meta.json signature parameters (probe/append must match)

— and answers "is this new doc a near-dup of anything kept so far?" with
one narrow equi-join per band: new-batch bucket rows against the postings
on (band, bucket), estimate-filtered on the stored signatures. Only the
NEW batch runs the signature UDF; the corpus side is a parquet scan of
(band, bucket, id) longs. Verification is signature-estimate based (both
sides' signatures are in the index; raw text is NOT stored — at 64 hashes
the estimate's σ at J=0.7 is ~0.057, so a 0.8 cutoff keeps exact dups
with margin). Survivors are appended to the index, which makes ingestion
an induction: the index always describes exactly the kept corpus.

Skew: ``overcap`` is computed ONCE at build time (the posting-list
groupBy) and frozen — probe joins anti-join both sides against it, so a
boilerplate bucket with 10^7 postings never expands. Appends keep the
frozen list (new boilerplate enters ``overcap`` on the next ``rebuild``;
in the window between, a hot bucket's probe cost grows linearly with
appended postings, never quadratically — the probe side is a new batch,
not a self-join).

No reference analog (the reference is a string codec kernel); the design
is the standard posting-list LSH index from the dedup literature
(Broder's shingling + banded MinHash as used by Gopher/RefinedWeb-style
pipelines), re-expressed as Spark joins over parquet.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import band_buckets, minhash_signatures

_META = ("n_hashes", "bands", "shingle_k", "seed")


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta.json")


def _read_meta(path: str) -> dict:
    try:
        with open(_meta_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"{path!r} is not a minhash index (no meta.json); build one "
            "with minhash_index_write") from None


def minhash_index_write(df: DataFrame, path: str, *, text_col: str = "text",
                        id_col: str = "doc_id", n_hashes: int = 64,
                        bands: int = 16, shingle_k: int = 5, seed: int = 1,
                        bucket_cap: int = 4096) -> None:
    """Build (overwrite) the index from the corpus kept so far. The one
    signature-UDF pass over the corpus happens HERE; every later probe is
    join-only. ``bucket_cap`` postings lists are counted once and frozen
    into ``overcap`` (see module docstring)."""
    assert n_hashes % bands == 0
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, seed)
    sig.write.mode("overwrite").parquet(os.path.join(path, "sigs"))
    spark = df.sparkSession
    sig_back = spark.read.parquet(os.path.join(path, "sigs"))  # UDF ran once
    buckets = band_buckets(sig_back, id_col, n_hashes, bands)
    # cluster postings by bucket so a probe join co-partitions cheaply
    (buckets.repartition(F.col("band"), F.col("bucket"))
            .write.mode("overwrite").parquet(os.path.join(path, "buckets")))
    over = (spark.read.parquet(os.path.join(path, "buckets"))
            .groupBy("band", "bucket").count()
            .where(F.col("count") > bucket_cap).select("band", "bucket"))
    over.write.mode("overwrite").parquet(os.path.join(path, "overcap"))
    with open(_meta_path(path), "w") as fh:
        json.dump({"n_hashes": n_hashes, "bands": bands,
                   "shingle_k": shingle_k, "seed": seed,
                   "bucket_cap": bucket_cap, "id_col": id_col}, fh)


def minhash_index_append(df_new: DataFrame, path: str, *,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> None:
    """Add new (already-deduplicated) docs to the index: one signature
    pass over ``df_new`` only, parquet-appended postings. The frozen
    ``overcap`` list is kept (rebuild to refresh it)."""
    meta = _read_meta(path)
    sig = minhash_signatures(df_new, text_col, id_col,
                             meta["n_hashes"], meta["shingle_k"], meta["seed"])
    sig.write.mode("append").parquet(os.path.join(path, "sigs"))
    spark = df_new.sparkSession
    # re-read so the banding consumes the materialized signatures instead
    # of re-running the UDF per band reference
    fresh = (spark.read.parquet(os.path.join(path, "sigs"))
             .join(df_new.select(F.col(id_col)), id_col, "left_semi"))
    (band_buckets(fresh, id_col, meta["n_hashes"], meta["bands"])
     .repartition(F.col("band"), F.col("bucket"))
     .write.mode("append").parquet(os.path.join(path, "buckets")))


def flag_against_index(df_new: DataFrame, path: str, *,
                       text_col: str = "text", id_col: str = "doc_id",
                       threshold: float = 0.8) -> DataFrame:
    """``df_new`` plus a boolean ``index_dup``: True iff the doc's
    estimated Jaccard against SOME indexed doc is ≥ ``threshold``.

    Plan shape (the 100 TB story): signature UDF over the new batch only;
    banded join new-buckets × postings on (band, bucket) — both sides
    anti-joined against the frozen ``overcap`` list first; distinct
    (new_id, idx_id) candidates; estimate from the two signature frames
    (JVM zip_with/aggregate); new ids with a passing candidate marked via
    one left join. The corpus contributes parquet scans of narrow longs —
    no corpus-side UDF, no self-join, no text shuffle."""
    meta = _read_meta(path)
    spark = df_new.sparkSession
    sig_new = minhash_signatures(df_new, text_col, id_col, meta["n_hashes"],
                                 meta["shingle_k"], meta["seed"]).persist()
    new_b = band_buckets(sig_new, id_col, meta["n_hashes"], meta["bands"])
    over = F.broadcast(spark.read.parquet(os.path.join(path, "overcap")))
    postings = (spark.read.parquet(os.path.join(path, "buckets"))
                .join(over, ["band", "bucket"], "left_anti")
                .select("band", "bucket",
                        F.col(meta.get("id_col", id_col)).alias("idx_id")))
    new_b = new_b.join(over, ["band", "bucket"], "left_anti")
    cand = (
        new_b.join(postings, ["band", "bucket"])
        .select(F.col(id_col).alias("new_id"), "idx_id").distinct()
    )
    idx_sigs = (spark.read.parquet(os.path.join(path, "sigs"))
                .select(F.col(meta.get("id_col", id_col)).alias("idx_id"),
                        F.col("sig").alias("sig_idx")))
    n_agree = F.aggregate(
        F.zip_with("sig", "sig_idx", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    )
    hits = (
        cand.join(sig_new.select(F.col(id_col).alias("new_id"), "sig"), "new_id")
        .join(idx_sigs, "idx_id")
        .where((n_agree / F.lit(meta["n_hashes"])) >= threshold)
        .select("new_id").distinct()
        .withColumn("index_dup", F.lit(True))
    )
    return (
        df_new.join(hits, df_new[id_col] == hits["new_id"], "left")
        .drop("new_id")
        .withColumn("index_dup", F.coalesce("index_dup", F.lit(False)))
    )


def dedup_against_index(df_new: DataFrame, path: str, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8,
                        append_survivors: bool = True) -> DataFrame:
    """Incremental-ingest dedup: drop new docs near-duplicating the
    indexed corpus, then (by default) append the survivors so the NEXT
    batch dedups against them too. Within-batch duplicates are the batch
    ops' job (compose ``neardup_dedup``/``exact_dedup`` upstream).
    Returns the surviving rows of ``df_new``."""
    flagged = flag_against_index(df_new, path, text_col=text_col,
                                 id_col=id_col, threshold=threshold)
    survivors = flagged.where(~F.col("index_dup")).drop("index_dup")
    if append_survivors:
        # localCheckpoint (not persist): the append WRITES to the parquet
        # paths the survivor plan READS, and Spark's cache manager recaches
        # by path — a persisted plan would silently recompute against the
        # mutated index (everything self-matches → zero rows). Severing
        # lineage pins the pre-append result.
        survivors = survivors.localCheckpoint(eager=True)
        minhash_index_append(survivors, path, text_col=text_col, id_col=id_col)
    return survivors
