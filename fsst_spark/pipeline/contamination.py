"""Benchmark-contamination screening: flag training documents whose
word n-grams overlap an evaluation/benchmark set.

The standard decontamination step of an LLM data pipeline (n-gram
overlap against eval sets, as popularized by GPT-3's 13-gram and
Gopher/Chinchilla variants): every training document is reduced to its
DISTINCT word n-grams, the benchmark set to one global distinct n-gram
dictionary, and a single hash join counts per-document hits. All
tokenization and shingling is JVM expression work (split / transform /
slice) — no Python in the row path.

Scale shape: eval sets are tiny next to a 100 TB crawl (10^6–10^8
n-grams), so the benchmark side is collected to a distinct frame and
broadcast — the scan side streams through a broadcast hash join, no
shuffle of the corpus. For a pathological benchmark too big to
broadcast, pass ``broadcast_bench=False`` to fall back to a shuffled
join on the n-gram string. (No analog in /root/reference — the
reference is a string-compression kernel; this is engine surface.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["word_ngrams", "ngram_contamination"]

# lowercase + split on runs of anything non-alphanumeric: deliberately the
# simplest tokenizer that DuckDB's regexp_split_to_array reproduces
# byte-for-byte, so the oracle gate can pin results exactly
_TOKEN_SPLIT = "[^a-z0-9]+"


def word_ngrams(text: Column, n: int) -> Column:
    """DISTINCT word ``n``-grams of a text column as an array of
    space-joined strings; empty array when the text has fewer than ``n``
    words. Pure JVM expressions (split → filter → transform+slice)."""
    words = F.filter(F.split(F.lower(text), _TOKEN_SPLIT),
                     lambda x: x != "")
    k = F.size(words) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    # sequence(1, k) RUNS BACKWARDS for k < 1 (Spark generates descending
    # steps), so guard short texts explicitly
    return F.array_distinct(
        F.when(k >= 1, grams).otherwise(F.array().cast("array<string>")))


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    threshold: float = 0.5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document benchmark overlap: returns ``(id_col, n_grams,
    n_overlap, overlap_frac, contaminated)``.

    ``n_grams`` counts the document's distinct ``n``-grams, ``n_overlap``
    how many of them appear anywhere in ``bench``, and ``contaminated``
    is ``overlap_frac >= threshold``. Documents shorter than ``n`` words
    have no grams and are never contaminated (overlap_frac 0.0 — a
    too-short doc can't be an eval leak at this ``n``).

    One explode of the corpus's distinct grams + one broadcast left join
    + one re-group on ``id_col``; the benchmark dictionary is globally
    distinct so a gram repeated across eval items can't double-count.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    bench_text_col = bench_text_col or text_col
    bgrams = (
        bench.select(F.explode(word_ngrams(F.col(bench_text_col), n))
                     .alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_bench:
        bgrams = F.broadcast(bgrams)
    dgrams = docs.select(
        F.col(id_col),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    joined = dgrams.join(bgrams, "gram", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_overlap"),
    )
    frac = F.when(F.col("n_grams") > 0,
                  F.col("n_overlap") / F.col("n_grams")).otherwise(F.lit(0.0))
    return per_doc.select(
        id_col, "n_grams", "n_overlap",
        frac.alias("overlap_frac"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )
