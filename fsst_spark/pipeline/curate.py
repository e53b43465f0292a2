"""End-to-end training-data curation: one operator composing the pipeline
a web-crawl corpus actually goes through before tokenization.

    quality filter (Gopher rules)        -> drop junk pages
    [optional] PII scrub                 -> redact emails/IPs/phones
    [optional] paragraph dedup (C4)      -> drop repeated paragraphs
    exact dedup (normalized fingerprint) -> one survivor per content
    [optional] near-dup resolution       -> MinHash pairs -> components
    [optional] decontamination           -> drop eval-set n-gram leaks
    per-domain cap                       -> balance mega-domains
    deterministic sample                 -> reproducible downsizing

Every stage is itself a tested operator; this module only composes them
and exposes per-stage row counts, so a 100 TB run can report exactly
where its volume went. All stages except near-dup resolution are pure
JVM expressions; the whole default pipeline is DuckDB-oracle-checkable
end-to-end (survivor set pinned by id-sum, not just counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .contamination import ngram_contamination
from .dedup import dedup_paragraphs, exact_dedup, neardup_dedup
from .sampling import cap_per_group, deterministic_sample
from .textstats import gopher_quality_flags, pii_scrub


def curate(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           group_col: str | None = "source", cap_n: int = 50,
           sample_fraction: float = 1.0, neardup: bool = False,
           salt: str = "curate", pii: bool = False, para: bool = False,
           words_per_para: int = 15, bench: DataFrame | None = None,
           contam_n: int = 8,
           contam_threshold: float = 0.5) -> dict[str, DataFrame]:
    """Run the curation pipeline; returns every intermediate stage.

    Returns ``{"quality": ..., ["scrubbed": ...,] ["para": ...,]
    "deduped": ..., ["decontam": ...,] "capped": ..., "sampled": ...}``
    — all lazy DataFrames
    sharing lineage, so asking for counts of each stage costs one pass per
    stage and Catalyst reuses the common prefix. The final stage is
    ``sampled``.

    ``pii`` scrubs emails/IPs/phones from quality survivors (downstream
    fingerprints hash the SCRUBBED text — two pages differing only in
    redacted PII dedup together, the behavior a training corpus wants).
    ``para`` then drops every repeated paragraph corpus-wide (C4 pass) and
    removes documents that lose all their paragraphs.
    """
    flags = gopher_quality_flags(df, text_col, id_col).where("keep").select(id_col)
    quality = df.join(flags, id_col, "left_semi")
    stages: dict[str, DataFrame] = {"quality": quality}
    cur = quality
    if pii:
        scrubbed = pii_scrub(cur, text_col)
        cur = scrubbed.drop(
            *[c for c in scrubbed.columns if c.startswith("n_pii_")])
        stages["scrubbed"] = cur
    if para:
        kept = dedup_paragraphs(cur, text_col, id_col, words_per_para)
        cur = cur.drop(text_col).join(
            kept.filter(F.col("n_kept") > 0)
                .select(id_col, F.col("text_dedup").alias(text_col)),
            id_col)
        stages["para"] = cur
    deduped = exact_dedup(cur, text_col, keep="min", id_col=id_col)
    if neardup:
        deduped = neardup_dedup(deduped, text_col=text_col, id_col=id_col,
                                method="minhash")
    if bench is not None:
        # decontaminate AFTER dedup (the cheaper set), BEFORE balancing —
        # an eval leak must never survive into the training corpus; the
        # anti-join side is the per-doc flag frame, metadata-narrow
        flagged = (ngram_contamination(deduped, bench, n=contam_n,
                                       text_col=text_col, id_col=id_col,
                                       threshold=contam_threshold)
                   .where(F.col("contaminated")).select(id_col))
        deduped = deduped.join(flagged, id_col, "left_anti")
        stages["decontam"] = deduped
    capped = (cap_per_group(deduped, group_col, cap_n, id_col)
              if group_col else deduped)
    sampled = (deterministic_sample(capped, sample_fraction, id_col, salt)
               if sample_fraction < 1.0 else capped)
    stages.update(deduped=deduped, capped=capped, sampled=sampled)
    return stages


def curation_report(df: DataFrame, **kwargs) -> DataFrame:
    """One-row per-stage volume report: row counts after each stage plus
    the id-sum of the final survivor set (pins the exact selection)."""
    stages = curate(df, **kwargs)
    id_col = kwargs.get("id_col", "doc_id")
    out = df.agg(F.count("*").alias("n_input"))
    for name, frame in stages.items():
        out = out.crossJoin(frame.agg(F.count("*").alias(f"n_{name}")))
    return out.crossJoin(
        stages["sampled"].agg(F.sum(id_col).alias("sum_final_ids"))
    )
