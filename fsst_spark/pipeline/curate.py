"""End-to-end training-data curation: one operator composing the pipeline
a web-crawl corpus actually goes through before tokenization.

    quality filter (Gopher rules)        -> drop junk pages
    exact dedup (normalized fingerprint) -> one survivor per content
    [optional] near-dup resolution       -> MinHash pairs -> components
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

from .dedup import exact_dedup, neardup_dedup
from .sampling import cap_per_group, deterministic_sample
from .textstats import gopher_quality_flags


def curate(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           group_col: str | None = "source", cap_n: int = 50,
           sample_fraction: float = 1.0, neardup: bool = False,
           salt: str = "curate") -> dict[str, DataFrame]:
    """Run the curation pipeline; returns every intermediate stage.

    Returns ``{"quality": ..., "deduped": ..., "capped": ...,
    "sampled": ...}`` — all lazy DataFrames sharing lineage, so asking
    for counts of each stage costs one pass per stage and Catalyst reuses
    the common prefix. The final stage is ``sampled``.
    """
    flags = gopher_quality_flags(df, text_col, id_col).where("keep").select(id_col)
    quality = df.join(flags, id_col, "left_semi")
    deduped = exact_dedup(quality, text_col, keep="min", id_col=id_col)
    if neardup:
        deduped = neardup_dedup(deduped, text_col=text_col, id_col=id_col,
                                method="minhash")
    capped = (cap_per_group(deduped, group_col, cap_n, id_col)
              if group_col else deduped)
    sampled = (deterministic_sample(capped, sample_fraction, id_col, salt)
               if sample_fraction < 1.0 else capped)
    return {"quality": quality, "deduped": deduped,
            "capped": capped, "sampled": sampled}


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
