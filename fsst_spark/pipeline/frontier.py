"""Crawl-frontier building: extracted links -> the next fetch list.

Composes the webtext pipeline's existing pieces into the crawler's other
half: ``textextract.extract_links`` (href targets at scan speed) ->
normalization (fragment strip, root-relative and protocol-relative
resolution against the page's own URL, non-fetchable scheme drop) ->
global dedup -> anti-join against the already-crawled URL set -> a
deterministic per-host cap (politeness budget, the batch sibling of
``quota_stream``'s byte budget).

Everything is pure JVM expressions (regexp/concat/split — no UDF), so the
whole frontier is one scan + one distinct + one anti-join + one window,
each shuffle keyed on url/host. At 10^12 pages the known-set anti-join is
the big join; it hash-shuffles both sides on url — the standard shape —
and the per-host window input is already deduped frontier candidates,
orders of magnitude smaller than the page table.

Normalization scope (documented, SQL-replicable): absolute http(s) links
pass through; ``//host/path`` gets the https scheme; ``/path`` resolves
against the page's host; everything else (mailto:, javascript:, data:,
dir-relative paths) is dropped — dir-relative resolution needs the base
path's directory semantics, which a crawler handles at fetch time.

Reference tie: the reference kernel (spiraldb/fsst) has no crawl ops;
this module is north-rule training-pipeline scope (Common-Crawl-style
corpus maintenance).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

_HOST_RE = "^https?://([^/]+)"


def host_of(url: Column) -> Column:
    """The host part of an absolute http(s) URL ('' if not absolute)."""
    return F.regexp_extract(url, _HOST_RE, 1)


def normalize_link(link: Column, base_url: Column) -> Column:
    """Fetchable absolute URL for an extracted href, or NULL to drop it.

    fragment strip -> absolute http(s) pass-through / protocol-relative
    '//h/p' -> 'https://h/p' / root-relative '/p' -> base scheme+host + p;
    all other forms (other schemes, dir-relative) -> NULL."""
    frag = F.split(link, "#", 2).getItem(0)
    base_host = host_of(base_url)
    return (
        F.when(frag.rlike("^https?://"), frag)
        .when(frag.startswith("//"), F.concat(F.lit("https:"), frag))
        .when(frag.startswith("/") & (base_host != ""),
              F.concat(F.lit("https://"), base_host, frag))
        .otherwise(F.lit(None))
    )


def crawl_frontier(pages: DataFrame, known: DataFrame | None = None, *,
                   html_col: str = "html", url_col: str = "url",
                   per_host_cap: int | None = None) -> DataFrame:
    """(url, host) frontier rows: normalized outlinks of ``pages`` minus
    ``known`` URLs (a one-column frame named ``url``; pass the crawled
    store's url column), capped at ``per_host_cap`` per host in
    deterministic url order (ties impossible post-distinct)."""
    from .textextract import extract_links

    links = pages.select(
        F.col(url_col).alias("_base"),
        F.explode(extract_links(F.col(html_col),
                                pages.schema[html_col].dataType)).alias("_raw"))
    cand = (links
            .select(normalize_link(F.col("_raw"), F.col("_base")).alias("url"))
            .where(F.col("url").isNotNull())
            .distinct())
    if known is not None:
        cand = cand.join(known.select("url").distinct(), "url", "left_anti")
    out = cand.select("url", host_of(F.col("url")).alias("host"))
    if per_host_cap is not None:
        if per_host_cap <= 0:
            raise ValueError("per_host_cap must be a positive int")
        w = Window.partitionBy("host").orderBy("url")
        out = (out.withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") <= per_host_cap).drop("_rn"))
    return out


def frontier_stream(pages: DataFrame, known: DataFrame | None = None, *,
                    html_col: str = "html", url_col: str = "url",
                    per_host_cap: int | None = None) -> DataFrame:
    """Streaming crawl frontier over a stream of crawled pages: the
    continuous sibling of :func:`crawl_frontier` for the crawl loop
    (fetch -> extract -> frontier -> fetch ...).

    Normalization is stateless (same pure-JVM expressions); frontier URLs
    emit EXACTLY ONCE across all micro-batches via streaming
    ``dropDuplicates("url")`` (state = one entry per distinct frontier
    url — the crawler's discovered-set, which any frontier must hold
    somewhere); the crawled set ``known`` (a STATIC frame) is excluded
    via a stream-static left-outer join + null filter (left ANTI is not
    in Spark's supported stream-static join set); the per-host politeness
    budget is a custom stateful operator (``applyInPandasWithState``,
    ONE admitted-count per host — the count sibling of
    ``quota_stream.quota_filter``): each host admits at most
    ``per_host_cap`` urls over the stream's lifetime, in url order within
    each micro-batch, first-arrived wins across batches (crawl-budget
    semantics: matches the batch form whenever per-host arrival order
    follows url order)."""
    if not pages.isStreaming:
        raise ValueError("frontier_stream needs a streaming frame; "
                         "use crawl_frontier for batch inputs")
    from .textextract import extract_links

    links = pages.select(
        F.col(url_col).alias("_base"),
        F.explode(extract_links(F.col(html_col),
                                pages.schema[html_col].dataType)).alias("_raw"))
    cand = (links
            .select(normalize_link(F.col("_raw"), F.col("_base")).alias("url"))
            .where(F.col("url").isNotNull()))
    if known is not None:
        k = known.select("url").distinct().withColumn("_known", F.lit(1))
        cand = (cand.join(k, "url", "left_outer")
                .where(F.col("_known").isNull()).drop("_known"))
    out = cand.select("url", host_of(F.col("url")).alias("host"))
    if per_host_cap is None:
        return out.dropDuplicates(["url"])
    if per_host_cap <= 0:
        raise ValueError("per_host_cap must be a positive int")

    # ONE stateful operator does both dedup and the cap (chaining
    # dropDuplicates into applyInPandasWithState would be two stateful
    # operators in one query): state per host = the ADMITTED url set,
    # which the cap bounds at per_host_cap entries — a host's rejected
    # urls need no memory, since once the cap is reached it never reopens
    def admit(key, pdfs, state) -> "pd.DataFrame":
        seen = set(state.get[0]) if state.exists else set()
        parts = [p for p in pdfs if len(p)]
        if parts:
            pdf = (parts[0] if len(parts) == 1
                   else pd.concat(parts, ignore_index=True))
            pdf = (pdf.drop_duplicates("url")
                   .sort_values("url", kind="stable"))
            fresh = pdf[~pdf["url"].isin(seen)]
            room = max(0, per_host_cap - len(seen))
            kept = fresh.iloc[:room]
            if len(kept):
                seen |= set(kept["url"])
                yield kept[["url", "host"]]
        state.update((sorted(seen),))

    return out.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType="url string, host string",
        stateStructType="admitted array<string>",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
