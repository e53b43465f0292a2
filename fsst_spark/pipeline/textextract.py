"""HTML -> text extraction for web-crawl pipelines.

The engine's input is Common-Crawl-style pages ``(url, warc_ts,
html:binary, text:string, lang)`` where ``text`` is the main content
extracted from ``html``. This module re-derives that extraction
engine-side so the per-row invariant — byte-identical extracted text per
url — is checkable on any store, not just trusted upstream.

Everything is Spark built-ins (regexp chain + literal replaces, JVM-side,
whole-stage codegen) — no Python UDFs, so the extraction runs at scan
speed on 10^12 rows with zero Arrow hops. The extraction strategy is the
standard readability-style cascade:

1. decode bytes as UTF-8 (invalid sequences -> U+FFFD, stripped later),
2. drop ``<script>``/``<style>`` blocks and HTML comments,
3. scope to the first ``<article>``, else ``<main>``, else ``<body>``,
   else the whole document (boilerplate like ``<title>`` and ``<footer>``
   lives outside the article scope and is discarded),
4. strip the remaining tags,
5. decode the common named/numeric character entities (``&amp;`` last so
   double-escapes resolve correctly),
6. remove control bytes and U+FFFD (crawl payloads carry NUL/0xFF runs;
   the synthetic corpus plants them on ~1% of pages — see
   ``synth/webcorpus.py``).

The byte-identity invariant is pinned in ``tests/test_textextract.py``:
for every synthetic web page, ``extract_main_text(html) == text``,
including the NUL/0xFF pages, and round-trips ``escape_html_text`` ->
embed -> extract exactly.

Limitations (documented, not silent): entity decoding covers the named
set below plus ``&#34;``/``&#39;``; other numeric entities pass through
verbatim (decoding arbitrary ``&#NNNN;`` needs a codepoint construction
Spark expressions don't have — a ``mapInArrow`` pass can post-process the
long tail if a corpus needs it). Nested same-tag scopes (an ``<article>``
inside an ``<article>``) resolve to the first non-greedy close, which is
the common-crawl-practical reading.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

# Named entities decoded JVM-side. Order matters only for &amp; (kept
# last in the replace chain so "&amp;lt;" -> "&lt;" not "<").
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&copy;", "©"),
)

# C0 controls (minus \t \n \r), DEL, and the UTF-8 replacement char that
# F.decode substitutes for invalid byte sequences.
_CTRL_PATTERN = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f�]"


def escape_html_text(text: Column) -> Column:
    """Escape text for embedding in HTML (&, <, > — & first)."""
    out = F.replace(text, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def decode_entities(text: Column) -> Column:
    """Decode the bounded named/numeric entity set; ``&amp;`` last."""
    out = text
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def _as_string(html: Column, dtype) -> Column:
    if isinstance(dtype, T.BinaryType):
        # CAST(binary AS STRING), not decode(): Spark 4's decode() raises
        # MALFORMED_CHARACTER_CODING on invalid UTF-8, but crawl payloads
        # carry garbage bytes by construction. The cast passes bytes
        # through; the regexp engine's Java-string boundary turns invalid
        # sequences into U+FFFD, which the control-byte cleanup strips.
        return html.cast("string")
    return html


def html_to_text(html: Column) -> Column:
    """Main-content extraction over a STRING html column (see module doc).

    Pure expression tree — compose freely inside selects/filters; the
    whole cascade stays in one codegen stage.
    """
    h = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    h = F.regexp_replace(h, r"(?is)<style[^>]*>.*?</style>", " ")
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    art = F.regexp_extract(h, r"(?is)<article[^>]*>(.*?)</article>", 1)
    main = F.regexp_extract(h, r"(?is)<main[^>]*>(.*?)</main>", 1)
    body = F.regexp_extract(h, r"(?is)<body[^>]*>(.*?)</body>", 1)
    scoped = (
        F.when(art != "", art)
        .when(main != "", main)
        .when(body != "", body)
        .otherwise(h)
    )
    stripped = F.regexp_replace(scoped, r"(?s)<[^>]*>", "")
    return F.regexp_replace(decode_entities(stripped), _CTRL_PATTERN, "")


def extract_main_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text_extracted"
) -> DataFrame:
    """Add ``out_col`` = extracted main text of ``html_col`` (string or
    binary). 100 TB shape: narrow projection, no shuffle, no UDF — the
    extraction fuses into whatever scan/filter stage already reads html."""
    src = _as_string(F.col(html_col), df.schema[html_col].dataType)
    return df.withColumn(out_col, html_to_text(src))


# href values in double or single quotes; RE2-compatible (no backrefs) so
# the DuckDB oracle evaluates the identical pattern.
_HREF_DQ = r'(?i)<a\s[^>]*href\s*=\s*"([^"]*)"'
_HREF_SQ = r"(?i)<a\s[^>]*href\s*=\s*'([^']*)'"


def extract_links(html: Column, dtype=None) -> Column:
    """``array<string>`` of ``<a href>`` targets, document order within
    each quote style (double-quoted first, then single-quoted)."""
    h = _as_string(html, dtype) if dtype is not None else html
    dq = F.regexp_extract_all(h, F.lit(_HREF_DQ), F.lit(1))
    sq = F.regexp_extract_all(h, F.lit(_HREF_SQ), F.lit(1))
    return F.concat(dq, sq)


def verify_extraction(
    df: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """One-row report of the input_hint invariant over a page table:
    n_rows, n_match (extract(html) == text byte-identical), n_mismatch.
    Aggregation is map-side partial — no wide shuffle at any scale."""
    extracted = html_to_text(_as_string(F.col(html_col), df.schema[html_col].dataType))
    ok = (extracted == F.col(text_col)).cast("long")
    return df.select(ok.alias("_ok")).agg(
        F.count("*").alias("n_rows"),
        F.sum("_ok").alias("n_match"),
        (F.count("*") - F.sum("_ok")).alias("n_mismatch"),
    )
