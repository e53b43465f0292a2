"""HTML -> text extraction: the input_hint per-row invariant.

The engine's input contract says extracted text must be byte-identical
per url. These tests pin that on the synthetic Common-Crawl-style corpus
(binary html, ~1% NUL/0xFF pages) and on adversarial literal pages.
"""

import pyspark.sql.functions as F
import pytest

from fsst_spark.pipeline.textextract import (
    escape_html_text,
    extract_links,
    extract_main_text,
    html_to_text,
    verify_extraction,
)
from fsst_spark.synth.webcorpus import synth_web_df


def test_webcorpus_extraction_bit_identical(spark):
    """extract(html) == text for EVERY synthetic page, including the
    ~1% whose html carries the \\x00\\xff marker (invalid UTF-8)."""
    df = synth_web_df(spark, 3000, seed=7)
    row = verify_extraction(df).collect()[0]
    assert row["n_rows"] == 3000
    assert row["n_mismatch"] == 0, "extraction not byte-identical"
    # the weird-marker arm must actually be exercised at n=3000 (~1%)
    n_weird = df.filter(F.contains(F.col("html"), F.lit(b"\x00\xff"))).count()
    assert n_weird > 0


def test_extraction_scoping_and_entities(spark):
    rows = [
        # title+footer boilerplate dropped, article kept
        ("<html><head><title>T</title></head><body><main><article><p>hi "
         "there</p></article></main><footer>&copy; f</footer></body></html>",
         "hi there"),
        # no article: falls back to <main>
        ("<body><main><p>m</p></main><footer>x</footer></body>", "m"),
        # no main: falls back to <body>; script/style/comment removed
        # each removed block (script, comment) leaves one space
        ("<html><head><style>p{}</style></head><body><script>var "
         "a='<p>no</p>';</script><!-- c --><p>b</p></body></html>", "  b"),
        # bare fragment: whole doc
        ("<p>frag</p>", "frag"),
        # entities, &amp; decoded last so double-escapes resolve right
        ("<body>&lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39; &copy;</body>",
         '<tag> &amp; "q" \'s\' ©'),
        # unknown numeric entity passes through verbatim (documented)
        ("<body>&#10003;</body>", "&#10003;"),
    ]
    df = spark.createDataFrame(rows, "html string, want string")
    out = df.select(html_to_text(F.col("html")).alias("got"), "want").collect()
    for r in out:
        assert r["got"] == r["want"], (r["got"], r["want"])


def test_escape_embed_extract_roundtrip(spark):
    """escape -> embed in boilerplate -> extract is identity for any text
    free of control bytes — the exact_roundtrip oracle's premise."""
    texts = ["a & b < c > d", "&amp; pre-escaped", "", "x" * 500,
             'quotes " and \' mixed', "tabs\tand\nnewlines stay"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    embedded = df.select(
        "text",
        F.concat(
            F.lit("<html><head><title>p</title></head><body><article><p>"),
            escape_html_text(F.col("text")),
            F.lit("</p></article><footer>&copy; 2024</footer></body></html>"),
        ).alias("html"),
    )
    got = embedded.select("text", html_to_text(F.col("html")).alias("got"))
    assert got.filter(F.col("got") != F.col("text")).count() == 0


def test_extract_links(spark):
    html = ('<body><a href="https://a.example/x">A</a> text '
            "<A HREF='/rel/y'>B</A> <a name=n>no-href</a>"
            '<a class=c href="https://b.example/z?q=1#f">C</a></body>')
    df = spark.createDataFrame([(html,)], "html string")
    links = df.select(extract_links(F.col("html")).alias("ls")).collect()[0]["ls"]
    # double-quoted matches first (document order), then single-quoted
    assert links == ["https://a.example/x", "https://b.example/z?q=1#f", "/rel/y"]


def test_extract_main_text_binary_column(spark):
    df = synth_web_df(spark, 50, seed=3)
    assert dict(df.dtypes)["html"] == "binary"
    out = extract_main_text(df, "html", "ext")
    assert out.filter(F.col("ext") != F.col("text")).count() == 0


def test_extraction_stays_jvm_side(spark):
    """No Python/Arrow eval nodes: the cascade must fuse into codegen."""
    df = synth_web_df(spark, 10, seed=1)
    plan = extract_main_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
