"""Crawl-frontier building (pipeline/frontier.py): link normalization
branches, known-set anti-join, and the per-host politeness cap."""

import pytest
from pyspark.sql import functions as F

from fsst_spark.pipeline.frontier import crawl_frontier, host_of, normalize_link


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_normalize_branches(spark):
    df = spark.createDataFrame(
        [("https://a.example/x", l) for l in [
            "https://b.example/p",        # absolute: pass through
            "http://c.example/q#frag",    # fragment strip
            "//cdn.example/r",            # protocol-relative
            "/root/path",                 # root-relative vs base host
            "mailto:x@y.z",               # dropped
            "javascript:void(0)",         # dropped
            "rel/ative",                  # dir-relative: dropped
            "#top",                       # pure fragment: dropped
        ]], "base string, link string")
    got = [r[0] for r in df.select(
        normalize_link(F.col("link"), F.col("base"))).collect()]
    assert got == [
        "https://b.example/p",
        "http://c.example/q",
        "https://cdn.example/r",
        "https://a.example/root/path",
        None, None, None, None,
    ]


def test_host_of(spark):
    df = spark.createDataFrame(
        [("https://h.example/p",), ("http://x.y/",), ("ftp://n.o/p",)],
        "u string")
    assert [r[0] for r in df.select(host_of(F.col("u"))).collect()] == [
        "h.example", "x.y", ""]


def test_frontier_dedup_known_and_cap(spark):
    pages = _pages(spark, [
        ("https://h1.ex/a",
         '<a href="https://h2.ex/p1">x</a><a href="/l1">y</a>'
         '<a href="https://h2.ex/p1">dup</a>'),
        ("https://h1.ex/b",
         '<a href=\'/l2\'>z</a><a href="https://h2.ex/p2">w</a>'
         '<a href="https://known.ex/k">k</a>'),
    ])
    known = spark.createDataFrame([("https://known.ex/k",)], "url string")
    got = sorted((r["url"], r["host"])
                 for r in crawl_frontier(pages, known).collect())
    assert got == [
        ("https://h1.ex/l1", "h1.ex"),
        ("https://h1.ex/l2", "h1.ex"),
        ("https://h2.ex/p1", "h2.ex"),
        ("https://h2.ex/p2", "h2.ex"),
    ]
    capped = sorted((r["url"], r["host"]) for r in crawl_frontier(
        pages, known, per_host_cap=1).collect())
    # deterministic: lexicographically first url survives per host
    assert capped == [
        ("https://h1.ex/l1", "h1.ex"),
        ("https://h2.ex/p1", "h2.ex"),
    ]
    with pytest.raises(ValueError, match="positive"):
        crawl_frontier(pages, known, per_host_cap=0)


def test_frontier_stream_dedup_cap_across_microbatches(spark, tmp_path):
    """Streaming frontier: urls emit exactly once across micro-batches,
    the per-host cap persists (a host capped in batch 1 admits nothing in
    batch 2), and the known set is excluded — state = the admitted url
    set per host, bounded by the cap."""
    from fsst_spark.pipeline.frontier import frontier_stream

    def page(base, hrefs):
        return (base, "".join(f'<a href="{h}">x</a>' for h in hrefs))

    src = str(tmp_path / "pages_src")
    b1 = spark.createDataFrame([
        page("https://h1.ex/a", ["https://big.ex/p1", "https://big.ex/p2",
                                 "https://big.ex/p3", "/l1",
                                 "https://known.ex/k"]),
    ], "url string, html string")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2 = spark.createDataFrame([
        # big.ex already capped; p1 is a repeat; small.ex fresh
        page("https://h2.ex/b", ["https://big.ex/p4", "https://big.ex/p1",
                                 "https://small.ex/s1", "/l2"]),
    ], "url string, html string")
    b2.coalesce(1).write.mode("append").parquet(src)

    known = spark.createDataFrame([("https://known.ex/k",)], "url string")
    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (frontier_stream(stream, known, per_host_cap=2)
         .writeStream.outputMode("append")
         .format("memory").queryName("frontier_out")
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "f_ckpt"))
         .start())
    q.awaitTermination(180)
    got = sorted((r["url"], r["host"]) for r in
                 spark.sql("SELECT * FROM frontier_out").collect())
    assert got == [
        ("https://big.ex/p1", "big.ex"),   # cap 2: p1, p2 admitted in b1
        ("https://big.ex/p2", "big.ex"),   # p3 (b1) and p4 (b2) rejected
        ("https://h1.ex/l1", "h1.ex"),
        ("https://h2.ex/l2", "h2.ex"),
        ("https://small.ex/s1", "small.ex"),
    ]


def test_frontier_stream_requires_stream(spark):
    from fsst_spark.pipeline.frontier import frontier_stream

    df = spark.createDataFrame([("u", "h")], "url string, html string")
    with pytest.raises(ValueError, match="streaming"):
        frontier_stream(df)
