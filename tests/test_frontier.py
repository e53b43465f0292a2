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
