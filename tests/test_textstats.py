"""Unit tests for text-analysis column functions: BPE-ish pre-tokenization
counts must match a reference Python re implementation exactly (the same
pattern also backs the DuckDB oracle in __spark_entry__.py)."""

import re

from pyspark.sql import functions as F

from fsst_spark.pipeline.textstats import BPE_PATTERN, bpe_token_count, token_count

CASES = [
    "",
    "hello world",
    "Hello, World! 123",
    "a1b2c3",
    "  leading and trailing  ",
    "tabs\tand\nnewlines\r\nmixed",
    "punct...!!!??? runs---",
    "café résumé naïve",  # non-ASCII letters -> symbol runs
    "x" * 500,
    "1 22 333 4444",
]


def test_bpe_token_count_matches_python_re(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                               "i long, text string")
    got = {r["i"]: r["n"] for r in
           df.select("i", bpe_token_count(F.col("text")).alias("n")).collect()}
    for i, t in enumerate(CASES):
        assert got[i] == len(re.findall(BPE_PATTERN, t)), (i, t)


def test_bpe_ge_whitespace_tokens_on_words(spark):
    # BPE pre-segmentation splits at class boundaries, so it never counts
    # fewer tokens than whitespace splitting on non-empty text
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES) if t.strip()],
                               "i long, text string")
    rows = df.select(bpe_token_count(F.col("text")).alias("b"),
                     token_count(F.col("text")).alias("w")).collect()
    assert all(r["b"] >= r["w"] for r in rows), rows
