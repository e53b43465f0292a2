"""Aggregation pushdown over the encoded store: GROUP BY answered from
dict codes / RLE runs, falling back to chunk-local decode — results must
equal plain DataFrame aggregation over the source."""

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.agg import encoded_group_count, encoded_group_sum
from fsst_spark.jobs.encode import encode_job


@pytest.fixture(scope="module")
def docs_with_nulls(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .withColumn("lang", F.when(F.col("doc_id") % 97 == 0, None)
                    .otherwise(F.col("lang")))
        .withColumn("n_chars", F.when(F.col("doc_id") % 89 == 0, None)
                    .otherwise(F.col("n_chars")))
    )
    docs.persist().count()
    yield docs
    docs.unpersist()


@pytest.fixture(scope="module")
def enc_store(spark, docs_with_nulls, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("agg_store"))
    encode_job(spark, docs_with_nulls, out, num_partitions=4,
               chunk_bytes=64 << 10, resume=False,
               unique_col="doc_id").collect()
    return out


def _by_key(rows):
    return sorted(rows, key=lambda t: (t[0] is None, t[0]))


def test_group_count_dict_column(spark, docs_with_nulls, enc_store):
    got = _by_key(
        (r["value"], r["cnt"])
        for r in encoded_group_count(spark, enc_store, "lang").collect())
    want = _by_key(
        (r["lang"], r["count"])
        for r in docs_with_nulls.groupBy("lang").count().collect())
    assert got == want
    assert any(v is None for v, _ in got)  # null group present


def test_group_count_int_rle_column(spark, tmp_path):
    # sorted by bucket -> long runs -> int_rle; counts must come out exact
    df = (spark.range(0, 3000).withColumnRenamed("id", "doc_id")
          .withColumn("bucket", F.col("doc_id") % 7)
          .orderBy("bucket", "doc_id").coalesce(1))
    out = str(tmp_path / "rle_store")
    encode_job(spark, df, out, chunk_bytes=1 << 20, resume=False,
               pre_partitioned=True, unique_col="doc_id").collect()
    got = sorted((r["value"], r["cnt"])
                 for r in encoded_group_count(spark, out, "bucket").collect())
    assert got == [(b, 3000 // 7 + (1 if b < 3000 % 7 else 0))
                   for b in range(7)]


def test_group_sum_matches_dataframe_agg(spark, docs_with_nulls, enc_store):
    got = _by_key(
        (r["value"], r["cnt"], r["sum_val"])
        for r in encoded_group_sum(spark, enc_store, "lang", "n_chars").collect())
    want = _by_key(
        (r["lang"], r["c"], r["s"])
        for r in docs_with_nulls.groupBy("lang")
        .agg(F.count("*").alias("c"), F.sum("n_chars").alias("s")).collect())
    assert got == want


def test_group_sum_guards(spark, enc_store):
    with pytest.raises(KeyError):
        encoded_group_count(spark, enc_store, "nope")
    with pytest.raises(ValueError, match="int or float"):
        encoded_group_sum(spark, enc_store, "n_chars", "lang")
