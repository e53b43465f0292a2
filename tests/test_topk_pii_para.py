"""encoded_topk zone pruning, PII scrub ordering, paragraph dedup edges."""

import pytest
from pyspark.sql import Row, functions as F

from fsst_spark.jobs.encode import encode_job
from fsst_spark.jobs.stats import encoded_topk
from fsst_spark.pipeline.dedup import dedup_paragraphs
from fsst_spark.pipeline.textstats import pii_scrub


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("topk") / "store")
    df = (spark.range(0, 50000).withColumnRenamed("id", "doc_id")
          .withColumn("v", (F.col("doc_id") * 2654435761) % 1000000)
          .withColumn("s", F.concat(F.lit("w"),
                                    F.lpad(F.col("doc_id") % 3000, 4, "0"))))
    encode_job(spark, df, out, num_partitions=8, chunk_bytes=8 << 10,
               resume=False, unique_col="doc_id", sort_key="v").collect()
    return out, df


def test_topk_desc_prunes_and_is_exact(spark, store):
    out, df = store
    obs = {}
    got = [r["val"] for r in encoded_topk(spark, out, "v", 100,
                                          observer=obs).collect()]
    want = [r["v"] for r in
            df.orderBy(F.desc("v")).limit(100).select("v").collect()]
    assert got == want
    # clustered on v: the top-100 live in O(1) chunks
    assert obs["n_chunks_decoded"] < obs["n_chunks_total"] / 4, obs


def test_topk_asc_bottom_k(spark, store):
    out, df = store
    obs = {}
    got = [r["val"] for r in encoded_topk(spark, out, "v", 37, ascending=True,
                                          observer=obs).collect()]
    want = [r["v"] for r in df.orderBy("v").limit(37).select("v").collect()]
    assert got == want
    assert obs["n_chunks_decoded"] < obs["n_chunks_total"] / 4, obs


def test_topk_string_column(spark, store):
    out, df = store
    # store is clustered on v, NOT s: string top-k must still be exact
    got = [r["val"] for r in encoded_topk(spark, out, "s", 25).collect()]
    want = [r["s"] for r in
            df.orderBy(F.desc("s")).limit(25).select("s").collect()]
    assert got == want


def test_topk_k_larger_than_store(spark, tmp_path):
    out = str(tmp_path / "tiny")
    df = (spark.range(0, 7).withColumnRenamed("id", "doc_id")
          .withColumn("v", F.col("doc_id") * 10))
    encode_job(spark, df, out, num_partitions=1, resume=False,
               unique_col="doc_id").collect()
    got = sorted(r["val"] for r in encoded_topk(spark, out, "v", 100).collect())
    assert got == [0, 10, 20, 30, 40, 50, 60]


def test_topk_ignores_nulls(spark, tmp_path):
    out = str(tmp_path / "nulls")
    df = (spark.range(0, 2000).withColumnRenamed("id", "doc_id")
          .withColumn("v", F.when(F.col("doc_id") % 3 == 0, None)
                      .otherwise(F.col("doc_id"))))
    encode_job(spark, df, out, num_partitions=2, chunk_bytes=4 << 10,
               resume=False, unique_col="doc_id").collect()
    got = [r["val"] for r in encoded_topk(spark, out, "v", 5).collect()]
    want = [r["v"] for r in df.dropna().orderBy(F.desc("v")).limit(5)
            .select("v").collect()]
    assert got == want


def test_topk_guards(spark, store):
    out, _ = store
    with pytest.raises(ValueError):
        encoded_topk(spark, out, "v", 0)
    with pytest.raises(ValueError):
        encoded_topk(spark, out, "v", 10 ** 6)
    with pytest.raises(KeyError):
        encoded_topk(spark, out, "nope", 5)


def test_pii_scrub_order_prevents_double_count(spark):
    df = spark.createDataFrame([Row(
        text="mail a1@b.co ip 10.0.0.1 tel +1-555-123-4567 end")])
    r = pii_scrub(df).collect()[0]
    # the email's and IP's digits must NOT also count as phones
    assert (r["n_pii_email"], r["n_pii_ipv4"], r["n_pii_phone"]) == (1, 1, 1)
    assert r["text"] == "mail [EMAIL] ip [IP] tel [PHONE] end"


def test_pii_scrub_clean_text_untouched(spark):
    df = spark.createDataFrame([Row(text="plain words only here")])
    r = pii_scrub(df).collect()[0]
    assert r["text"] == "plain words only here"
    assert r["n_pii_email"] == r["n_pii_phone"] == r["n_pii_ipv4"] == 0


def test_para_dedup_first_occurrence_survives(spark):
    # 3-word paragraphs; doc 2 repeats doc 1's first paragraph
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f"),
        Row(doc_id=2, text="a b c x y z"),
        Row(doc_id=3, text="a b c"),  # loses its ONLY paragraph
    ])
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(df, words_per_para=3).collect()}
    assert out[1]["n_kept"] == 2 and out[1]["text_dedup"] == "a b c\n\nd e f"
    assert out[2]["n_kept"] == 1 and out[2]["text_dedup"] == "x y z"
    assert out[3]["n_kept"] == 0 and out[3]["text_dedup"] == ""


def test_para_dedup_tail_paragraph_and_counts(spark):
    df = spark.createDataFrame([Row(doc_id=7, text="p q r s")])
    r = dedup_paragraphs(df, words_per_para=3).collect()[0]
    assert r["n_paras"] == 2 and r["n_kept"] == 2
    assert r["text_dedup"] == "p q r\n\ns"
    with pytest.raises(ValueError):
        dedup_paragraphs(df, words_per_para=0)
