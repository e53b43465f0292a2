"""encoded_profile: exact rows/nulls/bytes/codec-mix from metadata only."""

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.encode import encode_job
from fsst_spark.jobs.stats import encoded_profile


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("profile") / "store")
    df = (spark.range(0, 3000, 1, 3).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.when(F.col("doc_id") % 7 == 0, None)
                      .when(F.col("doc_id") % 2 == 0, "en").otherwise("de"))
          .withColumn("price", F.col("doc_id").cast("double") * 0.25))
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "500")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)
    return out


def test_profile_exact_rows_and_nulls(spark, store):
    rows = {r["column"]: r.asDict() for r in
            encoded_profile(spark, store).collect()}
    assert set(rows) == {"doc_id", "lang", "price"}
    for c in rows:
        assert rows[c]["n_rows"] == 3000
    # every 7th lang is null: ceil(3000/7) ids 0,7,...,2996 -> 429
    assert rows["lang"]["n_nulls"] == 429
    assert rows["doc_id"]["n_nulls"] == 0
    assert rows["price"]["n_nulls"] == 0


def test_profile_codecs_bytes_and_zones(spark, store):
    rows = {r["column"]: r.asDict() for r in
            encoded_profile(spark, store).collect()}
    assert "str_dict" in rows["lang"]["codecs"]
    assert rows["doc_id"]["arrow_type"] == "int64"
    for c in rows:
        r = rows[c]
        assert r["n_chunks"] >= 6
        assert r["raw_bytes"] > 0 and r["enc_bytes"] >= 0
        assert r["ratio_x100"] >= 100  # nothing here is incompressible
    # int zones are exact value bounds
    assert rows["doc_id"]["zmin_long"] == 0
    assert rows["doc_id"]["zmax_long"] == 2999


def test_profile_column_subset_and_unknown(spark, store):
    rows = encoded_profile(spark, store, ["lang"]).collect()
    assert [r["column"] for r in rows] == ["lang"]
    with pytest.raises(KeyError):
        encoded_profile(spark, store, ["nope"])


def test_profile_plan_reads_no_payload(spark, store):
    plan = encoded_profile(spark, store)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "payload" not in plan, plan[:800]
