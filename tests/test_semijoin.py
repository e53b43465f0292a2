"""decode_semijoin: the build side of a join prunes the encoded store's
SCAN (zone + dict + bloom chunk pruning) before a broadcast semi join —
results must equal decode-everything-then-join, and the scan must
provably shrink when the key set is small."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.decode import decode_job, decode_semijoin
from fsst_spark.jobs.encode import encode_job


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("semijoin_store"))
    rng = np.random.default_rng(3)
    ids = rng.permutation(4000).tolist()  # unclustered: zones collapse
    df = (
        spark.createDataFrame([(int(i),) for i in ids], "doc_id bigint")
        .repartition(4)
        .withColumn("url", F.concat(F.lit("https://h"),
                                    (F.col("doc_id") % 97).cast("string"),
                                    F.lit(".example.net/d/"),
                                    F.col("doc_id").cast("string")))
        .withColumn("lang", F.when(F.col("doc_id") % 4 == 0, "de")
                    .otherwise("en"))
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "250")
    try:
        encode_job(spark, df, out, chunk_bytes=1 << 10, resume=False,
                   pre_partitioned=True, unique_col="doc_id").collect()
    finally:
        spark.conf.set(key, old)
    return out


def _urls_of(ids):
    return [f"https://h{i % 97}.example.net/d/{i}" for i in ids]


def test_list_keys_exact(spark, store):
    want = [17, 901, 3999]
    got = sorted(r["doc_id"] for r in decode_semijoin(
        spark, store, "url", _urls_of(want)).collect())
    assert got == want


def test_dataframe_keys_exact(spark, store):
    keys = spark.createDataFrame([(u,) for u in _urls_of(range(0, 4000, 400))],
                                 ["u"])
    got = sorted(r["doc_id"] for r in decode_semijoin(
        spark, store, "url", keys).collect())
    assert got == list(range(0, 4000, 400))


def test_keys_prune_the_scan(spark, store):
    full = decode_job(spark, store).select("pid", "chunk_id").distinct().count()
    out = decode_semijoin(spark, store, "url", _urls_of([1234]))
    touched = out.select("pid", "chunk_id").distinct().count()
    # the matching row lives in exactly one chunk; bloom fp adds at most ~1
    assert full >= 8 and touched <= 2, (touched, full)


def test_duplicate_and_absent_keys(spark, store):
    keys = _urls_of([50, 50, 50]) + ["https://nowhere.invalid/x"]
    got = [r["doc_id"] for r in decode_semijoin(
        spark, store, "url", keys).collect()]
    assert got == [50]  # semi join: one output row despite key dup


def test_empty_keys_decode_nothing(spark, store):
    assert decode_semijoin(spark, store, "url", []).count() == 0
    empty_df = spark.createDataFrame([], "u string")
    assert decode_semijoin(spark, store, "url", empty_df).count() == 0


def test_over_cap_falls_back_to_unpruned_join(spark, store):
    keys = spark.createDataFrame([(u,) for u in _urls_of(range(300))], ["u"])
    got = decode_semijoin(spark, store, "url", keys,
                          max_pushdown_keys=10)  # force the fallback arm
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(300))


def test_columns_projection_drops_join_col_when_unrequested(spark, store):
    out = decode_semijoin(spark, store, "url", _urls_of([123]),
                          columns=["doc_id", "lang"])
    assert "url" not in out.columns
    rows = out.collect()
    assert [(r["doc_id"], r["lang"]) for r in rows] == [(123, "en")]


def test_multicolumn_keys_frame_rejected(spark, store):
    bad = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="one column"):
        decode_semijoin(spark, store, "url", bad)
