"""Incremental (CDC-style) commit-range reads: ``decode_changes`` on the
job API, ``.option('since_commit', N)`` on the DataSource, and the shared
``commit_range_pids`` snapshot algebra.

Contract under test: a consumer that records the commit-log high-watermark
after each run and reads ``(since=old_hw, until=new_hw)`` sees every
appended row exactly once, the ranges tile the store with no overlap, the
same (since, until) pair is immutable while the store grows, filters
compose, tombstones apply, and empty/invalid ranges behave.
"""

import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.decode import decode_changes, decode_job
from fsst_spark.sources.fsst_source import (
    commit_count,
    commit_range_pids,
    log_commit_snapshot,
    register,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )


def _agg(df):
    return df.agg(F.count("*").alias("n"),
                  F.sum("doc_id").alias("s")).collect()[0]


@pytest.fixture(scope="module")
def grown(spark, docs, tmp_path_factory):
    """A store grown by three DataSource appends (commits 0, 1, 2) holding
    doc_id % 3 == 0 / 1 / 2 respectively."""
    out = str(tmp_path_factory.mktemp("changes_store"))
    register(spark)
    for r in range(3):
        docs.where(f"doc_id % 3 = {r}").write.format("fsst") \
            .mode("append").save(out)
    return out


def test_decode_changes_tiles_the_store(spark, docs, grown):
    """(since=-1,0] + (0,1] + (1,2] == the whole store, disjointly."""
    assert commit_count(grown) == 3
    parts = [decode_changes(spark, grown, since=i - 1, until=i)
             for i in range(3)]
    for r, part in enumerate(parts):
        assert _agg(part) == _agg(docs.where(f"doc_id % 3 = {r}"))
    ids = [set(x["doc_id"] for x in p.select("doc_id").collect())
           for p in parts]
    assert not (ids[0] & ids[1]) and not (ids[1] & ids[2])
    assert _agg(decode_changes(spark, grown, since=-1)) == _agg(docs)


def test_decode_changes_watermark_loop(spark, docs, tmp_path):
    """The documented consumer loop: read (old_hw, new_hw] after each
    append; every row arrives exactly once."""
    out = str(tmp_path / "wm")
    seen: list[int] = []
    hw = -1
    for r in range(3):
        docs.where(f"doc_id % 3 = {r}").write.format("fsst") \
            .mode("append").save(out)
        new_hw = commit_count(out) - 1
        batch = decode_changes(spark, out, since=hw, until=new_hw)
        seen.extend(x["doc_id"] for x in batch.select("doc_id").collect())
        hw = new_hw
    expect = [x["doc_id"] for x in docs.select("doc_id").collect()]
    assert sorted(seen) == sorted(expect)


def test_decode_changes_immutable_while_growing(spark, docs, tmp_path):
    """The same (since, until) returns the same rows after more appends."""
    out = str(tmp_path / "grow")
    docs.where("doc_id % 3 = 0").write.format("fsst").mode("append").save(out)
    docs.where("doc_id % 3 = 1").write.format("fsst").mode("append").save(out)
    before = _agg(decode_changes(spark, out, since=0, until=1))
    docs.where("doc_id % 3 = 2").write.format("fsst").mode("append").save(out)
    assert _agg(decode_changes(spark, out, since=0, until=1)) == before


def test_decode_changes_filters_compose(spark, docs, grown):
    """Zone/row filters apply inside the commit range only."""
    got = decode_changes(spark, grown, since=0, until=1,
                         filters=[("n_chars", ">=", 300)])
    exp = docs.where("doc_id % 3 = 1").where("n_chars >= 300")
    assert _agg(got) == _agg(exp)


def test_decode_changes_empty_and_bad_ranges(spark, grown):
    assert decode_changes(spark, grown, since=2, until=2).count() == 0
    with pytest.raises(ValueError, match="out of range"):
        decode_changes(spark, grown, since=1, until=99)
    with pytest.raises(ValueError, match="out of range"):
        decode_changes(spark, grown, since=-2)
    with pytest.raises(ValueError, match="no commit log"):
        decode_changes(spark, "/nonexistent-store", since=-1)


def test_since_commit_datasource_option(spark, docs, grown):
    """.option('since_commit', N) is the DataSource spelling; composes
    with as_of for a closed range."""
    inc = spark.read.format("fsst").option("since_commit", 0).load(grown)
    assert _agg(inc) == _agg(docs.where("doc_id % 3 != 0"))
    closed = (spark.read.format("fsst").option("since_commit", 0)
              .option("as_of", 1).load(grown))
    assert _agg(closed) == _agg(docs.where("doc_id % 3 = 1"))


def test_decode_changes_on_job_store(spark, docs, tmp_path):
    """Job-API stores join the incremental world the same way they join
    streaming: log_commit_snapshot after each completed encode action."""
    from fsst_spark.jobs.encode import encode_job

    out = str(tmp_path / "jobinc")
    first = docs.where("doc_id % 2 = 0")
    second = docs.where("doc_id % 2 = 1")
    n0 = encode_job(spark, first, out, chunk_bytes=64 << 10, resume=False,
                    pre_partitioned=True, unique_col="doc_id") \
        .count()  # action materializes the write
    assert n0 > 0 and log_commit_snapshot(out) == 0
    pids0 = commit_range_pids(out, -1, 0)
    encode_job(spark, second, out, chunk_bytes=64 << 10, resume=True,
               pre_partitioned=True, unique_col="doc_id",
               pid_offset=len(pids0)).count()
    assert log_commit_snapshot(out) == 1
    assert _agg(decode_changes(spark, out, since=0)) == _agg(second)
    assert _agg(decode_job(spark, out)) == _agg(docs)


def test_decode_changes_respects_tombstones(spark, docs, tmp_path):
    """Deletes are store-global: a row appended in the range and deleted
    later does not reappear in an incremental re-read."""
    from fsst_spark.jobs.deletes import delete_where

    out = str(tmp_path / "tomb")
    docs.where("doc_id % 3 = 0").write.format("fsst").mode("append").save(out)
    docs.where("doc_id % 3 = 1").write.format("fsst").mode("append").save(out)
    delete_where(spark, out, "lang", "==", "de")
    got = decode_changes(spark, out, since=0, until=1)
    exp = docs.where("doc_id % 3 = 1").where("lang != 'de'")
    assert _agg(got) == _agg(exp)
