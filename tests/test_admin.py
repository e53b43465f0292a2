"""Store admin ops: snapshot rollback, vacuum of aborted-write leftovers,
trash lifecycle — all driver-side metadata work over the commit log."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.admin import empty_trash, rollback_store, vacuum_store
from fsst_spark.jobs.decode import decode_job
from fsst_spark.sources.fsst_source import commit_count, register

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


def _grow(spark, docs, out, parts=3):
    register(spark)
    for r in range(parts):
        docs.where(f"doc_id % {parts} = {r}").write.format("fsst") \
            .mode("append").save(out)


def test_rollback_undoes_appends(spark, docs, tmp_path):
    out = str(tmp_path / "rb")
    _grow(spark, docs, out)
    res = rollback_store(out, to_commit=0)
    assert res["retired_commits"] == 2 and res["files_retired"] > 0
    assert commit_count(out) == 1
    assert _agg(decode_job(spark, out)) == _agg(docs.where("doc_id % 3 = 0"))
    # the datasource read agrees, and as_of past the rollback boundary raises
    assert _agg(spark.read.format("fsst").load(out)) \
        == _agg(docs.where("doc_id % 3 = 0"))
    with pytest.raises(Exception, match="out of range"):
        spark.read.format("fsst").option("as_of", 1).load(out).collect()
    # retired files are parked in trash, not gone
    assert glob.glob(os.path.join(out, "trash", "rollback-*", "chunks", "*"))
    # the store keeps working: a fresh append lands as commit entry 1
    docs.where("doc_id % 3 = 1").write.format("fsst").mode("append").save(out)
    assert commit_count(out) == 2
    assert _agg(decode_job(spark, out)) == _agg(docs.where("doc_id % 3 != 2"))


def test_rollback_hard_leaves_no_trash(spark, docs, tmp_path):
    out = str(tmp_path / "rbh")
    _grow(spark, docs, out, parts=2)
    res = rollback_store(out, to_commit=0, hard=True)
    assert res["trash"] is None
    assert not os.path.isdir(os.path.join(out, "trash"))
    assert _agg(decode_job(spark, out)) == _agg(docs.where("doc_id % 2 = 0"))


def test_rollback_drops_retired_tombstones(spark, docs, tmp_path):
    from fsst_spark.jobs.deletes import delete_where, deleted_count

    out = str(tmp_path / "rbt")
    _grow(spark, docs, out, parts=2)
    delete_where(spark, out, "lang", "==", "de")  # tombstones in both pids
    before = deleted_count(out)
    assert before > 0
    rollback_store(out, to_commit=0)
    after = deleted_count(out)
    assert 0 < after < before  # pid-1 tombstones dropped, pid-0 kept
    exp = docs.where("doc_id % 2 = 0").where("lang != 'de'")
    assert _agg(decode_job(spark, out)) == _agg(exp)


def test_rollback_guards(spark, docs, tmp_path):
    from fsst_spark.jobs.encode import encode_job

    out = str(tmp_path / "rbg")
    _grow(spark, docs, out, parts=2)
    with pytest.raises(ValueError, match="retires nothing"):
        rollback_store(out, to_commit=1)
    # unlogged chunk files block rollback (ambiguous boundary)
    job = str(tmp_path / "rbj")
    encode_job(spark, docs.limit(50), job, chunk_bytes=64 << 10, resume=False,
               pre_partitioned=True, unique_col="doc_id").count()
    with pytest.raises(ValueError, match="no commit log"):
        rollback_store(job, to_commit=-1)


def test_vacuum_retires_orphans_only(spark, docs, tmp_path):
    out = str(tmp_path / "vac")
    _grow(spark, docs, out, parts=2)
    orphan = os.path.join(out, "chunks", "part-99999.parquet")
    with open(orphan, "wb") as fh:  # a torn write's leftover
        fh.write(b"not a real chunk")
    res = vacuum_store(out)
    assert res["orphan_pids"] == [99999] and res["files_retired"] == 1
    assert not os.path.exists(orphan)
    assert _agg(decode_job(spark, out)) == _agg(docs)
    trash = empty_trash(out)
    assert trash["files_deleted"] == 1
    assert not os.path.isdir(os.path.join(out, "trash"))


def test_vacuum_refuses_job_stores(spark, docs, tmp_path):
    from fsst_spark.jobs.encode import encode_job

    job = str(tmp_path / "vacjob")
    encode_job(spark, docs.limit(50), job, chunk_bytes=64 << 10, resume=False,
               pre_partitioned=True, unique_col="doc_id").count()
    with pytest.raises(ValueError, match="directory listing"):
        vacuum_store(job)


def test_admin_calls_are_logged(spark, docs, tmp_path):
    from fsst_spark.jobs.schema import store_status

    out = str(tmp_path / "lg")
    _grow(spark, docs, out, parts=2)
    rollback_store(out, to_commit=0)
    vacuum_store(out)
    actions = [m["action"] for m in store_status(out)["recent_mutations"]]
    assert actions[-2:] == ["rollback", "vacuum"]
