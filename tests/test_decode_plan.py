"""decode_plan: the metadata-only EXPLAIN for selective decode.

Pins the contract that the plan's numbers are the REAL scan's numbers:
``chunks_kept`` equals the pruned-chunk survivor count the decode would
read, ``rows_bound`` bounds (and with chunk-granular slack, tracks) the
exact result, and ``scan_fraction`` on a clustered store is small for a
selective predicate and 1.0 with no filters.
"""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.decode import decode_filtered, decode_plan
from fsst_spark.jobs.encode import encode_job


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plan") / "store")
    df = (spark.range(0, 20000).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.element_at(
              F.array(F.lit("de"), F.lit("en"), F.lit("fr"), F.lit("pt")),
              (F.col("doc_id") % 4 + 1).cast("int")))
          .withColumn("txt", F.concat(F.lit("body-"), F.col("doc_id"))))
    encode_job(spark, df, out, num_partitions=4, chunk_bytes=8 << 10,
               resume=False, unique_col="doc_id",
               sort_key="doc_id").collect()
    return out


def test_plan_matches_real_decode(spark, store):
    flt = [("doc_id", ">=", 1000), ("doc_id", "<", 2000)]
    plan = decode_plan(spark, store, filters=flt)
    got = decode_filtered(spark, store, filters=flt)
    rows = got.count()
    read_chunks = got.select("pid", "chunk_id").distinct().count()
    # the plan's kept set IS the real decode's scan set
    assert plan["chunks_kept"] >= read_chunks  # decode may drop empty chunks
    assert plan["chunks_kept"] < plan["chunks_total"]
    assert plan["chunks_after_zones"] == plan["chunks_kept"]  # int filter
    assert rows == 1000
    assert plan["rows_bound"] >= rows
    # clustered on doc_id: a 5% predicate reads a small fraction
    assert plan["scan_fraction"] < 0.35, plan
    assert plan["enc_bytes_to_read"] <= plan["enc_bytes_total"]
    assert plan["has_deletes"] is False


def test_plan_no_filters_is_full_scan(spark, store):
    plan = decode_plan(spark, store)
    assert plan["chunks_kept"] == plan["chunks_total"] > 0
    assert plan["rows_bound"] == plan["rows_total"] == 20000
    assert plan["scan_fraction"] == 1.0


def test_plan_dict_stage_and_or_branch(spark, store):
    # lang is dict-coded and unclustered: zones keep everything, the dict
    # stage can only help on a value absent from some chunk's dictionary —
    # a NONEXISTENT value must prune to zero via dict/bloom
    plan = decode_plan(spark, store, filters=[("lang", "==", "zz")])
    assert plan["chunks_kept"] == 0 and plan["rows_bound"] == 0
    assert plan["scan_fraction"] == 0.0
    # OR of two disjoint ranges keeps the union of the branch keep-sets
    p_or = decode_plan(spark, store, any_filters=[
        ("doc_id", "<", 500), ("doc_id", ">=", 19500)])
    assert 0 < p_or["chunks_kept"] < p_or["chunks_total"]
    assert p_or["rows_bound"] >= 1000


def test_plan_column_subset_counts_filter_column(spark, store):
    # filter col outside columns= still scans (the row predicate needs it)
    plan = decode_plan(spark, store, columns=["txt"],
                       filters=[("doc_id", "<", 100)])
    assert sorted(plan["columns"]) == ["doc_id", "txt"]
    full = decode_plan(spark, store, filters=[("doc_id", "<", 100)])
    assert plan["enc_bytes_to_read"] < full["enc_bytes_to_read"]


def test_plan_unknown_column_raises(spark, store):
    with pytest.raises(KeyError):
        decode_plan(spark, store, filters=[("nope", "==", 1)])
    with pytest.raises(KeyError):
        decode_plan(spark, store, columns=["nope"])


def test_cli_plan_only(store):
    r = subprocess.run(
        [sys.executable, "-m", "fsst_spark.jobs.cli", "decode",
         "--data", store, "--where", "doc_id:<:1000", "--plan-only"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    plan = json.loads(r.stdout.strip().splitlines()[-1])
    assert plan["chunks_kept"] < plan["chunks_total"]
    assert plan["filters"] == [["doc_id", "<", 1000]]


def test_cli_decode_without_out_or_plan_fails(store):
    r = subprocess.run(
        [sys.executable, "-m", "fsst_spark.jobs.cli", "decode",
         "--data", store],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode != 0
    assert "--out" in (r.stderr + r.stdout)
