#!/usr/bin/env python3
"""Capture .explain('formatted') for every bench-timed query path.

Run from a repo tree (round-start worktree for the *_before.txt files,
HEAD for *_after.txt):

    python scripts/capture_plans.py <out_dir> [suffix]

Queries whose entry functions collect internally (store_join, ann_store)
are captured at their internal DataFrame, which is where the plan-shape
claims in OPTIMIZATION_r06.md point.
"""
import contextlib
import io
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import fsst_spark  # noqa
from fsst_spark.jobs.session import get_spark
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("local[8]", app_name="capture_plans")
    import __spark_entry__ as E

    from fsst_spark.jobs.encode import encode_job, encode_files_job
    from fsst_spark.jobs.decode import decode_job, decode_filtered
    from fsst_spark.jobs.verify import roundtrip_summary
    from fsst_spark.jobs.join import store_join
    from fsst_spark.jobs.agg import encoded_group_topk

    plans = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # a small encoded store for the decode/verify/join plans
    store = tempfile.mkdtemp(prefix="plans_store_")
    encode_job(spark, docs.select("doc_id", "lang", "n_chars", "text"),
               store, chunk_bytes=256 << 10, resume=False,
               num_partitions=4, sort_key="doc_id",
               unique_col="doc_id").collect()
    r_store = tempfile.mkdtemp(prefix="plans_rstore_")
    encode_job(spark, docs.where(F.col("doc_id") < 100).select(
        "doc_id", (F.col("n_chars") * 2).cast("long").alias("score")),
        r_store, chunk_bytes=64 << 10, resume=False, num_partitions=2,
        sort_key="doc_id", unique_col="doc_id").collect()

    plans["web_decode"] = plan_of(decode_job(spark, store))
    plans["web_decode_filtered"] = plan_of(
        decode_filtered(spark, store, "doc_id", "<", 100))
    plans["web_verify"] = plan_of(roundtrip_summary(spark, store))
    plans["store_join"] = plan_of(store_join(spark, store, r_store, "doc_id",
                                             right_columns=["score"],
                                             left_columns=["lang"]))
    plans["group_topk"] = plan_of(
        encoded_group_topk(spark, store, "lang", "doc_id", k=3))
    plans["fsst_text"] = plan_of(E.q_fsst_roundtrip_text(spark, SF_DIR))
    plans["token_stats"] = plan_of(E.q_token_quality_stats(spark, SF_DIR))
    plans["ann_topk"] = plan_of(E.q_ann_cosine_topk(spark, SF_DIR))
    plans["emb_roundtrip"] = plan_of(E.q_embedding_roundtrip(spark, SF_DIR))
    plans["dedup_minhash"] = plan_of(E.q_minhash_neardup(spark, SF_DIR))

    # ann_store internal top-k frame
    from fsst_spark.pipeline.ann_store import ann_store_topk, build_ann_store
    ann = tempfile.mkdtemp(prefix="plans_ann_")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    build_ann_store(spark, emb.filter(F.col("vec_id") != 0), ann,
                    n_cells=8, num_partitions=4, chunk_bytes=64 << 10)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0)
         .select("embedding").collect()[0][0]]
    plans["ann_store"] = plan_of(ann_store_topk(spark, ann, q, k=10, nprobe=8))

    # encode jobs (lazy metrics frames)
    enc_out = tempfile.mkdtemp(prefix="plans_enc_")
    corpus_files = sorted(
        __import__("glob").glob(f"{SF_DIR}/documents.parquet"))
    plans["web_encode"] = plan_of(
        encode_files_job(spark, "", enc_out, files=corpus_files,
                         chunk_bytes=32 << 20, resume=False))
    plans["web_encode_df"] = plan_of(
        encode_job(spark, docs, enc_out + "_df", chunk_bytes=32 << 20,
                   resume=False))

    for name, p in plans.items():
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(p)
    print(f"wrote {len(plans)} plans to {out_dir}")
    for d in (store, r_store, ann, enc_out, enc_out + "_df"):
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
