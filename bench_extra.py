#!/usr/bin/env python3
"""Extra benchmarks for optimization work (bench.py is FROZEN for
measurement; this file is the guide-§1 isolation harness and is never read
by the driver).

Per query: N warm repetitions of exactly what bench.py times (the query
function + .collect(), or the encode/verify/decode jobs), preceded by an
optional noop-sink materialization, with ``spark.sparkContext
.setJobDescription`` labels so the UI maps stages to queries. Also dumps
``.explain('formatted')`` for every query that returns a DataFrame lazily
enough to explain, into ``plans/<tag>/<query>.txt``.

Usage:
  python bench_extra.py [--reps 3] [--plans-dir plans/r06/x] [--only q1,q2]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import shutil
import sys
import tempfile
import time

import fsst_spark  # noqa: F401  (malloc tuning before JVM start)

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEED = 42


def _capture_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset")
    ap.add_argument("--skip-encode", action="store_true",
                    help="skip the web_encode/verify/decode family")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from fsst_spark.jobs.session import get_spark

    import bench as bench_mod
    import __spark_entry__ as entry_mod

    spark = get_spark(f"local[{CPUS}]", app_name="fsst_bench_extra")
    corpus_dir = bench_mod.ensure_corpus(spark, bench_mod.sf_of(SF_DIR))

    results: dict[str, list[float]] = {}
    plans: dict[str, str] = {}

    def run(qname, fn, reps=args.reps):
        if only and qname not in only:
            return
        walls = []
        for i in range(reps + 1):  # rep 0 = warm, dropped
            spark.sparkContext.setJobDescription(f"{qname}#{i}")
            t0 = time.time()
            fn()
            w = time.time() - t0
            if i > 0:
                walls.append(round(w, 3))
        spark.sparkContext.setJobDescription(None)
        results[qname] = walls
        print(f"{qname}: min={min(walls):.3f} walls={walls}", flush=True)

    # ---- encode family (same jobs bench.py times) -------------------------
    out_big = tempfile.mkdtemp(prefix="fsst_bx_big_")
    if not args.skip_encode and (only is None or
                                 {"web_encode", "web_verify", "web_decode",
                                  "web_encode_df"} & only):
        from fsst_spark.jobs.encode import encode_files_job, encode_job
        from fsst_spark.jobs.verify import roundtrip_summary
        from fsst_spark.jobs.decode import decode_job

        def enc():
            shutil.rmtree(out_big, ignore_errors=True)
            encode_files_job(spark, corpus_dir, out_big,
                             chunk_bytes=32 << 20, resume=False,
                             lineage={"source": "synth:web",
                                      "seed": SEED}).collect()

        run("web_encode", enc)
        if only and "web_encode" not in only:
            enc()  # verify/decode need the store even when encode is untimed

        corpus = spark.read.parquet(corpus_dir)

        def enc_df():
            out_df = tempfile.mkdtemp(prefix="fsst_bx_df_")
            try:
                encode_job(spark, corpus, out_df, chunk_bytes=32 << 20,
                           resume=False).collect()
            finally:
                shutil.rmtree(out_df, ignore_errors=True)

        run("web_encode_df", enc_df)
        run("web_verify",
            lambda: roundtrip_summary(spark, out_big).collect())
        plans["web_verify"] = _capture_plan(roundtrip_summary(spark, out_big))
        run("web_decode", lambda: decode_job(spark, out_big).count())
        plans["web_decode"] = _capture_plan(decode_job(spark, out_big))

    # ---- pipeline queries (the bench.py list) -----------------------------
    qfns = [("fsst_text", entry_mod.q_fsst_roundtrip_text),
            ("dedup_minhash", entry_mod.q_minhash_neardup),
            ("token_stats", entry_mod.q_token_quality_stats),
            ("ann_topk", entry_mod.q_ann_cosine_topk),
            ("ann_store", entry_mod.q_ann_store_topk),
            ("emb_roundtrip", entry_mod.q_embedding_roundtrip),
            ("store_join", entry_mod.q_store_join)]
    for qname, fn in qfns:
        run(qname, lambda fn=fn: fn(spark, SF_DIR).collect())
        if only is None or qname in only:
            try:
                plans[qname] = _capture_plan(fn(spark, SF_DIR))
            except Exception as exc:  # noqa: BLE001
                plans[qname] = f"(plan capture failed: {exc})"

    shutil.rmtree(out_big, ignore_errors=True)

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for q, p in plans.items():
            with open(os.path.join(args.plans_dir, f"{q}.txt"), "w") as f:
                f.write(p)

    summary = {q: {"min": min(w), "walls": w} for q, w in results.items()}
    summary["total_min"] = round(sum(min(w) for w in results.values()), 3)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
