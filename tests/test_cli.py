"""CLI smoke: the spark-submit entry points run end-to-end in a fresh
process (the CLI owns and stops its own SparkSession, so it cannot share
the test-session fixture)."""

import json
import os
import subprocess
import sys


def _run(*args):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "fsst_spark.jobs.cli", *args],
        capture_output=True, text=True, timeout=420, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_synth_then_curate(tmp_path):
    src = str(tmp_path / "corpus")
    out = str(tmp_path / "curated")
    r = _run("synth", "--rows", "300", "--out", src)
    assert r["rows"] == 300
    r = _run("curate", "--input", src, "--out", out,
             "--id-col", "url", "--group-col", "lang",
             "--cap", "40", "--fraction", "0.5")
    assert 0 < r["rows"] <= 300
    import glob
    assert glob.glob(out + "/*.parquet")


def test_cli_encode_then_selective_decode(tmp_path):
    src = str(tmp_path / "corpus2")
    enc = str(tmp_path / "encoded")
    dec = str(tmp_path / "decoded")
    _run("synth", "--rows", "400", "--out", src)
    r = _run("encode", "--input", src, "--out", enc, "--partitions", "4")
    assert r["rows"] == 400 and r["ratio"] > 1.5
    _run("decode", "--data", enc, "--out", dec,
         "--where", "url:>=:https://")
    import duckdb
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{dec}/*.parquet')").fetchone()[0]
    assert n == 400  # every synthetic url matches; selective path exercised


def test_cli_encode_fast_path_and_conjunctive_where(tmp_path):
    """Without --partitions/--group-by a parquet input routes to the
    file-granular columnar encode (no JVM row hop); repeated --where
    clauses AND at the chunk level with values coerced by column type."""
    src = str(tmp_path / "corpus3")
    enc = str(tmp_path / "encoded3")
    dec = str(tmp_path / "decoded3")
    _run("synth", "--rows", "400", "--out", src)
    r = _run("encode", "--input", src, "--out", enc)
    assert r["rows"] == 400 and r["ratio"] > 1.5
    _run("decode", "--data", enc, "--out", dec,
         "--where", "url:>=:https://", "--where", "url:<=:zzzz")
    import duckdb
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{dec}/*.parquet')").fetchone()[0]
    assert n == 400
