"""Per-chunk quantile sketches: blob round-trip, exact small-chunk
quantiles, bounded-error big-chunk quantiles, refusal paths."""

import math
import os

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.encode import encode_files_job
from fsst_spark.jobs.stats import encoded_quantiles
from fsst_spark.kernel.qsample import qsample_build, qsample_parse

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
QS = [0.1, 0.25, 0.5, 0.75, 0.9]


def _rank_value(sorted_vals, q):
    """ceil(q*n)-th smallest (the engine's selection convention)."""
    n = len(sorted_vals)
    r = max(int(math.ceil(q * n)), 1)
    return sorted_vals[r - 1]


def test_blob_roundtrip_int():
    arr = pa.array([5, 1, None, 9, 3], type=pa.int64())
    is_int, n, pts = qsample_parse(qsample_build(arr, k=256))
    assert is_int and n == 4
    assert pts.tolist() == [1, 3, 5, 9]  # n <= k: all values, sorted


def test_blob_sampling_bounds():
    arr = pa.array(list(range(1000)), type=pa.int64())
    is_int, n, pts = qsample_parse(qsample_build(arr, k=64))
    assert n == 1000 and len(pts) == 64
    assert pts[0] == 0 and pts[-1] == 999  # endpoints always kept
    assert sorted(pts.tolist()) == pts.tolist()


def test_blob_float_nan_last():
    arr = pa.array([2.0, float("nan"), -1.0], type=pa.float64())
    is_int, n, pts = qsample_parse(qsample_build(arr, k=8))
    assert not is_int and n == 3
    assert pts[0] == -1.0 and pts[1] == 2.0 and np.isnan(pts[2])


def test_blob_unsupported_and_empty():
    assert qsample_build(pa.array(["a", "b"]), 8) is None
    assert qsample_build(pa.array([None, None], type=pa.int64()), 8) is None


@pytest.fixture(scope="module")
def small_chunk_store(spark, tmp_path_factory):
    """Every chunk holds ≤128 values (< k=256): sketches are complete and
    merged quantiles must be EXACT."""
    out = str(tmp_path_factory.mktemp("qstore_small"))
    encode_files_job(spark, "", out, files=[f"{SF_DIR}/documents.parquet"],
                     columns=["doc_id", "n_chars", "lang"], chunk_bytes=1,
                     batch_rows=128, resume=False).collect()
    return out


def test_exact_quantiles_small_chunks(spark, small_chunk_store):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    obs = {}
    got = {r["q"]: r["val"]
           for r in encoded_quantiles(spark, small_chunk_store, "n_chars",
                                      QS, observer=obs).collect()}
    assert obs["exact"] and obs["n_values"] == len(vals)
    for q in QS:
        assert got[q] == _rank_value(vals, q), q


def test_approx_quantiles_rank_bound(spark, tmp_path):
    """One 500-row chunk sketched at k=64: every answer must be within
    the 2N/k equi-depth rank bound of the true rank."""
    out = str(tmp_path / "qstore_big")
    encode_files_job(spark, "", out, files=[f"{SF_DIR}/documents.parquet"],
                     columns=["n_chars"], chunk_bytes=1 << 30,
                     qsample_k=64, resume=False).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    n = len(vals)
    got = {r["q"]: r["val"]
           for r in encoded_quantiles(spark, out, "n_chars", QS).collect()}
    for q in QS:
        v = got[q]
        lo = sum(1 for x in vals if x < v)   # tightest rank interval of v
        hi = sum(1 for x in vals if x <= v)
        target = q * n
        dist = 0 if lo <= target <= hi else min(abs(target - lo),
                                                abs(target - hi))
        assert dist <= 2 * n / 64 + 1, (q, v, dist)


def test_quantiles_refusals(spark, small_chunk_store, tmp_path):
    with pytest.raises(ValueError, match="numeric"):
        encoded_quantiles(spark, small_chunk_store, "lang", [0.5])
    with pytest.raises(ValueError, match="qs must"):
        encoded_quantiles(spark, small_chunk_store, "n_chars", [1.5])
    out = str(tmp_path / "nosketch")
    encode_files_job(spark, "", out, files=[f"{SF_DIR}/documents.parquet"],
                     columns=["n_chars"], chunk_bytes=1 << 30,
                     qsample_k=0, resume=False).collect()
    with pytest.raises(ValueError, match="sketch"):
        encoded_quantiles(spark, out, "n_chars", [0.5])
