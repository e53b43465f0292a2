"""Decode-free string-length stats: kernel (decoded_strlens /
fsst_vec.decoded_lengths) and the encoded_strlen_stats job.

The invariant everywhere: per-row DECODED byte lengths recovered without
materializing a single decoded byte must equal octet_length of the
original values, for every string codec the selector can pick, with and
without nulls."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from fsst_spark.kernel.codecs import (decode_column, decoded_strlens,
                                      encode_column)


def _octets(arr: pa.Array) -> np.ndarray:
    vals = [v.as_py() for v in arr if v.is_valid]
    return np.array(
        [len(v if isinstance(v, bytes) else v.encode()) for v in vals],
        dtype=np.int64)


def _corpora(nulls: bool):
    words = ["http://example.com/page", "the quick brown fox", "",
             "über-straße 😀", "a" * 32]
    mixed = [None if (nulls and i % 11 == 0)
             else words[i % len(words)] + str(i % 13) for i in range(500)]
    lowcard = [None if (nulls and i % 7 == 0) else ["de", "en", "fr"][i % 3]
               for i in range(400)]
    sorted_urls = sorted(f"com.example/path/{i:06d}" for i in range(300))
    rng = np.random.default_rng(3)
    rand_bin = [None if (nulls and i % 5 == 0)
                else rng.integers(0, 256, size=int(rng.integers(0, 40)),
                                  dtype=np.uint8).tobytes()
                for i in range(200)]
    return [("mixed", pa.array(mixed, pa.string())),
            ("lowcard", pa.array(lowcard, pa.string())),
            ("sorted_urls", pa.array(sorted_urls, pa.string())),
            ("rand_binary", pa.array(rand_bin, pa.binary()))]


@pytest.mark.parametrize("nulls", [False, True])
def test_kernel_lengths_match_octet_length_all_codecs(nulls):
    seen = set()
    for name, arr in _corpora(nulls):
        enc = encode_column(arr)
        seen.add(enc["codec"])
        lens, mask = decoded_strlens(enc)
        assert np.array_equal(lens, _octets(arr)), (name, enc["codec"])
        vm = np.array([v.is_valid for v in arr])
        if mask is None:
            assert vm.all()
        else:
            assert np.array_equal(mask, vm)
        # and the real decoder agrees the payload is intact
        assert decode_column(enc).equals(arr)
    # the corpora must actually exercise every string codec
    assert {"str_fsst", "str_dict", "str_front", "str_plain"} <= seen


def test_kernel_escape_heavy_stream():
    # random bytes rarely match trained symbols -> escape-dominated FSST
    rng = np.random.default_rng(11)
    vals = [rng.integers(0, 256, size=int(rng.integers(1, 60)),
                         dtype=np.uint8).tobytes() for _ in range(300)]
    arr = pa.array(vals, pa.binary())
    enc = encode_column(arr)
    lens, _ = decoded_strlens(enc)
    assert np.array_equal(lens, _octets(arr))


def test_kernel_all_null_and_empty_chunks():
    for arr in (pa.array([None, None, None], pa.string()),
                pa.array(["", "", ""], pa.string())):
        enc = encode_column(arr)
        lens, mask = decoded_strlens(enc)
        n_valid = sum(v.is_valid for v in arr)
        assert len(lens) == n_valid
        assert (lens == 0).all()
        if n_valid < len(arr):
            assert mask is not None and int(mask.sum()) == n_valid


def test_kernel_rejects_non_string_codec():
    enc = encode_column(pa.array(np.arange(10), pa.int64()))
    with pytest.raises(NotImplementedError):
        decoded_strlens(enc)


def test_job_matches_spark_octet_length(spark, tmp_path):
    from fsst_spark.jobs.encode import encode_job
    from fsst_spark.jobs.stats import encoded_strlen_stats

    out = str(tmp_path / "store")
    docs = spark.range(0, 800).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 13 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("döc 😀 body text "),
                     (F.col("id") % 97).cast("string"))).alias("text"),
        F.element_at(F.array(F.lit("de"), F.lit("en"), F.lit("fr")),
                     ((F.col("id") % 3) + 1).cast("int")).alias("lang"))
    encode_job(spark, docs, out, chunk_bytes=4 << 10, resume=False,
               pre_partitioned=True, unique_col="doc_id").collect()

    got = {r["column"]: r
           for r in encoded_strlen_stats(spark, out, ["text", "lang"]).collect()}
    exp = {r["column"]: r for r in docs.selectExpr(
        "stack(2, 'text', text, 'lang', lang) as (column, v)"
    ).groupBy("column").agg(
        F.count("v").alias("n_values"),
        F.sum(F.octet_length("v")).alias("sum_bytes"),
        (F.sum(F.octet_length("v")) / F.count("v")).alias("avg_bytes"),
        F.min(F.octet_length("v")).alias("min_bytes"),
        F.max(F.octet_length("v")).alias("max_bytes")).collect()}
    for c in ("text", "lang"):
        for k in ("n_values", "sum_bytes", "min_bytes", "max_bytes"):
            assert got[c][k] == exp[c][k], (c, k)
        assert got[c]["avg_bytes"] == pytest.approx(exp[c]["avg_bytes"])


def test_job_rejects_non_string_column(spark, tmp_path):
    from fsst_spark.jobs.encode import encode_job
    from fsst_spark.jobs.stats import encoded_strlen_stats

    out = str(tmp_path / "store")
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"),
                                    F.col("id").alias("n"))
    encode_job(spark, df, out, resume=False, pre_partitioned=True,
               unique_col="doc_id").collect()
    with pytest.raises(ValueError, match="string/binary"):
        encoded_strlen_stats(spark, out, ["n"])
    with pytest.raises(KeyError):
        encoded_strlen_stats(spark, out, ["nope"])
