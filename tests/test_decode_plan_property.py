"""Property test: decode_plan's numbers bound the real scan for ANY
predicate — random ops/values/combinations over one clustered store.

Invariants per example:
  * chunks_kept counts every chunk the real decode reads (superset),
  * rows_bound >= the exact result row count,
  * byte/row/chunk totals are internally consistent,
  * the exact result equals a full-decode-then-filter reference.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from fsst_spark.jobs.decode import decode_filtered, decode_job, decode_plan
from fsst_spark.jobs.encode import encode_job

_STORE = {}


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planprop") / "store")
    df = (spark.range(0, 6000).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.element_at(
              F.array(F.lit("de"), F.lit("en"), F.lit("fr")),
              (F.col("doc_id") % 3 + 1).cast("int")))
          .withColumn("n_chars", (F.col("doc_id") * 7) % 1000))
    encode_job(spark, df, out, num_partitions=6, chunk_bytes=8 << 10,
               resume=False, unique_col="doc_id",
               sort_key="doc_id").collect()
    _STORE["full"] = decode_job(spark, out).drop("pid", "chunk_id") \
        .toPandas()
    return out


_int_filter = st.tuples(
    st.sampled_from(["doc_id", "n_chars"]),
    st.sampled_from([">=", ">", "<=", "<", "=="]),
    st.integers(min_value=-50, max_value=6100),
)
_str_filter = st.tuples(
    st.sampled_from(["lang"]),
    st.sampled_from(["=="]),
    st.sampled_from(["de", "en", "fr", "zz"]),
)
_filter = st.one_of(_int_filter, _str_filter)


def _apply(pdf, flt):
    col, op, val = flt
    s = pdf[col]
    return {"<": s < val, "<=": s <= val, ">": s > val,
            ">=": s >= val, "==": s == val}[op]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(conj=st.lists(_filter, min_size=0, max_size=2),
       disj=st.lists(_filter, min_size=0, max_size=2))
def test_plan_bounds_real_scan(spark, store, conj, disj):
    conj, disj = [list(f) for f in conj], [list(f) for f in disj]
    if not conj and not disj:
        return
    plan = decode_plan(spark, store, filters=conj or None,
                       any_filters=disj or None)
    got = decode_filtered(spark, store, filters=conj or None,
                          any_filters=disj or None)
    read_chunks = got.select("pid", "chunk_id").distinct().count()
    n_rows = got.count()
    # plan is a superset of the real scan and bounds the result
    assert plan["chunks_kept"] >= read_chunks
    assert plan["chunks_kept"] <= plan["chunks_after_zones"] \
        <= plan["chunks_total"]
    assert plan["rows_bound"] >= n_rows
    assert 0 <= plan["enc_bytes_to_read"] <= plan["enc_bytes_total"]
    assert 0.0 <= plan["scan_fraction"] <= 1.0
    # the exact result matches pandas reference semantics
    pdf = _STORE["full"]
    mask = None
    for f in conj:
        m = _apply(pdf, f)
        mask = m if mask is None else (mask & m)
    if disj:
        om = None
        for f in disj:
            m = _apply(pdf, f)
            om = m if om is None else (om | m)
        mask = om if mask is None else (mask & om)
    assert n_rows == int(mask.sum())
