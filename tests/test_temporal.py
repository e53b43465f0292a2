"""as-of join + sessionize: semantics vs pandas merge_asof / a pure-Python
reference, tie determinism, tolerance, and the join-free plan shape."""

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from fsst_spark.pipeline.temporal import asof_join, session_stats, sessionize

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def sides(spark):
    ev = _events(spark)
    left = ev.where(F.col("event_type") == "click") \
             .select("user_id", "ts", "event_id")
    right = ev.where(F.col("event_type") == "view") \
              .select("user_id", "ts", "event_id", "value")
    return left, right


def _pandas_asof(lpdf, rpdf, direction, tolerance=None):
    lp = lpdf.sort_values("ts", kind="stable").reset_index(drop=True)
    rp = rpdf.sort_values("ts", kind="stable").reset_index(drop=True)
    out = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction=direction,
        suffixes=("", "_r"), tolerance=tolerance)
    # pandas only suffixes COLLIDING columns; right-only ones keep their name
    if "value" in out.columns and "value_r" not in out.columns:
        out = out.rename(columns={"value": "value_r"})
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, sides, direction):
    left, right = sides
    got = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=["event_id", "value"],
                    direction=direction, tiebreak_col="event_id") \
        .toPandas().sort_values("event_id").reset_index(drop=True)
    want = _pandas_asof(left.toPandas(), right.toPandas(), direction) \
        .sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want) > 50
    pd.testing.assert_series_equal(
        got["event_id_r"].astype("float64"),
        want["event_id_r"].astype("float64"), check_names=False)
    pd.testing.assert_series_equal(
        got["value_r"], want["value_r"], check_names=False)


def test_asof_tolerance(spark, sides):
    left, right = sides
    tol_us = 3_600_000_000  # 1 hour
    got = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=["event_id"], tolerance_us=tol_us,
                    tiebreak_col="event_id").toPandas()
    want = _pandas_asof(left.toPandas(), right.toPandas(), "backward",
                        tolerance=pd.Timedelta(hours=1))
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["event_id_r"].notna().sum() == want["event_id_r"].notna().sum()
    assert got["event_id_r"].notna().sum() < got.shape[0]  # tolerance bites
    pd.testing.assert_series_equal(
        got["event_id_r"].astype("float64"),
        want["event_id_r"].astype("float64"), check_names=False)


def test_asof_ties_and_nulls(spark):
    t0 = dt.datetime(2024, 1, 1)
    ms = dt.timedelta(minutes=1)
    left = spark.createDataFrame(
        [(1, t0 + 2 * ms, "a"), (1, t0, "early"), (1, None, "null_ts"),
         (2, t0 + ms, "other_key")],
        "k int, ts timestamp, tag string")
    right = spark.createDataFrame(
        # two right rows tied at the SAME ts: largest tiebreak must win;
        # one null-ts right row must never be carried anywhere
        [(1, t0 + 2 * ms, 10, "lo"), (1, t0 + 2 * ms, 20, "hi"),
         (1, None, 99, "poison")],
        "k int, ts timestamp, tb int, v string")
    out = {r["tag"]: r for r in asof_join(
        left, right, on="k", ts_col="ts", right_cols=["v"],
        tiebreak_col="tb").collect()}
    assert out["a"]["v_r"] == "hi"          # inclusive bound + max tiebreak
    assert out["early"]["v_r"] is None      # nothing at-or-before
    assert out["null_ts"]["v_r"] is None    # null left ts matches nothing
    assert out["other_key"]["v_r"] is None  # key isolation
    assert len(out) == 4                    # left-join shape: no row lost


def test_asof_plan_is_join_free(spark, sides):
    left, right = sides
    plan = asof_join(left, right, on="user_id", right_cols=["value"],
                     tiebreak_col="event_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    # exactly one width-changing exchange: the hash shuffle feeding the sort
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch == 1, plan


def _py_sessions(rows, gap_us):
    """(user, ts_us sorted) -> session seq per row, pure Python."""
    out = {}
    by_user = {}
    for uid, ts, eid in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    for uid, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for ts, eid in evs:
            if prev is None or ts - prev > gap_us:
                seq += 1
            out[eid] = seq
            prev = ts
    return out


def test_sessionize_matches_python(spark):
    ev = _events(spark).select("user_id", "ts", "event_id")
    gap_us = 6 * 3600 * 1_000_000  # 6h: the synthetic stream spans a month
    got = {r["event_id"]: r["session_seq"]
           for r in sessionize(ev, gap_us=gap_us,
                               tiebreak_col="event_id").collect()}
    epoch = dt.datetime(1970, 1, 1)
    raw = [(r["user_id"],
            (r["ts"] - epoch) // dt.timedelta(microseconds=1),
            r["event_id"])
           for r in ev.collect()]
    want = _py_sessions(raw, gap_us)
    assert got == want
    assert max(want.values()) > 1  # the gap actually splits sessions


def test_session_stats(spark):
    ev = _events(spark).select("user_id", "ts", "event_id")
    gap_us = 6 * 3600 * 1_000_000
    st = session_stats(ev, gap_us=gap_us, tiebreak_col="event_id")
    rows = st.collect()
    total = sum(r["n_events"] for r in rows)
    assert total == ev.where(F.col("ts").isNotNull()).count()
    for r in rows:
        assert r["dur_us"] >= 0
        assert r["n_events"] >= 1
