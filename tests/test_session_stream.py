"""session_window_stats: built-in session_window (batch + streaming)
must agree with the gaps-and-islands batch operator, boundary included."""

import datetime as dt

from pyspark.sql import functions as F

from fsst_spark.pipeline.temporal import session_stats
from fsst_spark.streaming.session_stream import session_window_stats

SF = "/root/testdata/sf0.001"
GAP_US = 6 * 3600 * 1_000_000


def _key(rows):
    """Session identity that both shapes share: (user, first-event ts)."""
    return sorted((r["user_id"], r["t_start"].replace(tzinfo=None),
                   r["n_events"], r["dur_us"]) for r in rows)


def test_batch_session_window_matches_islands(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "event_id")
    got = _key(session_window_stats(ev, gap_us=GAP_US).collect())
    want = _key(session_stats(ev, gap_us=GAP_US,
                              tiebreak_col="event_id").collect())
    assert got == want and len(got) > 20


def test_boundary_gap_exactly_threshold(spark):
    """An inter-event gap EXACTLY equal to gap_us must stay one session
    in both operators (the +1µs alignment under test)."""
    t0 = dt.datetime(2024, 1, 1)
    gap = dt.timedelta(microseconds=GAP_US)
    eps = dt.timedelta(microseconds=1)
    ev = spark.createDataFrame(
        [(1, t0, 10), (1, t0 + gap, 11),           # == gap: same session
         (2, t0, 20), (2, t0 + gap + eps, 21)],    # > gap: two sessions
        "user_id int, ts timestamp, event_id int")
    a = _key(session_window_stats(ev, gap_us=GAP_US).collect())
    b = _key(session_stats(ev, gap_us=GAP_US,
                           tiebreak_col="event_id").collect())
    assert a == b
    n_sessions = {u: 0 for u in (1, 2)}
    for u, *_ in a:
        n_sessions[u] += 1
    assert n_sessions == {1: 1, 2: 2}


def test_stream_matches_batch(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "event_id")
    want = _key(session_window_stats(ev, gap_us=GAP_US).collect())

    ev.write.parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema(ev.schema).parquet(str(tmp_path / "src"))
    agg = session_window_stats(stream, gap_us=GAP_US, watermark="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("sess")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = _key(spark.sql("SELECT * FROM sess").collect())
    assert got == want
