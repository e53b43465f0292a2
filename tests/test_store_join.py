"""Store-to-store equi-join: exactness, two-sided zone pruning, outer
semantics, and the type/collision guards."""
import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.encode import encode_job
from fsst_spark.jobs.join import store_join, store_join_plan


def _mk_store(spark, tmp, name, rows, schema, sort_key=None,
              chunk_bytes=2 << 10):
    out = str(tmp / name)
    df = spark.createDataFrame(rows, schema)
    encode_job(spark, df, out, chunk_bytes=chunk_bytes, resume=False,
               num_partitions=2, sort_key=sort_key, unique_col=schema.split()[0]).collect()
    return out, df


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    # chunk boundaries follow the incoming Arrow batch (10k rows default),
    # so 60k left rows -> ~6 chunk groups; the right store covers only ids
    # 45000..46999, making most left chunks provably unjoinable
    tmp = tmp_path_factory.mktemp("store_join")
    l_raw = spark.range(60000).select(
        F.col("id"),
        F.concat(F.lit("host"), (F.col("id") % 7)).alias("host"),
        (F.col("id") * 3).alias("n"))
    r_raw = spark.range(45000, 47000).select(
        F.col("id"), (F.col("id") / 2.0).alias("score"))
    l_dir, r_dir = str(tmp / "left"), str(tmp / "right")
    encode_job(spark, l_raw, l_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=2, sort_key="id", unique_col="id").collect()
    encode_job(spark, r_raw, r_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=2, sort_key="id", unique_col="id").collect()
    return l_dir, l_raw, r_dir, r_raw


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_inner_join_exact_and_pruned(spark, stores):
    l_dir, l_df, r_dir, r_df = stores
    got = store_join(spark, l_dir, r_dir, "id")
    want = l_df.join(r_df, "id", "inner")
    cols = ["id", "host", "n", "score"]
    assert _sorted_rows(got.select(cols), cols) == \
        _sorted_rows(want.select(cols), cols)
    plan = store_join_plan(spark, l_dir, r_dir, "id")
    # the right store covers 10% of the left key range: clustering must
    # prune most left chunk groups, and never below the true match set
    assert plan["left_total"] >= 4
    assert plan["left_kept"] < plan["left_total"] / 2
    assert plan["right_kept"] == plan["right_total"]  # fully overlapped


def test_prune_off_same_result(spark, stores):
    l_dir, l_df, r_dir, r_df = stores
    a = store_join(spark, l_dir, r_dir, "id")
    b = store_join(spark, l_dir, r_dir, "id", prune=False)
    cols = ["id", "host", "n", "score"]
    assert _sorted_rows(a.select(cols), cols) == _sorted_rows(b.select(cols), cols)


def test_left_join_keeps_all_left_rows(spark, stores):
    l_dir, l_df, r_dir, r_df = stores
    got = store_join(spark, l_dir, r_dir, "id", how="left")
    assert got.count() == l_df.count()
    # unmatched rows carry NULL score; matched rows carry the right value
    n_null = got.filter(F.col("score").isNull()).count()
    assert n_null == l_df.count() - r_df.count()
    assert got.filter(F.col("score").isNotNull()).count() == r_df.count()
    plan = store_join_plan(spark, l_dir, r_dir, "id", how="left")
    assert plan["_left_keys"] is None          # preserved side never pruned
    assert plan["right_kept"] == plan["right_total"]


def test_semi_and_anti(spark, stores):
    l_dir, l_df, r_dir, r_df = stores
    semi = store_join(spark, l_dir, r_dir, "id", how="left_semi")
    anti = store_join(spark, l_dir, r_dir, "id", how="left_anti")
    assert semi.count() == r_df.count()
    assert anti.count() == l_df.count() - r_df.count()
    assert semi.columns == ["id", "host", "n"]  # right columns never emitted


def test_string_key_join(spark, tmp_path):
    # string keys exercise the zone_pack8 prefix path: shared prefixes
    # collapse, so pruning must stay conservative yet exact results hold
    la = [(f"com.example/{i:04d}", i) for i in range(400)]
    rb = [(f"com.example/{i:04d}", i * 2) for i in range(350, 380)]
    l_dir, l_df = _mk_store(spark, tmp_path, "ls", la, "url string, a bigint",
                            sort_key="url")
    r_dir, r_df = _mk_store(spark, tmp_path, "rs", rb, "url string, b bigint",
                            sort_key="url")
    got = store_join(spark, l_dir, r_dir, "url")
    want = l_df.join(r_df, "url", "inner")
    cols = ["url", "a", "b"]
    assert _sorted_rows(got.select(cols), cols) == \
        _sorted_rows(want.select(cols), cols)


def test_projection_and_guards(spark, stores, tmp_path):
    l_dir, l_df, r_dir, r_df = stores
    got = store_join(spark, l_dir, r_dir, "id", left_columns=["host"],
                     right_columns=["score"])
    assert sorted(got.columns) == ["host", "id", "score"]
    # colliding non-key column
    c_dir, _ = _mk_store(spark, tmp_path, "clash",
                         [(1, "x", 9)], "id bigint, host string, z bigint")
    with pytest.raises(ValueError, match="host"):
        store_join(spark, l_dir, c_dir, "id")
    # key type mismatch
    s_dir, _ = _mk_store(spark, tmp_path, "strkey",
                         [("1", 1.0)], "id string, score double")
    with pytest.raises(TypeError, match="comparable"):
        store_join(spark, l_dir, s_dir, "id")
    with pytest.raises(ValueError, match="how"):
        store_join(spark, l_dir, r_dir, "id", how="cross")


def test_disjoint_ranges_prune_everything(spark, tmp_path):
    l_dir, l_df = _mk_store(spark, tmp_path, "lo",
                            [(i, i) for i in range(100)],
                            "id bigint, a bigint", sort_key="id")
    r_dir, r_df = _mk_store(spark, tmp_path, "hi",
                            [(i, i) for i in range(1000, 1100)],
                            "id bigint, b bigint", sort_key="id")
    plan = store_join_plan(spark, l_dir, r_dir, "id")
    assert plan["left_kept"] == 0 and plan["right_kept"] == 0
    assert store_join(spark, l_dir, r_dir, "id").count() == 0


def test_runtime_filter_on_unclustered_stores(spark, tmp_path):
    """Interval pruning needs clustering; the runtime filter does not: a
    small right store's keys point-prune the unclustered left scan via
    decode_semijoin (zone-IN + bloom), and the result stays exact."""
    l_raw = spark.range(60000).select(
        # hash order: no key clustering, interval overlap prunes nothing
        F.xxhash64("id").alias("_h"), F.col("id"),
        (F.col("id") * 7).alias("a")).orderBy("_h").drop("_h")
    r_raw = spark.range(100).select(
        (F.col("id") * 599).alias("id"), F.lit(1).alias("b"))
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    encode_job(spark, l_raw, l_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=2, unique_col="id").collect()
    encode_job(spark, r_raw, r_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=1, unique_col="id").collect()
    plan = store_join_plan(spark, l_dir, r_dir, "id")
    assert plan["runtime_filter_build"] == "right"
    assert plan["right_rows_kept"] == 100
    got = store_join(spark, l_dir, r_dir, "id")
    want = l_raw.join(r_raw, "id", "inner")
    cols = ["id", "a", "b"]
    assert _sorted_rows(got.select(cols), cols) == \
        _sorted_rows(want.select(cols), cols)
    # disabling the filter must not change the answer
    off = store_join(spark, l_dir, r_dir, "id", runtime_filter=False)
    assert _sorted_rows(off.select(cols), cols) == \
        _sorted_rows(want.select(cols), cols)


def test_runtime_filter_left_build_for_left_join(spark, stores, tmp_path):
    """For a LEFT join only the right side is prunable, so the build side
    must be the (preserved) left side — and only when it is small."""
    l_dir, l_df, r_dir, r_df = stores
    plan = store_join_plan(spark, l_dir, r_dir, "id", how="left")
    # 60k left rows exceed no cap here (default 100k): build side = left
    assert plan["runtime_filter_build"] == "left"
    plan2 = store_join_plan(spark, l_dir, r_dir, "id", how="left",
                            rf_max_rows=1000)
    assert plan2["runtime_filter_build"] is None  # left too big, right not prunable... build must be preserved side
    got = store_join(spark, l_dir, r_dir, "id", how="left")
    assert got.count() == l_df.count()


def test_small_side_broadcast_hint(spark, tmp_path):
    """A side whose kept decoded bytes fit broadcast_threshold_bytes gets
    an explicit broadcast hint — the big side's scan never plans a
    shuffle exchange — and the answer is unchanged with the hint off."""
    l_raw = spark.range(60000).select(
        F.col("id"), (F.col("id") % 11).alias("v"))
    r_raw = spark.range(500).select(
        (F.col("id") * 31).alias("id"), F.lit(2).alias("w"))
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    encode_job(spark, l_raw, l_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=2, sort_key="id", unique_col="id").collect()
    encode_job(spark, r_raw, r_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=1, sort_key="id", unique_col="id").collect()
    got = store_join(spark, l_dir, r_dir, "id")
    physical = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in physical, physical
    cols = ["id", "v", "w"]
    want = l_raw.join(r_raw, "id", "inner")
    assert _sorted_rows(got.select(cols), cols) == \
        _sorted_rows(want.select(cols), cols)
    # bytes-bounded, not row-bounded: threshold 0 disables the hint, and
    # the un-hinted join still returns the identical rows
    off = store_join(spark, l_dir, r_dir, "id",
                     broadcast_threshold_bytes=0)
    assert _sorted_rows(off.select(cols), cols) == \
        _sorted_rows(want.select(cols), cols)


def test_composite_key_join(spark, tmp_path):
    """on=[k1, k2]: every key column prunes independently (the chunk must
    survive both interval tests), the final equi-join matches on BOTH
    keys, and non-key collision checks exclude all key columns."""
    l_raw = spark.range(20000).select(
        (F.col("id") % 100).alias("g"), F.col("id").alias("seq"),
        (F.col("id") * 3).alias("a"))
    r_raw = spark.range(19900, 20500).select(
        (F.col("id") % 100).alias("g"), F.col("id").alias("seq"),
        F.lit(7).alias("b"))
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    encode_job(spark, l_raw, l_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=2, sort_key="seq", unique_col="seq").collect()
    encode_job(spark, r_raw, r_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=1, sort_key="seq", unique_col="seq").collect()
    plan = store_join_plan(spark, l_dir, r_dir, ["g", "seq"])
    assert plan["key_type"] == ["int64", "int64"]
    # the seq column is clustered: most left chunks prune on it alone
    assert plan["left_kept"] < plan["left_total"]
    got = store_join(spark, l_dir, r_dir, ["g", "seq"])
    want = l_raw.join(r_raw, ["g", "seq"], "inner")
    cols = ["g", "seq", "a", "b"]
    assert _sorted_rows(got.select(cols), cols) == \
        _sorted_rows(want.select(cols), cols)
    with pytest.raises(ValueError, match="duplicate"):
        store_join_plan(spark, l_dir, r_dir, ["g", "g"])


def test_runtime_filter_outer_and_anti_semantics(spark, tmp_path):
    """The runtime filter must preserve outer/anti semantics: left_anti
    with a small LEFT build (right side semi-filtered to left's keys
    keeps exactly the keys needed for exclusion) and right-outer with a
    small RIGHT build (left rows semi-filtered to right's keys; every
    right row still appears, unmatched ones with NULL left columns)."""
    l_raw = spark.range(30000).select(
        F.col("id"), (F.col("id") % 3).alias("x"))
    r_raw = spark.range(200).select(
        (F.col("id") * 777).alias("id"), F.lit(5).alias("y"))
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    encode_job(spark, l_raw, l_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=2, unique_col="id").collect()
    encode_job(spark, r_raw, r_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=1, unique_col="id").collect()
    # left_anti, small LEFT build: rf prunes the right scan
    small_l = spark.range(50).select((F.col("id") * 777).alias("id"),
                                     F.lit(1).alias("z"))
    sl_dir = str(tmp_path / "sl")
    encode_job(spark, small_l, sl_dir, chunk_bytes=2 << 10, resume=False,
               num_partitions=1, unique_col="id").collect()
    plan = store_join_plan(spark, sl_dir, r_dir, "id", how="left_anti")
    assert plan["runtime_filter_build"] == "left"
    got = store_join(spark, sl_dir, r_dir, "id", how="left_anti")
    want = small_l.join(r_raw, "id", "left_anti")
    cols = ["id", "z"]
    assert _sorted_rows(got.select(cols), cols) == \
        _sorted_rows(want.select(cols), cols)
    # right outer, small RIGHT build: rf prunes the left scan; unmatched
    # right rows survive with NULL left columns
    got_r = store_join(spark, l_dir, r_dir, "id", how="right")
    want_r = l_raw.join(r_raw, "id", "right")
    cols = ["id", "x", "y"]
    assert _sorted_rows(got_r.select(cols), cols) == \
        _sorted_rows(want_r.select(cols), cols)
    n_unmatched = got_r.where(F.col("x").isNull()).count()
    assert n_unmatched == want_r.where(F.col("x").isNull()).count()
    assert n_unmatched > 0  # ids past 30000*: genuinely unmatched rows
