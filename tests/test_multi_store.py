"""decode_stores: a family of daily-shard stores reads as one DataFrame
with per-store pruning, null-fill for schema drift, and fail-fast type
checks."""
import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.decode import decode_stores
from fsst_spark.jobs.encode import encode_job


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def shards(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multi_store")
    base = spark.range(4000).select(
        F.col("id"), (F.col("id") % 5).alias("day"),
        F.concat(F.lit("u"), F.col("id")).alias("url"))
    dirs = []
    for day in (0, 1, 2):
        d = str(tmp / f"day{day}")
        encode_job(spark, base.filter(F.col("day") == day), d,
                   chunk_bytes=2 << 10, resume=False, num_partitions=2,
                   sort_key="id", unique_col="id").collect()
        dirs.append(d)
    return dirs, base


def test_union_equals_full_set(spark, shards):
    dirs, base = shards
    got = decode_stores(spark, dirs)
    want = base.filter(F.col("day") < 3)
    cols = ["id", "day", "url"]
    assert _rows(got.select(cols), cols) == _rows(want.select(cols), cols)


def test_filters_apply_per_store(spark, shards):
    dirs, base = shards
    got = decode_stores(spark, dirs, columns=["id", "day"],
                        filters=[("id", "<", 50)])
    want = base.filter((F.col("day") < 3) & (F.col("id") < 50))
    cols = ["id", "day"]
    assert _rows(got.select(cols), cols) == _rows(want.select(cols), cols)


def test_provenance_and_missing_column_null_fill(spark, shards, tmp_path):
    dirs, base = shards
    # an old shard that predates the url column: its rows null-fill
    old = str(tmp_path / "old")
    encode_job(spark, spark.range(10).select(
        F.col("id"), F.lit(9).cast("long").alias("day")), old,
        chunk_bytes=2 << 10, resume=False, num_partitions=1,
        unique_col="id").collect()
    got = decode_stores(spark, [dirs[0], old], provenance_col="shard")
    rows = got.collect()
    assert {r["shard"] for r in rows} == {dirs[0], old}
    assert all(r["url"] is None for r in rows if r["shard"] == old)
    assert all(r["url"] is not None for r in rows if r["shard"] == dirs[0])
    # a conjunct on the missing column skips the old shard entirely
    pruned = decode_stores(spark, [dirs[0], old],
                           filters=[("url", ">=", "u")])
    assert {r["day"] for r in pruned.collect()} == {0}


def test_type_drift_fails_fast(spark, shards, tmp_path):
    dirs, _ = shards
    drift = str(tmp_path / "drift")
    encode_job(spark, spark.range(10).select(
        F.col("id").cast("string").alias("id")), drift,
        chunk_bytes=2 << 10, resume=False, num_partitions=1,
        unique_col="id").collect()
    with pytest.raises(TypeError, match="must agree"):
        decode_stores(spark, [dirs[0], drift])


def test_all_shards_pruned_keeps_schema(spark, shards):
    dirs, _ = shards
    got = decode_stores(spark, dirs, filters=[("id", ">", 10_000_000)])
    assert got.count() == 0
    assert set(got.columns) == {"id", "day", "url"}


def test_family_stats_and_minmax(spark, shards):
    dirs, base = shards
    from fsst_spark.jobs.stats import (stores_column_minmax,
                                       stores_column_stats)

    rows = {r["column"]: r for r in
            stores_column_stats(spark, dirs, ["id", "day"]).collect()}
    sub = base.filter(F.col("day") < 3)
    want_n = sub.count()
    assert rows["id"]["n_rows"] == want_n
    assert rows["id"]["min_long"] == sub.agg(F.min("id")).first()[0]
    assert rows["id"]["max_long"] == sub.agg(F.max("id")).first()[0]
    assert rows["day"]["min_long"] == 0 and rows["day"]["max_long"] == 2
    mm = stores_column_minmax(spark, dirs, "url")
    urls = [r["url"] for r in sub.select("url").collect()]
    assert mm["min"] == min(urls) and mm["max"] == max(urls)
    assert mm["n_rows"] == want_n
    assert mm["n_chunks_decoded"] < mm["n_chunks_total"]


def test_family_ndv_counts_cross_shard_dupes_once(spark, shards, tmp_path):
    """stores_ndv merges per-shard HLL sketches: a url re-crawled on two
    days counts once (set-union semantics), and per-shard estimates stay
    within HLL tolerance of the true distinct counts."""
    from fsst_spark.jobs.stats import stores_ndv

    dirs, base = shards
    # a shard that re-crawls day 0's urls under new ids: distinct url
    # count must NOT grow
    recrawl = str(tmp_path / "recrawl")
    encode_job(spark, base.filter(F.col("day") == 0).select(
        (F.col("id") + 500_000).alias("id"), F.col("day"), F.col("url")),
        recrawl, chunk_bytes=2 << 10, resume=False, num_partitions=1,
        sort_key="id", unique_col="id").collect()
    est = stores_ndv(spark, dirs, ["url"])["url"]
    est_re = stores_ndv(spark, dirs + [recrawl], ["url"])["url"]
    true = base.filter(F.col("day") < 3).select("url").distinct().count()
    assert abs(est - true) / true < 0.15
    assert est_re == est  # identical merged registers: same url set


def test_merge_stores_reclusters_family(spark, shards, tmp_path):
    """merge_stores: a shard family consolidates into one clustered store
    whose zones prune across former shard boundaries, bit-identical."""
    from fsst_spark.jobs.compact import merge_stores
    from fsst_spark.jobs.decode import decode_filtered, decode_job

    dirs, base = shards
    merged = str(tmp_path / "merged")
    merge_stores(spark, dirs, merged, sort_key="id", chunk_bytes=2 << 10,
                 num_partitions=2, unique_col="id").collect()
    want = base.filter(F.col("day") < 3)
    got = decode_job(spark, merged).drop("pid", "chunk_id")
    cols = ["id", "day", "url"]
    assert _rows(got.select(cols), cols) == _rows(want.select(cols), cols)
    # clustering across former shard boundaries: a narrow id range prunes
    narrow = decode_filtered(spark, merged, "id", "<", 40, columns=["id"])
    assert narrow.count() == want.filter("id < 40").count()
    # lineage in the manifest names every source shard
    import glob
    import json

    mf = glob.glob(f"{merged}/manifest/*.parquet")
    lin = json.loads(duckdb_lineage(mf[0]))
    assert set(lin["merged_from"]) == set(dirs)


def duckdb_lineage(manifest_file):
    import duckdb

    return duckdb.sql(
        f"SELECT lineage FROM read_parquet('{manifest_file}') LIMIT 1"
    ).fetchone()[0]


def test_shard_sharing_no_projected_column_is_skipped(spark, shards, tmp_path):
    """A shard carrying none of the projected columns must not leak its
    own columns into the union (decode_job treats [] as all-columns)."""
    dirs, base = shards
    alien = str(tmp_path / "alien")
    encode_job(spark, spark.range(5).select(
        F.col("id").alias("other"), F.lit("x").alias("extra")), alien,
        chunk_bytes=2 << 10, resume=False, num_partitions=1,
        unique_col="other").collect()
    got = decode_stores(spark, [dirs[0], alien], columns=["id", "url"])
    assert set(got.columns) == {"id", "url"}
    assert got.count() == base.filter(F.col("day") == 0).count()


def test_large_in_list_count_pushdown(spark, shards):
    """A >16-value IN list must not build a chained-OR Catalyst tree
    (JVM stack): both the selective decode and the metadata count route
    through the binary-search keep predicate and stay exact."""
    from fsst_spark.jobs.agg import encoded_count_filtered
    from fsst_spark.jobs.decode import decode_filtered

    dirs, base = shards
    vals = [int(v) for v in range(0, 4000, 7)]  # 572 probes
    want = base.filter((F.col("day") == 0) & F.col("id").isin(vals)).count()
    got = decode_filtered(spark, dirs[0], "id", "in", vals,
                          columns=["id"]).count()
    assert got == want
    cnt = encoded_count_filtered(spark, dirs[0],
                                 filters=[("id", "in", vals)]).collect()[0]
    assert cnt["n_rows"] == want
