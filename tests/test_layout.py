"""Z-order layout clustering: multi-dimension zone pruning + exactness."""

import pytest
from pyspark.sql import functions as F

from fsst_spark.jobs.agg import encoded_count_filtered
from fsst_spark.jobs.encode import encode_job
from fsst_spark.jobs.layout import zorder_key


@pytest.fixture(scope="module")
def grid_df(spark):
    df = (spark.range(0, 40000).withColumnRenamed("id", "doc_id")
          .withColumn("x", F.col("doc_id") % 1000)
          .withColumn("y", (F.col("doc_id") * 7919) % 1000)
          .withColumn("s", F.concat(F.lit("k"), F.lpad(F.col("doc_id") % 500, 3, "0"))))
    df.persist().count()
    yield df
    df.unpersist()


def _count(spark, out, filters):
    return encoded_count_filtered(spark, out, filters).collect()[0].asDict()


def test_zorder_prunes_both_dimensions(spark, grid_df, tmp_path):
    """With sort_key=zorder(x, y) a zone-range filter on EITHER column
    prunes chunks; a single-column sort gives all pruning power to that
    one column. Counts stay exact either way."""
    out = str(tmp_path / "zstore")
    encode_job(spark, grid_df, out, num_partitions=8, chunk_bytes=8 << 10,
               resume=False, unique_col="doc_id",
               sort_key=zorder_key(grid_df, ["x", "y"])).collect()
    rx = _count(spark, out, [("x", ">=", 100), ("x", "<", 200)])
    ry = _count(spark, out, [("y", ">=", 100), ("y", "<", 200)])
    want_x = grid_df.filter((F.col("x") >= 100) & (F.col("x") < 200)).count()
    want_y = grid_df.filter((F.col("y") >= 100) & (F.col("y") < 200)).count()
    assert rx["n_rows"] == want_x and ry["n_rows"] == want_y
    assert rx["chunks_pruned"] > 0, rx
    assert ry["chunks_pruned"] > 0, ry


def test_zorder_string_column_prunes(spark, grid_df, tmp_path):
    """String columns rank through their 8-byte prefix (hex/conv JVM
    expression): prefix-distinct strings still prune after z-ordering."""
    out = str(tmp_path / "zstr")
    encode_job(spark, grid_df, out, num_partitions=8, chunk_bytes=8 << 10,
               resume=False, unique_col="doc_id",
               sort_key=zorder_key(grid_df, ["s", "y"])).collect()
    rs = _count(spark, out, [("s", ">=", "k100"), ("s", "<", "k200")])
    want = grid_df.filter((F.col("s") >= "k100") & (F.col("s") < "k200")).count()
    assert rs["n_rows"] == want
    assert rs["chunks_pruned"] > 0, rs


def test_zorder_nulls_and_guards(spark):
    df = (spark.range(0, 100).withColumnRenamed("id", "doc_id")
          .withColumn("x", F.when(F.col("doc_id") % 7 == 0, None)
                      .otherwise(F.col("doc_id") % 10))
          .withColumn("y", F.col("doc_id") % 5))
    k = zorder_key(df, ["x", "y"])  # nulls bucket to 0, must not error
    n = df.select(k.alias("z")).filter(F.col("z").isNotNull()).count()
    assert n == 100  # key defined for every row, nulls included
    with pytest.raises(ValueError):
        zorder_key(df, [])
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=0)
    with pytest.raises(KeyError):
        zorder_key(df, ["x", "nope"])


def test_cluster_by_zorder_parse(spark):
    from fsst_spark.jobs.cli import _parse_cluster_by

    names, exprs = _parse_cluster_by("zorder(x, y)")
    assert names == [] and len(exprs) == 1
    df = (spark.range(0, 50).withColumnRenamed("id", "x")
          .withColumn("y", F.col("x") % 5))
    col = exprs[0](df)  # factory resolves against the frame
    assert df.select(col.alias("z")).count() == 50
    with pytest.raises(ValueError):
        _parse_cluster_by("zorder(x)")
    with pytest.raises(ValueError):
        _parse_cluster_by("weird_fn(url)")
    # mixed entries: top-level comma split keeps zorder's inner commas
    names, exprs = _parse_cluster_by("zorder(x,y), lang")
    assert names == [] and len(exprs) == 2
