"""Replicates the driver's correctness gate locally: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count + schema + order-insensitive values."""

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


ORACLED = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(entry_mod.oracle_sql()[name]).df()
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=0, rtol=0)


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    for name in sorted(set(qs) - set(ORACLED)):
        df = qs[name](spark, SF_DIR)
        rows = df.collect()
        assert rows is not None and len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 5
    # every codec round-trip in the flagship must be bit-perfect
    for r in rows:
        assert r["n_match"] == r["n_rows"], r
