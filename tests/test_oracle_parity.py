"""Self-check harness replicating the driver's oracle comparison:
run every catalog query on Spark AND its DuckDB oracle at sf0.001,
then compare row counts, column names, and exact values (sorted
column-wise and row-wise).  Exact equality here implies the driver's
order-insensitive value-hash matches regardless of its rounding."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from stampede_to_fresco_etl_spark.catalog import REGISTRY, TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            non_null = s.dropna()
            if len(non_null) and not isinstance(non_null.iloc[0], str):
                df[c] = pd.to_datetime(s, errors="ignore")
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int64", "Int32", "Int64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    fn, sql = REGISTRY[name]
    got = _normalize(fn(spark, SF_DIR).toPandas())
    if sql is None:
        assert len(got) >= 0  # rows-only check, mirrors the driver
        return
    want = _normalize(_duck(sql))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_exact=True, check_dtype=False)
