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


#: SF_DIR -> connection with the table views registered.  One
#: connection + one view registration per scale dir instead of per
#: QUERY (r12, VERDICT r11 item 6): the 303-query sweep's wall was
#: dominated by a ~1 s/query floor, of which fresh-connection setup
#: and 10 view registrations per call were the oracle side's share.
#: Oracles are pure SELECTs over the views, so sharing a connection
#: changes nothing semantically; keyed by SF_DIR because the sweep
#: rebinds it (sweep.py sets P.SF_DIR).
_DUCK_CONS: dict[str, duckdb.DuckDBPyConnection] = {}


def _duck(sql: str) -> pd.DataFrame:
    con = _DUCK_CONS.get(SF_DIR)
    if con is None:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        _DUCK_CONS[SF_DIR] = con
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            non_null = s.dropna()
            if len(non_null) and not isinstance(non_null.iloc[0], str):
                try:
                    df[c] = pd.to_datetime(s)
                except (ValueError, TypeError):
                    pass  # non-datetime object column: leave as-is
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int64", "Int32", "Int64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


#: Queries allowed to return an empty frame at tiny scale factors.
#: Everything else must produce rows: an empty-but-oracle-matching
#: result is a degenerate query, not a passing one (the failure mode
#: u4's lifetime-set version and q11's absolute threshold actually
#: hit — both matched their oracles on zero rows).
_MAY_BE_EMPTY: set[str] = {
    # Empty at sf0.001 ONLY (both populated at the driver's sf0.01
    # gate and linear beyond): q22's no-order rich customers don't
    # exist in a 150-customer sample where every rich customer has
    # orders; q11's 2x-mean part threshold finds no tail in a
    # 200-part near-uniform sample.
    "tpch_q22",
    "tpch_q11",
}


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
    if name not in _MAY_BE_EMPTY:
        assert len(got) > 0, (
            f"{name}: oracle-matching but EMPTY — degenerate at this sf"
        )


def test_oracle_representation_lint():
    """No oracle may emit HUGEINT/UHUGEINT/DECIMAL output columns
    (VERDICT r7 item 2): the value compare above runs
    check_dtype=False, which is blind to DuckDB's type widening —
    pandas renders HUGEINT as float (1234567.0) while Spark emits
    int64 (1234567), a guaranteed driver hash-mismatch with correct
    values (w5's r6/r7 red rows).  Every oracle output column must be
    CAST to the Spark-side type.  DATE columns are tolerated by the
    driver's canonicalizer (u4's green row) — tracked in
    scripts/oracle_lint.py's NOTE channel, not failed here."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from oracle_lint import lint

    banned, _dates = lint(SF_DIR)
    assert not banned, (
        "oracle output columns with driver-hash-unsafe types: "
        + ", ".join(f"{q}.{c}:{t}" for q, c, t in banned)
    )
