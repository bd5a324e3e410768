"""Pin the r13 session plan memo's safety criterion.

A query may appear in `catalog._PLAN_CACHED_QUERIES` only while its
construction is a PURE function of (session, sf_dir): two fresh
constructs must yield byte-identical physical plans (modulo
expression/plan-id counters), and the plan must contain no
ExistingRDD scan (a per-call localCheckpoint / pinned spread /
createDataFrame would make the memo reuse per-call state across
calls).  If an edit to any listed query introduces per-call state,
this test fails and the query must leave the list.
"""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"


def _norm_plan(df) -> str:
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"lambda [a-z]+_\d+", "lambda v", s)
    s = re.sub(r"_common_expr_\d+", "_common_expr_", s)
    return s


def test_plan_cached_queries_are_construct_pure(spark):
    from stampede_to_fresco_etl_spark.catalog import (
        _PLAN_CACHED_QUERIES,
        REGISTRY,
    )

    for name in _PLAN_CACHED_QUERIES:
        wrapped = REGISTRY[name][0]
        fn = wrapped.__wrapped__
        fn(spark, SF)  # first call may build session state (LUTs…)
        p1 = _norm_plan(fn(spark, SF))
        p2 = _norm_plan(fn(spark, SF))
        assert p1 == p2, f"{name}: construct not pure (plans differ)"
        assert "ExistingRDD" not in p1, (
            f"{name}: per-call RDD state in plan — not memo-safe"
        )


def test_plan_cache_memoizes_per_session_and_sf(spark):
    from stampede_to_fresco_etl_spark.catalog import (
        _QUERY_PLAN_CACHE,
        REGISTRY,
    )

    wrapped = REGISTRY["x28_ann_recall_audit"][0]
    a = wrapped(spark, SF)
    b = wrapped(spark, SF)
    assert a is b  # the memo
    # a different sf_dir misses the memo
    c = wrapped(spark, "/root/testdata/sf0.01")
    assert c is not a
    assert any(
        k[2] == "x28_ann_recall_audit" for k in _QUERY_PLAN_CACHE
    )


def test_plan_cache_result_not_persisted(spark):
    """The memoized plan holds no persisted blocks: every execution
    recomputes from parquet (the no-result-caching contract)."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    df = REGISTRY["x16_decontaminate"][0](spark, SF)
    df.write.mode("overwrite").format("noop").save()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "InMemoryTableScan" not in plan
    assert "ExistingRDD" not in plan


@pytest.mark.parametrize(
    "name", ["x28_ann_recall_audit", "x16_decontaminate"]
)
def test_plan_cached_results_match_uncached(spark, name):
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    wrapped = REGISTRY[name][0]
    got = sorted(map(tuple, wrapped(spark, SF).collect()))
    want = sorted(map(tuple, wrapped.__wrapped__(spark, SF).collect()))
    assert got == want
