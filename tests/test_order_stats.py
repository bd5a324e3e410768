"""operators/order_stats.py — exact distributed positional selection.

Unit parity vs pandas on adversarial shapes (ties, singleton groups,
groups smaller than the partition count), plus the plan canaries for
the positional-quantile family: after the r6 rewrite none of
a16/x25/x31/w12 may rank the raw table inside a per-group serial
window (VERDICT r5 finding 1 — `row_number` over a 5-value partition
key is a straggler at 100×)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.operators.order_stats import (
    positional_select,
)

MEDIAN_RANKS = [
    ("lo", lambda n: F.floor((n + 1) / 2).cast("long")),
    ("hi", lambda n: F.floor((n + 2) / 2).cast("long")),
]


def _pandas_rank_value(vals, k):
    return sorted(vals)[k - 1]


def _check_median(spark, rows, num_partitions=None):
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["n"], r["lo"], r["hi"])
        for r in positional_select(
            df, ["g"], "v", MEDIAN_RANKS, num_partitions=num_partitions
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    for g, sub in pdf.groupby("g"):
        n = len(sub)
        want_lo = _pandas_rank_value(sub["v"], (n + 1) // 2)
        want_hi = _pandas_rank_value(sub["v"], (n + 2) // 2)
        assert got[g] == (n, want_lo, want_hi), (g, got[g])
    assert set(got) == set(pdf["g"].unique())


def test_median_ranks_basic(spark):
    rows = [("a", v) for v in [5, 1, 9, 3, 7]] + [
        ("b", v) for v in [10, 20, 30, 40]
    ]
    _check_median(spark, rows)


def test_ties_and_singletons(spark):
    # runs of equal values: any tie order selects the same value
    rows = (
        [("a", 2)] * 10
        + [("a", 1)] * 3
        + [("a", 3)] * 4
        + [("solo", 42)]
    )
    _check_median(spark, rows)


def test_groups_smaller_than_partitions(spark):
    # P far larger than any group: most range partitions empty or
    # single-row; offsets must still chain correctly
    rows = [("g%d" % (i % 7), (i * 37) % 101) for i in range(50)]
    _check_median(spark, rows, num_partitions=32)


def test_multiple_quantiles_one_pass(spark):
    rows = [("a", v) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = positional_select(
        df,
        ["g"],
        "v",
        [
            ("p05", lambda n: (F.floor((n - 1) * 5 / 100) + 1).cast("long")),
            ("q1", lambda n: F.floor((n + 3) / 4).cast("long")),
            ("q3", lambda n: F.floor((3 * n + 1) / 4).cast("long")),
            ("p95", lambda n: (F.floor((n - 1) * 95 / 100) + 1).cast("long")),
        ],
    ).collect()[0]
    # nearest-rank on 1..100: p05=row 5, q1=row 25, q3=row 75, p95=row 95
    assert (out["p05"], out["q1"], out["q3"], out["p95"]) == (5, 25, 75, 95)
    assert out["n"] == 100


def test_composite_group_key(spark):
    rows = [
        ("a", 0, 1), ("a", 0, 3), ("a", 1, 5),
        ("b", 0, 2), ("b", 0, 4), ("b", 0, 6),
    ]
    df = spark.createDataFrame(rows, "g string, h int, v long")
    got = {
        (r["g"], r["h"]): (r["lo"], r["hi"])
        for r in positional_select(
            df, ["g", "h"], "v", MEDIAN_RANKS
        ).collect()
    }
    assert got == {("a", 0): (1, 3), ("a", 1): (5, 5), ("b", 0): (4, 4)}


def test_quantile_family_never_ranks_raw_table(spark):
    """a16/x25/x31/w12 plan canary: no ranking window over the data —
    the only Window nodes sit above the (pid, group) count aggregate
    (bounded by P·G rows), the data side reaches its final aggregate
    through a BroadcastHashJoin, and no SortMergeJoin appears.

    Exchange budgets are STATIC-plan counts: since r13 removed the
    kernel's localCheckpoint, the range exchange appears once per
    consumer in the static tree (two consumers → +2 over the r12
    budget) but AQE's stage cache deduplicates the identical
    subtrees at runtime — the executed shuffle count is unchanged
    (uncached parquet bases; verified r13)."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    sf = "/root/testdata/sf0.001"
    budgets = {
        "a16_exact_median": 5,
        "x25_iqr_outliers": 6,
        "x31_winsorize": 5,
        "w12_seasonal_residuals": 5,
    }
    for name, max_ex in budgets.items():
        fn = REGISTRY[name][0]
        # bypass the r13 session plan memo: inspect a FRESH construct,
        # never an earlier test's executed (AQE-final) plan
        df = getattr(fn, "__wrapped__", fn)(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "row_number" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        got = plan.count("- Exchange (")
        assert got <= max_ex, (name, got, max_ex)


def test_prefix_sum_with_running_min_vs_pandas(spark):
    """Parallel two-pass scan ≡ serial scan, on a shape that forces
    groups to straddle many range partitions (num_partitions far
    above rows/group) with negative values so the running min moves
    mid-stream."""
    import random

    from stampede_to_fresco_etl_spark.operators.order_stats import (
        prefix_sum_with_running_min,
    )

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", i, rng.randint(-50, 40)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, seq long, v long")
    got = {
        (r["g"], r["seq"]): (r["pt"], r["minp"])
        for r in prefix_sum_with_running_min(
            df, ["g"], ["seq"], "v", num_partitions=32
        ).collect()
    }
    by_g: dict = {}
    for g, seq, v in sorted(rows, key=lambda t: (t[0], t[1])):
        pt, mn = by_g.get(g, (0, None))
        pt += v
        mn = pt if mn is None else min(mn, pt)
        by_g[g] = (pt, mn)
        assert got[(g, seq)] == (pt, mn), (g, seq, got[(g, seq)], (pt, mn))
    assert len(got) == len(rows)


def test_prefix_scan_single_row_groups(spark):
    from stampede_to_fresco_etl_spark.operators.order_stats import (
        prefix_sum_with_running_min,
    )

    rows = [("a", 1, -5), ("b", 1, 7)]
    df = spark.createDataFrame(rows, "g string, seq long, v long")
    got = {
        r["g"]: (r["pt"], r["minp"])
        for r in prefix_sum_with_running_min(
            df, ["g"], ["seq"], "v"
        ).collect()
    }
    assert got == {"a": (-5, -5), "b": (7, 7)}


def test_w11_adaptive_scan_both_paths(spark, monkeypatch):
    """w11's adaptive prefix pair: at test scale the serial windows
    run (below the measured crossover); with the threshold forced to
    0 the parallel scan kernel runs — its plan must carry NO
    PARTITION BY event_type ORDER BY ts window (one task per type),
    and its values must equal the serial path's exactly."""
    import re

    import stampede_to_fresco_etl_spark.catalog as C

    sf = "/root/testdata/sf0.001"
    serial = (
        C.REGISTRY["w11_cusum_drift"][0](spark, sf)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    monkeypatch.setattr(C, "_W11_SERIAL_MAX_ROWS", 0)
    # fresh construct (bypass the session plan memo): the memo key is
    # (session, sf_dir, name) — legitimately blind to a monkeypatched
    # threshold — and this canary needs the kernel-path PLAN
    df = C.REGISTRY["w11_cusum_drift"][0].__wrapped__(spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert not re.findall(
        r"windowspecdefinition\(event_type#\d+, ts#", plan
    )
    assert "SortMergeJoin" not in plan
    kernel = df.toPandas().set_index("event_id").sort_index()
    pd.testing.assert_frame_equal(serial, kernel, check_exact=True)


def test_hot_value_spreads_across_partitions(spark):
    """Value-skew guard: a RangePartitioner never splits equal keys,
    so without the salt a value held by 80% of rows would land in
    ONE partition.  With the salt in the range key the hot value's
    rows must occupy many partitions — and the selection stays
    exact."""
    from pyspark.sql import functions as SF

    rows = [("a", 7)] * 8000 + [("a", v) for v in range(1000)] + [
        ("a", v) for v in range(100000, 101000)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    # spread check on the kernel's own partitioning
    part = (
        df.withColumn("__salt", SF.monotonically_increasing_id())
        .repartitionByRange(32, "g", "v", "__salt")
        .withColumn("__pid", SF.spark_partition_id())
    )
    hot_pids = (
        part.filter(SF.col("v") == 7)
        .select("__pid")
        .distinct()
        .count()
    )
    assert hot_pids >= 8, hot_pids  # not one fat partition
    _check_median(spark, rows, num_partitions=32)
