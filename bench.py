#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall-clock seconds.

Queries are fully executed via the `noop` sink (all partitions
materialized, nothing collected to the driver)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stampede_to_fresco_etl_spark.catalog import REGISTRY  # noqa: E402
from stampede_to_fresco_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "a1_groupby_sum",
    "w1_rate_kernel",
    "j1_interval_join",
    "j1b_interval_join_bucketed",
    "t1_tumbling_window",
    "a6_pivot_events",
    "q3_join_agg_broadcast",
    "p8_union_dedup",
    "step2_fresco_wide",
    "d1_exact_dedup",
    "d2_minhash_lsh",
    "d3_simhash",
    "v1_cosine_topk",
    "v3_embedding_near_dups",
    "q5_nation_revenue",
    "x1_token_stats",
    "mm2_decode_meta",
    "f16_json_extract",
    "d5_dup_clusters",
    "k1_kmv_distinct",
    "x6_keyword_topk",
    "x9_pack_chunks",
    "tpch_q1",
    "tpch_q10",
]

#: Previous round's bench (same sf) for per-query regression deltas.
PREV_BENCH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path once with a trivial action.
    spark.range(1000).count()

    warmup = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _sql = REGISTRY[name]
        # untimed warmup run(s): measure the engine, not first-query
        # codegen/plan-compilation overhead
        for _ in range(warmup):
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # per-query delta vs the previous round's bench (only comparable
    # at the same scale factor) so regressions are visible at a glance
    try:
        with open(PREV_BENCH) as f:
            prev = json.load(f)
        # the driver wraps our JSON line under "parsed"
        prev = prev.get("parsed", prev)
        if prev.get("sf") == sf:
            out["vs_prev"] = {
                name: round(t - prev["queries"][name], 3)
                for name, t in timings.items()
                if name in prev.get("queries", {})
            }
    except (OSError, ValueError, KeyError):
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
