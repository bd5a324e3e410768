"""Skew rehearsal: hot-job interval join at 10M rows (SCALE.md §skew).

Synthesizes a metric stream where ONE job carries half of all rows —
the classic telemetry hot key — and runs the non-broadcast interval
join (bucketed_interval_join, the fallback when accounting is too big
to broadcast, so the join SHUFFLES on (bucket, jid) and the hot jid
lands on one reducer).  Measures the per-task executor-time spread of
the shuffle-join stage from the UI REST API with AQE skew-join
splitting ON vs OFF, and verifies both plans return identical rows.

Skew thresholds are demo-scaled (32 MB / 8 MB advisory) because a 5M-
row hot partition is ~hundreds of MB where the production default
(256 MB) sits; at 100 TB the defaults trigger without tuning.

Run:  python scripts/skew_rehearsal.py [n_rows] [n_jobs]
Prints one JSON line per mode: task-time quantiles of the join stage.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from stampede_to_fresco_etl_spark.operators.interval_join import (  # noqa: E402
    bucketed_interval_join,
)
from stampede_to_fresco_etl_spark.session import get_spark  # noqa: E402

BASE = "2013-03-01 00:00:00"


def synth(spark, n_rows: int, n_jobs: int):
    """events: hot job J0 owns 50% of rows; intervals: one hour/job,
    all inside one day (one coarse bucket — worst case: the shuffle
    key degenerates to the jid)."""
    ev = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("J0"))
            .otherwise(F.concat(F.lit("J"), (F.col("id") % n_jobs)))
            .alias("jid"),
            F.concat(F.lit("h"), F.col("id") % 64).alias("host"),
            F.timestamp_micros(
                F.unix_micros(F.to_timestamp(F.lit(BASE)))
                + (F.col("id") % 3_000) * 1_000_000
            ).alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
    )
    iv = spark.range(n_jobs).select(
        F.concat(F.lit("J"), F.col("id")).alias("jid"),
        F.to_timestamp(F.lit(BASE)).alias("start"),
        F.timestamp_micros(
            F.unix_micros(F.to_timestamp(F.lit(BASE))) + 3_600 * 1_000_000
        ).alias("end"),
    )
    return ev, iv


def run_join(ev, iv):
    out = bucketed_interval_join(
        ev, iv.withColumnRenamed("jid", "ijid"),
        event_key="jid", interval_key="ijid",
        ts_col="ts", start_col="start", end_col="end",
    )
    t0 = time.perf_counter()
    n = out.count()
    return n, time.perf_counter() - t0


def stage_summaries(spark, seen: set[int]):
    """Task-time quantiles for NEW completed stages with shuffle reads."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        stages = json.load(r)
    out = []
    for s in stages:
        sid = s["stageId"]
        if sid in seen:
            continue
        seen.add(sid)
        if s.get("shuffleReadBytes", 0) == 0:
            continue
        url = (
            f"{base}/api/v1/applications/{app}/stages/{sid}/"
            f"{s['attemptId']}/taskSummary?quantiles=0.0,0.5,0.99,1.0"
        )
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                q = json.load(r)
        except Exception:
            continue
        rt = q.get("executorRunTime", [0, 0, 0, 0])
        out.append(
            {
                "stage": sid,
                "tasks": s["numCompleteTasks"],
                "shuffle_read_mb": round(s["shuffleReadBytes"] / 2**20, 1),
                "task_ms_min": rt[0],
                "task_ms_p50": rt[1],
                "task_ms_p99": rt[2],
                "task_ms_max": rt[3],
            }
        )
    return out


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_jobs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark(
        app_name="skew-rehearsal",
        extra_conf={
            "spark.ui.enabled": "true",
            # demo-scaled skew thresholds (defaults are cluster-sized)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "32m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            # force the shuffle path (no auto-broadcast of the 10k
            # interval side — the whole point is the fallback join)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev, iv = synth(spark, n_rows, n_jobs)
    ev = ev.localCheckpoint()  # measure the join, not the synth
    iv = iv.localCheckpoint()

    seen: set[int] = set()
    results = {}
    for mode, flag in (("skew_split_on", "true"), ("skew_split_off", "false")):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
        n, wall = run_join(ev, iv)
        time.sleep(0.3)  # status store drains async
        stages = stage_summaries(spark, seen)
        join_stage = max(
            stages, key=lambda s: s["shuffle_read_mb"], default=None
        )
        results[mode] = {"rows": n, "wall_sec": round(wall, 2),
                         "join_stage": join_stage}
        print(json.dumps({mode: results[mode]}))

    same = results["skew_split_on"]["rows"] == results["skew_split_off"]["rows"]
    print(json.dumps({"rows_equal": same,
                      "n_rows": n_rows, "n_jobs": n_jobs}))


if __name__ == "__main__":
    main()
