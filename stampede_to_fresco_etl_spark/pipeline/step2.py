"""step-2 parity: FRESCO metrics × job accounting → 21-column wide
table.

Reference: step-2/consumer.py process_job/efficient_job_processing
(:295-591) — a per-job Python loop with hand-built batching.  Spark
shape (SURVEY §3.2): ONE declarative plan:

    metrics ⋈ broadcast(accounting)  on jid + [start, end)
      → job-aligned 1-min buckets, clamped, μs-floor midpoint
      → groupBy(job × host × bucket × Event).mean(Value)
      → pivot(Event → value_*) with fixed event list
      → host_list / enrichment columns
      → select(OUTPUT_COLUMNS)

Catalyst plans pushdown + broadcast-hash; executors replace the
thread/batch machinery; `write.partitionBy(month)` replaces the
manifest shuttle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import (
    normalize_job_id,
    parse_timestamp,
)
from stampede_to_fresco_etl_spark.operators.interval_join import (
    join_metrics_to_accounting,
)
from stampede_to_fresco_etl_spark.operators.pivot import (
    pivot_events,
    with_null_column,
)
from stampede_to_fresco_etl_spark.operators.windows import (
    DEFAULT_WINDOW_SECONDS,
    with_job_aligned_window,
)
from stampede_to_fresco_etl_spark.schemas import FRESCO_EVENTS, OUTPUT_COLUMNS


def parse_accounting(raw: DataFrame) -> DataFrame:
    """Parse raw accounting strings → typed table
    (load_accounting_data, step-2/consumer.py:178-223): timestamp
    parse (%m/%d/%Y %H:%M:%S, non-strict), drop rows missing any
    essential column — the reference's drop_nulls subset is
    ["start", "end", "submit", "jid"] (consumer.py:211), so a row
    with an unparseable submit time is discarded too."""
    df = (
        raw.withColumn("start", parse_timestamp("start"))
        .withColumn("end", parse_timestamp("end"))
        .withColumn("submit", parse_timestamp("submit"))
    )
    return df.dropna(subset=["jobID", "start", "end", "submit"])


def _bucketed(
    metrics: DataFrame,
    accounting: DataFrame,
    window_sec: int = DEFAULT_WINDOW_SECONDS,
):
    """metrics ⋈ accounting → job-aligned clamped buckets, grouped by
    the full wide-table key + Event — the shared front half of the
    batch plan and the per-micro-batch partial aggregation."""
    joined = join_metrics_to_accounting(metrics, accounting)

    # Job-aligned tumbling buckets clamped to job end; midpoint time
    # (consumer.py:406-424).
    joined = with_job_aligned_window(
        joined,
        ts_col="Timestamp",
        anchor_col="start",
        end_col="end",
        duration_sec=window_sec,
    )

    # group per (job, host, bucket, Event) (consumer.py:428-430).
    return joined.groupBy(
        "jid",
        F.col("Host").alias("host"),
        "time",
        F.col("submit").alias("submit_time"),
        F.col("start").alias("start_time"),
        F.col("end").alias("end_time"),
        F.col("walltime").alias("timelimit"),
        F.col("nnodes").alias("nhosts"),
        F.col("ncpus").alias("ncores"),
        "account",
        "queue",
        F.col("jobname").alias("jobname"),
        F.col("exit_status").alias("exitcode"),
        F.col("user").alias("username"),
        "Event",
    )


def partial_step2(
    metrics: DataFrame,
    accounting: DataFrame,
    window_sec: int = DEFAULT_WINDOW_SECONDS,
) -> DataFrame:
    """The ADDITIVE decomposition of the step-2 aggregate: (sum, n)
    per (wide key × Event).  mean is not mergeable across arrival
    batches, sum/count is — this is the state a streaming/incremental
    maintainer carries (streaming/step2_stream.py), and two partial
    frames merge exactly via `merge_partials`."""
    return _bucketed(metrics, accounting, window_sec).agg(
        F.sum("Value").alias("sum_value"),
        F.count("Value").alias("n_value"),
    )


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Merge partial (sum, n) frames: union + re-sum per group."""
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    keys = [c for c in merged.columns if c not in ("sum_value", "n_value")]
    return merged.groupBy(*keys).agg(
        F.sum("sum_value").alias("sum_value"),
        F.sum("n_value").alias("n_value"),
    )


def finish_step2(partials: DataFrame) -> DataFrame:
    """Back half of the step-2 plan from partial aggregates: mean =
    sum/n, pivot, value_gpu, host_list, output projection."""
    agg = partials.select(
        *[c for c in partials.columns if c not in ("sum_value", "n_value")],
        (F.col("sum_value") / F.col("n_value")).alias("avg_value"),
    )
    return _widen(agg)


def join_and_widen(
    metrics: DataFrame,
    accounting: DataFrame,
    window_sec: int = DEFAULT_WINDOW_SECONDS,
) -> DataFrame:
    """The whole step-2 dataflow as one plan (consumer.py:295-591)."""
    agg = _bucketed(metrics, accounting, window_sec).agg(
        F.avg("Value").alias("avg_value")
    )
    return _widen(agg)


def _widen(agg: DataFrame) -> DataFrame:
    # Pivot with the fixed 5-event list; value_gpu always null
    # (consumer.py:438-442,483-491).
    keys = [c for c in agg.columns if c not in ("Event", "avg_value")]
    wide = pivot_events(agg, keys, events=FRESCO_EVENTS)
    wide = with_null_column(wide, "value_gpu", "double")

    # host_list: sorted unique hosts of the JOB RECORD, attached to
    # every row (consumer.py:403-404).  The reference builds it per
    # accounting row, so the window partitions on (jid, start, end) —
    # two jobs whose ids normalize to the same jid keep separate host
    # lists — and empty/null hosts are dropped (filter(None, hosts)).
    # Computed POST-aggregation: hosts survive as group keys, and the
    # window shuffles the small wide frame instead of every joined
    # metric row — same result, ~|rows|/|buckets| less shuffle volume.
    w_job = Window.partitionBy("jid", "start_time", "end_time")
    wide = wide.withColumn(
        "host_list",
        F.array_join(
            F.sort_array(
                F.collect_set(
                    F.when(F.col("host") != "", F.col("host"))
                ).over(w_job)
            ),
            ",",
        ),
    )
    return wide.select(*OUTPUT_COLUMNS)


def run_step2(
    metrics: DataFrame,
    raw_accounting: DataFrame,
    window_sec: int = DEFAULT_WINDOW_SECONDS,
) -> DataFrame:
    """Convenience end-to-end: raw accounting parse + join/widen."""
    return join_and_widen(metrics, parse_accounting(raw_accounting), window_sec)


__all__ = [
    "parse_accounting",
    "join_and_widen",
    "partial_step2",
    "merge_partials",
    "finish_step2",
    "run_step2",
    "normalize_job_id",
]
