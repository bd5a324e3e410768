"""Time bucketing — SURVEY §2.6 T1-T5.

The reference emulates tumbling windows with a per-job while-loop
slicing `[start, start + 1min)` clamped to the job end
(step-2/consumer.py:406-424).  Two subtleties survive into the Spark
version (SURVEY §7.3 traps 4/5):

  - buckets are aligned to EACH JOB'S start, not wall-clock minutes,
    so `F.window()`'s default alignment is wrong; bucketing is integer
    μs arithmetic keyed per job;
  - the last bucket is truncated (clamped) at the job end, and the
    output `time` is the μs-floor midpoint of the CLAMPED interval.

All of it is pure column arithmetic — no shuffle beyond the groupBy
that consumes the bucket column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import aligned_bucket_start, midpoint

#: Canonical aggregation window (step-2/consumer.py:27); legacy 5-min
#: variant at step-3.1/old/consumer_2.py:26.
DEFAULT_WINDOW_SECONDS = 60


def with_job_aligned_window(
    df: DataFrame,
    ts_col: str = "Timestamp",
    anchor_col: str = "start",
    end_col: str = "end",
    duration_sec: int = DEFAULT_WINDOW_SECONDS,
    out_start: str = "bucket_start",
    out_end: str = "bucket_end",
    out_time: str = "time",
) -> DataFrame:
    """Add job-aligned tumbling-bucket columns + clamped midpoint.

    bucket_start = anchor + floor((ts-anchor)/dur)*dur
    bucket_end   = min(bucket_start + dur, job end)   (clamp)
    time         = μs-floor midpoint of [bucket_start, bucket_end)
    (step-2/consumer.py:406-424,412-414)
    """
    dur = F.lit(duration_sec)
    b0 = aligned_bucket_start(F.col(ts_col), F.col(anchor_col), duration_sec)
    df = df.withColumn(out_start, b0)
    df = df.withColumn(
        out_end,
        F.least(
            F.timestamp_micros(
                F.unix_micros(F.col(out_start))
                + dur.cast("long") * F.lit(1_000_000)
            ),
            F.col(end_col),
        ),
    )
    return df.withColumn(out_time, midpoint(F.col(out_start), F.col(out_end)))


def with_tumbling_window(
    df: DataFrame,
    ts_col: str,
    duration: str = "1 minute",
    out: str = "window",
) -> DataFrame:
    """Wall-clock-aligned tumbling window via native F.window — the
    streaming-friendly variant (used where job alignment is not
    required; cf. legacy 5-min consumer labeling buckets by start,
    step-3.1/old/consumer_2.py:439-450)."""
    return df.withColumn(out, F.window(F.col(ts_col), duration))


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_sec: float,
    order_cols: list[str] | None = None,
    out: str = "session_seq",
) -> DataFrame:
    """Gap-based session windows: a new session starts whenever the
    gap to the previous event of the same key exceeds `gap_sec`.
    Adds `out` = 1-based session index per key (running count of
    session breaks — the classic lag + cumulative-sum formulation).

    One window over (key) — a single shuffle keyed by the (high-
    cardinality) entity, exactly the partitioning the rate kernel
    uses, so sessionizing 100 TB of events costs one exchange.
    `order_cols` supplies deterministic tie-breakers for same-
    timestamp events (default: ts only)."""
    from pyspark.sql import Window as W

    from stampede_to_fresco_etl_spark.functions import seconds_between

    order = order_cols or [ts_col]
    w = W.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    is_break = F.when(
        prev.isNull()
        | (seconds_between(F.col(ts_col), prev) > F.lit(float(gap_sec))),
        1,
    ).otherwise(0)
    run = W.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn(out, F.sum(is_break).over(run))


def with_day(df: DataFrame, ts_col: str, out: str = "date") -> DataFrame:
    """Calendar day key for partitioned writes
    (step-1/transformer.py:394-401)."""
    return df.withColumn(out, F.to_date(F.col(ts_col)))


def with_month(df: DataFrame, ts_col: str, out: str = "year_month") -> DataFrame:
    """Calendar month key 'yyyy-MM'
    (utils/organize_parquet_files_into_month_dirs.py:21-47)."""
    return df.withColumn(out, F.date_format(F.col(ts_col), "yyyy-MM"))


def rolling_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Trailing time-range rolling aggregates per key: for every row,
    count/sum/min/max of `value_col` over the key's rows in
    [ts − window, ts] — the moving-average / burst-detection shape of
    telemetry analytics, and the batch twin of a sliding stream
    window.

    RANGE framing over integer microseconds, not ROWS: irregular
    sampling means "last N rows" and "last N seconds" disagree, and
    the μs long ordering makes the frame bound exact in any engine
    (timestamp RANGE frames differ in interval semantics across
    engines; integers don't).  Ties on (key, ts) are all peers of the
    frame in RANGE mode, so output is deterministic regardless of row
    order within a timestamp.

    One shuffle on the key (the window's partitionBy); the rolling
    frame itself is a per-partition sliding computation.  A hot key
    concentrates its rows on one reducer — the same hazard and the
    same remedies as every per-key window (SCALE.md §skew).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(us)
        .rangeBetween(-int(window_seconds) * 1_000_000, 0)
    )
    v = F.col(value_col)
    return df.select(
        *key_cols,
        *(extra_cols or []),  # row-identity passthrough (no window role)
        F.col(ts_col),
        v,
        F.count(v).over(w).alias("roll_n"),
        F.sum(v).over(w).alias("roll_sum"),
        F.min(v).over(w).alias("roll_min"),
        F.max(v).over(w).alias("roll_max"),
    )


def resample_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Regular-grid resampling with forward fill — the gap-filling
    pass a telemetry pipeline runs before rate math or ML feature
    extraction when collectors drop samples (the reference's node
    metrics assume a complete 1-min grid; this manufactures one).

    Per key: bucket samples to the step (multiple samples per bucket
    max-pool), span the grid from the key's first to last bucket
    (`sequence` + explode — no driver-side loop), left-join the
    samples back, and carry the last observed value across the gaps
    with an IGNORE NULLS running window.  `is_gap` marks manufactured
    rows so downstream can weight or drop them.

    Bucket arithmetic is all-integer (`us - us % step`), so any
    engine reproduces the grid exactly — no float division of epoch
    micros.

    Scale shape: one hash-agg (bucketing), one tiny span-agg, one
    explode whose output is the GRID (bounded by span/step per key,
    independent of sample count), one keyed left join, one per-key
    ordered window over grid rows.  Each shuffles on the entity key;
    per-key window size is the grid length, not the raw sample
    count — dense keys cost the same as sparse ones."""
    from pyspark.sql import Window

    step = int(step_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    cond = F.col(value_col).isNotNull()
    for k in key_cols:
        cond = cond & F.col(k).isNotNull()
    b = (
        df.filter(cond)
        .select(
            *key_cols,
            (us - F.pmod(us, F.lit(step))).alias("bucket"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.max("__v").alias("v"))
    )
    spans = b.groupBy(*key_cols).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    # explicit key-hash spread of the SPANS before the grid explode
    # (r12): AQE sizes the post-agg exchange by the tiny spans
    # table's bytes and cannot see the sequence-explode fan-out (one
    # row per key -> one row per grid bucket), so the explode + join
    # + window all ran as 1-2 tasks at any spans size (measured: a
    # 971 ms single task carried the whole window pass at sf0.1).
    # Repartitioning the PRE-explode spans moves only one row per key
    # and fans the generator itself out; keying by the entity
    # satisfies the window's clustering (no later exchange).  The
    # count is 4x cores ON PURPOSE: at exactly the session's
    # shuffle-partition count the exchange is provably redundant with
    # the spans agg's partitioning and the optimizer elides it,
    # collapsing the stage back to the spans sizing (observed); the
    # offset count also bounds per-task grid length.  The same
    # byte-blind fan-out exists at every scale — spans are one row
    # per KEY while the grid is span/step rows.
    spans = spans.repartition(
        4 * df.sparkSession.sparkContext.defaultParallelism, *key_cols
    )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(step))
        ).alias("bucket"),
    )
    j = grid.join(b, [*key_cols, "bucket"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        *key_cols,
        F.timestamp_micros(F.col("bucket")).alias("bucket_ts"),
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v").isNull().alias("is_gap"),
    )


def coalesce_intervals(
    df: DataFrame,
    key_cols: list[str],
    s_col: str,
    e_col: str,
    order_extra: list[str] | None = None,
) -> DataFrame:
    """Interval union: merge overlapping-or-touching [s, e] intervals
    per key into maximal disjoint spans (uptime/coverage/entitlement
    flattening).

    The sequential sweep-line becomes two running windows on ONE
    key-sorted pass: prev_max_end = running max of ends over
    [unbounded, 1 preceding]; a new span starts where
    s > prev_max_end; span id = running sum of the start flags (the
    islands trick in interval form).  `order_extra` extends the sort
    tiebreak (the order among identical (s, e) rows is immaterial to
    the result, but a total order keeps the plan deterministic).

    Output: key_cols + (span_start, span_end, n_merged), spans
    pairwise disjoint and strictly increasing per key."""
    order = [s_col, e_col, *(order_extra or [])]
    prev = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max = F.max(e_col).over(prev)
    # the first row of each key has no preceding max — gate on NULL
    # rather than a numeric sentinel so the kernel works for any
    # orderable start type (long, timestamp, date) and a NULL start
    # never silently folds into the previous span.
    flagged = df.withColumn(
        "__new",
        F.when(
            prev_max.isNull() | (F.col(s_col) > prev_max),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("__span", F.sum("__new").over(run))
    return (
        flagged.groupBy(*key_cols, "__span")
        .agg(
            F.min(s_col).alias("span_start"),
            F.max(e_col).alias("span_end"),
            F.count("*").alias("n_merged"),
        )
        .drop("__span")
    )
