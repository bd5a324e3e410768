"""Incremental ingest as Structured Streaming — replaces the
reference's watchdog/mover/appender machinery (step-1/mover.py,
step-1/appender.py:65-70,215-387) with the file source + checkpoint:

  - backlog scan + new-file detection → `readStream` file source;
  - per-target locks, temp+atomic-rename appends, retry/backoff →
    the streaming committer + checkpoint (exactly-once);
  - daily-file merging daemons → `partitionBy(date)` on the sink;
  - unbounded re-merge dedup (T6) → watermarked dropDuplicates
    (bounded state — the documented semantic deviation from the
    reference's unbounded dedup; batch mode remains bit-exact).

Scale notes: the file source lists incrementally
(maxFilesPerTrigger bounds batch size); state for dedup is bounded by
the watermark horizon; sinks write zstd parquet partitioned by date
so downstream partition pruning works identically to batch mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from stampede_to_fresco_etl_spark.schemas import FRESCO_LONG


def read_event_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType = FRESCO_LONG,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source over a landing directory.  Picks up the
    startup backlog AND new arrivals exactly once (subsumes
    appender.process_existing_files + watchdog on_created)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(landing_dir)


def deduped(
    stream: DataFrame,
    ts_col: str = "Timestamp",
    watermark: str = "10 minutes",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Late/duplicate handling (T6): drop duplicate events within the
    watermark horizon.  The reference re-merged daily files and ran
    unique() unboundedly; a stream must bound state."""
    keys = key_cols or ["Job Id", "Host", ts_col, "Event"]
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)


def write_daily_sink(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "Timestamp",
    available_now: bool = True,
) -> StreamingQuery:
    """Date-partitioned zstd parquet sink with checkpointed
    exactly-once semantics (replaces appender's locked atomic-rename
    appends).  `available_now=True` drains the backlog then stops —
    the batch-catchup mode; pass False for a continuous daemon."""
    out = stream.withColumn("date", F.to_date(F.col(ts_col)))
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .option("compression", "zstd")
        .partitionBy("date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def minute_rollup(
    stream: DataFrame,
    ts_col: str = "Timestamp",
    watermark: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    """Streaming analog of the step-2 window aggregation: watermarked
    1-minute tumbling mean per (Job Id, Host, Event).  Append-mode
    emits each window once its watermark passes — the streaming
    counterpart of the batch job-aligned windows (which stay batch
    because they need the job's full [start,end) extent)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            "Job Id",
            "Host",
            "Event",
        )
        .agg(
            F.avg("Value").alias("avg_value"),
            F.count("*").alias("n_samples"),
        )
        .select(
            F.col("win").start.alias("window_start"),
            F.col("win").end.alias("window_end"),
            "Job Id",
            "Host",
            "Event",
            "avg_value",
            "n_samples",
        )
    )


def run_incremental_pipeline(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    dedup_watermark: str = "10 minutes",
) -> StreamingQuery:
    """End-to-end incremental mode: landing dir → watermarked dedup →
    daily-partitioned parquet, exactly-once."""
    stream = read_event_stream(spark, landing_dir)
    return write_daily_sink(
        deduped(stream, watermark=dedup_watermark),
        out_dir,
        checkpoint_dir,
    )


def stream_stream_attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    p_ts: str = "p_ts",
    c_ts: str = "c_ts",
    lookback_seconds: int = 3600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join — the attribution shape
    (batch twin: the j10 interval-overlap join): each purchase joins
    the same user's clicks that happened within `lookback_seconds`
    BEFORE it.

    The 100 TB contract is the state bound: BOTH sides carry event-time
    watermarks and the join condition constrains the two event times
    against each other, so Spark can evict buffered rows once the
    watermark passes `ts + lookback` — an equality-only stream-stream
    join would buffer both streams forever.  Column names must already
    be disjoint (streaming joins have no alias scoping on the state
    store keys)."""
    p = purchases.withWatermark(p_ts, watermark)
    c = clicks.withWatermark(c_ts, watermark)
    cond = (
        (p[key] == c[f"c_{key}"])
        & (c[c_ts] >= p[p_ts] - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
        & (c[c_ts] <= p[p_ts])
    )
    return p.join(c, cond, "inner")


def run_upsert_stream(
    spark: SparkSession,
    landing_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    key_cols: list[str],
    order_cols: list[str],
) -> StreamingQuery:
    """Streaming keyed upsert — the foreachBatch twin of the batch
    latest-wins kernel (catalog s19): each micro-batch merges into a
    parquet snapshot under MERGE semantics (updates replace, new keys
    insert, untouched keys survive), latest (order_cols) winning per
    key_cols.

    Mechanics per batch: read current snapshot (if any) ∪ batch →
    ONE row_number window on the merge key → rewrite the snapshot
    through a tmp-dir + atomic-rename swap (write-then-overwrite of
    the frame being read would race the lazy scan).  State is bounded
    by LIVE KEYS, not history — the property that lets an upsert sink
    run forever.  Exactly-once across restarts comes from the file
    source + checkpoint; replaying a batch is idempotent because the
    merge is deterministic."""
    from pyspark.sql import Window as W

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        try:
            current = s.read.parquet(snapshot_dir)
            merged = current.unionByName(batch_df)
        except Exception:
            merged = batch_df
        w = W.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        jvm = s._jvm
        conf = s._jsc.hadoopConfiguration()
        live = jvm.org.apache.hadoop.fs.Path(snapshot_dir)
        fs = live.getFileSystem(conf)
        tmp_s = snapshot_dir.rstrip("/") + "__upsert_tmp"
        latest.write.mode("overwrite").parquet(tmp_s)
        tmp = jvm.org.apache.hadoop.fs.Path(tmp_s)
        if fs.exists(live):
            fs.delete(live, True)
        if not fs.rename(tmp, live):
            raise IOError(f"upsert: could not swap in {tmp_s}")

    stream = spark.readStream.schema(schema).parquet(landing_dir)
    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_rollup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "Timestamp",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    value_col: str = "Value",
) -> DataFrame:
    """Streaming sessionization — the native Structured Streaming
    twin of the batch gap-sessionize operator (operators/windows.
    sessionize): `session_window` opens a session at the first event
    per key and extends it while events arrive within `gap`; the
    watermark closes sessions and bounds state.  Events in the same
    micro-batch AND across micro-batches merge into one session as
    long as they fall inside the gap — state the batch operator gets
    for free from its global window sort.

    Append-mode output: one row per closed session."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *key_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("sw").start.alias("session_start"),
            F.col("sw").end.alias("session_end"),
            *key_cols,
            "n_events",
            "sum_value",
        )
    )
