"""step-1 parity: raw node telemetry CSVs → FRESCO long event table.

Reference: step-1/data_processor.py (process_block_file :86-144,
process_cpu_file :146-230, process_llite_file :232-296,
process_memory_metrics :298-363) orchestrated by
step-1/transformer.py:342-470.

Spark shape (SURVEY §3.1): one declarative plan per metric type —
read → clean → (rollup) → lag-diff window → rate arithmetic →
project to the long schema — then unionByName and a
`partitionBy(date)` write.  The reference's 500-node write batching,
in-memory date dict, and daily-concat daemons disappear: the shuffle
handles grouping and the committer handles files.

Unit constants (step-1/data_processor.py:20-22):
  SECTOR_SIZE=512 bytes, 2^30 bytes/GB, 2^20 bytes/MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import (
    horizontal_sum,
    parse_timestamp,
    safe_div,
    to_fresco_job_id,
    validate_metric,
)
from stampede_to_fresco_etl_spark.operators.rates import (
    lag_deltas,
    rate,
    valid_rate_rows,
)
from stampede_to_fresco_etl_spark.schemas import JIFFY_COLS

SECTOR_BYTES = 512.0
BYTES_PER_GB = float(2**30)
BYTES_PER_MB = float(2**20)

KEYS = ["jobID", "node"]


def _clean(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """Shared prologue: parse timestamps (non-strict, two formats),
    drop rows with null essentials, zero-fill counters
    (step-1/data_processor.py:96-106)."""
    df = df.withColumn("ts", parse_timestamp("timestamp"))
    df = df.dropna(subset=["jobID", "node", "ts"])
    return df.fillna(0.0, subset=value_cols)


def _finish(df: DataFrame, event: str, units: str, value: F.Column) -> DataFrame:
    """Shared epilogue: project to the FRESCO long schema with
    normalized job ids (step-1/data_processor.py:132-140)."""
    return df.select(
        to_fresco_job_id(F.col("jobID")).alias("Job Id"),
        F.col("node").alias("Host"),
        F.col("ts").alias("Timestamp"),
        F.lit(event).alias("Event"),
        value.cast("double").alias("Value"),
        F.lit(units).alias("Units"),
    )


def process_block(raw: DataFrame) -> DataFrame:
    """block.csv → `block` events in GB/s
    (step-1/data_processor.py:86-144).

    Σ_devices(rd+wr sectors) per (job,node,ts) → Δ over (job,node) →
    Δsectors×512 / Δt / 2^30, clipped ≥0.  Device rollup happens
    BEFORE the delta (SURVEY §7.3 traps 1/2)."""
    df = _clean(raw, ["rd_sectors", "wr_sectors"])
    df = df.groupBy("jobID", "node", "ts").agg(
        F.sum(F.col("rd_sectors") + F.col("wr_sectors")).alias("total_sectors")
    )
    df = lag_deltas(df, KEYS, "ts", ["total_sectors"])
    df = valid_rate_rows(df, ["total_sectors_delta"])
    value = validate_metric(
        rate(
            F.col("total_sectors_delta"),
            F.col("dt_seconds"),
            SECTOR_BYTES / BYTES_PER_GB,
        ),
        lo=0.0,
    )
    return _finish(df, "block", "GB/s", value)


def process_cpu(raw: DataFrame) -> DataFrame:
    """cpu.csv → `cpuuser` events in CPU %
    (step-1/data_processor.py:146-230).

    Σ_cores per (job,node,ts) of 7 jiffy counters → per-column Δ over
    (job,node) → user_Δ / Σ(all 7 Δ) × 100, clip [0,100].

    Filter parity (:164-166, :209-211): rows with a null device are
    dropped BEFORE the core rollup; the ONLY delta filter is
    `total_jiffies_delta > 0` — unlike the rate kernels there is no
    Δt threshold and no per-column negative-delta drop (a negative
    individual jiffy delta, e.g. after a core-count change, is kept
    and the ratio is clipped into [0,100])."""
    df = _clean(raw, JIFFY_COLS)
    df = df.dropna(subset=["device"])
    df = df.groupBy("jobID", "node", "ts").agg(
        *[F.sum(c).alias(c) for c in JIFFY_COLS]
    )
    df = lag_deltas(df, KEYS, "ts", JIFFY_COLS)
    delta_cols = [c + "_delta" for c in JIFFY_COLS]
    df = df.withColumn("total_delta", horizontal_sum(delta_cols))
    df = df.filter(F.col("total_delta") > 0)
    value = validate_metric(
        safe_div(F.col("user_delta"), F.col("total_delta")) * 100.0,
        lo=0.0,
        hi=100.0,
    )
    return _finish(df, "cpuuser", "CPU %", value)


def process_llite(raw: DataFrame) -> DataFrame:
    """llite.csv → `nfs` events in MB/s
    (step-1/data_processor.py:232-296).

    (read_bytes+write_bytes) Δ over (job,node) / Δt / 2^20, clip ≥0.
    NOTE: the executed reference does NOT re-aggregate duplicate
    timestamps for llite (:254-262 commented out) — we follow the
    executed code (SURVEY §7.3 trap 2)."""
    df = _clean(raw, ["read_bytes", "write_bytes"])
    df = df.withColumn("total_bytes", F.col("read_bytes") + F.col("write_bytes"))
    df = lag_deltas(df, KEYS, "ts", ["total_bytes"])
    df = valid_rate_rows(df, ["total_bytes_delta"])
    value = validate_metric(
        rate(F.col("total_bytes_delta"), F.col("dt_seconds"), 1.0 / BYTES_PER_MB),
        lo=0.0,
    )
    return _finish(df, "nfs", "MB/s", value)


def process_mem(raw: DataFrame) -> DataFrame:
    """mem.csv → `memused` + `memused_minus_diskcache` events in GB
    (step-1/data_processor.py:298-363).

    Pure gauge projections — no window function:
      memused                 = MemUsed / 2^30            clip ≥0
      memused_minus_diskcache = (MemUsed - FilePages)/2^30 clip ≥0
    All gauges are zero-filled BEFORE the math (:309-314); the
    MemTotal-MemFree fallback only applies when the MemUsed column is
    absent entirely (:317-327), so per-row MemUsed stays canonical."""
    df = _clean(raw, ["MemTotal", "MemFree", "MemUsed", "FilePages"])
    mem_used = (
        F.col("MemUsed")
        if "MemUsed" in raw.columns
        else (F.col("MemTotal") - F.col("MemFree"))
    )
    used = _finish(
        df, "memused", "GB", validate_metric(mem_used / BYTES_PER_GB, lo=0.0)
    )
    minus_cache = _finish(
        df,
        "memused_minus_diskcache",
        "GB",
        validate_metric((mem_used - F.col("FilePages")) / BYTES_PER_GB, lo=0.0),
    )
    return used.unionByName(minus_cache)


def run_step1(
    spark,
    input_dir: str,
    output_dir: str | None = None,
):
    """Directory-level step-1 (the transformer.py:342-470 Spark
    shape, SURVEY §3.1): read every node's block/cpu/llite/mem CSVs
    with one globbed scan per metric type, derive all events, and
    (optionally) write the FRESCO long table partitioned by day.

    Layout: ``{input_dir}/<NODE>/{block,cpu,llite,mem}.csv`` — the
    glob replaces the reference's per-node loop; Spark's task
    scheduling replaces the 500-node write batching; missing files
    for a metric type simply contribute nothing (tolerant dispatch,
    data_processor.py:365-414)."""
    from stampede_to_fresco_etl_spark.schemas import (
        BLOCK_RAW,
        CPU_RAW,
        LLITE_RAW,
        MEM_RAW,
    )
    from stampede_to_fresco_etl_spark.sources.readers import read_csv_robust

    def _try_read(name, schema):
        # ONE glob pattern handed to Spark's DataSource: file listing
        # (and locality planning) happens distributed in the reader,
        # not as a driver-side per-node glob — at 6k nodes the driver
        # never touches the filesystem.  A pattern with no matches
        # raises at analysis time -> that metric contributes nothing.
        from pyspark.errors import AnalysisException

        try:
            return read_csv_robust(
                spark, f"{input_dir}/*/{name}.csv", schema
            )
        except AnalysisException:
            return None

    out = transform_node_data(
        block=_try_read("block", BLOCK_RAW),
        cpu=_try_read("cpu", CPU_RAW),
        llite=_try_read("llite", LLITE_RAW),
        mem=_try_read("mem", MEM_RAW),
    )
    if output_dir is not None:
        from stampede_to_fresco_etl_spark.operators.windows import with_day
        from stampede_to_fresco_etl_spark.sources.writers import write_parquet

        write_parquet(
            with_day(out, "Timestamp"),
            output_dir,
            partition_by=["date"],
            sort_within_partitions=["Job Id", "Host", "Timestamp"],
        )
    return out


def transform_node_data(
    block: DataFrame | None = None,
    cpu: DataFrame | None = None,
    llite: DataFrame | None = None,
    mem: DataFrame | None = None,
) -> DataFrame:
    """Union all derived event frames into one FRESCO long table
    (pl.concat vertical_relaxed, step-1/data_processor.py:415-433).
    Missing inputs are simply skipped, mirroring the reference's
    tolerant per-file dispatch (:365-414)."""
    parts = []
    if block is not None:
        parts.append(process_block(block))
    if cpu is not None:
        parts.append(process_cpu(cpu))
    if llite is not None:
        parts.append(process_llite(llite))
    if mem is not None:
        parts.append(process_mem(mem))
    if not parts:
        raise ValueError("no input frames supplied")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
