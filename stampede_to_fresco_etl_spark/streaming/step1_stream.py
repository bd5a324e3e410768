"""Incremental step-1: raw node telemetry streams → FRESCO long
events, with lag state crossing micro-batches.

The batch plan (pipeline/step1.py) derives rates with window
functions; a stream cannot — the previous sample of a (job, node)
key usually arrived in an earlier micro-batch (an earlier file).
This module generalizes `streaming/stateful.streaming_rate` into a
MULTI-COLUMN lag kernel with an optional per-timestamp rollup, then
rebuilds each metric's formula on top with the same edge rules as
the batch kernels:

  - block:  Σ_devices(rd+wr sectors) per ts → Δ → ×512/Δt/2³⁰, ≥0
  - cpuuser: Σ_cores of 7 jiffies per ts → per-column Δ →
             userΔ/ΣΔ×100 when ΣΔ>0, clip [0,100]
  - nfs:    (read+write bytes) per ROW (no rollup — executed-
             reference parity) → Δ → /Δt/2²⁰, ≥0
  - memused / memused_minus_diskcache: stateless gauges — the batch
             expressions run on the stream unchanged.

State per (job, node): (last_ts_us, last value vector) — ~every
metric's whole cross-batch memory is two numbers per column.

Incremental contract (same as the reference's consumer): files
arrive in time order per node.  A sample at or before the state's
last timestamp produces dt ≤ 0 < min_dt and is dropped — the batch
path is the reprocess mode for out-of-order history.  A rollup
group (one timestamp's device/core rows) must not straddle files:
true for the reference's per-node CSVs, where a file carries whole
snapshots, and the file source never splits a file across batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from stampede_to_fresco_etl_spark.functions import (
    parse_timestamp,
    to_fresco_job_id,
    validate_metric,
)
from stampede_to_fresco_etl_spark.operators.rates import MIN_DT_SECONDS
from stampede_to_fresco_etl_spark.pipeline.step1 import (
    BYTES_PER_GB,
    BYTES_PER_MB,
    SECTOR_BYTES,
)
from stampede_to_fresco_etl_spark.schemas import JIFFY_COLS

#: cross-batch state: last sample's timestamp + value vector
LAG_STATE = StructType(
    [
        StructField("last_ts_us", LongType(), True),
        StructField("last_vals", ArrayType(DoubleType()), True),
    ]
)


def _lag_output_schema(n_vals: int) -> StructType:
    return StructType(
        [
            StructField("jobID", StringType(), True),
            StructField("node", StringType(), True),
            StructField("ts_us", LongType(), True),
            StructField("dt_seconds", DoubleType(), True),
        ]
        + [StructField(f"d{i}", DoubleType(), True) for i in range(n_vals)]
    )


def _multi_lag_fn(n_vals: int, rollup: bool):
    cols = [f"v{i}" for i in range(n_vals)]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        job, node = key
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if rollup:
            # device/core rollup per timestamp BEFORE the delta —
            # same order of operations as the batch plan
            pdf = pdf.groupby("ts_us", as_index=False)[cols].sum()
        pdf = pdf.sort_values("ts_us", kind="stable", ignore_index=True)

        if state.exists:
            last_ts, last_vals = state.get
            last_vals = list(last_vals)
        else:
            last_ts, last_vals = None, None

        out = {c: [] for c in ("ts_us", "dt_seconds")}
        for i in range(n_vals):
            out[f"d{i}"] = []
        for row in pdf.itertuples(index=False):
            ts = int(row.ts_us)
            vals = [float(getattr(row, c)) for c in cols]
            if last_ts is None:
                out["ts_us"].append(ts)
                out["dt_seconds"].append(None)
                for i in range(n_vals):
                    out[f"d{i}"].append(None)
            else:
                out["ts_us"].append(ts)
                out["dt_seconds"].append((ts - last_ts) / 1_000_000.0)
                for i in range(n_vals):
                    out[f"d{i}"].append(vals[i] - last_vals[i])
            # every sample advances the state (batch diff() parity)
            last_ts, last_vals = ts, vals

        if last_ts is not None:
            state.update((last_ts, last_vals))
        if out["ts_us"]:
            frame = pd.DataFrame(out)
            frame.insert(0, "node", node)
            frame.insert(0, "jobID", job)
            yield frame

    return update


def streaming_lag_deltas(
    stream: DataFrame, value_exprs: list[F.Column], rollup: bool
) -> DataFrame:
    """Cross-batch lag deltas for `value_exprs` per (jobID, node):
    output (jobID, node, ts_us, dt_seconds, d0..dN-1); the first-ever
    row of a key carries nulls, exactly like batch `lag_deltas`."""
    n = len(value_exprs)
    prepared = stream.select(
        F.col("jobID"),
        F.col("node"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        *[e.cast("double").alias(f"v{i}") for i, e in enumerate(value_exprs)],
    )
    return prepared.groupBy("jobID", "node").applyInPandasWithState(
        _multi_lag_fn(n, rollup),
        outputStructType=_lag_output_schema(n),
        stateStructType=LAG_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _clean_stream(raw: DataFrame, value_cols: list[str]) -> DataFrame:
    df = raw.withColumn("ts", parse_timestamp("timestamp"))
    df = df.dropna(subset=["jobID", "node", "ts"])
    return df.fillna(0.0, subset=value_cols)


def _finish_stream(
    df: DataFrame, event: str, units: str, value: F.Column
) -> DataFrame:
    return df.select(
        to_fresco_job_id(F.col("jobID")).alias("Job Id"),
        F.col("node").alias("Host"),
        F.timestamp_micros(F.col("ts_us")).alias("Timestamp"),
        F.lit(event).alias("Event"),
        value.cast("double").alias("Value"),
        F.lit(units).alias("Units"),
    )


def _valid(df: DataFrame) -> DataFrame:
    return df.filter(
        F.col("dt_seconds").isNotNull()
        & (F.col("dt_seconds") >= MIN_DT_SECONDS)
        & F.col("d0").isNotNull()
        & (F.col("d0") >= 0)
    )


def stream_block(raw: DataFrame) -> DataFrame:
    df = _clean_stream(raw, ["rd_sectors", "wr_sectors"])
    lag = streaming_lag_deltas(
        df, [F.col("rd_sectors") + F.col("wr_sectors")], rollup=True
    )
    value = validate_metric(
        F.col("d0") * F.lit(SECTOR_BYTES / BYTES_PER_GB) / F.col("dt_seconds"),
        lo=0.0,
    )
    return _finish_stream(_valid(lag), "block", "GB/s", value)


def stream_cpu(raw: DataFrame) -> DataFrame:
    df = _clean_stream(raw, JIFFY_COLS).dropna(subset=["device"])
    lag = streaming_lag_deltas(
        df, [F.col(c) for c in JIFFY_COLS], rollup=True
    )
    total = sum(F.col(f"d{i}") for i in range(len(JIFFY_COLS)))
    # dt > 0 enforces the module contract (a cross-batch duplicate or
    # out-of-order snapshot must be dropped, not rated against stale
    # lag state).  Deliberate deviation from the batch cpu path, which
    # has no dt filter but guarantees per-node time ordering by
    # sorting before the lag — the streaming state cannot.
    lag = (
        lag.withColumn("total_delta", total)
        .filter(F.col("dt_seconds").isNotNull() & (F.col("dt_seconds") > 0))
        .filter(F.col("total_delta") > 0)
    )
    user_idx = JIFFY_COLS.index("user")
    value = validate_metric(
        F.col(f"d{user_idx}")
        / F.nullif(F.col("total_delta"), F.lit(0.0))
        * 100.0,
        lo=0.0,
        hi=100.0,
    )
    return _finish_stream(lag, "cpuuser", "CPU %", value)


def stream_llite(raw: DataFrame) -> DataFrame:
    df = _clean_stream(raw, ["read_bytes", "write_bytes"])
    lag = streaming_lag_deltas(
        df, [F.col("read_bytes") + F.col("write_bytes")], rollup=False
    )
    value = validate_metric(
        F.col("d0") / F.lit(BYTES_PER_MB) / F.col("dt_seconds"), lo=0.0
    )
    return _finish_stream(_valid(lag), "nfs", "MB/s", value)


def stream_mem(raw: DataFrame) -> DataFrame:
    """Gauges are stateless: the batch expressions run unchanged."""
    from stampede_to_fresco_etl_spark.pipeline.step1 import process_mem

    return process_mem(raw)


def run_step1_incremental(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> list[StreamingQuery]:
    """Continuous step-1 over a landing tree
    ``{input_dir}/<NODE>/{block,cpu,llite,mem}*.csv`` — the streaming
    twin of `pipeline.step1.run_step1`.  The trailing glob accepts
    suffixed re-scrapes (``block_0002.csv``): each new pull appends a
    file per node, and the lag state carries rates ACROSS pulls —
    the first sample of a new file diffs against the last sample of
    the previous one.  Each metric type is its own streaming query
    (own checkpoint subdir), all draining into one date-partitioned
    FRESCO long table; availableNow drains the backlog and stops,
    re-invoke to pick up new files."""
    from stampede_to_fresco_etl_spark.schemas import (
        BLOCK_RAW,
        CPU_RAW,
        LLITE_RAW,
        MEM_RAW,
    )

    sources = {
        "block": (BLOCK_RAW, stream_block),
        "cpu": (CPU_RAW, stream_cpu),
        "llite": (LLITE_RAW, stream_llite),
        "mem": (MEM_RAW, stream_mem),
    }
    queries = []
    for name, (schema, derive) in sources.items():
        raw = (
            spark.readStream.schema(schema)
            .option("header", "true")
            .option("mode", "PERMISSIVE")
            .csv(f"{input_dir}/*/{name}*.csv")
        )
        out = derive(raw).withColumn("date", F.to_date(F.col("Timestamp")))
        # one sink dir per metric: the parquet file sink's
        # _spark_metadata commit log is per-path and cannot be shared
        # by concurrent queries ("Race while writing batch N")
        q = (
            out.writeStream.format("parquet")
            .option("path", f"{out_dir}/{name}")
            .option("checkpointLocation", f"{checkpoint_dir}/{name}")
            .partitionBy("date")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        queries.append(q)
    return queries


def read_fresco_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union the per-metric sink dirs back into one long table (the
    reader-side view of `run_step1_incremental`'s output)."""
    from stampede_to_fresco_etl_spark.streaming.step2_stream import _fs

    fs, jvm = _fs(spark, out_dir)
    root = jvm.org.apache.hadoop.fs.Path(out_dir)
    parts = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            if st.isDirectory():
                parts.append(spark.read.parquet(str(st.getPath())))
    if not parts:
        raise ValueError(f"no step-1 output under {out_dir}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
