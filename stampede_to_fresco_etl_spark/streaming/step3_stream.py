"""Incremental step-3: streaming string finalization of the wide
table — the last reference stage gets its streaming twin, so all
three stages (telemetry derivation, join+widen, finalize) run
continuously end-to-end.

Reference: step-3/final_cleanup.py:22-96 is a 100-process IN-PLACE
parquet rewrite over the finished monthly files.  The streaming form
is write-aside by construction: new wide-table files land (e.g. from
incremental step-2's output), the file source picks them up exactly
once, the four stateless column transforms apply, and the finalized
table accumulates under its own root — no locks, no rewrite races,
and a crash replays the same files idempotently via the checkpoint.

Stateless transforms mean no state store and no watermark: this is
the cheapest possible streaming stage, pure per-batch projection.
Scale: cost ∝ arriving bytes; the sink keeps step-2's month
partitioning so downstream partition pruning is unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from stampede_to_fresco_etl_spark.pipeline.step3 import finalize


def run_step3_incremental(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    partition_col: str | None = "month",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous finalize over a landing directory of wide-table
    parquet files.  `schema` is the wide schema as written by step-2
    (read it once from a batch sample: streaming file sources require
    an explicit schema).  Drains the backlog and stops with
    `available_now`; pass False for a long-lived daemon."""
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    out = finalize(stream)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .option("compression", "zstd")
        .outputMode("append")
    )
    if partition_col is not None and partition_col in out.columns:
        writer = writer.partitionBy(partition_col)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
