"""Streaming exact-fingerprint index maintenance — the md5 hash set
(`index_store.exact_fp_dir`) grown per ingest batch, the last cell
of the stored-artifact matrix (dedup bands: `dedup_stream`; IVF:
`ann_stream`; text postings: `text_index_stream`; exact fps: here).

foreachBatch body: hash ONLY the batch, reduce to its own
``(fp, n_docs)`` rows, overwrite them under ``batch_id=N`` — the
layout the snapshot bootstrap writes as ``batch_id=0``.  One fp can
appear in several batches, so `index_store.read_exact_fp` SUMS
copies across partitions at probe time (no read-modify-write, replay
trivially convergent — dedup_stream's exactly-once argument).

Scale: per-batch cost is one hash + one hash agg over the batch —
corpus-size-independent; 32-byte keys, bucketed by fp at cluster
scale so a probe shuffles only its batch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from stampede_to_fresco_etl_spark.streaming.dedup_stream import DOC_SCHEMA


def apply_exact_fp_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    fp_dir: str,
) -> None:
    """One micro-batch: fingerprint and append as the batch's own
    partition (idempotent overwrite)."""
    batch_df.groupBy(F.md5("text").alias("fp")).agg(
        F.count("*").cast("long").alias("n_docs")
    ).write.mode("overwrite").parquet(f"{fp_dir}/batch_id={batch_id}")
    # growth: drop any session-cached reader of the grown dir (r13)
    from stampede_to_fresco_etl_spark.index_store import (
        invalidate_readers,
    )

    invalidate_readers(spark, fp_dir)


def run_exact_fp_stream(
    spark: SparkSession,
    landing_dir: str,
    fp_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    from stampede_to_fresco_etl_spark.index_store import guard_daemon_dirs

    guard_daemon_dirs(fp_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    # batch id + 1: batch_id=0 is reserved for the snapshot
    # bootstrap (index_store) — see dedup_stream.run_incremental_dedup
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_exact_fp_batch(spark, df, bid + 1, fp_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
