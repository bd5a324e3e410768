"""Streaming quality-gate router — x13's Gopher-style quality
signals applied at INGEST time, routing each arriving document to a
keep or drop sink with per-batch audit counters.

A curation pipeline thresholds documents before they ever reach
tokenization; running the same filter as a stream means a bad crawl
batch is quarantined the moment it lands instead of at the next
nightly rebuild.  Semantics are pinned to the batch operator: the
scorer IS `operators.text.quality_signals` (the oracle-gated x13
expressions), so batch ≡ stream by construction — proved
row-for-row by tests/test_streaming_curation.py.

Exactly-once follows dedup_stream's shape: checkpointed foreachBatch
+ deterministic per-batch partition overwrite for keep/drop/stats,
so crash-replay converges.  State: none — the scorer is pure column
math, the streaming query is stateless, and the audit row is one
line per batch.

Scale notes: the scorer is zero-shuffle whole-stage-codegen column
expressions (no Python), so the router's cost is the scan plus two
partitioned writes; at 100 TB/day the keep/drop split writes are the
same bytes a batch filter would write, just incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from stampede_to_fresco_etl_spark.operators.text import quality_signals
from stampede_to_fresco_etl_spark.streaming.dedup_stream import DOC_SCHEMA

#: keep thresholds (Gopher-style): enough words, mean word length in
#: the human-text band, mostly alphabetic words
MIN_WORDS = 3
MEAN_WLEN_LO = 2.0
MEAN_WLEN_HI = 12.0
MIN_ALPHA_FRAC = 0.5


def score_and_route(batch_df: DataFrame) -> DataFrame:
    """(doc_id, text, …signals…, keep) — the pure routing projection
    shared by batch and stream."""
    sig = quality_signals(batch_df, "doc_id", "text")
    scored = batch_df.join(sig, "doc_id")
    keep = (
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("mean_word_len") >= MEAN_WLEN_LO)
        & (F.col("mean_word_len") <= MEAN_WLEN_HI)
        & (F.col("alpha_word_ratio") >= F.lit(MIN_ALPHA_FRAC))
    )
    return scored.withColumn("keep", keep)


def apply_curation_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    keep_dir: str,
    drop_dir: str,
    stats_dir: str,
) -> None:
    """One micro-batch: score, route, audit.  Idempotent — all three
    sinks overwrite this batch's own partition."""
    routed = score_and_route(
        batch_df.select("doc_id", "text")
    ).localCheckpoint()
    routed.filter(F.col("keep")).drop("keep").write.mode(
        "overwrite"
    ).parquet(f"{keep_dir}/batch_id={batch_id}")
    routed.filter(~F.col("keep")).drop("keep").write.mode(
        "overwrite"
    ).parquet(f"{drop_dir}/batch_id={batch_id}")
    stats = routed.agg(
        F.count("*").alias("n_in"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
    )
    stats.write.mode("overwrite").parquet(
        f"{stats_dir}/batch_id={batch_id}"
    )


def run_quality_router(
    spark: SparkSession,
    landing_dir: str,
    keep_dir: str,
    drop_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_curation_batch(
            spark, df, bid, keep_dir, drop_dir, stats_dir
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
