"""Streaming text-index maintenance — the postings/doclen artifact
(`index_store.text_index_dirs`) grown per ingest batch, completing
the stored-artifact matrix's text side (dedup bands:
`dedup_stream`; IVF assignment: `ann_stream`; postings: here).

foreachBatch body per arriving document batch:

  1. tokenize ONLY the batch and reduce to its own
     ``(token, doc_id, tf)`` postings rows and ``(doc_id, dl)``
     doc-length rows;
  2. overwrite both under this batch's ``batch_id=N`` partition —
     the same layout the snapshot bootstrap writes as
     ``batch_id=0``, so a batch query (x57's BM25 probe) reads the
     union transparently.

No totals companion is maintained incrementally: n_docs/dl_sum are
one metadata-cheap aggregate over the doclen table at probe time
(`read_text_totals`), so there is no read-modify-write race and
replay stays trivially convergent — both sinks are deterministic
per-batch partition overwrites (dedup_stream's exactly-once
argument).

Scale: per-batch cost is the batch's own tokenize + two hash aggs —
corpus-size-independent.  At cluster scale the postings partitions
are bucketed BY TOKEN inside each batch partition; probes read only
their terms' buckets (x57's pushdown) across all batch partitions,
and a compaction pass (s31's planner) periodically folds old batch
partitions together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from stampede_to_fresco_etl_spark.streaming.dedup_stream import DOC_SCHEMA


def apply_text_index_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    postings_dir: str,
    doclen_dir: str,
) -> None:
    """One micro-batch: tokenize the batch, append its postings and
    doc lengths as its own partitions.  Idempotent — both writes
    overwrite this batch's own partition.

    Layout safety (r11, tightened r12/ADVICE r11): the batch REFUSES
    to grow a persisted postings artifact whose layout manifest
    records a different bucket count (`assert_postings_layout` —
    mixing bucket counts in one directory tree would make every
    probe's directory pruning silently wrong), and it REFUSES to
    grow a NON-EMPTY artifact that has no manifest at all: such an
    artifact may have been written under a different
    TEXT_TOKEN_BUCKETS (a pre-manifest build), and stamping the
    current count onto it would certify a mixed layout as consistent
    forever — the exact failure the gate targets.  The manifest is
    stamped only when this batch CREATES the artifact, and BEFORE
    the partition write (so a crash between the two replays as
    manifest-present, never as refuse-to-grow)."""
    from stampede_to_fresco_etl_spark.index_store import (
        assert_postings_layout,
        postings_layout_state,
        token_bucket_col,
        write_postings_layout,
    )

    assert_postings_layout(spark, postings_dir)
    has_manifest, nonempty = postings_layout_state(
        spark, postings_dir
    )
    if not has_manifest:
        if nonempty:
            raise ValueError(
                f"refusing to grow non-empty postings artifact "
                f"{postings_dir!r}: it carries no layout manifest, "
                f"so its stored token_bucket values may come from a "
                f"different TEXT_TOKEN_BUCKETS than this build's — "
                f"growing (and stamping) it would certify a mixed "
                f"layout whose directory pruning silently drops "
                f"postings.  Verify the stored bucket count and "
                f"stamp it explicitly with write_postings_layout "
                f"(a one-off migration step), then restart the "
                f"daemon"
            )
        write_postings_layout(spark, postings_dir)

    toks = batch_df.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    )
    td = toks.groupBy("token", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    # same token_bucket directory partitioning as the snapshot
    # bootstrap (`index_store.text_index_dirs`): partition discovery
    # requires a consistent depth across batch_id partitions, and the
    # probe's directory pruning must keep holding as the index grows
    (
        td.withColumn("token_bucket", token_bucket_col(F.col("token")))
        .repartition(F.col("token_bucket"))
        .write.mode("overwrite")
        .partitionBy("token_bucket")
        .parquet(f"{postings_dir}/batch_id={batch_id}")
    )
    toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("dl")
    ).write.mode("overwrite").parquet(
        f"{doclen_dir}/batch_id={batch_id}"
    )
    # growth: drop any session-cached reader of the grown dirs (r13)
    from stampede_to_fresco_etl_spark.index_store import (
        invalidate_readers,
    )

    invalidate_readers(spark, postings_dir)
    invalidate_readers(spark, doclen_dir)


def read_text_totals(spark: SparkSession, doclen_dir: str):
    """(n_docs, dl_sum) over every batch partition — the totals
    companion derived at probe time (footer-cheap)."""
    return (
        spark.read.parquet(doclen_dir)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("dl_sum"),
        )
    )


def run_text_index_stream(
    spark: SparkSession,
    landing_dir: str,
    postings_dir: str,
    doclen_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous postings-maintenance daemon (availableNow=True
    drains the backlog and stops — the batch-catchup mode)."""
    from stampede_to_fresco_etl_spark.index_store import guard_daemon_dirs

    guard_daemon_dirs(postings_dir, doclen_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    # batch id + 1: batch_id=0 is reserved for the snapshot
    # bootstrap (index_store) — see dedup_stream.run_incremental_dedup
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_text_index_batch(
            spark, df, bid + 1, postings_dir, doclen_dir
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
