"""Streaming incremental near-dup detection — d15's batch-vs-index
LSH probe run continuously over a document landing stream.

Batch mode (catalog `d15_incremental_dedup`) probes one ingest batch
against a stored corpus index; a deployment does that on every
arriving batch.  This module is that steady state as Structured
Streaming: a file source over the landing dir, and a `foreachBatch`
body that

  1. minhashes ONLY the new batch (`minhash_signatures`);
  2. flags intra-batch candidates (`lsh_candidate_pairs` on the
     batch alone — small × small);
  3. probes the stored index (`lsh_pairs_between` — batch × index
     band equi-join, never index × index);
  4. appends the batch's signatures to the index and the candidate
     pairs to the matches sink, both under a `batch_id=N` partition.

Exactly-once: the checkpoint re-runs an uncommitted batch with the
SAME batch_id, and both writes are deterministic overwrites of that
batch's own partition directory — replay converges instead of
duplicating (proved by tests/test_streaming_dedup.py's double-apply).
On replay the index already holds the batch's own partition, so the
probe reads `batch_id != current` — partition pruning makes the
exclusion free.  Single-writer / replay-before-read contract: a
reader that races the non-atomic partition rewrite can observe a
partial batch directory; step2_stream's marker protocol is the
upgrade when readers are concurrent.

Scale notes (100 TB): per-batch cost is O(|batch| + matches) —
the corpus is touched only through the band equi-join against its
stored index, and the index stores the EXPLODED band table
(`band_signatures`: bands × (k+2) longs per doc, ~200 B/doc — a
10-billion-doc index is ~2 TB of parquet, scanned column-pruned), so
the probe NEVER re-bands the corpus: banding cost is paid once, on
each batch's own delta, at append time.  On a cluster, write the
index `bucketBy(band_idx, band_key)` so the probe shuffles only the
batch side into existing buckets.  State lives entirely in the two
parquet sinks — the streaming query itself is stateless, so there is
no store-growth or watermark concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType
from pyspark.sql.utils import AnalysisException

from stampede_to_fresco_etl_spark.operators.dedup import (
    band_signatures,
    lsh_candidate_pairs,
    lsh_pairs_between,
    minhash_signatures,
)

#: landing-file schema (the documents table's query-relevant columns)
DOC_SCHEMA = "doc_id long, text string"


def _read_index(
    spark: SparkSession, index_dir: str, exclude_batch_id: int
) -> DataFrame | None:
    """The stored BAND-TABLE index (`band_signatures` rows), minus
    the current batch's own partition (present on crash-replay).
    None before the first commit."""
    try:
        idx = spark.read.parquet(index_dir)
    except AnalysisException:
        return None
    return idx.filter(F.col("batch_id") != exclude_batch_id).drop(
        "batch_id"
    )


def apply_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    matches_dir: str,
    num_hashes: int = 6,
    bands: int = 3,
) -> None:
    """One micro-batch: probe, record matches, grow the index.
    Idempotent — both writes overwrite this batch's own partition."""
    sigs = minhash_signatures(
        batch_df.select("doc_id", "text"), "doc_id", "text", num_hashes
    ).localCheckpoint()

    intra = lsh_candidate_pairs(
        sigs, num_hashes=num_hashes, bands=bands, materialize=False
    ).select(
        F.col("doc_a").alias("new_doc"),
        F.col("doc_b").alias("matched_doc"),
        "est_jaccard",
        F.lit("batch").alias("kind"),
    )
    matches = intra
    index = _read_index(spark, index_dir, batch_id)
    if index is not None:
        cross = lsh_pairs_between(
            sigs,
            indexed_bands=index,
            num_hashes=num_hashes,
            bands=bands,
            materialize=False,
        ).select(
            "new_doc",
            F.col("indexed_doc").alias("matched_doc"),
            "est_jaccard",
            F.lit("index").alias("kind"),
        )
        matches = matches.unionByName(cross)

    matches.write.mode("overwrite").parquet(
        f"{matches_dir}/batch_id={batch_id}"
    )
    band_signatures(sigs, num_hashes, bands).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/batch_id={batch_id}")
    # growth: a session-cached reader of this dir holds the pre-grow
    # file listing — drop it (r13 reader-cache contract)
    from stampede_to_fresco_etl_spark.index_store import (
        invalidate_readers,
    )

    invalidate_readers(spark, index_dir)


def run_incremental_dedup(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    matches_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = DOC_SCHEMA,
    num_hashes: int = 6,
    bands: int = 3,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous ingest-dedup daemon.  `available_now=True` drains
    the current backlog and stops (the batch-catchup mode used by
    tests); False runs until `stop()`."""
    from stampede_to_fresco_etl_spark.index_store import guard_daemon_dirs

    guard_daemon_dirs(index_dir, matches_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    # partition id = checkpoint batch id + 1: ``batch_id=0`` is
    # reserved for the snapshot bootstrap (index_store), so a fresh
    # daemon pointed at a bootstrapped artifact never overwrites the
    # snapshot with its first micro-batch.  Replay still converges —
    # the offset is a pure function of the checkpoint's id.
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_dedup_batch(
            spark,
            df,
            bid + 1,
            index_dir,
            matches_dir,
            num_hashes=num_hashes,
            bands=bands,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
