"""Streaming PQ-codes maintenance — the codes parquet
(`index_store.pq_codes_dir`) grown per ingest batch against a FROZEN
codebook companion, completing the stored-artifact matrix's last
asymmetry: every family (dedup bands, IVF assignment, text postings,
exact fps — and now PQ codes) has a snapshot bootstrap, a streaming
growth daemon, an oracle-gated batch probe, and a batch ≡ stream
equivalence test.

foreachBatch body per arriving embedding batch:

  1. FREEZE the codebook on first contact: batch 1 (partition ids
     are checkpoint-id + 1; 0 is the snapshot bootstrap's) seeds the
     per-subspace codewords from its ``k`` smallest vec_ids — fully
     deterministic, so crash-replay re-derives the identical
     companion (ann_stream's centroid argument) — and publishes them
     as one parquet file;
  2. ENCODE only the batch with the shared kernel
     (`similarity.pq_encode` — the identical expressions catalog v11
     runs, so batch ≡ stream is structural, not coincidental);
  3. overwrite the batch's own ``batch_id=N`` codes partition
     (idempotent replay, dedup_stream's exactly-once argument).

Scale: per-batch cost is the batch's own in-row encode — m·k L2²
folds per vector, zero shuffle, corpus-size-independent.  The codes
table is the 100 TB serving artifact (m bytes/vector); v17's ADC
search scans ONLY it.  Re-quantization after a codebook refresh is a
batch rebuild + `compact_index`-style swap, never an in-place edit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType
from pyspark.sql.utils import AnalysisException

from stampede_to_fresco_etl_spark.operators.similarity import pq_encode
from stampede_to_fresco_etl_spark.streaming.ann_stream import EMB_SCHEMA

PQ_M = 4
PQ_K = 16
PQ_DIMS = 16


def _load_or_seed_codebook(
    spark: SparkSession,
    batch_df: DataFrame,
    codebook_dir: str,
    k: int = PQ_K,
) -> list[list[float]]:
    """Frozen full-dimension codebook vectors: read the companion
    artifact if it exists; otherwise (first batch, or its replay)
    seed from this batch's ``k`` smallest vec_ids and publish.
    Replay rewrites byte-identical content — no RNG anywhere."""
    try:
        rows = (
            spark.read.parquet(codebook_dir).orderBy("code").collect()
        )
        return [[float(x) for x in r["cv"]] for r in rows]
    except AnalysisException:
        pass
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in batch_df.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(k)
        .collect()
    ]
    if not seeds:
        # an EMPTY first batch must not freeze (and publish) an empty
        # codebook — later batches would read it back, skip reseeding
        # forever, and pq_encode against zero codewords would land
        # all-NULL codes in the artifact.  Defer seeding to the first
        # batch that actually carries vectors.
        return []
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(seeds)],
        "code int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(codebook_dir)
    return seeds


def apply_pq_codes_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    codes_dir: str,
    codebook_dir: str,
    m: int = PQ_M,
    k: int = PQ_K,
    dims: int = PQ_DIMS,
) -> None:
    """One micro-batch: freeze/load the codebook, encode ONLY the
    batch, append as the batch's own partition (idempotent
    overwrite)."""
    seeds = _load_or_seed_codebook(spark, batch_df, codebook_dir, k)
    if not seeds:
        # no codebook yet (empty first batch/es): nothing to encode —
        # the batch carries no rows, and writing an empty partition
        # would add an empty dir per replay for no content
        return
    pq_encode(
        batch_df.select("vec_id", "embedding"), seeds, m=m, dims=dims
    ).write.mode("overwrite").parquet(f"{codes_dir}/batch_id={batch_id}")
    # growth makes any session-cached DERIVED serving layout stale,
    # and any session-cached reader of the grown dir itself (r13)
    from stampede_to_fresco_etl_spark.index_store import (
        _invalidate_derived,
        invalidate_readers,
    )

    _invalidate_derived(spark, codes_dir)
    invalidate_readers(spark, codes_dir)


def run_pq_codes_stream(
    spark: SparkSession,
    landing_dir: str,
    codes_dir: str,
    codebook_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = EMB_SCHEMA,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous codes-maintenance daemon (availableNow=True drains
    the backlog and stops — the batch-catchup mode)."""
    from stampede_to_fresco_etl_spark.index_store import guard_daemon_dirs

    guard_daemon_dirs(codes_dir, codebook_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    # batch id + 1: batch_id=0 is reserved for the snapshot
    # bootstrap (index_store) — see dedup_stream.run_incremental_dedup
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_pq_codes_batch(
            spark, df, bid + 1, codes_dir, codebook_dir
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
