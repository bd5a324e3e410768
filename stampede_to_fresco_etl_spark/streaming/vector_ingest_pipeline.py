"""End-to-end streaming VECTOR ingest — the composition VERDICT r9
(watch item 3c) ordered: the document pipeline's gate→probe→admit
shape applied to the embedding side, growing BOTH vector source
artifacts in one foreachBatch body so the derived IVF-PQ serving
layout can re-derive from a consistent pair:

    landing embedding batch
      → fp gate        (md5 of the double-normalized payload vs the
                        stored vector-fp set: an exact re-crawl of
                        an indexed vector never reaches assignment —
                        d16's cost short-circuit on the vector side)
      → ann growth     (`ann_stream.apply_ann_batch`: assign novel
                        vectors to FROZEN centroids, record nearest-
                        indexed matches, grow ``batch_id=N``)
      → codes growth   (`pq_codes_stream.apply_pq_codes_batch`:
                        encode novel vectors against the FROZEN
                        codebook, grow the codes partition)
      → invalidation   (both appliers call `_invalidate_derived`, so
                        a session-cached `ivfpq_dir` join of the OLD
                        sources re-derives on next probe)

Exactly-once: every sink (fp partition, matches, assignment, codes)
is a per-batch partition overwrite keyed by the checkpoint's
batch_id, and the fp gate excludes the current batch's own fp
partition — the dedup_stream replay-convergence argument applies to
the whole composition.  The fp is computed over
``as_double_vec(embedding)`` cast to string, so float-typed corpus
parquet and double-typed stream batches fingerprint identically.

Scale: the gate is one equi-join on a 32-byte key against a
bucketable fp set (O(batch + matches)); assignment/encode are in-row
math against broadcast-sized frozen companions; nothing scans the
corpus — per-batch cost is corpus-size-independent (rehearsed at
sf0.1 vs sf1 by scripts/vector_ingest_rehearsal.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType
from pyspark.sql.utils import AnalysisException

from stampede_to_fresco_etl_spark.operators.similarity import (
    as_double_vec,
)
from stampede_to_fresco_etl_spark.streaming.ann_stream import (
    EMB_SCHEMA,
    apply_ann_batch,
)
from stampede_to_fresco_etl_spark.streaming.pq_codes_stream import (
    apply_pq_codes_batch,
)


def vector_fp(col: str = "embedding") -> Column:
    """32-byte payload fingerprint of an embedding, type-normalized:
    identical vectors fingerprint identically whether they arrive as
    ``array<float>`` (corpus parquet) or ``array<double>`` (stream
    schema)."""
    return F.md5(as_double_vec(col).cast("string"))


def bootstrap_vector_fps(
    spark: SparkSession, indexed_emb: DataFrame, fp_dir: str
) -> None:
    """Snapshot the indexed corpus's vector-fp set as ``batch_id=0``
    — the gate's bootstrap partition, exactly like the other five
    artifact families'."""
    indexed_emb.select(vector_fp().alias("fp")).groupBy("fp").agg(
        F.count("*").cast("long").alias("n")
    ).write.mode("overwrite").parquet(f"{fp_dir}/batch_id=0")


def apply_vector_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    fp_dir: str,
    index_dir: str,
    matches_dir: str,
    centroids_dir: str,
    codes_dir: str,
    codebook_dir: str,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> None:
    """One micro-batch of the full fp-gate→ann-growth→codes-growth
    composition.  Idempotent: replaying a batch rewrites every sink's
    own partition with identical content."""
    fped = batch_df.select(
        "vec_id", "embedding", vector_fp().alias("fp")
    )
    known = None
    try:
        known = (
            spark.read.parquet(fp_dir)
            .filter(F.col("batch_id") != batch_id)
            .select("fp")
            .distinct()
        )
    except AnalysisException:
        pass
    novel = (
        fped.join(known, "fp", "left_anti") if known is not None else fped
    )
    # within-batch exact dups: keep the lowest vec_id (deterministic,
    # arrival-order-free — the doc pipeline's lower-id-wins rule)
    novel = (
        novel.groupBy("fp")
        .agg(
            F.min_by(
                F.struct("vec_id", "embedding"), F.col("vec_id")
            ).alias("r")
        )
        .select(
            F.col("r.vec_id").alias("vec_id"),
            F.col("r.embedding").alias("embedding"),
            "fp",
        )
        .localCheckpoint()
    )
    # grow the gate's own artifact from the ADMITTED rows
    novel.groupBy("fp").agg(
        F.count("*").cast("long").alias("n")
    ).write.mode("overwrite").parquet(f"{fp_dir}/batch_id={batch_id}")
    emb = novel.select("vec_id", "embedding")
    # both appliers tolerate empty batches and both invalidate the
    # derived IVF-PQ layout after growth
    apply_ann_batch(
        spark,
        emb,
        batch_id,
        index_dir,
        matches_dir,
        centroids_dir,
        n_centroids=n_centroids,
        n_probe=n_probe,
    )
    apply_pq_codes_batch(
        spark, emb, batch_id, codes_dir, codebook_dir
    )


def run_vector_ingest_pipeline(
    spark: SparkSession,
    landing_dir: str,
    fp_dir: str,
    index_dir: str,
    matches_dir: str,
    centroids_dir: str,
    codes_dir: str,
    codebook_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = EMB_SCHEMA,
    n_centroids: int = 16,
    n_probe: int = 4,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    from stampede_to_fresco_etl_spark.index_store import (
        guard_daemon_dirs,
    )

    guard_daemon_dirs(
        fp_dir, index_dir, matches_dir, centroids_dir,
        codes_dir, codebook_dir,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    # batch id + 1: batch_id=0 is reserved for the snapshot
    # bootstrap (index_store) — see dedup_stream.run_incremental_dedup
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_vector_ingest_batch(
            spark,
            df,
            bid + 1,
            fp_dir,
            index_dir,
            matches_dir,
            centroids_dir,
            codes_dir,
            codebook_dir,
            n_centroids=n_centroids,
            n_probe=n_probe,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
