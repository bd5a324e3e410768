"""Streaming incremental ANN — v16's batch-vs-IVF-index probe run
continuously over an embedding ingest stream (the vector-side twin
of `dedup_stream`).

foreachBatch body per arriving embedding batch:

  1. FREEZE cells on first contact: batch 0 seeds the centroids
     (`similarity.seed_centroids` — md5-ordered sample, fully
     deterministic, so crash-replay of batch 0 re-derives the
     identical centroid artifact) and persists them as the index's
     companion table;
  2. assign the batch's vectors to their nearest cell (the storable
     index rows) and to their `n_probe` nearest cells (the probe
     fan-out);
  3. probe the STORED index (batch_id != current — replay-safe) with
     a cell equi-join, keep each new vector's top-1 indexed
     neighbor;
  4. append the batch's (vec_id, v, cell) rows to the index
     partition.

Exactly-once follows dedup_stream: deterministic per-batch partition
overwrite for matches and index, deterministic re-seed for the
centroid artifact.  At 100 TB the index is stored partitioned (on a
cluster: bucketed) BY CELL, so the probe shuffles only the batch
side into existing cell files — `broadcast` never appears: the batch
is data-sized (v16's `broadcast_probes=False` rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType
from pyspark.sql.utils import AnalysisException

from stampede_to_fresco_etl_spark.operators.similarity import (
    _nearest_cell,
    _sqdist,
    _with_centroid_col,
    as_double_vec,
    ivf_probe_stored,
    seed_centroids,
)

EMB_SCHEMA = "vec_id long, embedding array<double>"

N_CENTROIDS = 8
N_PROBE = 2


def _load_or_seed_centroids(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    centroids_dir: str,
    n_centroids: int,
) -> list[list[float]]:
    """Frozen cell centroids: read the companion artifact if it
    exists; otherwise (first batch, or its replay) seed from this
    batch deterministically and publish.  Replay of batch 0 rewrites
    byte-identical content — md5 ordering has no RNG."""
    try:
        rows = (
            spark.read.parquet(centroids_dir)
            .orderBy("cell")
            .collect()
        )
        return [[float(x) for x in r["cv"]] for r in rows]
    except AnalysisException:
        pass
    cents = seed_centroids(batch_df, "vec_id", "embedding", n_centroids)
    if not cents:
        # an EMPTY first batch must not freeze (and publish) an empty
        # centroid table — later batches would read it back, never
        # reseed, and every assignment would land a NULL cell.  Defer
        # seeding to the first batch that carries vectors.
        return []
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(centroids_dir)
    return cents


def apply_ann_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    matches_dir: str,
    centroids_dir: str,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> None:
    """One micro-batch: assign, probe, record matches, grow the
    index.  Idempotent via per-batch partition overwrite."""
    cents = _load_or_seed_centroids(
        spark, batch_df, batch_id, centroids_dir, n_centroids
    )
    if not cents:
        # no centroids yet (empty first batch/es): nothing to assign
        # or probe — defer all artifact writes to the first batch
        # that carries vectors
        return
    b = _with_centroid_col(
        batch_df.select("vec_id", as_double_vec("embedding").alias("v")),
        cents,
    ).withColumn(
        "d", F.transform(F.col("__cents"), lambda c: _sqdist(F.col("v"), c))
    )
    assigned = b.select(
        "vec_id", "v", _nearest_cell("d").alias("cell")
    ).localCheckpoint()

    index = None
    try:
        index = spark.read.parquet(index_dir).filter(
            F.col("batch_id") != batch_id
        )
    except AnalysisException:
        pass
    if index is not None:
        # The probe half is the SHARED kernel (`ivf_probe_stored`) —
        # the batch catalog query v16 runs the identical code over
        # the identical artifact layout, so batch ≡ stream is
        # structural, not coincidental.
        matches = ivf_probe_stored(
            index.drop("batch_id"),
            cents,
            batch_df.select(
                F.col("vec_id").alias("new_id"), "embedding"
            ),
            probe_id_col="new_id",
            k=1,
            n_probe=n_probe,
            broadcast_probes=False,
        ).select(
            "new_id",
            F.col("vec_id").alias("indexed_id"),
            "cos_sim",
        )
    else:
        matches = spark.createDataFrame(
            [], "new_id long, indexed_id long, cos_sim double"
        )
    matches.write.mode("overwrite").parquet(
        f"{matches_dir}/batch_id={batch_id}"
    )
    assigned.write.mode("overwrite").parquet(
        f"{index_dir}/batch_id={batch_id}"
    )
    # growth makes any session-cached DERIVED serving layout stale,
    # and any session-cached reader of the grown dir itself (r13)
    from stampede_to_fresco_etl_spark.index_store import (
        _invalidate_derived,
        invalidate_readers,
    )

    _invalidate_derived(spark, index_dir)
    invalidate_readers(spark, index_dir)


def run_incremental_ann(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    matches_dir: str,
    centroids_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = EMB_SCHEMA,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    from stampede_to_fresco_etl_spark.index_store import guard_daemon_dirs

    guard_daemon_dirs(index_dir, matches_dir, centroids_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    # batch id + 1: batch_id=0 is reserved for the snapshot
    # bootstrap (index_store) — see dedup_stream.run_incremental_dedup
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_ann_batch(
            spark,
            df,
            bid + 1,
            index_dir,
            matches_dir,
            centroids_dir,
            n_centroids=n_centroids,
            n_probe=n_probe,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
