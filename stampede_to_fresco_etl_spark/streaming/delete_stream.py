"""Streaming DELETE maintenance — the tombstone verb's stream twin
(r10), completing the lifecycle matrix: every stored artifact now
has grow daemons (dedup/ann/text/exact-fp/pq-codes streams) AND a
delete daemon, both replay-idempotent per-batch partition writes.

A takedown feed (GDPR erasure requests, moderation lists, corpus
pruning decisions) lands as files of key rows; each micro-batch
becomes one tombstone partition of the target artifact via
`index_store.apply_deletes_batch` — so probes hide the keys from
the moment the batch commits (the batch applier also invalidates
any session-cached derived serving layout), and the next
maintenance-window `compact_index(tombstone_keys=…)` erases them
physically and clears the set.

Exactly-once: `apply_deletes_batch` writes ``batch_id=N`` overwrite
partitions keyed by the checkpoint's batch id — replaying a batch
rewrites its own partition with identical content, and tombstone
READS are distinct-unions over all partitions, so duplicates across
batches are harmless by construction.

LIFECYCLE COUPLING (found by the r11 rehearsal, pinned there): the
checkpoint and the tombstone dirs share one lifecycle.  Resetting
the checkpoint while tombstones are PENDING restarts batch numbering
at 1, so the next wave's per-batch overwrite silently replaces a
pending wave's keys — lost deletes.  Rotate the checkpoint only
after `compact_index(tombstone_keys=…)` has applied and cleared the
pending set (the same maintenance-window rule as the grow daemons'
compaction).

Scale: per-batch cost is O(batch keys) — one small parquet write;
nothing scans the artifact.  The probe-side cost model is
`anti_tombstones`' (SCALE.md r10): one broadcast anti-join,
identity when no delete is pending.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from stampede_to_fresco_etl_spark.index_store import (
    apply_deletes_batch,
)


def run_delete_stream(
    spark: SparkSession,
    landing_dir: str,
    artifact_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Tail a takedown-feed directory and tombstone each batch's
    keys against `artifact_path`.  ``batch_id`` starts at 1 —
    ``batch_id=0`` stays reserved for artifact bootstraps (the other
    daemons' convention), though tombstone dirs have no bootstrap."""
    from stampede_to_fresco_etl_spark.index_store import (
        guard_daemon_dirs,
    )

    guard_daemon_dirs(artifact_path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    stream = reader.parquet(landing_dir)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_deletes_batch(
            spark,
            artifact_path,
            df.select(*key_cols),
            bid + 1,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: takedown-feed schema for the entity daemon: any column may be
#: null for entities with no presence on that side (doc-only /
#: vector-only); `index_store.ENTITY_FAMILIES` drops nulls per
#: family.
ENTITY_SCHEMA = "doc_id long, text string, vec_id long"


def run_entity_delete_stream(
    spark: SparkSession,
    landing_dir: str,
    family_paths: dict,
    checkpoint_dir: str,
    schema: StructType | str = ENTITY_SCHEMA,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """The ENTITY-level delete daemon (r11): one takedown feed of
    entity rows fans out to tombstones in EVERY listed artifact
    family via `index_store.erase_entities_batch` — the single-verb
    twin of the composed vector-ingest pipeline, closing the gap
    where per-artifact delete feeds could silently miss a family and
    retain erased content.  `family_paths` maps family name
    (`index_store.ENTITY_FAMILIES` keys) -> artifact dir.

    Exactly-once: identical to `run_delete_stream` — every family's
    tombstone write is a per-batch ``batch_id=N`` overwrite keyed by
    the checkpoint's batch id, so replaying a batch rewrites the same
    partitions with identical content in every family (convergent),
    and tombstone reads are distinct-unions.  Per-batch cost is
    O(batch keys) × families; nothing scans any artifact."""
    from stampede_to_fresco_etl_spark.index_store import (
        ENTITY_FAMILIES,
        erase_entities_batch,
        guard_daemon_dirs,
    )

    from stampede_to_fresco_etl_spark.index_store import family_dirs

    for fam in family_paths:
        if fam not in ENTITY_FAMILIES:
            raise ValueError(
                f"unknown artifact family {fam!r}; known: "
                f"{sorted(ENTITY_FAMILIES)}"
            )
    guard_daemon_dirs(
        *[d for p in family_paths.values() for d in family_dirs(p)]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        )
    stream = reader.parquet(landing_dir)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: erase_entities_batch(
            spark, df, family_paths, bid + 1
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
