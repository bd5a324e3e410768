"""End-to-end streaming ingest pipeline — the composition of the
round's three ingest-time stages in ONE foreachBatch body:

    landing batch
      → quality gate   (curation_stream.score_and_route: x13's
                        Gopher signals; rejects → drop sink)
      → dedup probe    (minhash the survivors, probe the stored LSH
                        band index; flagged near-dups → dup sink,
                        with their best indexed match)
      → admit + index  (novel docs land in the admitted sink AND
                        their band rows join the index — the corpus
                        only ever grows by quality-passing, novel
                        documents)

This is the streaming twin of the batch curation capstone (x34's
funnel / x40's e2e build): the same stage semantics, applied
incrementally at ingest so a duplicate crawl batch never reaches
tokenization.  Stage semantics are pinned to the oracle-gated batch
operators — the gate IS `score_and_route`, the probe IS
`lsh_pairs_between` — so batch ≡ stream per stage by construction,
and the composition is tested stage-by-stage
(tests/test_streaming_pipeline.py).

Exactly-once: all four sinks (drop / dup / admitted / index) are
per-batch partition overwrites keyed by the checkpoint's batch_id —
the dedup_stream replay-convergence argument applies to the whole
composition, including the index-growth rule (the probe excludes the
current batch's own index partition).

Scale: the gate is zero-shuffle column math; the probe touches the
corpus only through the band equi-join (store the index bucketed by
band key on a cluster); per-batch cost is O(|batch| + matches).
Admission rule: a doc is rejected when est_jaccard ≥ `dup_threshold`
against any INDEXED doc, or against any LOWER-doc_id gate-survivor
of the same batch — regardless of whether that lower doc is itself
admitted (lower-id-wins, TRANSITIVE: if 5 is an index dup and 9
matches only 5, 9 is dropped too, on the connected-components-dedup
reading that 9 ≈ 5 ≈ corpus makes 9 a transitive near-dup of the
corpus).  Deterministic and arrival-order-free; the alternative —
admission-aware filtering, where a doc is kept if its only matches
were themselves rejected — would need an iterative peel over match
chains and re-admit content the transitive rule treats as covered.

Staging note: a deployment usually inserts the exact-fingerprint
gate (the batch query d16 / `index_store.exact_fp_dir`) between the
quality gate and the LSH probe — md5-identical docs then skip
minhashing entirely.  It is deliberately NOT a stage here: an exact
duplicate minhashes to an identical signature, so the LSH probe
already rejects it (est_jaccard = 1.0 ≥ threshold) — the fp gate is
a cost short-circuit, not a semantic stage, and this composition
pins semantics.
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
from stampede_to_fresco_etl_spark.streaming.curation_stream import (
    score_and_route,
)
from stampede_to_fresco_etl_spark.streaming.dedup_stream import DOC_SCHEMA

DUP_THRESHOLD = 0.8


def apply_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    drop_dir: str,
    dup_dir: str,
    admitted_dir: str,
    index_dir: str,
    num_hashes: int = 6,
    bands: int = 3,
    dup_threshold: float = DUP_THRESHOLD,
) -> None:
    """One micro-batch of the full gate→dedup→admit pipeline."""
    routed = score_and_route(
        batch_df.select("doc_id", "text")
    ).localCheckpoint()
    routed.filter(~F.col("keep")).select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(f"{drop_dir}/batch_id={batch_id}")

    survivors = routed.filter(F.col("keep")).select("doc_id", "text")
    sigs = minhash_signatures(
        survivors, "doc_id", "text", num_hashes
    ).localCheckpoint()

    # duplicates against the stored index…
    dup_pairs = None
    try:
        index = spark.read.parquet(index_dir).filter(
            F.col("batch_id") != batch_id
        )
        dup_pairs = lsh_pairs_between(
            sigs,
            indexed_bands=index,
            num_hashes=num_hashes,
            bands=bands,
            materialize=False,
        ).filter(F.col("est_jaccard") >= dup_threshold)
    except AnalysisException:
        pass
    # …and within the batch (keep the LOWER doc_id — deterministic)
    intra = (
        lsh_candidate_pairs(
            sigs, num_hashes=num_hashes, bands=bands, materialize=False
        )
        .filter(F.col("est_jaccard") >= dup_threshold)
        .select(
            F.col("doc_b").alias("new_doc"),
            F.col("doc_a").alias("matched_doc"),
            "est_jaccard",
        )
    )
    if dup_pairs is not None:
        dups = intra.unionByName(
            dup_pairs.select(
                "new_doc",
                F.col("indexed_doc").alias("matched_doc"),
                "est_jaccard",
            )
        )
    else:
        dups = intra
    # one row per rejected doc: its best match (max est, min match id)
    dup_best = dups.groupBy("new_doc").agg(
        F.max_by(
            F.struct("est_jaccard", "matched_doc"),
            F.struct(
                F.col("est_jaccard"), -F.col("matched_doc")
            ),
        ).alias("best")
    ).select(
        F.col("new_doc").alias("doc_id"),
        F.col("best.matched_doc").alias("matched_doc"),
        F.col("best.est_jaccard").alias("est_jaccard"),
    ).localCheckpoint()
    dup_best.write.mode("overwrite").parquet(
        f"{dup_dir}/batch_id={batch_id}"
    )

    admitted = survivors.join(dup_best, "doc_id", "left_anti")
    admitted.write.mode("overwrite").parquet(
        f"{admitted_dir}/batch_id={batch_id}"
    )
    admitted_sigs = sigs.join(
        dup_best.select(F.col("doc_id").alias("doc")), "doc", "left_anti"
    )
    band_signatures(admitted_sigs, num_hashes, bands).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/batch_id={batch_id}")
    # growth: drop any session-cached reader of the grown dir (r13)
    from stampede_to_fresco_etl_spark.index_store import (
        invalidate_readers,
    )

    invalidate_readers(spark, index_dir)


def run_ingest_pipeline(
    spark: SparkSession,
    landing_dir: str,
    drop_dir: str,
    dup_dir: str,
    admitted_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: StructType | str = DOC_SCHEMA,
    dup_threshold: float = DUP_THRESHOLD,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    from stampede_to_fresco_etl_spark.index_store import guard_daemon_dirs

    guard_daemon_dirs(index_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    # batch id + 1: batch_id=0 is reserved for the snapshot
    # bootstrap (index_store) — see dedup_stream.run_incremental_dedup
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: apply_ingest_batch(
            spark,
            df,
            bid + 1,
            drop_dir,
            dup_dir,
            admitted_dir,
            index_dir,
            dup_threshold=dup_threshold,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
