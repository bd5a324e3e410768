"""The delete daemon (`streaming.delete_stream`) — takedown feed →
tombstone partitions: probes hide the keys after each wave, replay
converges, and the maintenance compaction erases physically.  The
batch twin (`apply_deletes_batch`) is pinned family-by-family in
test_index_store; here the STREAM drives it through a real
checkpointed query."""

from __future__ import annotations

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

    # replay convergence: a fresh checkpoint re-delivers everything;
    # tombstone content must not change
    before = {
        r["fp"]
        for r in index_store.read_tombstones(spark, fp_dir).collect()
    }
    run_delete_stream(
        spark,
        landing,
        fp_dir,
        ["fp"],
        str(tmp_path / "ckpt2"),
        "fp string",
    ).awaitTermination(120)
    after = {
        r["fp"]
        for r in index_store.read_tombstones(spark, fp_dir).collect()
    }
    assert after == before == deleted

    # maintenance fold: physical erase, set cleared
    index_store.compact_index(spark, fp_dir, tombstone_keys=["fp"])
    assert _live_fps(spark, fp_dir) == full - deleted
    assert index_store.read_tombstones(spark, fp_dir) is None
