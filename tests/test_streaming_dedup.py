"""Streaming incremental dedup ≡ batch d15 semantics: two ingest
waves through the foreachBatch body must produce exactly the pairs
the batch kernels produce on the same split — intra-wave candidates
from `lsh_candidate_pairs`, cross-wave from `lsh_pairs_between`
(never index × index) — and crash-replay of a batch must converge,
not duplicate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_pairs_between,
    minhash_signatures,
)
from stampede_to_fresco_etl_spark.streaming.dedup_stream import (
    DOC_SCHEMA,
    apply_dedup_batch,
    run_incremental_dedup,
)

BODY_A = "the quick brown fox jumps over the lazy dog again"
BODY_B = "pack my box with five dozen liquor jugs tonight ok"
BODY_C = "sphinx of black quartz judge my vow so swiftly here"

WAVE1 = [(1, BODY_A), (2, BODY_A), (3, BODY_B), (4, BODY_C)]
WAVE2 = [(11, BODY_A), (12, BODY_B), (13, BODY_B), (14, "totally fresh words never seen in any prior document x")]


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k)
        for k in ("landing", "index", "matches", "ckpt")
    }
    (tmp_path / "landing").mkdir()
    return d


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _pairs(rows):
    return {(r["new_doc"], r["matched_doc"], r["kind"]) for r in rows}


def test_two_waves_match_batch_kernels(spark, dirs):
    _docs(spark, WAVE1).write.mode("append").parquet(dirs["landing"])
    run_incremental_dedup(
        spark, dirs["landing"], dirs["index"], dirs["matches"],
        dirs["ckpt"],
    ).awaitTermination(120)
    _docs(spark, WAVE2).write.mode("append").parquet(dirs["landing"])
    run_incremental_dedup(
        spark, dirs["landing"], dirs["index"], dirs["matches"],
        dirs["ckpt"],
    ).awaitTermination(120)

    got = _pairs(spark.read.parquet(dirs["matches"]).collect())

    s1 = minhash_signatures(_docs(spark, WAVE1), "doc_id", "text", 6)
    s2 = minhash_signatures(_docs(spark, WAVE2), "doc_id", "text", 6)
    want = set()
    for sigs in (s1, s2):
        for r in lsh_candidate_pairs(sigs, 6, 3).collect():
            want.add((r["doc_a"], r["doc_b"], "batch"))
    for r in lsh_pairs_between(s2, s1, 6, 3).collect():
        want.add((r["new_doc"], r["indexed_doc"], "index"))

    assert got == want
    # the structural guarantees, spelled out:
    w1_ids = {d for d, _ in WAVE1}
    cross = {(a, b) for a, b, k in got if k == "index"}
    assert cross and all(
        a not in w1_ids and b in w1_ids for a, b in cross
    )  # cross pairs always (new, indexed) — never index×index
    # index is the stored band table: bands rows per doc, every doc
    # exactly once
    idx = spark.read.parquet(dirs["index"])
    n_docs = len(WAVE1) + len(WAVE2)
    assert idx.select("doc").distinct().count() == n_docs
    assert idx.count() == n_docs * 3  # 3 bands per doc
    # partitions are checkpoint-id + 1 — batch_id=0 is reserved for
    # the snapshot bootstrap (index_store)
    assert set(idx.select("batch_id").distinct().toPandas()["batch_id"]) == {1, 2}


def test_replay_converges(spark, dirs):
    """Re-applying a batch with the same batch_id (the checkpoint's
    crash-replay) must leave matches and index byte-identical —
    partition overwrite, and the probe excludes the batch's own
    partition already present in the index."""
    apply_dedup_batch(
        spark, _docs(spark, WAVE1), 0, dirs["index"], dirs["matches"]
    )
    apply_dedup_batch(
        spark, _docs(spark, WAVE2), 1, dirs["index"], dirs["matches"]
    )
    before = sorted(
        map(tuple, spark.read.parquet(dirs["matches"]).collect())
    )
    idx_before = spark.read.parquet(dirs["index"]).count()
    assert idx_before == (len(WAVE1) + len(WAVE2)) * 3

    apply_dedup_batch(  # replay batch 1
        spark, _docs(spark, WAVE2), 1, dirs["index"], dirs["matches"]
    )
    after = sorted(
        map(tuple, spark.read.parquet(dirs["matches"]).collect())
    )
    assert after == before
    assert spark.read.parquet(dirs["index"]).count() == idx_before
    # replay must not have produced self-pairs from the batch's own
    # partition that was already in the index
    m = spark.read.parquet(dirs["matches"])
    assert m.filter(F.col("new_doc") == F.col("matched_doc")).count() == 0


def test_first_batch_empty_index(spark, dirs):
    """Batch 0 probes a nonexistent index: only intra-batch pairs."""
    apply_dedup_batch(
        spark, _docs(spark, WAVE1), 0, dirs["index"], dirs["matches"]
    )
    rows = spark.read.parquet(dirs["matches"]).collect()
    assert rows and all(r["kind"] == "batch" for r in rows)
    assert {(r["new_doc"], r["matched_doc"]) for r in rows} == {(1, 2)}


def test_incremental_covers_full_corpus_pairs(spark):
    """Completeness identity: intra(A) ∪ intra(B) ∪ cross(B→A) over
    any two-way corpus split equals the full-corpus LSH pairs —
    banding the union is the union of banded rows, so incremental
    ingestion loses NO candidate pair vs a batch recompute (and adds
    none).  This is the contract that makes the steady-state index
    safe to trust."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 != 0)
    sa = minhash_signatures(a, "doc_id", "text", 6)
    sb = minhash_signatures(b, "doc_id", "text", 6)
    sall = minhash_signatures(docs, "doc_id", "text", 6)

    def key(x, y):
        return (min(x, y), max(x, y))

    inc = set()
    for sigs in (sa, sb):
        for r in lsh_candidate_pairs(sigs, 6, 3).collect():
            inc.add(key(r["doc_a"], r["doc_b"]))
    for r in lsh_pairs_between(sb, sa, 6, 3).collect():
        inc.add(key(r["new_doc"], r["indexed_doc"]))
    full = {
        key(r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sall, 6, 3).collect()
    }
    assert inc == full and full


def test_replay_after_partial_commit(spark, dirs, tmp_path):
    """Crash between the matches write and the index write (the two
    are not atomic together): batch 1's matches exist, its index
    partition does not.  Replay must converge to exactly the clean
    two-batch state — matches rewritten identically, index completed."""
    import shutil

    apply_dedup_batch(
        spark, _docs(spark, WAVE1), 0, dirs["index"], dirs["matches"]
    )
    apply_dedup_batch(
        spark, _docs(spark, WAVE2), 1, dirs["index"], dirs["matches"]
    )
    clean_matches = sorted(
        map(tuple, spark.read.parquet(dirs["matches"]).collect())
    )
    clean_index = sorted(
        map(tuple, spark.read.parquet(dirs["index"]).collect())
    )
    # simulate the crash window: batch 1 matches committed, index not
    shutil.rmtree(dirs["index"] + "/batch_id=1")
    apply_dedup_batch(  # checkpoint replays batch 1
        spark, _docs(spark, WAVE2), 1, dirs["index"], dirs["matches"]
    )
    assert (
        sorted(map(tuple, spark.read.parquet(dirs["matches"]).collect()))
        == clean_matches
    )
    assert (
        sorted(map(tuple, spark.read.parquet(dirs["index"]).collect()))
        == clean_index
    )
