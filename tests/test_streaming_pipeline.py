"""End-to-end streaming ingest pipeline: gate → dedup-probe → admit.
The composition must (a) partition every arriving doc into exactly
one of drop/dup/admitted, (b) grow the index by ADMITTED docs only —
a later duplicate of a rejected doc matches the surviving copy, not
the rejected one, (c) replay-converge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.streaming.curation_stream import (
    score_and_route,
)
from stampede_to_fresco_etl_spark.streaming.dedup_stream import DOC_SCHEMA
from stampede_to_fresco_etl_spark.streaming.ingest_pipeline import (
    apply_ingest_batch,
    run_ingest_pipeline,
)

GOOD_A = "the quick brown fox jumps over the lazy dog again"
GOOD_B = "pack my box with five dozen liquor jugs tonight ok"
GOOD_C = "sphinx of black quartz judge my vow so swiftly here"
JUNK = "x"

WAVE1 = [
    (1, GOOD_A),
    (2, GOOD_A),   # intra-batch dup of 1 → dup sink, matched 1
    (3, GOOD_B),
    (4, JUNK),     # quality-dropped
]
WAVE2 = [
    (11, GOOD_A),  # dup of INDEXED doc 1 (2 was never indexed)
    (12, GOOD_C),  # novel → admitted
    (13, JUNK),    # quality-dropped
]


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k)
        for k in ("landing", "drop", "dup", "admitted", "index", "ckpt")
    }
    (tmp_path / "landing").mkdir()
    return d


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _ids(spark, path):
    return {r["doc_id"] for r in spark.read.parquet(path).collect()}


def test_pipeline_two_waves(spark, dirs):
    _docs(spark, WAVE1).write.mode("append").parquet(dirs["landing"])
    run_ingest_pipeline(
        spark, dirs["landing"], dirs["drop"], dirs["dup"],
        dirs["admitted"], dirs["index"], dirs["ckpt"],
    ).awaitTermination(120)
    _docs(spark, WAVE2).write.mode("append").parquet(dirs["landing"])
    run_ingest_pipeline(
        spark, dirs["landing"], dirs["drop"], dirs["dup"],
        dirs["admitted"], dirs["index"], dirs["ckpt"],
    ).awaitTermination(120)

    dropped = _ids(spark, dirs["drop"])
    dup = {
        r["doc_id"]: r["matched_doc"]
        for r in spark.read.parquet(dirs["dup"]).collect()
    }
    admitted = _ids(spark, dirs["admitted"])

    # the gate is exactly score_and_route
    want_drop = {
        r["doc_id"]
        for r in score_and_route(
            _docs(spark, WAVE1 + WAVE2)
        ).collect()
        if not r["keep"]
    }
    assert dropped == want_drop == {4, 13}
    # dup routing: 2 matched intra-batch against 1; 11 matched the
    # INDEX copy 1 (2 never entered the index)
    assert dup == {2: 1, 11: 1}
    assert admitted == {1, 3, 12}
    # exactly-one-sink partition of every arriving doc
    all_ids = {d for d, _ in WAVE1 + WAVE2}
    assert dropped | set(dup) | admitted == all_ids
    assert not (dropped & set(dup)) and not (dropped & admitted)
    assert not (set(dup) & admitted)
    # index holds bands for admitted docs only (3 bands each)
    idx = spark.read.parquet(dirs["index"])
    assert {r["doc"] for r in idx.collect()} == admitted
    assert idx.count() == len(admitted) * 3


def test_pipeline_replay_converges(spark, dirs):
    apply_ingest_batch(
        spark, _docs(spark, WAVE1), 0, dirs["drop"], dirs["dup"],
        dirs["admitted"], dirs["index"],
    )
    apply_ingest_batch(
        spark, _docs(spark, WAVE2), 1, dirs["drop"], dirs["dup"],
        dirs["admitted"], dirs["index"],
    )

    def snap():
        return tuple(
            sorted(map(tuple, spark.read.parquet(dirs[k]).collect()))
            for k in ("drop", "dup", "admitted", "index")
        )

    before = snap()
    apply_ingest_batch(  # crash-replay of batch 1
        spark, _docs(spark, WAVE2), 1, dirs["drop"], dirs["dup"],
        dirs["admitted"], dirs["index"],
    )
    assert snap() == before
