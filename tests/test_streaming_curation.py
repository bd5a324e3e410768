"""Streaming quality router ≡ batch filter: the stream's keep/drop
partition union must equal the batch `score_and_route` of the same
corpus row-for-row, partitions cover the input exactly, audit
counters add up, and crash-replay converges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.streaming.curation_stream import (
    apply_curation_batch,
    run_quality_router,
    score_and_route,
)
from stampede_to_fresco_etl_spark.streaming.dedup_stream import DOC_SCHEMA

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k)
        for k in ("landing", "keep", "drop", "stats", "ckpt")
    }
    (tmp_path / "landing").mkdir()
    return d


def _waves(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    # a junk wave the filter must actually drop, on top of real docs
    junk = spark.createDataFrame(
        [
            (90001, "x"),
            (90002, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbb ccccccccccccccccc"),
            (90003, "1 2 3 4 5 6 7 8 9 0 11 22 33"),
            (90004, "a perfectly ordinary readable sentence of words"),
        ],
        DOC_SCHEMA,
    )
    return docs.filter(F.col("doc_id") % 2 == 0), docs.filter(
        F.col("doc_id") % 2 == 1
    ).unionByName(junk)


def test_router_stream_equals_batch(spark, dirs):
    w1, w2 = _waves(spark)
    w1.write.mode("append").parquet(dirs["landing"])
    run_quality_router(
        spark, dirs["landing"], dirs["keep"], dirs["drop"],
        dirs["stats"], dirs["ckpt"],
    ).awaitTermination(120)
    w2.write.mode("append").parquet(dirs["landing"])
    run_quality_router(
        spark, dirs["landing"], dirs["keep"], dirs["drop"],
        dirs["stats"], dirs["ckpt"],
    ).awaitTermination(120)

    kept = {
        r["doc_id"] for r in spark.read.parquet(dirs["keep"]).collect()
    }
    dropped = {
        r["doc_id"] for r in spark.read.parquet(dirs["drop"]).collect()
    }
    full = w1.unionByName(w2)
    want = score_and_route(full).collect()
    want_keep = {r["doc_id"] for r in want if r["keep"]}
    want_drop = {r["doc_id"] for r in want if not r["keep"]}
    assert kept == want_keep
    assert dropped == want_drop
    assert want_drop  # the junk wave exercised the drop path
    assert not (kept & dropped)
    assert len(kept) + len(dropped) == full.count()
    # audit counters add up per batch and in total
    stats = spark.read.parquet(dirs["stats"]).collect()
    assert len(stats) == 2
    for r in stats:
        assert r["n_in"] == r["n_keep"] + r["n_drop"]
    assert sum(r["n_in"] for r in stats) == full.count()


def test_router_replay_converges(spark, dirs):
    w1, w2 = _waves(spark)
    apply_curation_batch(
        spark, w1, 0, dirs["keep"], dirs["drop"], dirs["stats"]
    )
    apply_curation_batch(
        spark, w2, 1, dirs["keep"], dirs["drop"], dirs["stats"]
    )

    def snap():
        return tuple(
            sorted(map(tuple, spark.read.parquet(dirs[k]).collect()))
            for k in ("keep", "drop", "stats")
        )

    before = snap()
    apply_curation_batch(  # crash-replay of batch 1
        spark, w2, 1, dirs["keep"], dirs["drop"], dirs["stats"]
    )
    assert snap() == before
