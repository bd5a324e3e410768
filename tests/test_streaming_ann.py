"""Streaming incremental ANN ≡ batch reference: two embedding waves
through the foreachBatch body produce exactly the wave-2→wave-1
top-1 neighbors a batch computation with the SAME frozen (wave-1
seeded) centroids produces; centroids are frozen at first contact;
replay converges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.streaming.ann_stream import (
    EMB_SCHEMA,
    apply_ann_batch,
    run_incremental_ann,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k)
        for k in ("landing", "index", "matches", "cents", "ckpt")
    }
    (tmp_path / "landing").mkdir()
    return d


def _waves(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return (
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    )


def test_ann_stream_equals_batch_reference(spark, dirs):
    from stampede_to_fresco_etl_spark.operators.similarity import ivf_topk

    w1, w2 = _waves(spark)
    w1.write.mode("append").parquet(dirs["landing"])
    run_incremental_ann(
        spark, dirs["landing"], dirs["index"], dirs["matches"],
        dirs["cents"], dirs["ckpt"],
    ).awaitTermination(120)
    w2.write.mode("append").parquet(dirs["landing"])
    run_incremental_ann(
        spark, dirs["landing"], dirs["index"], dirs["matches"],
        dirs["cents"], dirs["ckpt"],
    ).awaitTermination(120)

    got = {
        r["new_id"]: (r["indexed_id"], r["cos_sim"])
        for r in spark.read.parquet(dirs["matches"]).collect()
    }
    # batch reference: ivf_topk with corpus=w1, probes=w2 — but the
    # stream's centroids were seeded from w1 (batch 0), which is
    # exactly ivf_topk's seed source when corpus=w1
    ref = ivf_topk(
        w1,
        w2.select(F.col("vec_id").alias("probe_id"), "embedding"),
        probe_id_col="probe_id",
        k=1,
        n_centroids=8,
        n_probe=2,
        broadcast_probes=False,
    ).collect()
    want = {r["probe_id"]: (r["vec_id"], r["cos_sim"]) for r in ref}
    assert got == want and got
    # centroids were frozen at batch 0 and survived batch 1
    cents = spark.read.parquet(dirs["cents"]).collect()
    assert len(cents) == 8
    # the index holds one assignment row per ingested vector
    idx = spark.read.parquet(dirs["index"])
    assert idx.count() == w1.count() + w2.count()


def test_ann_replay_converges(spark, dirs):
    w1, w2 = _waves(spark)
    apply_ann_batch(
        spark, w1, 0, dirs["index"], dirs["matches"], dirs["cents"]
    )
    apply_ann_batch(
        spark, w2, 1, dirs["index"], dirs["matches"], dirs["cents"]
    )

    def snap():
        return (
            sorted(
                (r["new_id"], r["indexed_id"], r["cos_sim"])
                for r in spark.read.parquet(dirs["matches"]).collect()
            ),
            spark.read.parquet(dirs["index"]).count(),
            sorted(
                map(tuple, spark.read.parquet(dirs["cents"]).collect())
            ),
        )

    before = snap()
    apply_ann_batch(  # crash-replay of batch 1
        spark, w2, 1, dirs["index"], dirs["matches"], dirs["cents"]
    )
    assert snap() == before
    # batch 0's matches partition exists and is empty (no index yet)
    m0 = spark.read.parquet(dirs["matches"]).filter(
        F.col("batch_id") == 0
    )
    assert m0.count() == 0


def test_empty_first_batch_defers_centroid_seeding(spark, dirs):
    """An EMPTY first batch must not freeze (and publish) an empty
    centroid table — the first batch carrying vectors seeds it, and
    the grown index matches the never-empty run exactly."""
    import os

    w1, _w2 = _waves(spark)
    empty = w1.filter(F.lit(False))
    apply_ann_batch(
        spark, empty, 1, dirs["index"], dirs["matches"], dirs["cents"]
    )
    assert not os.path.exists(dirs["cents"])
    assert not os.path.exists(dirs["index"])

    apply_ann_batch(
        spark, w1, 2, dirs["index"], dirs["matches"], dirs["cents"]
    )
    cents = spark.read.parquet(dirs["cents"]).count()
    assert cents > 0
    assigned = spark.read.parquet(dirs["index"])
    assert assigned.filter(F.col("cell").isNull()).count() == 0
    assert assigned.count() == w1.count()
