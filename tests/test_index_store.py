"""Batch ≡ stream on the SHARED stored-index artifact (VERDICT r7
item 5): the d15/v16 catalog queries materialize their index as the
same parquet layout the streaming twins grow, so a daemon pointed at
the batch-built artifact must produce exactly the batch query's
matches — and the artifact a stream bootstraps must serve the batch
probe kernels unchanged."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark import index_store
from stampede_to_fresco_etl_spark.catalog import (
    INGEST_IDX_BOUND,
    INGEST_SPLIT_SALT,
    MINHASH_BANDS,
    MINHASH_K,
    REGISTRY,
    V16_CENTROIDS,
    V16_NPROBE,
    load,
)
from stampede_to_fresco_etl_spark.functions import md5_int63
from stampede_to_fresco_etl_spark.operators.similarity import (
    ivf_probe_stored,
)
from stampede_to_fresco_etl_spark.streaming.ann_stream import (
    apply_ann_batch,
)
from stampede_to_fresco_etl_spark.streaming.dedup_stream import (
    apply_dedup_batch,
)

SF = "/root/testdata/sf0.001"


def _split(df, id_col):
    h = md5_int63(id_col, salt=INGEST_SPLIT_SALT)
    return (
        df.filter(h < F.lit(INGEST_IDX_BOUND)),
        df.filter(h >= F.lit(INGEST_IDX_BOUND)),
    )


def test_dedup_stream_on_batch_built_artifact(spark, tmp_path):
    """Run d15 (which materializes the band-table artifact), copy the
    artifact, and feed the SAME 20% batch through the streaming
    foreachBatch body pointed at the copy: the stream's index-kind
    matches must equal the batch query's rows exactly."""
    fn, _sql = REGISTRY["d15_incremental_dedup"]
    batch_rows = {
        (r["new_doc"], r["indexed_doc"], round(r["est_jaccard"], 9))
        for r in fn(spark, SF).collect()
    }

    src = (
        f"{index_store._scratch()}/index_store/dedup/"
        f"{index_store._key(SF)}"
    )
    idx_dir = str(tmp_path / "index")
    shutil.copytree(src, idx_dir)
    matches_dir = str(tmp_path / "matches")

    docs = load(spark, SF, "documents")
    _idx, new = _split(docs, "doc_id")
    apply_dedup_batch(
        spark,
        new.select("doc_id", "text"),
        batch_id=1,
        index_dir=idx_dir,
        matches_dir=matches_dir,
        num_hashes=MINHASH_K,
        bands=MINHASH_BANDS,
    )
    stream_rows = {
        (r["new_doc"], r["matched_doc"], round(r["est_jaccard"], 9))
        for r in spark.read.parquet(matches_dir)
        .filter(F.col("kind") == "index")
        .collect()
    }
    assert stream_rows == batch_rows
    assert len(batch_rows) > 0
    # ... and the stream appended the batch's own signatures beside
    # the snapshot bootstrap, same band-table schema
    idx = spark.read.parquet(idx_dir)
    assert set(idx.select("batch_id").distinct().toPandas()["batch_id"]) == {
        0,
        1,
    }
    boot = spark.read.parquet(f"{src}/batch_id=0")
    assert [f.name for f in idx.drop("batch_id").schema.fields] == [
        f.name for f in boot.schema.fields
    ]


def test_ann_stream_on_batch_built_artifact(spark, tmp_path):
    """Same contract on the vector side: v16 materializes centroid +
    assignment parquet; the ann_stream body pointed at a copy must
    reproduce v16's matches row-for-row (shared `ivf_probe_stored`
    kernel), and v16's probe over the STREAM-grown index must see the
    appended batch."""
    fn, _sql = REGISTRY["v16_incremental_ann"]
    batch_rows = {
        (r["new_id"], r["indexed_id"], round(r["cos_sim"], 9))
        for r in fn(spark, SF).collect()
    }

    base = (
        f"{index_store._scratch()}/index_store/ann/{index_store._key(SF)}"
    )
    idx_dir = str(tmp_path / "index")
    cent_dir = str(tmp_path / "centroids")
    shutil.copytree(f"{base}/index", idx_dir)
    shutil.copytree(f"{base}/centroids", cent_dir)
    matches_dir = str(tmp_path / "matches")

    emb = load(spark, SF, "embeddings")
    _idx, new = _split(emb, "vec_id")
    apply_ann_batch(
        spark,
        new.select("vec_id", "embedding"),
        batch_id=1,
        index_dir=idx_dir,
        matches_dir=matches_dir,
        centroids_dir=cent_dir,
        n_centroids=V16_CENTROIDS,
        n_probe=V16_NPROBE,
    )
    stream_rows = {
        (r["new_id"], r["indexed_id"], round(r["cos_sim"], 9))
        for r in spark.read.parquet(matches_dir).collect()
    }
    assert stream_rows == batch_rows
    assert len(batch_rows) > 0

    # batch probe over the STREAM-GROWN artifact: each probed vector
    # now collides with its own appended index row (cos_sim = 1.0)
    grown = index_store.read_ann_index(spark, idx_dir)
    cents = index_store.read_ann_centroids(spark, cent_dir)
    probes = new.select(F.col("vec_id").alias("new_id"), "embedding")
    top = ivf_probe_stored(
        grown,
        cents,
        probes,
        probe_id_col="new_id",
        k=1,
        n_probe=V16_NPROBE,
        broadcast_probes=False,
    )
    self_hits = top.filter(F.col("vec_id") == F.col("new_id")).count()
    assert self_hits == probes.count()
