"""Streaming PQ-codes maintenance ≡ the batch code build: a
snapshot-bootstrapped codes artifact grown by the daemon over the
rest of the corpus must hold exactly the codes catalog v11 computes
over the full corpus (shared `pq_encode` kernel + one frozen
codebook), and crash-replay of a batch must converge."""

from __future__ import annotations

from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark import index_store
from stampede_to_fresco_etl_spark.catalog import (
    REGISTRY,
    load,
    pq_seed_codebook,
)
from stampede_to_fresco_etl_spark.operators.similarity import pq_encode
from stampede_to_fresco_etl_spark.streaming.pq_codes_stream import (
    apply_pq_codes_batch,
    run_pq_codes_stream,
)

SF = "/root/testdata/sf0.001"


def _code_set(df):
    return {
        (
            r["vec_id"], r["code0"], r["code1"], r["code2"], r["code3"],
            r["recon_err"],
        )
        for r in df.collect()
    }


def test_bootstrap_then_stream_equals_batch_build(spark, tmp_path):
    """Deployment shape: the codebook is trained once on the
    snapshot and published as the companion; the snapshot's codes
    land as batch_id=0 (`index_store.pq_codes_dir`'s layout); the
    daemon encodes later waves against the SAME frozen codebook.
    The union must equal v11's one-shot full-corpus build."""
    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    seeds = pq_seed_codebook(emb)
    cut = emb.agg(
        F.expr("percentile(vec_id, 0.5)").cast("long").alias("c")
    ).collect()[0]["c"]
    half1 = emb.filter(F.col("vec_id") <= cut)
    half2 = emb.filter(F.col("vec_id") > cut)

    codes_dir = str(tmp_path / "codes")
    codebook_dir = str(tmp_path / "codebook")
    ckpt = str(tmp_path / "ckpt")
    landing = str(tmp_path / "landing")

    # snapshot bootstrap: codebook companion + batch_id=0 codes
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(seeds)],
        "code int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(codebook_dir)
    pq_encode(half1, seeds).write.mode("overwrite").parquet(
        f"{codes_dir}/batch_id=0"
    )

    half2.write.mode("append").parquet(landing)
    run_pq_codes_stream(
        spark, landing, codes_dir, codebook_dir, ckpt
    ).awaitTermination(120)

    grown = _code_set(index_store.read_pq_codes(spark, codes_dir))
    full = _code_set(REGISTRY["v11_pq_codes"][0](spark, SF))
    assert grown == full and len(full) > 0
    # daemon partitions sit beside the snapshot (ids >= 1)
    bids = {
        r["batch_id"]
        for r in spark.read.parquet(codes_dir)
        .select("batch_id")
        .distinct()
        .collect()
    }
    assert 0 in bids and len(bids) > 1


def test_first_batch_seeds_codebook_and_replay_converges(
    spark, tmp_path
):
    """With no companion on disk, the first batch seeds the codebook
    from its k smallest vec_ids (deterministic), and re-applying the
    same batch id leaves codes and codebook byte-identical."""
    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    codes_dir = str(tmp_path / "codes")
    codebook_dir = str(tmp_path / "codebook")

    apply_pq_codes_batch(spark, batch, 1, codes_dir, codebook_dir)
    codes1 = _code_set(spark.read.parquet(codes_dir).drop("batch_id"))
    book1 = sorted(
        map(tuple, spark.read.parquet(codebook_dir).collect())
    )
    assert len(codes1) == batch.count()

    apply_pq_codes_batch(spark, batch, 1, codes_dir, codebook_dir)
    codes2 = _code_set(spark.read.parquet(codes_dir).drop("batch_id"))
    book2 = sorted(
        map(tuple, spark.read.parquet(codebook_dir).collect())
    )
    assert codes1 == codes2 and book1 == book2

    # the codebook's own vectors (the batch's 16 smallest ids, by
    # the seeding rule) encode to themselves: zero reconstruction
    # error in every subspace
    probe = {r[0]: r for r in codes1}
    seed_ids = sorted(probe)[:16]
    assert all(probe[vid][5] == 0.0 for vid in seed_ids)


def test_codebook_refresh_swaps_codes_and_book(spark, tmp_path):
    """refresh_pq_codes: grow codes under codebook A, refresh to
    codebook B — afterwards the artifacts hold exactly
    pq_encode(corpus, B) as one batch_id=0 snapshot plus B as the
    companion, with the A-era growth partitions gone."""
    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    codes_dir = str(tmp_path / "codes")
    book_dir = str(tmp_path / "codebook")
    for i in (1, 2):
        apply_pq_codes_batch(
            spark, emb.filter(F.col("vec_id") % 2 == i - 1), i,
            codes_dir, book_dir,
        )
    # codebook B: a different deterministic sample (next 16 ids)
    rows = (
        emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 32))
        .orderBy("vec_id")
        .collect()
    )
    seeds_b = [[float(x) for x in r["embedding"]] for r in rows]
    index_store.refresh_pq_codes(
        spark, codes_dir, book_dir, emb, seeds_b
    )
    got = _code_set(index_store.read_pq_codes(spark, codes_dir))
    want = _code_set(pq_encode(emb, seeds_b))
    assert got == want and len(want) > 0
    bids = {
        r["batch_id"]
        for r in spark.read.parquet(codes_dir)
        .select("batch_id")
        .distinct()
        .collect()
    }
    assert bids == {0}
    book = sorted(
        (r["code"], tuple(r["cv"]))
        for r in spark.read.parquet(book_dir).collect()
    )
    assert book == sorted(
        (i, tuple(v)) for i, v in enumerate(seeds_b)
    )


def test_empty_first_batch_defers_codebook_seeding(spark, tmp_path):
    """An EMPTY first batch must not freeze (and publish) an empty
    codebook — the first batch that carries vectors seeds it, and
    codes come out identical to the never-empty run."""
    import os

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    empty = batch.filter(F.lit(False))
    codes_dir = str(tmp_path / "codes")
    codebook_dir = str(tmp_path / "codebook")

    apply_pq_codes_batch(spark, empty, 1, codes_dir, codebook_dir)
    assert not os.path.exists(codebook_dir)
    assert not os.path.exists(codes_dir)

    apply_pq_codes_batch(spark, batch, 2, codes_dir, codebook_dir)
    grown = _code_set(spark.read.parquet(codes_dir).drop("batch_id"))

    ref_codes = str(tmp_path / "ref_codes")
    ref_book = str(tmp_path / "ref_book")
    apply_pq_codes_batch(spark, batch, 1, ref_codes, ref_book)
    assert grown == _code_set(
        spark.read.parquet(ref_codes).drop("batch_id")
    )


def test_refresh_refuses_catalog_snapshot_artifact(spark, tmp_path):
    """The catalog-managed codes snapshot is pinned to the v11 seed
    codebook (oracle contract + session ADC tables) — refresh must
    refuse it and leave daemon-managed pairs as its domain."""
    import pytest

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    catalog_path = (
        f"{index_store._scratch()}/index_store/pq_codes/"
        f"{index_store._key(SF)}"
    )
    with pytest.raises(ValueError, match="refuses the catalog"):
        index_store.refresh_pq_codes(
            spark,
            catalog_path,
            str(tmp_path / "book"),
            emb,
            pq_seed_codebook(emb),
        )
