"""Streaming text-index maintenance ≡ the batch snapshot artifact:
two ingest waves through the foreachBatch body must grow postings /
doclen partitions whose UNION equals what `index_store` materializes
from the same corpus in one shot — content equality makes any probe
(x57's BM25) trivially batch ≡ stream — and crash-replay of a batch
must converge."""

from __future__ import annotations

from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark import index_store
from stampede_to_fresco_etl_spark.catalog import load
from stampede_to_fresco_etl_spark.streaming.text_index_stream import (
    apply_text_index_batch,
    read_text_totals,
    run_text_index_stream,
)

SF = "/root/testdata/sf0.001"


def _postings_set(df):
    return {
        (r["token"], r["doc_id"], r["tf"])
        for r in df.select("token", "doc_id", "tf").collect()
    }


def test_two_waves_equal_snapshot_artifact(spark, tmp_path):
    docs = load(spark, SF, "documents").select("doc_id", "text")
    landing = str(tmp_path / "landing")
    postings = str(tmp_path / "postings")
    doclen = str(tmp_path / "doclen")
    ckpt = str(tmp_path / "ckpt")
    cut = docs.agg(
        F.expr("percentile(doc_id, 0.5)").cast("long").alias("c")
    ).collect()[0]["c"]

    for wave in (
        docs.filter(F.col("doc_id") <= cut),
        docs.filter(F.col("doc_id") > cut),
    ):
        wave.write.mode("append").parquet(landing)
        run_text_index_stream(
            spark, landing, postings, doclen, ckpt
        ).awaitTermination(120)

    grown = spark.read.parquet(postings).drop("batch_id")
    snap_p, snap_l, snap_t = index_store.text_index_dirs(
        spark, SF, docs
    )
    snap = spark.read.parquet(snap_p)
    assert _postings_set(grown) == _postings_set(snap)

    grown_dl = {
        (r["doc_id"], r["dl"])
        for r in spark.read.parquet(doclen)
        .select("doc_id", "dl")
        .collect()
    }
    snap_dl = {
        (r["doc_id"], r["dl"])
        for r in spark.read.parquet(snap_l).collect()
    }
    assert grown_dl == snap_dl

    tot = read_text_totals(spark, doclen).collect()[0]
    snap_tot = spark.read.parquet(snap_t).collect()[0]
    assert tot["n_docs"] == snap_tot["n_docs"]
    assert tot["dl_sum"] == snap_tot["dl_sum"]


def test_replay_converges(spark, tmp_path):
    docs = load(spark, SF, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    postings = str(tmp_path / "postings")
    doclen = str(tmp_path / "doclen")
    apply_text_index_batch(spark, batch, 3, postings, doclen)
    first = _postings_set(spark.read.parquet(postings).drop("batch_id"))
    apply_text_index_batch(spark, batch, 3, postings, doclen)  # replay
    again = _postings_set(spark.read.parquet(postings).drop("batch_id"))
    assert first == again and len(first) > 0


def test_exact_fp_stream_equals_snapshot(spark, tmp_path):
    """Two fp-stream waves over the d16 split's indexed corpus must
    aggregate to exactly the snapshot artifact's (fp, n_docs) rows,
    so the batch probe (d16) is artifact-source-agnostic."""
    from stampede_to_fresco_etl_spark.catalog import (
        INGEST_IDX_BOUND,
        INGEST_SPLIT_SALT,
    )
    from stampede_to_fresco_etl_spark.functions import md5_int63
    from stampede_to_fresco_etl_spark.streaming.exact_fp_stream import (
        run_exact_fp_stream,
    )

    docs = load(spark, SF, "documents").select("doc_id", "text")
    idx = docs.filter(
        md5_int63("doc_id", salt=INGEST_SPLIT_SALT)
        < F.lit(INGEST_IDX_BOUND)
    )
    landing = str(tmp_path / "landing")
    fp_dir = str(tmp_path / "fps")
    ckpt = str(tmp_path / "ckpt")
    cut = idx.agg(
        F.expr("percentile(doc_id, 0.5)").cast("long").alias("c")
    ).collect()[0]["c"]
    for wave in (
        idx.filter(F.col("doc_id") <= cut),
        idx.filter(F.col("doc_id") > cut),
    ):
        wave.write.mode("append").parquet(landing)
        run_exact_fp_stream(spark, landing, fp_dir, ckpt).awaitTermination(
            120
        )

    grown = {
        (r["fp"], r["n_docs"])
        for r in index_store.read_exact_fp(spark, fp_dir).collect()
    }
    snap_dir = index_store.exact_fp_dir(spark, SF, idx)
    snap = {
        (r["fp"], r["n_docs"])
        for r in index_store.read_exact_fp(spark, snap_dir).collect()
    }
    assert grown == snap and len(grown) > 0


def test_stream_grows_snapshot_bootstrapped_text_index(spark, tmp_path):
    """The batch↔stream interop the artifact matrix advertises, on
    the text family (ADVICE r8): bootstrap the postings/doclen
    artifact from half the corpus via `index_store.text_index_dirs`
    (batch_id=0), then point the streaming daemon AT THAT DIRECTORY
    with the other half — the read must not hit 'Conflicting
    directory structures', the union must equal the full-corpus
    tokenization, and the daemon's partitions must sit beside the
    snapshot (batch ids ≥ 1)."""
    docs = load(spark, SF, "documents").select("doc_id", "text")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    # keep the per-test artifact inside tmp_path: sf_dir is only a
    # cache KEY, so without rerooting the scratch dir every pytest
    # run would leak a new orphaned tree into <repo>/.scratch
    import stampede_to_fresco_etl_spark.catalog as _cat
    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    mp.setattr(_cat, "_SCRATCH", str(tmp_path / "scratch"))
    try:
        snap_p, snap_l, _snap_t = index_store.text_index_dirs(
            spark, str(tmp_path / "corpus"), half1
        )
    finally:
        mp.undo()
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    half2.write.mode("append").parquet(landing)
    run_text_index_stream(
        spark, landing, snap_p, snap_l, ckpt
    ).awaitTermination(120)

    grown = spark.read.parquet(snap_p)
    expected = _postings_set(
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    assert _postings_set(grown) == expected

    bids = {
        r["batch_id"]
        for r in grown.select("batch_id").distinct().collect()
    }
    assert 0 in bids and all(b >= 0 for b in bids) and len(bids) > 1

    tot = read_text_totals(spark, snap_l).collect()[0]
    assert tot["n_docs"] == len({d for (_t, d, _tf) in expected})
    assert tot["dl_sum"] == sum(tf for (_t, _d, tf) in expected)


def test_postings_bucket_layout_and_probe_pruning(spark):
    """VERDICT r9 item 3: the postings artifact is directory-
    partitioned by token_bucket (one file per bucket per batch
    partition — the sliver-file lesson), the Spark- and driver-side
    bucket hashes agree on every stored token, and x57's probe scan
    carries the bucket literals as PartitionFilters so only the
    terms' directories are listed/opened."""
    import contextlib
    import io
    import os

    from stampede_to_fresco_etl_spark.catalog import (
        _X57_TERMS,
        q_bm25_stored_index,
    )

    docs = load(spark, SF, "documents").select("doc_id", "text")
    postings, _dl, _tot = index_store.text_index_dirs(spark, SF, docs)

    # layout: token_bucket=K dirs under batch_id=0, one file each
    b0 = os.path.join(postings, "batch_id=0")
    buckets = [d for d in os.listdir(b0) if d.startswith("token_bucket=")]
    assert 1 <= len(buckets) <= index_store.TEXT_TOKEN_BUCKETS
    for d in buckets:
        files = [
            f
            for f in os.listdir(os.path.join(b0, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1

    # engine bucket == driver twin on every stored token
    rows = (
        spark.read.parquet(postings)
        .select("token", "token_bucket")
        .distinct()
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert int(r["token_bucket"]) == index_store.token_bucket_of(
            r["token"]
        )

    # probe plan: bucket literals reach PartitionFilters
    df = q_bm25_stored_index(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    want = sorted({index_store.token_bucket_of(t) for t in _X57_TERMS})
    seg = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "token_bucket" in ln
    ]
    assert seg, plan
    assert all(str(b) in seg[0] for b in want)


def test_postings_layout_manifest_gates_bucket_count(spark, tmp_path):
    """VERDICT r10 watch item 3a: TEXT_TOKEN_BUCKETS is baked into
    every stored token_bucket value, so a persisted artifact probed
    (or grown) by a build with a different bucket count would
    silently mis-prune.  Pins: the snapshot bootstrap and the daemon
    batch both stamp the layout manifest; the artifact path is keyed
    by the bucket count; a mismatched manifest refuses both the
    probe-side assert and the daemon batch; an absent manifest
    (pre-r11 artifact) passes."""
    import pytest as _pytest

    import stampede_to_fresco_etl_spark.catalog as _cat

    docs = load(spark, SF, "documents").select("doc_id", "text").limit(20)
    mp = _pytest.MonkeyPatch()
    mp.setattr(_cat, "_SCRATCH", str(tmp_path / "scratch"))
    try:
        snap_p, _l, _t = index_store.text_index_dirs(
            spark, str(tmp_path / "corpus"), docs
        )
    finally:
        mp.undo()
    # path keyed by bucket count (the _{n}c convention)
    assert f"_{index_store.TEXT_TOKEN_BUCKETS}tb/" in snap_p
    # bootstrap stamped the manifest with the current count
    man = spark.read.parquet(
        index_store.postings_layout_dir(snap_p)
    ).collect()
    assert [r["token_buckets"] for r in man] == [
        index_store.TEXT_TOKEN_BUCKETS
    ]
    index_store.assert_postings_layout(spark, snap_p)  # no raise

    # daemon batch stamps a fresh artifact's manifest too
    dp, dl = str(tmp_path / "dp"), str(tmp_path / "dl")
    apply_text_index_batch(spark, docs, 1, dp, dl)
    assert spark.read.parquet(
        index_store.postings_layout_dir(dp)
    ).collect()[0]["token_buckets"] == index_store.TEXT_TOKEN_BUCKETS

    # a manifest from a DIFFERENT bucket count refuses probe + grow
    spark.createDataFrame(
        [(8,)], "token_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        index_store.postings_layout_dir(dp)
    )
    with _pytest.raises(ValueError, match="token_buckets=8"):
        index_store.assert_postings_layout(spark, dp)
    with _pytest.raises(ValueError, match="token_buckets=8"):
        apply_text_index_batch(spark, docs, 2, dp, dl)

    # absent manifest (pre-r11 artifact): the PROBE passes …
    import shutil as _sh

    _sh.rmtree(index_store.postings_layout_dir(dp))
    index_store.assert_postings_layout(spark, dp)
    # … but GROWING a non-empty manifest-less artifact refuses
    # (ADVICE r11): the stored token_bucket values may come from a
    # different count, and stamping the current one would certify a
    # mixed layout forever
    with _pytest.raises(ValueError, match="no layout manifest"):
        apply_text_index_batch(spark, docs, 3, dp, dl)
    # the explicit migration step (verify + stamp) re-enables growth
    index_store.write_postings_layout(spark, dp)
    apply_text_index_batch(spark, docs, 3, dp, dl)


def test_postings_layout_mark_invalidation_and_empty_manifest(
    spark, tmp_path
):
    """ADVICE r11: (a) a session-cached PASSED layout verdict must
    not survive a manifest rewrite — `write_postings_layout` clears
    the #layout_ok mark, so a later mismatched stamp is seen; (b) an
    empty manifest (crash mid-overwrite) raises a clear error, not a
    bare IndexError."""
    import pytest as _pytest

    dp, dl = str(tmp_path / "dp"), str(tmp_path / "dl")
    docs = load(spark, SF, "documents").select("doc_id", "text").limit(5)
    apply_text_index_batch(spark, docs, 1, dp, dl)
    # cache the PASS verdict
    index_store.assert_postings_layout(spark, dp)
    assert index_store.session_marker(spark, f"{dp}#layout_ok")
    # a manifest rewrite through the sanctioned writer invalidates it
    index_store.write_postings_layout(spark, dp)
    assert not index_store.session_marker(spark, f"{dp}#layout_ok")
    # an empty manifest dir (interrupted overwrite) raises clearly
    import shutil as _sh

    man = index_store.postings_layout_dir(dp)
    _sh.rmtree(man)
    spark.createDataFrame(
        [], "token_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(man)
    with _pytest.raises(ValueError, match="empty"):
        index_store.assert_postings_layout(spark, dp)
