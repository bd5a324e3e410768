"""Unit tests for similarity search (exact vs LSH recall) and the
multimodal mapInPandas plumbing."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    binary_meta,
    decode_image_meta,
    extract_features,
)
from stampede_to_fresco_etl_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    lsh_topk,
)


def _vecs(spark, vectors):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vectors)]
    )


def test_brute_force_topk_exact(spark):
    corpus = _vecs(
        spark,
        [[1, 0, 0], [0.9, 0.1, 0], [0, 1, 0], [-1, 0, 0]],
    )
    probes = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = brute_force_topk(corpus, probes, k=2).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["vec_id"] for r in ranked] == [0, 1]
    assert math.isclose(ranked[0]["cos_sim"], 1.0, rel_tol=1e-12)


def test_zero_norm_vector_yields_null_not_error(spark):
    # ANSI mode raises DIVIDE_BY_ZERO on x/0; the nullif guard must
    # turn zero-norm vectors into null similarity instead of a crash
    corpus = _vecs(spark, [[1, 0, 0], [0, 0, 0]])
    probes = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    rows = brute_force_topk(corpus, probes, k=5).collect()
    by_vec = {r["vec_id"]: r["cos_sim"] for r in rows}
    assert by_vec[0] == 1.0
    assert by_vec.get(1) is None or 1 not in by_vec


def test_lsh_recall_against_exact(spark, tmp_path):
    # On the real embeddings table, LSH top-k with few planes should
    # recover a large fraction of the exact top-k (same-bucket bias).
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = brute_force_topk(emb, probes, k=5).collect()
    approx = lsh_topk(emb, probes, k=5, num_planes=2).collect()
    exact_set = {(r["probe_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["probe_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, f"LSH recall too low: {recall}"
    # the probe itself always lands in its own bucket at rank 1
    own = [r for r in approx if r["vec_id"] == r["probe_id"]]
    assert all(r["rank"] == 1 for r in own) and len(own) == 3


def test_ivf_recall_and_determinism(spark):
    from pyspark.sql import functions as F

    from stampede_to_fresco_etl_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = brute_force_topk(emb, probes, k=5).collect()
    approx = ivf_topk(emb, probes, k=5, n_centroids=8, n_probe=3).collect()
    es = {(r["probe_id"], r["vec_id"]) for r in exact}
    asx = {(r["probe_id"], r["vec_id"]) for r in approx}
    assert len(asx) == 15  # k results per probe
    assert len(es & asx) / len(es) >= 0.5
    again = ivf_topk(emb, probes, k=5, n_centroids=8, n_probe=3).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))
    # full probe sweep degrades to exact search
    full = ivf_topk(emb, probes, k=5, n_centroids=8, n_probe=8).collect()
    assert {(r["probe_id"], r["vec_id"]) for r in full} == es


def test_embedding_near_dups_finds_duplicate_vector(spark):
    base = [0.1 * i for i in range(8)]
    near = [0.1 * i + (0.001 if i == 0 else 0.0) for i in range(8)]
    far = [1.0, -1.0, 0.5, -0.5, 0.2, -0.2, 0.9, -0.9]
    df = _vecs(spark, [base, near, far])
    out = embedding_near_dups(df, num_planes=4, dim=8, min_cosine=0.99)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_near_dups_plane_scaling_and_multiprobe(spark):
    from stampede_to_fresco_etl_spark.operators.similarity import (
        recommended_planes,
    )

    # sizing rule: buckets track corpus size, clamped to [4, 24]
    assert recommended_planes(500) == 4
    assert recommended_planes(10**6) == 10
    assert recommended_planes(10**9) == 20
    assert recommended_planes(10**12) == 24

    # identical vectors always share every sketch bit -> found at any
    # plane count; multi-probe can only ADD pairs (superset recall)
    from stampede_to_fresco_etl_spark.catalog import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    for planes in (4, 12):
        single = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups(
                emb, num_planes=planes, min_cosine=0.3
            ).collect()
        }
        multi = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups(
                emb, num_planes=planes, min_cosine=0.3, multi_probe=True
            ).collect()
        }
        assert single <= multi
        assert len(single) > 0
    # auto-sized planes (num_planes=None) runs and is deterministic
    auto = embedding_near_dups(emb, min_cosine=0.3).count()
    assert auto == embedding_near_dups(emb, min_cosine=0.3).count()


def test_decode_image_meta_plumbing(spark):
    rows = [
        Row(media_id=1, kind="image", payload=b"\x89PNG fake bytes",
            mime="image/png"),
        Row(media_id=2, kind="image", payload=None, mime=None),
    ]
    df = spark.createDataFrame(rows)
    out = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    r1 = out[1]
    assert r1["n_bytes"] == 15
    assert len(r1["digest"]) == 32
    assert 16 <= r1["width"] <= 4096 and 16 <= r1["height"] <= 4096
    r2 = out[2]
    assert r2["n_bytes"] is None and r2["digest"] is None

    # deterministic: same payload -> same fake dimensions
    again = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    assert again[1]["width"] == r1["width"]


def test_extract_features_shape(spark):
    from stampede_to_fresco_etl_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=b"abc", mime=None)],
        schema=MEDIA_SCHEMA,
    )
    r = extract_features(df).first()
    assert len(r["feature"]) == FEATURE_DIM
    assert all(-1.0 <= x <= 1.0 for x in r["feature"])


def test_binary_meta_sql_path(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello")]).withColumn(
        "payload", F.col("text").cast("binary")
    )
    r = binary_meta(df, "doc_id", "payload").first()
    assert r["n_bytes"] == 5
    assert r["prefix_hex"] == "68656c6c6f"
    import hashlib

    assert r["digest"] == hashlib.md5(b"hello").hexdigest()


def test_resize_image_hand_computed(spark):
    import numpy as np

    from stampede_to_fresco_etl_spark.operators.multimodal import (
        resize_image,
    )

    # 2×2 RGB image: pixels A B / C D; NN floor-scale to 1×1 keeps A
    a, b, c, d = (1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)
    img = bytes(a + b + c + d)
    df = spark.createDataFrame(
        [Row(media_id=1, payload=img, width=2, height=2)]
    )
    r = resize_image(df, 1, 1).first()
    assert bytes(r["payload"]) == bytes(a)
    assert r["width"] == 1 and r["height"] == 1

    # upscale 2×2 -> 4×4 duplicates every pixel in a 2×2 block
    up = resize_image(df, 4, 4).first()
    got = np.frombuffer(bytes(up["payload"]), dtype=np.uint8).reshape(
        4, 4, 3
    )
    src = np.frombuffer(img, dtype=np.uint8).reshape(2, 2, 3)
    for y in range(4):
        for x in range(4):
            assert (got[y, x] == src[y // 2, x // 2]).all()


def test_resize_image_malformed_and_null(spark):
    from stampede_to_fresco_etl_spark.operators.multimodal import (
        resize_image,
    )

    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=b"short", width=2, height=2),
            Row(media_id=2, payload=None, width=2, height=2),
            Row(media_id=3, payload=b"\x00" * 12, width=None, height=2),
        ]
    )
    rows = {r["media_id"]: r for r in resize_image(df, 1, 1).collect()}
    assert all(rows[i]["payload"] is None for i in (1, 2, 3))
    assert all(rows[i]["digest"] is None for i in (1, 2, 3))


def test_near_dups_arrow_engine_matches_column(spark):
    """The arrow (cogrouped numpy gram) engine must produce the SAME
    pair set as the column engine at every probe setting; cos_sim may
    differ only by BLAS summation-order ulps."""
    from stampede_to_fresco_etl_spark.catalog import load
    from stampede_to_fresco_etl_spark.operators.similarity import (
        embedding_near_dups,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    for mp in (False, True):
        col = {
            (r["id_a"], r["id_b"]): r["cos_sim"]
            for r in embedding_near_dups(
                emb, num_planes=4, dim=64, min_cosine=0.3, multi_probe=mp
            ).collect()
        }
        arr = {
            (r["id_a"], r["id_b"]): r["cos_sim"]
            for r in embedding_near_dups(
                emb, num_planes=4, dim=64, min_cosine=0.3, multi_probe=mp,
                engine="arrow",
            ).collect()
        }
        assert set(arr) == set(col), f"pair set diverged (multi_probe={mp})"
        assert all(abs(arr[k] - col[k]) < 1e-12 for k in arr)
    # and no duplicate pair rows from the probe explode
    n_rows = embedding_near_dups(
        emb, num_planes=4, dim=64, min_cosine=0.3, multi_probe=True,
        engine="arrow",
    ).count()
    assert n_rows == len(arr)


def test_sample_frames_uniform_and_malformed(spark):
    """4-frame clip sampled at k=2 -> frames 0 and 2; a 2-frame clip
    at n_samples=4 yields only its 2 frames; malformed payload yields
    one all-NULL row (never dropped, never fatal)."""
    import hashlib

    from stampede_to_fresco_etl_spark.operators.multimodal import (
        sample_frames,
    )

    fb = 4
    clip4 = bytes(range(16))          # 4 frames of 4 bytes
    clip2 = bytes(range(100, 108))    # 2 frames
    bad = b"xyz"                      # not a frame multiple
    df = spark.createDataFrame(
        [(1, clip4), (2, clip2), (3, bad), (4, None)],
        "media_id long, payload binary",
    )
    out = sample_frames(df, 2, fb).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)

    got4 = sorted((r["frame_idx"], bytes(r["frame"])) for r in by_id[1])
    assert got4 == [(0, clip4[0:4]), (2, clip4[8:12])]
    assert by_id[1][0]["digest"] == hashlib.md5(
        bytes(by_id[1][0]["frame"]).hex().encode()
    ).hexdigest()

    got2 = sorted((r["frame_idx"], bytes(r["frame"])) for r in by_id[2])
    assert got2 == [(0, clip2[0:4]), (1, clip2[4:8])]

    for mid in (3, 4):
        assert len(by_id[mid]) == 1
        r = by_id[mid][0]
        assert r["frame_idx"] is None and r["frame"] is None


def test_centroid_broadcast_table_path_bit_exact(spark, monkeypatch):
    """Above `_LITERAL_CENTROID_MAX` the centroid table must ride ONE
    broadcast row instead of inlined literals (the measured >16-cell
    codegen cliff — SCALE.md r8) and produce bit-identical results:
    a 64-cell config now runs without the 10x literal-tree penalty,
    and the two paths share every downstream fold."""
    from stampede_to_fresco_etl_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    assert S._LITERAL_CENTROID_MAX < 64
    table_df = S.ivf_topk(emb, probes, k=5, n_centroids=64, n_probe=4)
    # plan canary: the 1-row centroid side must come in as a broadcast
    # (BroadcastNestedLoopJoin), never a data-sized Exchange
    plan = table_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    table = table_df.collect()

    monkeypatch.setattr(S, "_LITERAL_CENTROID_MAX", 10_000)
    lit = S.ivf_topk(emb, probes, k=5, n_centroids=64, n_probe=4).collect()
    assert sorted(map(tuple, table)) == sorted(map(tuple, lit))
    assert len(table) == 15  # k per probe


def test_ivf_probe_stored_broadcast_table_path(spark, monkeypatch):
    """Same two-path equivalence on the stored-index probe kernel
    (shared by v16 and ann_stream)."""
    from stampede_to_fresco_etl_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = S.seed_centroids(emb, "vec_id", "embedding", 24)
    assigned = (
        S._with_centroid_col(
            emb.select(
                "vec_id", S.as_double_vec("embedding").alias("v")
            ),
            cents,
        )
        .withColumn(
            "d",
            F.transform(
                F.col("__cents"), lambda c: S._sqdist(F.col("v"), c)
            ),
        )
        .select(
            "vec_id", "v", S._nearest_cells("v", "d", 1)[0].alias("cell")
        )
        .localCheckpoint()
    )
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    table = S.ivf_probe_stored(assigned, cents, probes, k=5).collect()
    monkeypatch.setattr(S, "_LITERAL_CENTROID_MAX", 10_000)
    lit = S.ivf_probe_stored(assigned, cents, probes, k=5).collect()
    assert sorted(map(tuple, table)) == sorted(map(tuple, lit))
    assert len(table) == 15


def test_lit_double_helpers_bit_exact(spark):
    """`lit_double_vec` / `lit_double_matrix` parse ONE SQL literal
    instead of a py4j round-trip per element (~1.5 s of v21's plan
    construction, measured r10) — and must be BIT-identical to the
    per-element F.lit form: repr() is the shortest round-trip form
    and Double.parseDouble returns the same IEEE double, including
    subnormals, negatives and extreme exponents."""
    import random
    import struct

    from stampede_to_fresco_etl_spark.operators.similarity import (
        lit_double_matrix,
        lit_double_vec,
    )

    rng = random.Random(7)
    rows = [
        [
            rng.uniform(-1e3, 1e3) * 10 ** rng.randint(-300, 300)
            for _ in range(8)
        ]
        + [0.0, -0.0, 5e-324, 1.7976931348623157e308]
        for _ in range(4)
    ]
    df = spark.range(1).select(
        lit_double_matrix(rows).alias("m"),
        lit_double_vec(rows[0]).alias("v"),
        F.array(
            *[F.array(*[F.lit(x) for x in c]) for c in rows]
        ).alias("m0"),
    )
    assert df.schema["m"].dataType.simpleString() == "array<array<double>>"
    r = df.collect()[0]
    bits = lambda vals: [struct.pack("<d", x) for x in vals]  # noqa: E731
    assert bits([x for c in r["m"] for x in c]) == bits(
        [x for c in r["m0"] for x in c]
    )
    assert bits(r["v"]) == bits(rows[0])


def test_ivf_probe_stored_pair_engines_bit_exact(spark):
    """The k=1 ingest-match shape's two pair engines — the column
    fold join and the Arrow cogroup gram (`_cogroup_exact_top1`,
    dim-ordered numpy fold) — must be BIT-exact twins on real corpus
    data, including tie-breaks and ranks.  The arrow engine is the
    auto default for this shape (the 100× rehearsal's pair-cost
    fix); any drift between the engines would silently change v16
    and the ann_stream matches."""
    from stampede_to_fresco_etl_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = S.seed_centroids(emb, "vec_id", "embedding", 16)
    assigned = (
        S._with_centroid_col(
            emb.select(
                "vec_id", S.as_double_vec("embedding").alias("v")
            ),
            cents,
        )
        .withColumn(
            "d",
            F.transform(
                F.col("__cents"), lambda c: S._sqdist(F.col("v"), c)
            ),
        )
        .select(
            "vec_id", "v", S._nearest_cell("d").alias("cell")
        )
        .localCheckpoint()
    )
    probes = emb.filter(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    kw = dict(probe_id_col="probe_id", k=1, n_probe=2)
    arrow = S.ivf_probe_stored(
        assigned, cents, probes, pair_engine="arrow", **kw
    ).collect()
    column = S.ivf_probe_stored(
        assigned, cents, probes, pair_engine="column", **kw
    ).collect()
    assert len(arrow) == probes.count() > 0
    assert sorted(map(tuple, arrow)) == sorted(map(tuple, column))
    # auto routes this shape to arrow — same rows again
    auto = S.ivf_probe_stored(assigned, cents, probes, **kw).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, arrow))


def test_partial_topk_null_ordering_consistent_across_k(spark):
    """ADVICE r10: nulls-last is the contract in BOTH directions and
    at EVERY k.  Spark's bare asc() is NULLS FIRST, so before the
    asc_nulls_last pin the k=1 argmin (null -> +inf sentinel) and the
    k>=2 window silently forked on null sims for ascending callers
    (a null adc_dist would have won the window but lost the argmin).
    Also pins: a probe with ONLY null sims still surfaces one row."""
    from stampede_to_fresco_etl_spark.operators.similarity import (
        partial_topk,
    )

    scored = spark.createDataFrame(
        [
            (1, 10, 0.5),
            (1, 11, None),
            (1, 12, 0.2),
            (2, 20, None),
            (2, 21, None),
        ],
        "probe_id long, vec_id long, sim double",
    )
    for asc in (True, False):
        k1 = {
            (r["probe_id"], r["vec_id"], r["sim"])
            for r in partial_topk(
                scored, "probe_id", "vec_id", 1,
                sim_col="sim", ascending=asc,
            ).collect()
        }
        kw = {
            (r["probe_id"], r["vec_id"], r["sim"])
            for r in partial_topk(
                scored, "probe_id", "vec_id", 3,
                sim_col="sim", ascending=asc,
            ).filter(F.col("rank") == 1).collect()
        }
        best = (1, 12, 0.2) if asc else (1, 10, 0.5)
        assert k1 == kw == {best, (2, 20, None)}


def test_cogroup_exact_top1_derives_id_types(spark):
    """ADVICE r10: the Arrow gram kernel must derive its output id
    types from the inputs, not hardcode long — a string-id caller
    through pair_engine='auto' (every k=1 non-broadcast
    ivf_probe_stored) would otherwise fail at Arrow serialization
    where the column engine handled any type.  Pins string ids
    end-to-end and engine equality on them."""
    from stampede_to_fresco_etl_spark.operators import similarity as S

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(60)
    cents = S.seed_centroids(emb, "vec_id", "embedding", 4)
    assigned = (
        S._with_centroid_col(
            emb.select(
                F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
                S.as_double_vec("embedding").alias("v"),
            ),
            cents,
        )
        .withColumn(
            "d",
            F.transform(
                F.col("__cents"), lambda c: S._sqdist(F.col("v"), c)
            ),
        )
        .select("vec_id", "v", S._nearest_cell("d").alias("cell"))
        .localCheckpoint()
    )
    probes = emb.limit(9).select(
        F.concat(F.lit("p-"), F.col("vec_id")).alias("probe_id"),
        "embedding",
    )
    kw = dict(probe_id_col="probe_id", k=1, n_probe=2)
    arrow = S.ivf_probe_stored(
        assigned, cents, probes, pair_engine="arrow", **kw
    )
    assert dict(arrow.dtypes)["probe_id"] == "string"
    assert dict(arrow.dtypes)["vec_id"] == "string"
    column = S.ivf_probe_stored(
        assigned, cents, probes, pair_engine="column", **kw
    )
    a, c = sorted(map(tuple, arrow.collect())), sorted(
        map(tuple, column.collect())
    )
    assert a == c and len(a) == 9
