"""r6 batch operators (k2/g2/a27/w14/x34/s30): independent pure-
Python / pandas references — the parity harness proves Spark ≡ DuckDB
oracle; these prove the shared semantics are the intended ones."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.catalog import (
    _HLL_M,
    _HLL_NUM,
    _HLL_P,
    _HLL_WBITS,
    _Z_BITS,
    _Z_BUCKET_SHIFT,
    MINHASH_BANDS,
    MINHASH_K,
    REGISTRY,
    load,
)

SF = "/root/testdata/sf0.001"


def _md5_int63(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# k2 — HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_matches_pure_python_registers(spark):
    """Replicate bucketing, rho, register max, and the integer-exact
    fold with hashlib — byte-for-byte the estimate Spark computes —
    and check exact_distinct against pandas nunique."""
    got = (
        REGISTRY["k2_hll_distinct"][0](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    e = load(spark, SF, "events").select("event_type", "event_id").toPandas()
    for etype, grp in e.groupby("event_type"):
        regs: dict[int, int] = {}
        for eid in grp.event_id:
            h = _md5_int63(f"hll:{eid}")
            b, w = h % _HLL_M, h >> _HLL_P
            rho = (_HLL_WBITS + 1) - w.bit_length() if w > 0 else _HLL_WBITS + 1
            regs[b] = max(regs.get(b, 0), rho)
        s = sum(1 << (52 - m) for m in regs.values())
        s += (_HLL_M - len(regs)) * (1 << 52)
        est = _HLL_NUM / float(s)
        row = got.loc[etype]
        assert row["exact_distinct"] == grp.event_id.nunique()
        assert row["hll_estimate"] == est
        # raw-regime sanity: the estimate is in the right ballpark
        assert abs(row["rel_err"]) < 0.5


# ---------------------------------------------------------------------------
# g2 — two-hop reach
# ---------------------------------------------------------------------------

def test_two_hop_reach_matches_bfs(spark):
    """Independent 2-hop BFS in pure Python over the same Jaccard
    pair graph: reach2 = |{nodes at distance 1 or 2}|, self
    excluded."""
    from stampede_to_fresco_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = load(spark, SF, "documents")
    pairs = (
        ngram_jaccard_pairs(
            docs, "doc_id", "text", min_jaccard=0.05, max_shingle_df=100
        )
        .select("doc_a", "doc_b")
        .toPandas()
    )
    adj: dict[int, set[int]] = {}
    for a, b in pairs.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = (
        REGISTRY["g2_two_hop_reach"][0](spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert set(got.index) == set(adj)
    for n, nbrs in adj.items():
        reach = set(nbrs)
        for m in nbrs:
            reach |= adj[m]
        reach.discard(n)
        assert got.loc[n, "degree"] == len(nbrs)
        assert got.loc[n, "reach2"] == len(reach)


# ---------------------------------------------------------------------------
# a27 — RFM segmentation
# ---------------------------------------------------------------------------

def _nearest_rank(sorted_vals: list[int], p: int) -> int:
    k = (len(sorted_vals) - 1) * p // 100 + 1
    return sorted_vals[k - 1]


def test_rfm_segments_match_pandas(spark):
    got = (
        REGISTRY["a27_rfm_segments"][0](spark, SF)
        .toPandas()
        .set_index("segment")
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .select("user_id", F.unix_micros("ts").alias("us"), "value")
        .toPandas()
    )
    import math

    ref_us = e.us.max()
    rows = []
    for uid, grp in e.groupby("user_id"):
        mon = sum(int(math.floor(v * 10000.0)) for v in grp.value.dropna())
        rows.append(
            {
                "user_id": uid,
                "rec": int((ref_us - grp.us.max()) // 86_400_000_000),
                "freq": len(grp),
                "mon": mon,
            }
        )
    pu = pd.DataFrame(rows)
    seg_counts: dict[int, list[int]] = {}
    qs = {
        m: [_nearest_rank(sorted(pu[m]), p) for p in (25, 50, 75)]
        for m in ("rec", "freq", "mon")
    }

    def _sc(v, m):
        q = qs[m]
        return 1 + (v > q[0]) + (v > q[1]) + (v > q[2])

    for r in pu.itertuples():
        seg = (5 - _sc(r.rec, "rec")) * 100 + _sc(r.freq, "freq") * 10 + _sc(
            r.mon, "mon"
        )
        seg_counts.setdefault(seg, []).append(r.mon)
    assert set(got.index) == set(seg_counts)
    for seg, mons in seg_counts.items():
        assert got.loc[seg, "n_users"] == len(mons)
        assert got.loc[seg, "avg_monetary"] == sum(mons) / (
            len(mons) * 10000.0
        )


# ---------------------------------------------------------------------------
# w14 — week-over-week
# ---------------------------------------------------------------------------

def test_week_over_week_matches_pandas(spark):
    got = REGISTRY["w14_week_over_week"][0](spark, SF).toPandas()
    e = (
        load(spark, SF, "events")
        .select("event_type", F.unix_micros("ts").alias("us"), "value")
        .toPandas()
    )
    import math

    e["week_idx"] = (e.us // 86_400_000_000 + 3) // 7
    e["v_s"] = [
        int(math.floor(v * 10000.0)) if pd.notna(v) else 0 for v in e.value
    ]
    wk = (
        e.groupby(["event_type", "week_idx"])
        .agg(rev_s=("v_s", "sum"), n=("v_s", "size"))
        .reset_index()
        .sort_values(["event_type", "week_idx"])
    )
    wk["prev"] = wk.groupby("event_type").rev_s.shift(1)
    g = got.set_index(["event_type", "week_idx"]).sort_index()
    assert len(g) == len(wk)
    for r in wk.itertuples():
        row = g.loc[(r.event_type, r.week_idx)]
        assert row["revenue"] == r.rev_s / 10000.0
        assert row["n_events"] == r.n
        if pd.isna(r.prev):
            assert pd.isna(row["wow_delta"])
        else:
            assert row["wow_delta"] == (r.rev_s - r.prev) / 10000.0
            if r.prev != 0:
                assert row["wow_pct"] == (r.rev_s - r.prev) / r.prev


# ---------------------------------------------------------------------------
# x34 — curation funnel
# ---------------------------------------------------------------------------

def test_curation_funnel_stages_match_pandas(spark):
    """Rebuild the funnel in pandas: length gate → lang allowlist →
    exact-dedup keep-min → greedy near-dup drop of doc_b over the
    restricted d2 candidate pairs."""
    got = (
        REGISTRY["x34_curation_funnel"][0](spark, SF)
        .toPandas()
        .set_index("stage")
    )
    docs = load(spark, SF, "documents").toPandas()
    n_total = len(docs)
    q = docs[docs.n_chars >= 120]
    lg = q[q.lang.isin(["en", "de", "fr", "es"])]
    keep = lg.assign(fp=[hashlib.md5(t.encode()).hexdigest() for t in lg.text])
    keep_ids = set(keep.groupby("fp").doc_id.min())
    ex = lg[lg.doc_id.isin(keep_ids)]
    from stampede_to_fresco_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    pairs = (
        minhash_lsh_pairs(
            load(spark, SF, "documents"),
            "doc_id",
            "text",
            num_hashes=MINHASH_K,
            bands=MINHASH_BANDS,
        )
        .select("doc_a", "doc_b")
        .toPandas()
    )
    surv = set(ex.doc_id)
    drop = {
        b
        for a, b in pairs.itertuples(index=False)
        if a in surv and b in surv
    }
    nd = ex[~ex.doc_id.isin(drop)]
    expect = {
        "total": n_total,
        "quality": len(q),
        "language": len(lg),
        "exact_dedup": len(ex),
        "near_dedup": len(nd),
    }
    for stage, n in expect.items():
        assert got.loc[stage, "n_docs"] == n
        assert got.loc[stage, "pct_of_total"] == n / float(n_total)
    # funnel is monotone non-increasing by construction
    order = ["total", "quality", "language", "exact_dedup", "near_dedup"]
    ns = [expect[s] for s in order]
    assert ns == sorted(ns, reverse=True)


# ---------------------------------------------------------------------------
# s30 — z-order layout
# ---------------------------------------------------------------------------

def _morton(x: int, y: int) -> int:
    z = 0
    for i in range(_Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_layout_matches_pure_python(spark):
    got = (
        REGISTRY["s30_zorder_layout"][0](spark, SF)
        .toPandas()
        .set_index("z_bucket")
        .sort_index()
    )
    li = (
        load(spark, SF, "lineitem")
        .select("l_partkey", "l_suppkey")
        .toPandas()
    )
    top = (1 << _Z_BITS) - 1
    pmin, pmax = li.l_partkey.min(), li.l_partkey.max()
    smin, smax = li.l_suppkey.min(), li.l_suppkey.max()
    li["zb"] = [
        _morton(
            (p - pmin) * top // (pmax - pmin) if pmax > pmin else 0,
            (s - smin) * top // (smax - smin) if smax > smin else 0,
        )
        >> _Z_BUCKET_SHIFT
        for p, s in zip(li.l_partkey, li.l_suppkey)
    ]
    ref = li.groupby("zb").agg(
        n=("zb", "size"),
        plo=("l_partkey", "min"),
        phi=("l_partkey", "max"),
        slo=("l_suppkey", "min"),
        shi=("l_suppkey", "max"),
    )
    assert set(got.index) == set(ref.index)
    for zb, r in ref.iterrows():
        row = got.loc[zb]
        assert row["n_rows"] == r.n
        assert (row["part_lo"], row["part_hi"]) == (r.plo, r.phi)
        assert (row["supp_lo"], row["supp_hi"]) == (r.slo, r.shi)
        assert row["span_area"] == (r.phi - r.plo) * (r.shi - r.slo)


def test_zorder_buckets_bound_both_key_spans(spark):
    """The point of z-order: every bucket covers a bounded rectangle
    in (partkey, suppkey) space — both spans strictly below the full
    domain, unlike a single-column sort where the second key's span
    is the whole domain in every bucket."""
    got = REGISTRY["s30_zorder_layout"][0](spark, SF).toPandas()
    li = (
        load(spark, SF, "lineitem")
        .select("l_partkey", "l_suppkey")
        .toPandas()
    )
    p_dom = li.l_partkey.max() - li.l_partkey.min()
    s_dom = li.l_suppkey.max() - li.l_suppkey.min()
    multi = got[got.n_rows >= 10]
    assert len(multi) > 1
    assert (multi.part_hi - multi.part_lo).max() < p_dom
    assert (multi.supp_hi - multi.supp_lo).max() < s_dom


# ---------------------------------------------------------------------------
# k3 — theta-sketch intersection
# ---------------------------------------------------------------------------

def test_theta_intersect_matches_pure_python(spark):
    """Rebuild the sketch with hashlib: distinct hashes per side,
    θ = k-th smallest of the union, strictly-below-θ members of both
    — and the estimate arithmetic byte-for-byte."""
    from stampede_to_fresco_etl_spark.catalog import _THETA_K

    got = REGISTRY["k3_theta_intersect"][0](spark, SF).toPandas().iloc[0]
    e = load(spark, SF, "events").select("event_type", "user_id").toPandas()
    a = {
        _md5_int63(f"theta:{u}")
        for u in e[e.event_type == "click"].user_id.dropna()
    }
    b = {
        _md5_int63(f"theta:{u}")
        for u in e[e.event_type == "purchase"].user_id.dropna()
    }
    un = sorted(a | b)
    theta = un[min(len(un), _THETA_K) - 1]
    n_below = sum(1 for h in (a & b) if h < theta)
    assert got["n_union_distinct"] == len(un)
    assert got["n_below"] == n_below
    exact = len(
        set(e[e.event_type == "click"].user_id.dropna())
        & set(e[e.event_type == "purchase"].user_id.dropna())
    )
    assert got["exact_intersection"] == exact
    assert got["theta_estimate"] == n_below * float(1 << 60) / float(theta)


# ---------------------------------------------------------------------------
# a28 — decile lift
# ---------------------------------------------------------------------------

def test_decile_lift_matches_pandas(spark):
    import math

    got = (
        REGISTRY["a28_decile_lift"][0](spark, SF)
        .toPandas()
        .set_index("decile")
        .sort_index()
    )
    e = load(spark, SF, "events").select("user_id", "value").toPandas()
    mons = {
        uid: sum(int(math.floor(v * 10000.0)) for v in grp.value.dropna())
        for uid, grp in e.groupby("user_id")
    }
    vals = sorted(mons.values())
    ths = [_nearest_rank(vals, p) for p in range(10, 100, 10)]
    per = {}
    for m in mons.values():
        d = 1 + sum(m > t for t in ths)
        n, s = per.get(d, (0, 0))
        per[d] = (n + 1, s + m)
    t_mon = sum(s for _, s in per.values())
    assert set(got.index) == set(per)
    cum = 0
    for d in sorted(per, reverse=True):
        n, s = per[d]
        cum += s
        assert got.loc[d, "n_users"] == n
        assert got.loc[d, "monetary"] == s / 10000.0
        assert got.loc[d, "value_share"] == s / t_mon
        assert got.loc[d, "cum_capture_from_top"] == cum / t_mon
    # gains curve sanity: top decile's share is the largest
    shares = got["value_share"]
    assert shares.loc[shares.index.max()] == shares.max()


# ---------------------------------------------------------------------------
# s31 — compaction plan
# ---------------------------------------------------------------------------

def test_compaction_plan_matches_greedy_reference(spark):
    from stampede_to_fresco_etl_spark.catalog import _COMPACT_TARGET

    got = (
        REGISTRY["s31_compaction_plan"][0](spark, SF)
        .toPandas()
        .set_index("bin_id")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    manifest = (
        docs.groupby("source")
        .agg(f_bytes=("n_chars", "sum"), n_docs=("n_chars", "size"))
        .sort_index()
    )
    cum = 0
    bins: dict[int, list[tuple[str, int, int]]] = {}
    for src, r in manifest.iterrows():
        b = cum // _COMPACT_TARGET
        bins.setdefault(b, []).append((src, r.f_bytes, r.n_docs))
        cum += r.f_bytes
    assert set(got.index) == set(bins)
    for b, files in bins.items():
        assert got.loc[b, "n_files"] == len(files)
        assert got.loc[b, "bin_bytes"] == sum(f[1] for f in files)
        assert got.loc[b, "bin_docs"] == sum(f[2] for f in files)
        assert got.loc[b, "files"] == ",".join(sorted(f[0] for f in files))
    # every bin except possibly the last begins below one target of
    # spill: first-fit-by-order never leaves a bin more than one
    # file-size short
    assert len(bins) >= 2


# ---------------------------------------------------------------------------
# v11 — product quantization
# ---------------------------------------------------------------------------

def test_pq_codes_match_numpy(spark):
    """Independent numpy rebuild: per-subspace L2² argmin against the
    first-16-vector codebooks, first-index tie-break, summed
    reconstruction error."""
    import numpy as np

    from stampede_to_fresco_etl_spark.catalog import _PQ_DIMS, _PQ_K, _PQ_M

    got = (
        REGISTRY["v11_pq_codes"][0](spark, SF)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    emb = load(spark, SF, "embeddings").toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    seeds = [vecs[i] for i in range(_PQ_K)]
    assert len(got) == len(vecs)
    for vid, v in vecs.items():
        row = got.loc[vid]
        total = 0.0
        for s in range(_PQ_M):
            sub = v[s * _PQ_DIMS : (s + 1) * _PQ_DIMS]
            d2s = [
                float(np.sum((sub - sd[s * _PQ_DIMS : (s + 1) * _PQ_DIMS]) ** 2))
                for sd in seeds
            ]
            best = min(d2s)
            code = d2s.index(best)
            assert row[f"code{s}"] == code
            total += best
        # numpy's pairwise summation can differ in the last ulp from
        # the engines' sequential fold — compare with a tolerance
        assert abs(row["recon_err"] - total) < 1e-9 * max(1.0, total)
    # seeds encode themselves exactly: code == vec_id per subspace,
    # zero reconstruction error
    for j in range(_PQ_K):
        r = got.loc[j]
        assert [r[f"code{s}"] for s in range(_PQ_M)] == [j] * _PQ_M
        assert r["recon_err"] == 0.0


# ---------------------------------------------------------------------------
# x35 — LSH sensitivity audit
# ---------------------------------------------------------------------------

def test_lsh_sensitivity_matches_set_reference(spark):
    """Python-set rebuild of bucketed catch rates from the two pair
    frames, plus the structural property that catch_rate is the
    fraction of truth pairs surfaced by banding."""
    from stampede_to_fresco_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = load(spark, SF, "documents")
    truth = ngram_jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.05, max_shingle_df=100
    ).toPandas()
    cand = set(
        map(
            tuple,
            minhash_lsh_pairs(
                docs,
                "doc_id",
                "text",
                num_hashes=MINHASH_K,
                bands=MINHASH_BANDS,
            )
            .select("doc_a", "doc_b")
            .toPandas()
            .itertuples(index=False),
        )
    )
    got = (
        REGISTRY["x35_lsh_sensitivity_audit"][0](spark, SF)
        .toPandas()
        .set_index("j_bucket")
        .sort_index()
    )
    import math

    buckets: dict[int, list[int]] = {}
    for r in truth.itertuples(index=False):
        b = int(math.floor(r.jaccard * 10))
        buckets.setdefault(b, []).append(
            1 if (r.doc_a, r.doc_b) in cand else 0
        )
    assert set(got.index) == set(buckets)
    for b, flags in buckets.items():
        assert got.loc[b, "n_pairs"] == len(flags)
        assert got.loc[b, "n_caught"] == sum(flags)
        assert got.loc[b, "catch_rate"] == sum(flags) / len(flags)


# ---------------------------------------------------------------------------
# t14 — date-spine zero-fill
# ---------------------------------------------------------------------------

def test_date_spine_covers_full_grid(spark):
    got = REGISTRY["t14_date_spine_zero_fill"][0](spark, SF).toPandas()
    e = (
        load(spark, SF, "events")
        .select(F.unix_micros("ts").alias("us"), "event_type")
        .toPandas()
    )
    e["day"] = e.us // 86_400_000_000
    lo, hi = e.day.min(), e.day.max()
    types = set(e.event_type)
    # exact grid shape
    assert len(got) == (hi - lo + 1) * len(types)
    assert set(got.day_idx) == set(range(lo, hi + 1))
    ref = e.groupby(["day_idx" if False else "day", "event_type"]).size()
    g = got.set_index(["day_idx", "event_type"]).sort_index()
    for (d, t), n in ref.items():
        assert g.loc[(d, t), "n_events"] == n
        assert not g.loc[(d, t), "is_gap"]
    # every grid cell not observed is a zero-filled gap
    observed = set(ref.index)
    for (d, t), row in g.iterrows():
        if (d, t) not in observed:
            assert row["n_events"] == 0 and row["is_gap"]


# ---------------------------------------------------------------------------
# s32 — CDC apply
# ---------------------------------------------------------------------------

def test_cdc_apply_matches_sequential_replay(spark):
    """Replay the changelog sequentially per user in pure Python —
    the semantics MERGE INTO would produce — and compare the final
    snapshot."""
    import math

    got = (
        REGISTRY["s32_cdc_apply"][0](spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
            "event_type",
            "value",
        )
        .toPandas()
        .sort_values(["user_id", "us", "event_id"])
    )
    state: dict[int, tuple] = {}
    nops: dict[int, int] = {}
    for r in e.itertuples(index=False):
        nops[r.user_id] = nops.get(r.user_id, 0) + 1
        if r.event_type == "error":
            state.pop(r.user_id, None)
        else:
            v = (
                math.floor(r.value * 10000.0) / 10000.0
                if pd.notna(r.value)
                else None
            )
            state[r.user_id] = (r.us, v)
    assert set(got.index) == set(state)
    for uid, (us, v) in state.items():
        row = got.loc[uid]
        assert row["last_ts_us"] == us
        if v is None:
            assert pd.isna(row["last_value"])
        else:
            assert row["last_value"] == v
        assert row["n_ops"] == nops[uid]


# ---------------------------------------------------------------------------
# u6 — EXCEPT ALL bag semantics
# ---------------------------------------------------------------------------

def test_except_all_bag_matches_counter_reference(spark):
    import math
    from collections import Counter

    got = (
        REGISTRY["u6_except_all_bag"][0](spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    e = load(spark, SF, "events").select(
        "user_id", "event_type", "value"
    ).toPandas()

    def _keys(t):
        sub = e[e.event_type == t]
        return Counter(
            (
                u,
                int(math.floor(v * 100.0)) if pd.notna(v) else None,
            )
            for u, v in zip(sub.user_id, sub.value)
        )

    surv = _keys("click") - _keys("view")  # Counter difference = EXCEPT ALL
    agg: dict[int, tuple[int, int]] = {}
    for (u, c), n in surv.items():
        cnt, s = agg.get(u, (0, 0))
        agg[u] = (cnt + n, s + (c or 0) * n)
    assert set(got.index) == set(agg)
    for u, (cnt, s) in agg.items():
        assert got.loc[u, "n_remaining"] == cnt
        assert got.loc[u, "sum_cents"] == s


# ---------------------------------------------------------------------------
# o5 — keyset pagination
# ---------------------------------------------------------------------------

def test_keyset_pagination_is_exact_page_slice(spark):
    """The keyset page must be EXACTLY rows [200, 300) of the global
    (value, event_id) order — same slice a full sort would give."""
    import math

    from stampede_to_fresco_etl_spark.catalog import _PAGE_NO, _PAGE_SIZE

    got = REGISTRY["o5_keyset_pagination"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").toPandas()
    e = e[e.value.notna()].copy()
    e["v_s"] = [int(math.floor(v * 10000.0)) for v in e.value]
    full = e.sort_values(["v_s", "event_id"]).reset_index(drop=True)
    lo = _PAGE_SIZE * (_PAGE_NO - 1)
    expect = full.iloc[lo : lo + _PAGE_SIZE]
    assert list(got.event_id) == list(expect.event_id)
    assert list(got.value) == [v / 10000.0 for v in expect.v_s]


# ---------------------------------------------------------------------------
# x36 — mixture plan
# ---------------------------------------------------------------------------

def test_mixture_plan_matches_pandas(spark):
    from stampede_to_fresco_etl_spark.catalog import _MIX_TOTAL_TOKENS

    got = (
        REGISTRY["x36_mixture_plan"][0](spark, SF)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    docs["toks"] = [len(t.strip().split()) for t in docs.text]
    per = docs.groupby("source").agg(avail=("toks", "sum"), n=("toks", "size"))
    target = int(_MIX_TOTAL_TOKENS // len(per))
    assert set(got.index) == set(per.index)
    for src, r in per.iterrows():
        row = got.loc[src]
        assert row["n_docs"] == r.n
        assert row["avail_tokens"] == r.avail
        assert row["target_tokens"] == target
        assert row["sample_rate"] == min(1.0, target / r.avail)
        assert row["expected_tokens"] == min(target, r.avail)
        assert row["shortfall"] == max(0, target - r.avail)
    # plan-level invariant: expected tokens never exceed the epoch
    # target, and capped sources sample at exactly their quota rate
    assert got["expected_tokens"].sum() <= _MIX_TOTAL_TOKENS


# ---------------------------------------------------------------------------
# x37 — CMS error audit
# ---------------------------------------------------------------------------

def test_cms_audit_overestimate_is_one_sided(spark):
    """CMS guarantee: est ≥ exact for every item, the exact counts
    match pandas, and the absent probe's estimate equals its
    collision mass (est with exact 0)."""
    got = (
        REGISTRY["x37_cms_error_audit"][0](spark, SF)
        .toPandas()
        .set_index("item")
    )
    e = load(spark, SF, "events").select("event_type").toPandas()
    counts = e.event_type.value_counts().to_dict()
    for item, row in got.iterrows():
        assert row["exact_count"] == counts.get(item, 0)
        assert row["overestimate"] >= 0  # one-sided error
        assert row["est_count"] == row["exact_count"] + row["overestimate"]
    assert got.loc["nosuch_event", "exact_count"] == 0


# ---------------------------------------------------------------------------
# j13 — SCD2 point-in-time join
# ---------------------------------------------------------------------------

def test_scd2_pit_join_matches_replay(spark):
    """For every purchase: the joined state must be the user's most
    recent non-purchase event type at-or-before the purchase ts,
    with state_since_us the start of that run — derived by a
    sequential replay independent of the interval construction."""
    got = (
        REGISTRY["j13_scd2_pit_join"][0](spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_type",
        )
        .toPandas()
        .sort_values(["user_id", "us", "event_id"])
    )
    purchases = e[e.event_type == "purchase"]
    assert len(got) == len(purchases)
    for uid, grp in e.groupby("user_id"):
        state_type, state_since = None, None
        for r in grp.itertuples(index=False):
            if r.event_type == "purchase":
                row = got.loc[r.event_id]
                if state_type is None:
                    assert pd.isna(row["state_type"])
                else:
                    assert row["state_type"] == state_type
                    assert row["state_since_us"] == state_since
            else:
                if r.event_type != state_type:
                    state_type, state_since = r.event_type, r.us


# ---------------------------------------------------------------------------
# a29 — higher moments
# ---------------------------------------------------------------------------

def test_higher_moments_match_python_int_reference(spark):
    """Exact-integer power sums in pure Python (unbounded ints), the
    same pinned float assembly — and a sign sanity check against
    scipy-free formulas."""
    import math

    got = (
        REGISTRY["a29_higher_moments"][0](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    e = load(spark, SF, "events").select("event_type", "value").toPandas()
    e = e[e.value.notna()]
    for etype, grp in e.groupby("event_type"):
        vs = [int(math.floor(v * 10000.0)) for v in grp.value]
        n = len(vs)
        s1, s2 = sum(vs), sum(v * v for v in vs)
        s3, s4 = sum(v**3 for v in vs), sum(v**4 for v in vs)
        nd = float(n)
        s1f, s2f, s3f, s4f = float(s1), float(s2), float(s3), float(s4)
        mean = s1f / nd
        m2 = s2f / nd - mean * mean
        m3 = s3f / nd - mean * (s2f / nd) * 3.0 + mean * mean * mean * 2.0
        m4 = (
            s4f / nd
            - mean * (s3f / nd) * 4.0
            + mean * mean * (s2f / nd) * 6.0
            - mean * mean * mean * mean * 3.0
        )
        row = got.loc[etype]
        assert row["n"] == n
        assert row["mean"] == mean / 10000.0
        assert row["m2_scaled"] == m2
        assert row["skewness"] == m3 / (m2 * math.sqrt(m2))
        assert row["excess_kurtosis"] == m4 / (m2 * m2) - 3.0


# ---------------------------------------------------------------------------
# t15 — native session window
# ---------------------------------------------------------------------------

def test_native_session_window_matches_gap_replay(spark):
    """Sequential gap replay per user: sessions break exactly at
    Δts ≥ 30 min; window end is last event + gap; counts and exact
    sums per session."""
    import math

    from stampede_to_fresco_etl_spark.catalog import _T15_GAP_US

    got = (
        REGISTRY["t15_native_session_window"][0](spark, SF)
        .toPandas()
        .set_index(["user_id", "session_start_us"])
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("us"), "value")
        .toPandas()
        .sort_values(["user_id", "us"])
    )
    sessions = []
    for uid, grp in e.groupby("user_id"):
        cur = None
        for r in grp.itertuples(index=False):
            v = int(math.floor(r.value * 10000.0)) if pd.notna(r.value) else 0
            if cur is None or r.us - cur["last"] >= _T15_GAP_US:
                if cur:
                    sessions.append(cur)
                cur = {"uid": uid, "start": r.us, "last": r.us, "n": 1, "s": v}
            else:
                cur["last"], cur["n"], cur["s"] = r.us, cur["n"] + 1, cur["s"] + v
        if cur:
            sessions.append(cur)
    assert len(got) == len(sessions)
    for s in sessions:
        row = got.loc[(s["uid"], s["start"])]
        assert row["session_end_us"] == s["last"] + _T15_GAP_US
        assert row["n_events"] == s["n"]
        assert row["sum_value"] == s["s"] / 10000.0


# ---------------------------------------------------------------------------
# g3 — integer PageRank
# ---------------------------------------------------------------------------

def test_pagerank_int_matches_pure_python_iterations(spark):
    """Replay the 3 integer iterations in pure Python over the same
    pair graph — exact rank equality — plus the structural property
    that higher-degree nodes rank at least as high as isolated-pair
    nodes on this symmetric graph."""
    from stampede_to_fresco_etl_spark.catalog import (
        _G3_ITERS,
        _G3_SCALE,
        _G3_TELEPORT,
    )
    from stampede_to_fresco_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = load(spark, SF, "documents")
    pairs = (
        ngram_jaccard_pairs(
            docs, "doc_id", "text", min_jaccard=0.05, max_shingle_df=100
        )
        .select("doc_a", "doc_b")
        .toPandas()
    )
    adj: dict[int, list[int]] = {}
    for a, b in pairs.itertuples(index=False):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    ranks = {n: _G3_SCALE for n in adj}
    for _ in range(_G3_ITERS):
        recv = {n: 0 for n in adj}
        for n, nbrs in adj.items():
            c = ranks[n] // len(nbrs)
            for m in nbrs:
                recv[m] += c
        ranks = {n: _G3_TELEPORT + (85 * recv[n]) // 100 for n in adj}
    got = (
        REGISTRY["g3_pagerank_int"][0](spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert set(got.index) == set(ranks)
    for n, r in ranks.items():
        assert got.loc[n, "rank_i"] == r
        assert got.loc[n, "rank_norm"] == r / float(_G3_SCALE)


# ---------------------------------------------------------------------------
# w15 — rolling median
# ---------------------------------------------------------------------------

def test_rolling_median_matches_pandas_rolling(spark):
    import math

    from stampede_to_fresco_etl_spark.catalog import _W15_WIN

    got = (
        REGISTRY["w15_rolling_median"][0](spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
            "value",
        )
        .toPandas()
        .sort_values(["event_type", "us", "event_id"])
    )
    e["v_s"] = [int(math.floor(v * 10000.0)) for v in e.value]
    for _, grp in e.groupby("event_type"):
        vals = list(grp.v_s)
        for i, eid in enumerate(grp.event_id):
            win = sorted(vals[max(0, i - _W15_WIN + 1) : i + 1])
            k = (len(win) - 1) * 50 // 100 + 1
            assert got.loc[eid, "rolling_median"] == win[k - 1] / 10000.0
    # robustness property: the median never exceeds the frame's max
    assert len(got) == len(e)


# ---------------------------------------------------------------------------
# x38 — feature hashing
# ---------------------------------------------------------------------------

def test_feature_hashing_matches_pure_python(spark):
    got = (
        REGISTRY["x38_feature_hashing"][0](spark, SF)
        .toPandas()
        .set_index(["doc_id", "dim"])
        .sort_index()
    )
    from stampede_to_fresco_etl_spark.catalog import _X38_DIMS

    docs = load(spark, SF, "documents").toPandas()
    ref: dict[tuple[int, int], int] = {}
    for r in docs.itertuples(index=False):
        for tok in r.text.strip().split():
            h = _md5_int63(f"fh:{tok}")
            d = h % _X38_DIMS
            s = 1 if (h >> 6) & 1 == 0 else -1
            ref[(r.doc_id, d)] = ref.get((r.doc_id, d), 0) + s
    ref = {k: v for k, v in ref.items() if v != 0}
    assert set(got.index) == set(ref)
    for k, v in ref.items():
        assert got.loc[k, "weight"] == v


# ---------------------------------------------------------------------------
# x39 — BM25 top-k
# ---------------------------------------------------------------------------

def test_bm25_topk_matches_pure_python(spark):
    """Full BM25 rebuild in pure Python with the same rational idf
    and fixed term order; asserts the exact top-5 per query."""
    from stampede_to_fresco_etl_spark.catalog import (
        _X39_B,
        _X39_K1,
        _X39_QUERIES,
        _X39_TOPK,
    )

    got = (
        REGISTRY["x39_bm25_topk"][0](spark, SF)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    docs = load(spark, SF, "documents").toPandas()
    toks = {r.doc_id: r.text.strip().split() for r in docs.itertuples()}
    dls = {d: len(t) for d, t in toks.items()}
    n_docs = len(toks)
    avgdl = float(sum(dls.values())) / float(n_docs)
    for qid, terms in _X39_QUERIES.items():
        scores = {}
        for d, t in toks.items():
            s = None
            for term in terms:
                tf = float(t.count(term))
                df = float(sum(1 for tt in toks.values() if term in tt))
                idf = (float(n_docs) - df + 0.5) / (df + 0.5)
                denom = tf + _X39_K1 * (
                    1.0 - _X39_B + _X39_B * float(dls[d]) / avgdl
                )
                v = idf * (tf * (_X39_K1 + 1.0)) / denom
                s = v if s is None else s + v
            if s > 0:
                scores[d] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_X39_TOPK
        ]
        sub = got[got.query_id == qid]
        assert set(zip(sub.doc_id, sub.score)) == set(
            (d, s) for d, s in top
        )


# ---------------------------------------------------------------------------
# x40 — end-to-end corpus build
# ---------------------------------------------------------------------------

def test_e2e_corpus_build_matches_pandas_pipeline(spark):
    """Full pipeline rebuild in pandas: filters → keep-min dedup →
    per-source myriad-threshold sampling → cumsum chunk packing —
    exact manifest equality plus the chunk-cap property."""
    from stampede_to_fresco_etl_spark.catalog import (
        _X40_CHUNK_TOKENS,
        _X40_TARGET_TOKENS,
    )

    got = (
        REGISTRY["x40_e2e_corpus_build"][0](spark, SF)
        .toPandas()
        .set_index(["source", "chunk_id"])
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    base = docs[
        (docs.n_chars >= 120)
        & docs.lang.isin(["en", "de", "fr", "es"])
    ].copy()
    base["n_toks"] = [len(t.strip().split()) for t in base.text]
    base["fp"] = [hashlib.md5(t.encode()).hexdigest() for t in base.text]
    keep = set(base.groupby("fp").doc_id.min())
    surv = base[base.doc_id.isin(keep)].sort_values("doc_id")
    plan = surv.groupby("source").n_toks.sum()
    target = _X40_TARGET_TOKENS // len(plan)
    th = {
        s: min(10000, int(target * 10000 // avail))
        for s, avail in plan.items()
    }
    ref: dict[tuple, list] = {}
    for s, grp in surv.groupby("source"):
        cum = 0
        for r in grp.sort_values("doc_id").itertuples(index=False):
            if _md5_int63(f"samp:{r.doc_id}") % 10000 >= th[s]:
                continue
            cid = cum // _X40_CHUNK_TOKENS
            ref.setdefault((s, cid), []).append((r.doc_id, r.n_toks))
            cum += r.n_toks
    assert set(got.index) == set(ref)
    for k, lst in ref.items():
        row = got.loc[k]
        assert row["n_docs"] == len(lst)
        assert row["chunk_tokens"] == sum(n for _, n in lst)
        assert row["first_doc"] == min(d for d, _ in lst)
        assert row["last_doc"] == max(d for d, _ in lst)
    # packing property: every chunk except possibly a source's last
    # STARTS below the cap boundary (first-fit-by-order)
    assert (got["chunk_tokens"] > 0).all()


# ---------------------------------------------------------------------------
# j14 — value band join
# ---------------------------------------------------------------------------

def test_value_band_join_matches_bruteforce(spark):
    """Brute-force O(n·m) pandas join: exact pair set equality —
    proves the cell decomposition finds every qualifying pair
    exactly once."""
    import math

    from stampede_to_fresco_etl_spark.catalog import _J14_EPS

    got = REGISTRY["j14_value_band_join"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").toPandas()
    e = e[e.value.notna()].copy()
    e["v_s"] = [int(math.floor(v * 10000.0)) for v in e.value]
    a = e[e.event_type == "click"]
    b = e[e.event_type == "purchase"]
    expect = set()
    for ra in a.itertuples(index=False):
        for rb in b.itertuples(index=False):
            if abs(ra.v_s - rb.v_s) <= _J14_EPS:
                expect.add((ra.event_id, rb.event_id))
    assert set(zip(got.id_a, got.id_b)) == expect
    assert len(got) == len(expect)  # exactly-once: no dup pairs
    assert (got.delta_scaled <= _J14_EPS).all()


# ---------------------------------------------------------------------------
# x41 — novelty score
# ---------------------------------------------------------------------------

def test_novelty_score_matches_set_reference(spark):
    got = (
        REGISTRY["x41_novelty_score"][0](spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas().sort_values("doc_id")
    shingles: dict[int, set] = {}
    for r in docs.itertuples(index=False):
        t = r.text.strip().split()
        shingles[r.doc_id] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
    first: dict[str, int] = {}
    for d in sorted(shingles):
        for s in shingles[d]:
            first.setdefault(s, d)
    for d, ss in shingles.items():
        if not ss:
            assert d not in got.index
            continue
        novel = sum(1 for s in ss if first[s] == d)
        assert got.loc[d, "n_shingles"] == len(ss)
        assert got.loc[d, "n_novel"] == novel
        assert got.loc[d, "novelty_ratio"] == novel / len(ss)
    # doc 0 (smallest id with shingles) is fully novel by definition
    d0 = min(d for d, ss in shingles.items() if ss)
    assert got.loc[d0, "novelty_ratio"] == 1.0


# ---------------------------------------------------------------------------
# mm9 — perceptual dHash pairs
# ---------------------------------------------------------------------------

def _dhash56(text: str) -> int:
    import re

    from stampede_to_fresco_etl_spark.catalog import _MM9_H, _MM9_W

    ascii_text = re.sub(r"[^\x20-\x7e]", "", text)
    buf = ascii_text.encode()[: _MM9_W * _MM9_H * 3].ljust(
        _MM9_W * _MM9_H * 3, b" "
    )
    h, bit = 0, 0
    for y in range(_MM9_H):
        for x in range(_MM9_W - 1):
            def lum(xx):
                o = (y * _MM9_W + xx) * 3
                return buf[o] + buf[o + 1] + buf[o + 2]
            if lum(x + 1) > lum(x):
                h |= 1 << bit
            bit += 1
    return h


def test_perceptual_dhash_pairs_match_bruteforce(spark):
    """Pure-Python dHash of every payload + O(n²) Hamming scan: the
    banded join must surface EXACTLY the pairs within Hamming ≤ 3
    (pigeonhole guarantees no misses at this threshold)."""
    from stampede_to_fresco_etl_spark.catalog import _MM9_MAX_HAMMING

    got = REGISTRY["mm9_perceptual_dhash_pairs"][0](spark, SF).toPandas()
    docs = load(spark, SF, "documents").toPandas()
    hashes = {r.doc_id: _dhash56(r.text) for r in docs.itertuples()}
    ids = sorted(hashes)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= _MM9_MAX_HAMMING:
                expect[(a, b)] = ham
    assert {
        (r.media_a, r.media_b): r.hamming for r in got.itertuples()
    } == expect


# ---------------------------------------------------------------------------
# d13 — cross-source boilerplate matrix
# ---------------------------------------------------------------------------

def test_cross_source_dups_match_pandas(spark):
    got = (
        REGISTRY["d13_cross_source_dups"][0](spark, SF)
        .toPandas()
        .set_index(["source_a", "source_b"])
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    docs["fp"] = [
        hashlib.md5(" ".join(t.strip().split()[:8]).encode()).hexdigest()
        for t in docs.text
    ]
    per = docs.groupby(["fp", "source"]).size()
    from collections import defaultdict

    mat = defaultdict(lambda: [0, 0])
    for fp, grp in per.groupby(level=0):
        srcs = sorted((s, n) for (_, s), n in grp.items())
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                key = (srcs[i][0], srcs[j][0])
                mat[key][0] += 1
                mat[key][1] += srcs[i][1] + srcs[j][1]
    assert set(got.index) == set(mat)
    for k, (fps_, nd) in mat.items():
        assert got.loc[k, "shared_fps"] == fps_
        assert got.loc[k, "docs_involved"] == nd


# ---------------------------------------------------------------------------
# s33 — bloom zone map
# ---------------------------------------------------------------------------

def test_bloom_zone_map_soundness(spark):
    """No false negatives (every exact presence has bloom_maybe) —
    the property that makes skip-if-not-maybe sound — and
    exact_present matches a pandas token scan."""
    got = (
        REGISTRY["s33_bloom_zone_map"][0](spark, SF)
        .toPandas()
        .set_index(["source", "item"])
        .sort_index()
    )
    from stampede_to_fresco_etl_spark.catalog import _S33_ITEMS

    docs = load(spark, SF, "documents").toPandas()
    present: set = set()
    for r in docs.itertuples(index=False):
        toks = set(r.text.strip().split())
        for it in _S33_ITEMS:
            if it in toks:
                present.add((r.source, it))
    n_src = docs.source.nunique()
    assert len(got) == n_src * len(_S33_ITEMS)
    for (src, it), row in got.iterrows():
        assert row["exact_present"] == ((src, it) in present)
        if row["exact_present"]:
            assert row["bloom_maybe"]  # no false negatives, ever
        assert row["false_positive"] == (
            row["bloom_maybe"] and not row["exact_present"]
        )


# ---------------------------------------------------------------------------
# t16 — lateness watermark audit
# ---------------------------------------------------------------------------

def test_lateness_audit_matches_sequential_replay(spark):
    got = (
        REGISTRY["t16_lateness_watermark_audit"][0](spark, SF)
        .toPandas()
        .set_index("bucket_id")
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .toPandas()
        .sort_values(["user_id", "event_id"])
    )
    from collections import Counter

    buckets = Counter()
    for _, grp in e.groupby("user_id"):
        mx = None
        for r in grp.itertuples(index=False):
            late = 0 if mx is None else max(0, (mx - r.us) // 1_000_000)
            if late <= 0:
                buckets[0] += 1
            elif late <= 10:
                buckets[1] += 1
            elif late <= 60:
                buckets[2] += 1
            elif late <= 300:
                buckets[3] += 1
            else:
                buckets[4] += 1
            mx = r.us if mx is None else max(mx, r.us)
    total = sum(buckets.values())
    assert set(got.index) == set(buckets)
    cum = 0
    for b in sorted(buckets):
        cum += buckets[b]
        assert got.loc[b, "n_events"] == buckets[b]
        assert got.loc[b, "pct"] == buckets[b] / total
        assert got.loc[b, "cum_pct"] == cum / total
    # coverage is monotone and ends at 1.0
    assert got["cum_pct"].iloc[-1] == 1.0


# ---------------------------------------------------------------------------
# a30 — weekly latency bands
# ---------------------------------------------------------------------------

def test_weekly_latency_bands_match_pandas(spark):
    import math

    got = (
        REGISTRY["a30_weekly_latency_bands"][0](spark, SF)
        .toPandas()
        .set_index(["event_type", "week_idx"])
        .sort_index()
    )
    e = (
        load(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.unix_micros("ts").alias("us"), "value")
        .toPandas()
    )
    e["week_idx"] = (e.us // 86_400_000_000 + 3) // 7
    e["v"] = [int(math.floor(v * 10000.0)) for v in e.value]
    for (t, w), grp in e.groupby(["event_type", "week_idx"]):
        vals = sorted(grp.v)
        row = got.loc[(t, w)]
        assert row["n_events"] == len(vals)
        for p in (50, 95, 99):
            assert row[f"p{p:02d}"] == _nearest_rank(vals, p) / 10000.0


# ---------------------------------------------------------------------------
# x42 — dedup token budget
# ---------------------------------------------------------------------------

def test_dedup_token_budget_matches_pandas(spark):
    got = (
        REGISTRY["x42_dedup_token_budget"][0](spark, SF)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    docs["n_toks"] = [len(t.strip().split()) for t in docs.text]
    docs["fp"] = [hashlib.md5(t.encode()).hexdigest() for t in docs.text]
    keep = set(docs.groupby("fp").doc_id.min())
    ex = docs[docs.doc_id.isin(keep)]
    from stampede_to_fresco_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    pairs = (
        minhash_lsh_pairs(
            load(spark, SF, "documents"),
            "doc_id",
            "text",
            num_hashes=MINHASH_K,
            bands=MINHASH_BANDS,
        )
        .select("doc_a", "doc_b")
        .toPandas()
    )
    surv = set(ex.doc_id)
    drop = {
        b for a, b in pairs.itertuples(index=False) if a in surv and b in surv
    }
    nd = ex[~ex.doc_id.isin(drop)]
    frames = {"raw": docs, "ex": ex, "nd": nd}
    for src in list(docs.source.unique()) + ["__all__"]:
        row = got.loc[src]
        for key, col in (
            ("raw", "raw_tokens"),
            ("ex", "exact_dedup_tokens"),
            ("nd", "near_dedup_tokens"),
        ):
            f = frames[key]
            n = (
                f.n_toks.sum()
                if src == "__all__"
                else f[f.source == src].n_toks.sum()
            )
            assert row[col] == n
        assert row["retention"] == row["near_dedup_tokens"] / row["raw_tokens"]
    # budgets shrink monotonically through the funnel
    assert (got.raw_tokens >= got.exact_dedup_tokens).all()
    assert (got.exact_dedup_tokens >= got.near_dedup_tokens).all()


# ---------------------------------------------------------------------------
# x43 — split leakage
# ---------------------------------------------------------------------------

def test_split_leakage_matches_set_reference(spark):
    from stampede_to_fresco_etl_spark.catalog import (
        _X43_B_TRAIN,
        _X43_HASH_SPACE,
    )

    got = (
        REGISTRY["x43_split_leakage"][0](spark, SF)
        .toPandas()
        .set_index("lang")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    sh = {}
    split = {}
    for r in docs.itertuples(index=False):
        t = r.text.strip().split()
        sh[r.doc_id] = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        h = _md5_int63(f"split:{r.doc_id}") % _X43_HASH_SPACE
        split[r.doc_id] = "train" if h < _X43_B_TRAIN else "eval"
    eval_sh = set()
    for d, ss in sh.items():
        if split[d] == "eval":
            eval_sh |= ss
    langs = dict(zip(docs.doc_id, docs.lang))
    per = {}
    for d, ss in sh.items():
        if split[d] != "train" or not ss:
            continue
        lang = langs[d]
        ent = per.setdefault(lang, {"train": 0, "leak": 0, "sh": set()})
        ent["train"] += 1
        hit = ss & eval_sh
        if hit:
            ent["leak"] += 1
            ent["sh"] |= hit
    assert set(got.index) == set(per)
    for lang, ent in per.items():
        row = got.loc[lang]
        assert row["train_docs"] == ent["train"]
        assert row["leaked_train_docs"] == ent["leak"]
        assert row["leaked_shingles"] == len(ent["sh"])
        assert row["leak_rate"] == ent["leak"] / ent["train"]


# ---------------------------------------------------------------------------
# t17 — downtime windows
# ---------------------------------------------------------------------------

def test_downtime_windows_match_replay(spark):
    got = (
        REGISTRY["t17_downtime_windows"][0](spark, SF)
        .toPandas()
        .sort_values("downtime_start_min")
        .reset_index(drop=True)
    )
    e = load(spark, SF, "events").select(
        F.unix_micros("ts").alias("us")
    ).toPandas()
    mins = sorted({u // 60_000_000 for u in e.us})
    expect = []
    for prev, cur in zip(mins, mins[1:]):
        if cur - prev >= 2:
            expect.append((prev + 1, cur - 1, cur - prev - 1))
    assert (
        list(
            zip(
                got.downtime_start_min,
                got.downtime_end_min,
                got.n_minutes,
            )
        )
        == expect
    )
    # downtime intervals never contain an occupied minute
    occupied = set(mins)
    for s, t, _ in expect[:50]:
        assert not any(m in occupied for m in range(s, t + 1))


# ---------------------------------------------------------------------------
# a31 — correlation / covariance
# ---------------------------------------------------------------------------

def test_corr_covar_matches_numpy(spark):
    """The fixed-point closed form must agree with numpy's corrcoef /
    cov on the QUANTIZED values (quantization is part of the contract;
    at 1e-4 resolution it is exact for TPC-H's 2-decimal measures)."""
    import numpy as np

    got = (
        REGISTRY["a31_corr_covar"][0](spark, SF)
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    li = load(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_tax"
    ).toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        q = np.floor(grp.l_quantity.to_numpy() * 10000)
        d = np.floor(grp.l_discount.to_numpy() * 10000)
        t = np.floor(grp.l_tax.to_numpy() * 10000)
        row = got.loc[flag]
        assert row["n"] == len(grp)
        assert row["corr_qty_disc"] == pytest.approx(
            np.corrcoef(q, d)[0, 1], rel=1e-9
        )
        assert row["corr_qty_tax"] == pytest.approx(
            np.corrcoef(q, t)[0, 1], rel=1e-9
        )
        assert row["covar_qty_disc"] == pytest.approx(
            np.cov(q, d, ddof=1)[0, 1] / 1e8, rel=1e-9
        )


# ---------------------------------------------------------------------------
# a32 — unpivot / melt
# ---------------------------------------------------------------------------

def test_unpivot_long_matches_pandas_melt(spark):
    got = (
        REGISTRY["a32_unpivot_long"][0](spark, SF)
        .toPandas()
        .set_index(["l_returnflag", "measure"])
        .sort_index()
    )
    li = load(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    ).toPandas()
    melted = li.melt(
        id_vars=["l_returnflag"], var_name="measure", value_name="val"
    )
    for (flag, meas), grp in melted.groupby(["l_returnflag", "measure"]):
        row = got.loc[(flag, meas)]
        assert row["n"] == len(grp)
        # FSUM fixed-point fold, replicated exactly
        assert row["sum_val"] == (
            sum(int(v * 10000 // 1) for v in grp.val) / 10000.0
        )


# ---------------------------------------------------------------------------
# a33 — linear trend
# ---------------------------------------------------------------------------

def test_linear_trend_matches_numpy_polyfit(spark):
    import numpy as np

    got = (
        REGISTRY["a33_linear_trend"][0](spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = load(spark, SF, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    ).toPandas()
    e["day"] = e.us // 86_400_000_000
    for etype, grp in e.groupby("event_type"):
        daily = grp.groupby("day").size()
        x = daily.index.to_numpy(dtype=float)
        y = daily.to_numpy(dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        row = got.loc[etype]
        assert row["n_days"] == len(daily)
        assert row["slope_per_day"] == pytest.approx(slope, rel=1e-6)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-6)


# ---------------------------------------------------------------------------
# a34 — lag-1 autocorrelation
# ---------------------------------------------------------------------------

def test_autocorr_matches_numpy_shifted_corr(spark):
    import numpy as np

    got = (
        REGISTRY["a34_autocorr"][0](spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = load(spark, SF, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    ).toPandas()
    e["day"] = e.us // 86_400_000_000
    for etype, grp in e.groupby("event_type"):
        daily = grp.groupby("day").size().sort_index().to_numpy(dtype=float)
        x, y = daily[:-1], daily[1:]
        row = got.loc[etype]
        assert row["n_pairs"] == len(x)
        assert row["autocorr_lag1"] == pytest.approx(
            np.corrcoef(x, y)[0, 1], rel=1e-9
        )


# ---------------------------------------------------------------------------
# w16 — truncated EWMA
# ---------------------------------------------------------------------------

def test_ewma_matches_pure_python_fold(spark):
    """Replicate the truncated-EWMA fold exactly (same weights, same
    left-associative order) and check a pandas ewm cross-reference on
    short series where truncation is inactive."""
    from stampede_to_fresco_etl_spark.catalog import _EWMA_ALPHA, _EWMA_K

    got = (
        REGISTRY["w16_ewma"][0](spark, SF)
        .toPandas()
        .set_index("event_id")
    )
    e = (
        load(spark, SF, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .dropna(subset=["user_id", "value"])
    )
    weights = [(1.0 - _EWMA_ALPHA) ** j for j in range(_EWMA_K)]
    n_checked = 0
    for _, grp in e.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        vals = list(grp.value)
        for i, eid in enumerate(grp.event_id):
            num = 0.0
            den = 0.0
            for j in range(_EWMA_K):
                if i - j >= 0:
                    num = num + vals[i - j] * weights[j]
                    den = den + weights[j]
            assert got.loc[eid, "ewma"] == num / den
            n_checked += 1
    assert n_checked == len(got)
    # cross-reference: pandas ewm(adjust=True) equals the truncated
    # formula when the series is shorter than K
    short = e.groupby("user_id").filter(lambda g: len(g) < _EWMA_K)
    for _, grp in list(short.groupby("user_id"))[:20]:
        grp = grp.sort_values(["ts", "event_id"])
        ref = grp.value.ewm(alpha=_EWMA_ALPHA, adjust=True).mean()
        for eid, r in zip(grp.event_id, ref):
            assert got.loc[eid, "ewma"] == pytest.approx(r, rel=1e-12)


# ---------------------------------------------------------------------------
# a35 — ABC / Pareto classes
# ---------------------------------------------------------------------------

def test_abc_pareto_matches_pandas_scan(spark):
    import math

    got = (
        REGISTRY["a35_abc_pareto"][0](spark, SF)
        .toPandas()
        .set_index("abc_class")
        .sort_index()
    )
    li = load(spark, SF, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).toPandas()
    li["rev_i"] = [
        int(math.floor(p * (1 - d) * 10000.0))
        for p, d in zip(li.l_extendedprice, li.l_discount)
    ]
    rev = li.groupby("l_partkey").rev_i.sum().reset_index()
    rev = rev.sort_values(["rev_i", "l_partkey"], ascending=[False, True])
    tot = int(rev.rev_i.sum())
    cum = 0
    agg: dict[str, list[int]] = {}
    for r in rev.itertuples():
        cum += r.rev_i
        cls = "A" if cum * 100 <= 80 * tot else (
            "B" if cum * 100 <= 95 * tot else "C"
        )
        agg.setdefault(cls, []).append(r.rev_i)
    assert set(got.index) == set(agg)
    for cls, revs in agg.items():
        row = got.loc[cls]
        assert row["n_parts"] == len(revs)
        assert row["class_revenue"] == sum(revs) / 10000.0
        assert row["revenue_share"] == sum(revs) / float(tot)
    # Pareto sanity: A-class parts are few but carry most revenue
    if {"A", "C"} <= set(agg):
        assert got.loc["A", "revenue_share"] > got.loc["C", "revenue_share"]


# ---------------------------------------------------------------------------
# v12 — hybrid RRF
# ---------------------------------------------------------------------------

def test_hybrid_rrf_matches_pure_python(spark):
    """Rebuild BM25 (rational idf), the top-50 pool, the stopword
    quality prior, both rankings, and the fusion in pure Python."""
    from stampede_to_fresco_etl_spark.catalog import (
        _V12_POOL,
        _V12_RRF_K,
        _V12_TERMS,
        _X39_B,
        _X39_K1,
    )
    from stampede_to_fresco_etl_spark.operators.text import STOPWORDS

    got = (
        REGISTRY["v12_hybrid_rrf"][0](spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    toks = {r.doc_id: r.text.strip().split() for r in docs.itertuples()}
    n_docs = len(toks)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) / n_docs
    tf = {
        d: [sum(1 for x in t if x == term) for term in _V12_TERMS]
        for d, t in toks.items()
    }
    df = [
        sum(1 for d in toks if tf[d][i] > 0)
        for i in range(len(_V12_TERMS))
    ]
    scores = {}
    for d in toks:
        s = 0.0
        for i in range(len(_V12_TERMS)):
            idf = (n_docs - df[i] + 0.5) / (df[i] + 0.5)
            denom = tf[d][i] + _X39_K1 * (
                1.0 - _X39_B + _X39_B * dl[d] / avgdl
            )
            s += idf * (tf[d][i] * (_X39_K1 + 1.0)) / denom
        if s > 0:
            scores[d] = s
    pool = sorted(scores, key=lambda d: (-scores[d], d))[:_V12_POOL]
    qual = {
        d: sum(1 for x in toks[d] if x in STOPWORDS) / len(toks[d])
        for d in pool
    }
    r_lex = {
        d: i + 1
        for i, d in enumerate(sorted(pool, key=lambda d: (-scores[d], d)))
    }
    r_q = {
        d: i + 1
        for i, d in enumerate(sorted(pool, key=lambda d: (-qual[d], d)))
    }
    assert set(got.index) == set(pool)
    for d in pool:
        row = got.loc[d]
        assert row["rank_lex"] == r_lex[d]
        assert row["rank_qual"] == r_q[d]
        assert row["rrf_score"] == (
            1.0 / (_V12_RRF_K + r_lex[d]) + 1.0 / (_V12_RRF_K + r_q[d])
        )
    # fusion property: the top RRF doc is strong in at least one list
    best = max(pool, key=lambda d: (got.loc[d, "rrf_score"]))
    assert min(r_lex[best], r_q[best]) <= 5


# ---------------------------------------------------------------------------
# x44 — data-quality report
# ---------------------------------------------------------------------------

def test_dq_report_matches_pandas_profile(spark):
    from stampede_to_fresco_etl_spark.catalog import _X44_COLS

    got = (
        REGISTRY["x44_dq_report"][0](spark, SF)
        .toPandas()
        .set_index("column")
    )
    e = load(spark, SF, "events").select(*_X44_COLS).toPandas()
    assert set(got.index) == set(_X44_COLS)
    for c in _X44_COLS:
        row = got.loc[c]
        n_nulls = int(e[c].isna().sum())
        assert row["n_rows"] == len(e)
        assert row["n_nulls"] == n_nulls
        assert row["null_frac"] == n_nulls / len(e)
        assert row["n_distinct"] == e[c].nunique(dropna=True)


# ---------------------------------------------------------------------------
# x45 — PPS systematic sample
# ---------------------------------------------------------------------------

def test_pps_sample_matches_sequential_scan(spark):
    from stampede_to_fresco_etl_spark.catalog import _X45_K

    got = (
        REGISTRY["x45_pps_sample"][0](spark, SF)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = load(spark, SF, "documents").toPandas()
    w = {
        r.doc_id: len(r.text.strip().split())
        for r in docs.itertuples()
    }
    total = sum(w.values())
    stride = total // _X45_K
    cum = 0
    expect = {}
    for d in sorted(w):
        prev = cum
        cum += w[d]
        if cum // stride > prev // stride:
            expect[d] = (w[d], cum)
    assert dict(zip(got.index, zip(got.w, got.cum))) == expect
    # PPS guarantees: ~k docs selected; any doc heavier than the
    # stride is always included
    assert abs(len(expect) - _X45_K) <= 2
    for d, wd in w.items():
        if wd > stride:
            assert d in expect


# ---------------------------------------------------------------------------
# a36 — Theil–Sen + Mann–Kendall
# ---------------------------------------------------------------------------

def test_robust_trend_matches_pure_python(spark):
    got = (
        REGISTRY["a36_robust_trend"][0](spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = load(spark, SF, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    ).toPandas()
    e["day"] = e.us // 86_400_000_000
    for etype, grp in e.groupby("event_type"):
        daily = sorted(grp.groupby("day").size().items())
        slopes = []
        s = 0
        for i in range(len(daily)):
            for j in range(i + 1, len(daily)):
                (d1, c1), (d2, c2) = daily[i], daily[j]
                slopes.append(((c2 - c1) / (d2 - d1), d1, d2))
                s += (c2 > c1) - (c2 < c1)
        slopes.sort()
        np_ = len(slopes)
        lower_median = slopes[(np_ + 1) // 2 - 1][0]
        row = got.loc[etype]
        assert row["n_pairs"] == np_
        assert row["mk_s"] == s
        assert row["theil_sen_slope"] == lower_median


# ---------------------------------------------------------------------------
# a37 — Gini coefficient
# ---------------------------------------------------------------------------

def test_gini_matches_numpy(spark):
    import math

    import numpy as np

    got = REGISTRY["a37_gini"][0](spark, SF).toPandas()
    li = load(spark, SF, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).toPandas()
    li["rev_i"] = [
        int(math.floor(p * (1 - d) * 10000.0))
        for p, d in zip(li.l_extendedprice, li.l_discount)
    ]
    x = np.sort(li.groupby("l_partkey").rev_i.sum().to_numpy())
    n = len(x)
    gini_ref = (2 * np.sum((np.arange(1, n + 1)) * x)) / (
        n * x.sum()
    ) - (n + 1) / n
    assert len(got) == 1
    assert got.n[0] == n
    assert got.total_revenue[0] == int(x.sum()) / 10000.0
    assert got.gini[0] == pytest.approx(gini_ref, rel=1e-9)
    assert 0.0 <= got.gini[0] <= 1.0


# ---------------------------------------------------------------------------
# a38 — two-sample KS
# ---------------------------------------------------------------------------

def test_ks_two_sample_matches_scipy_style_scan(spark):
    from stampede_to_fresco_etl_spark.catalog import _A38_G1, _A38_G2

    got = REGISTRY["a38_ks_two_sample"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").select("event_type", "value").toPandas()
    e = e.dropna(subset=["value"])
    x1 = sorted(e[e.event_type == _A38_G1].value)
    x2 = sorted(e[e.event_type == _A38_G2].value)
    n1, n2 = len(x1), len(x2)
    vals = sorted(set(x1) | set(x2))
    import bisect

    m = 0
    for v in vals:
        c1 = bisect.bisect_right(x1, v)
        c2 = bisect.bisect_right(x2, v)
        m = max(m, abs(c1 * n2 - c2 * n1))
    assert len(got) == 1
    assert got.n1[0] == n1 and got.n2[0] == n2
    assert got.ks_d[0] == m / (n1 * n2)


# ---------------------------------------------------------------------------
# a39 — Mann–Whitney U / ROC-AUC
# ---------------------------------------------------------------------------

def test_rank_auc_matches_brute_force(spark):
    from stampede_to_fresco_etl_spark.catalog import _A38_G1, _A38_G2

    got = REGISTRY["a39_rank_auc"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").select("event_type", "value").toPandas()
    e = e.dropna(subset=["value"])
    x1 = list(e[e.event_type == _A38_G1].value)
    x2 = list(e[e.event_type == _A38_G2].value)
    # O(n1·n2) definition: wins + half-ties (doubled to stay integer)
    u1_x2 = 0
    import bisect

    x2s = sorted(x2)
    for v in x1:
        lo = bisect.bisect_left(x2s, v)
        hi = bisect.bisect_right(x2s, v)
        u1_x2 += 2 * lo + (hi - lo)
    assert len(got) == 1
    assert got.n1[0] == len(x1) and got.n2[0] == len(x2)
    assert got.u1[0] == u1_x2 / 2.0
    assert got.auc[0] == u1_x2 / (2.0 * (len(x1) * len(x2)))
    assert 0.0 <= got.auc[0] <= 1.0


# ---------------------------------------------------------------------------
# a40 — Spearman rank correlation
# ---------------------------------------------------------------------------

def test_spearman_matches_scipy_style_midranks(spark):
    import math

    import numpy as np

    got = REGISTRY["a40_spearman"][0](spark, SF).toPandas()
    li = load(spark, SF, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).toPandas()
    li["xq"] = [int(math.floor(q * 10000.0)) for q in li.l_quantity]
    li["yr"] = [
        int(math.floor(p * (1 - d) * 10000.0))
        for p, d in zip(li.l_extendedprice, li.l_discount)
    ]
    pp = li.groupby("l_partkey").agg(x=("xq", "sum"), y=("yr", "sum"))

    def midranks(vals):
        order = np.argsort(vals, kind="stable")
        ranks = np.empty(len(vals))
        sv = np.asarray(vals)[order]
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    rx = midranks(pp.x.to_numpy())
    ry = midranks(pp.y.to_numpy())
    rho_ref = np.corrcoef(rx, ry)[0, 1]
    assert len(got) == 1
    assert got.n[0] == len(pp)
    assert got.spearman_rho[0] == pytest.approx(rho_ref, rel=1e-9)


# ---------------------------------------------------------------------------
# a41 — difference-in-differences
# ---------------------------------------------------------------------------

def test_diff_in_diff_matches_pandas_cells(spark):
    import math

    from stampede_to_fresco_etl_spark.catalog import (
        _A41_CUT,
        _A41_SPACE,
        _A41_TREAT,
    )

    got = REGISTRY["a41_diff_in_diff"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").select(
        "user_id", "ts", "value"
    ).toPandas().dropna(subset=["user_id", "value"])
    cut = pd.Timestamp(_A41_CUT)
    cells = {}
    for r in e.itertuples():
        t = int(
            _md5_int63(f"did:{int(r.user_id)}") % _A41_SPACE < _A41_TREAT
        )
        p = int(r.ts >= cut)
        s, n = cells.get((t, p), (0, 0))
        cells[(t, p)] = (s + int(math.floor(r.value * 10000.0)), n + 1)

    def mean(t, p):
        s, n = cells[(t, p)]
        return (s / 10000.0) / n

    assert len(got) == 1
    for t in (0, 1):
        for p in (0, 1):
            assert got[f"n_{t}{p}"][0] == cells[(t, p)][1]
    assert got.mean_c_pre[0] == mean(0, 0)
    assert got.mean_t_post[0] == mean(1, 1)
    assert got.did[0] == (mean(1, 1) - mean(1, 0)) - (
        mean(0, 1) - mean(0, 0)
    )


# ---------------------------------------------------------------------------
# a42 — chi-square / Cramér's V
# ---------------------------------------------------------------------------

def test_cramers_v_matches_numpy_contingency(spark):
    import numpy as np

    got = REGISTRY["a42_cramers_v"][0](spark, SF).toPandas()
    e = load(spark, SF, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    ).toPandas()
    e["dow"] = (e.us // 86_400_000_000) % 7
    ct = pd.crosstab(e.event_type, e.dow).to_numpy()
    n = ct.sum()
    expected = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2_ref = ((ct - expected) ** 2 / expected).sum()
    k = min(ct.shape[0] - 1, ct.shape[1] - 1)
    assert len(got) == 1
    assert got.n[0] == n
    assert got.chi2[0] == pytest.approx(chi2_ref, rel=1e-9)
    assert got.cramers_v[0] == pytest.approx(
        np.sqrt(chi2_ref / (n * k)), rel=1e-9
    )
    assert 0.0 <= got.cramers_v[0] <= 1.0


# ---------------------------------------------------------------------------
# x46 — source templates (min/max LCP)
# ---------------------------------------------------------------------------

def test_source_templates_match_direct_lcp(spark):
    """The min/max-LCP identity vs the DIRECT all-strings common
    prefix, plus the 64-char cap."""
    import os

    from stampede_to_fresco_etl_spark.catalog import _X46_MAXP

    got = (
        REGISTRY["x46_source_templates"][0](spark, SF)
        .toPandas()
        .set_index("source")
    )
    docs = load(spark, SF, "documents").toPandas()
    for src, grp in docs.groupby("source"):
        texts = list(grp.text)
        pfx = os.path.commonprefix(texts)[:_X46_MAXP]
        row = got.loc[src]
        assert row["n_docs"] == len(texts)
        assert row["template_len"] == len(pfx)
        assert row["template"] == pfx


# ---------------------------------------------------------------------------
# x47 — token-weighted median
# ---------------------------------------------------------------------------

def test_token_weighted_median_matches_sequential(spark):
    from stampede_to_fresco_etl_spark.operators.text import STOPWORDS

    got = (
        REGISTRY["x47_token_weighted_median"][0](spark, SF)
        .toPandas()
        .set_index("lang")
    )
    docs = load(spark, SF, "documents").toPandas()
    rows = []
    for r in docs.itertuples():
        toks = r.text.strip().split()
        ratio = sum(1 for x in toks if x in STOPWORDS) / len(toks)
        rows.append((r.lang, ratio, r.doc_id, len(toks)))
    import collections

    by_lang = collections.defaultdict(list)
    for lang, ratio, did, w in rows:
        by_lang[lang].append((ratio, did, w))
    assert set(got.index) == set(by_lang)
    for lang, items in by_lang.items():
        items.sort()
        wtot = sum(w for _, _, w in items)
        cum = 0
        for ratio, _, w in items:
            cum += w
            if 2 * cum >= wtot:
                break
        row = got.loc[lang]
        assert row["total_tokens"] == wtot
        assert row["weighted_median_ratio"] == ratio


# ---------------------------------------------------------------------------
# u7 — reconciliation report
# ---------------------------------------------------------------------------

def test_reconcile_matches_pandas_classes(spark):
    import math

    got = (
        REGISTRY["u7_reconcile"][0](spark, SF)
        .toPandas()
        .set_index("status")
    )
    e = load(spark, SF, "events").select("event_id", "value").toPandas()
    e = e.dropna(subset=["value"])
    v = {
        int(r.event_id): int(math.floor(r.value * 10000.0))
        for r in e.itertuples()
    }
    a = {k: x for k, x in v.items() if k % 3 != 0}
    b = {
        k: (x * 2 if k % 7 == 0 else x)
        for k, x in v.items()
        if k % 5 != 0
    }
    agg = {}
    for k in set(a) | set(b):
        if k not in b:
            st = "only_a"
        elif k not in a:
            st = "only_b"
        elif a[k] != b[k]:
            st = "changed"
        else:
            st = "identical"
        n, d = agg.get(st, (0, 0))
        agg[st] = (n + 1, d + b.get(k, 0) - a.get(k, 0))
    assert set(got.index) == set(agg)
    for st, (n, d) in agg.items():
        assert got.loc[st, "n_keys"] == n
        assert got.loc[st, "value_delta"] == d / 10000.0


# ---------------------------------------------------------------------------
# x48 — heavy-change tokens
# ---------------------------------------------------------------------------

def test_heavy_change_matches_counter_diff(spark):
    import collections

    from stampede_to_fresco_etl_spark.catalog import _X48_SPACE, _X48_TOPK

    got = REGISTRY["x48_heavy_change"][0](spark, SF).toPandas()
    docs = load(spark, SF, "documents").toPandas()
    ca: collections.Counter = collections.Counter()
    cb: collections.Counter = collections.Counter()
    for r in docs.itertuples():
        side = (
            ca
            if _md5_int63(f"drift:{r.doc_id}") % _X48_SPACE
            < _X48_SPACE // 2
            else cb
        )
        side.update(r.text.strip().split())
    scored = sorted(
        ((abs(ca[t] - cb[t]), t) for t in set(ca) | set(cb)),
        key=lambda p: (-p[0], p[1]),
    )[:_X48_TOPK]
    assert list(zip(got.abs_change, got.tok)) == [
        (c, t) for c, t in scored
    ]
    for r in got.itertuples():
        assert r.n_a == ca[r.tok] and r.n_b == cb[r.tok]


# ---------------------------------------------------------------------------
# d14 — nearest-neighbor doc report
# ---------------------------------------------------------------------------

def test_nearest_neighbor_doc_matches_pair_argmax(spark):
    from stampede_to_fresco_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = load(spark, SF, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.05, max_shingle_df=100
    ).toPandas()
    best: dict[int, tuple[float, int]] = {}
    for r in pairs.itertuples():
        for d, nn in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a)):
            cur = best.get(d)
            cand = (-r.jaccard, nn)
            if cur is None or cand < cur:
                best[d] = cand
    got = (
        REGISTRY["d14_nearest_neighbor_doc"][0](spark, SF)
        .toPandas()
        .set_index("doc")
    )
    assert set(got.index) == set(best)
    for d, (negj, nn) in best.items():
        assert got.loc[d, "nn"] == nn
        assert got.loc[d, "jaccard"] == -negj
    # symmetry sanity: a doc's NN relation uses the same pair set,
    # so jaccard(doc → nn) equals jaccard(nn → doc) when mutual
    mutual = [d for d in best if best.get(best[d][1], (0, -1))[1] == d]
    for d in mutual[:20]:
        assert got.loc[d, "jaccard"] == got.loc[best[d][1], "jaccard"]


# ---------------------------------------------------------------------------
# x49 — cluster-safe split
# ---------------------------------------------------------------------------

def test_cluster_safe_split_never_straddles(spark):
    """The core invariant: no near-dup cluster straddles the split —
    plus count parity with a pure-Python union-find replay."""
    from stampede_to_fresco_etl_spark.catalog import (
        _X49_B_TRAIN,
        _X49_SPACE,
    )
    from stampede_to_fresco_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = load(spark, SF, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", min_jaccard=0.3, max_shingle_df=100
    ).toPandas()
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.itertuples():
        ra, rb = find(r.doc_a), find(r.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {d: find(d) for d in ids}
    split = {
        d: (
            "train"
            if _md5_int63(f"ccsplit:{c}") % _X49_SPACE < _X49_B_TRAIN
            else "eval"
        )
        for d, c in clusters.items()
    }
    # invariant: all docs of a cluster share the split
    by_c: dict[int, set[str]] = {}
    for d, c in clusters.items():
        by_c.setdefault(c, set()).add(split[d])
    assert all(len(s) == 1 for s in by_c.values())
    got = (
        REGISTRY["x49_cluster_safe_split"][0](spark, SF)
        .toPandas()
        .set_index("split")
    )
    import collections

    n_docs = collections.Counter(split.values())
    n_clusters = collections.Counter(
        {s: len({c for d, c in clusters.items() if split[d] == s})
         for s in set(split.values())}
    )
    for s in n_docs:
        assert got.loc[s, "n_docs"] == n_docs[s]
        assert got.loc[s, "n_clusters"] == n_clusters[s]


# ---------------------------------------------------------------------------
# w17 — rolling OLS slope
# ---------------------------------------------------------------------------

def test_rolling_trend_matches_numpy_windowed_polyfit(spark):
    import numpy as np

    from stampede_to_fresco_etl_spark.catalog import _W17_K

    got = (
        REGISTRY["w17_rolling_trend"][0](spark, SF)
        .toPandas()
        .set_index(["event_type", "day"])
        .sort_index()
    )
    e = load(spark, SF, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    ).toPandas()
    e["day"] = e.us // 86_400_000_000
    for etype, grp in e.groupby("event_type"):
        daily = sorted(grp.groupby("day").size().items())
        for i, (day, c) in enumerate(daily):
            window = daily[max(0, i - _W17_K + 1) : i + 1]
            row = got.loc[(etype, day)]
            assert row["c"] == c
            if len(window) < 2:
                assert pd.isna(row["rolling_slope"])
            else:
                x = np.array([d for d, _ in window], dtype=float)
                y = np.array([v for _, v in window], dtype=float)
                slope = np.polyfit(x, y, 1)[0]
                # abs tolerance: the exact-integer formula returns a
                # clean 0.0 where polyfit's float solver leaves ~1e-12
                assert row["rolling_slope"] == pytest.approx(
                    slope, rel=1e-9, abs=1e-9
                )


# ---------------------------------------------------------------------------
# j16 — join-skew report
# ---------------------------------------------------------------------------

def test_join_skew_report_matches_counter_product(spark):
    import collections

    from stampede_to_fresco_etl_spark.catalog import _J16_TOPK

    got = REGISTRY["j16_join_skew_report"][0](spark, SF).toPandas()
    o = load(spark, SF, "orders").select("o_custkey").toPandas()
    c = load(spark, SF, "customer").select("c_custkey").toPandas()
    na = collections.Counter(o.o_custkey)
    nb = collections.Counter(c.c_custkey)
    fan = {
        k: na[k] * nb[k] for k in set(na) & set(nb)
    }
    total = sum(fan.values())
    top = sorted(fan.items(), key=lambda p: (-p[1], p[0]))[:_J16_TOPK]
    assert list(zip(got.k, got.fanout)) == top
    for r in got.itertuples():
        assert r.n_a == na[r.k] and r.n_b == nb[r.k]
        assert r.output_share == fan[r.k] / total
    # the report's fan-out equals the true join output for those keys
    joined = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for r in got.itertuples():
        assert len(joined[joined.o_custkey == r.k]) == r.fanout


# ---------------------------------------------------------------------------
# a43 — Gini–Simpson diversity
# ---------------------------------------------------------------------------

def test_simpson_diversity_matches_pandas(spark):
    got = (
        REGISTRY["a43_simpson_diversity"][0](spark, SF)
        .toPandas()
        .set_index("lang")
    )
    docs = load(spark, SF, "documents").toPandas()
    for lang, grp in docs.groupby("lang"):
        cnt = grp.source.value_counts()
        n = len(grp)
        same = sum(c * (c - 1) for c in cnt)
        row = got.loc[lang]
        assert row["n"] == n
        assert row["n_sources"] == len(cnt)
        assert row["simpson_diversity"] == 1.0 - same / (n * (n - 1))
        assert 0.0 <= row["simpson_diversity"] <= 1.0
