"""Round-7 operators: row_ranks kernel (o2's de-serialized global
rank), the w5 integer-rational fix, and w5b — the kernel-backed
production twin of the analytic window suite (VERDICT r6 items 1-4).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.operators.order_stats import row_ranks

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_row_ranks_grouped_vs_pandas(spark):
    rows = [(f"g{i % 5}", (i * 37) % 97, i) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v long, tie long")
    got = {
        (r["g"], r["tie"]): r["rn"]
        for r in row_ranks(
            df, ["g"], ["v", "tie"], num_partitions=16
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "v", "tie"])
    pdf["rn"] = pdf.sort_values(["v", "tie"]).groupby("g").cumcount() + 1
    for _, r in pdf.iterrows():
        assert got[(r["g"], r["tie"])] == r["rn"]
    assert len(got) == len(rows)


def test_row_ranks_global_total_order(spark):
    rows = [((i * 61) % 211, i) for i in range(211)]
    df = spark.createDataFrame(rows, "v long, tie long")
    out = row_ranks(df, [], ["v", "tie"], out_name="pos").collect()
    by_v = {r["v"]: r["pos"] for r in out}
    assert by_v == {v: v + 1 for v, _ in rows}


def test_o2_no_single_partition_window(spark):
    """o2's rank must never move the table through one task: no
    unpartitioned data-sized WindowExec (the r6 counter-example to
    SCALE.md's claim) — every window spec in its plan carries an
    explicit partition key, and the rank is join-recovered."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    fn = REGISTRY["o2_global_sort"][0]
    # fresh construct (bypass the r13 session plan memo) — see the
    # w5b canary below
    df = getattr(fn, "__wrapped__", fn)(spark, SF)
    plan = _plan(df)
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "offset frame window expected"
    for s in specs:
        # every spec partitions by something (first arg not an
        # ORDER BY expr): the unpartitioned form prints
        # windowspecdefinition(<order> ASC NULLS FIRST, ...)
        first = s.split("(", 1)[1].split(",", 1)[0]
        assert "ASC" not in first and "DESC" not in first, s
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_w5b_matches_w5_exactly(spark):
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    w5 = REGISTRY["w5_analytic_windows"][0](spark, SF).toPandas()
    w5b = REGISTRY["w5b_analytic_windows_kernel"][0](
        spark, SF
    ).toPandas()
    assert list(w5.columns) == list(w5b.columns)
    key = ["event_type", "event_id"]
    w5 = w5.sort_values(key).reset_index(drop=True)
    w5b = w5b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(w5, w5b, check_exact=True)


def test_w5b_plan_canary(spark):
    """w5b plan canary: no window spec ordered by event_id (w5's
    per-type full-table sort signature) — the only specs allowed are
    the (pid, type) local pass, the P·G stats chain, and the
    calendar-bounded day frame; joins back are broadcast."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    fn = REGISTRY["w5b_analytic_windows_kernel"][0]
    # bypass the r13 session plan memo: the canary inspects a FRESH
    # construct, not the AQE final plan of an earlier test's execution
    df = getattr(fn, "__wrapped__", fn)(spark, SF)
    plan = _plan(df)
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs
    assert not any("event_id" in s for s in specs), specs
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("- Exchange (") <= 8


def test_w5_rationals_are_exact_integers(spark):
    """The r6 red row's root cause stays dead: w5 emits no raw float
    division — pr/cd ride as (num, den) bigint pairs that satisfy the
    percent_rank/cume_dist identities."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    pdf = REGISTRY["w5_analytic_windows"][0](spark, SF).toPandas()
    for c in ("pr_num", "pr_den", "cd_num", "cd_den"):
        assert str(pdf[c].dtype) == "int64", c
    # identities on one partition: pr_num = rnk-1; cd covers all rows
    g = pdf[pdf.event_type == pdf.event_type.iloc[0]]
    assert (g.pr_num == g.rnk - 1).all()
    assert (g.cd_den == len(g)).all()
    assert g.cd_num.max() == len(g)
    assert (g.groupby("day").cd_num.nunique() == 1).all()


def test_attribution_models_agree_on_totals(spark):
    """Both attribution models must distribute the SAME purchase set:
    identical n_purchases totals and identical total revenue, with
    every touch label drawn from the touch types + 'direct'."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    pdf = REGISTRY["a44_attribution"][0](spark, SF).toPandas()
    assert set(pdf.model) == {"first_touch", "last_touch"}
    tot = pdf.groupby("model").n_purchases.sum()
    assert tot.nunique() == 1
    rev = pdf.groupby("model").revenue.sum().round(4)
    assert rev.nunique() == 1
    assert set(pdf.touch) <= {"click", "view", "signup", "direct"}


def test_kaplan_meier_risk_table_invariants(spark):
    """n_risk is the suffix sum of (d+c), strictly decreasing in t,
    and row 0 carries the full population."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    pdf = (
        REGISTRY["a45_kaplan_meier"][0](spark, SF)
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    assert (pdf.hazard_num == pdf.d_churn).all()
    assert (pdf.hazard_den == pdf.n_risk).all()
    suffix = (pdf.d_churn + pdf.c_censored)[::-1].cumsum()[::-1]
    assert (pdf.n_risk == suffix).all()
    assert pdf.n_risk.iloc[0] == (pdf.d_churn + pdf.c_censored).sum()


def test_longest_streak_vs_pandas(spark):
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    got = (
        REGISTRY["w18_longest_streak"][0](spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    days = (
        ev.assign(day=pd.to_datetime(ev.ts).dt.normalize())[
            ["user_id", "day"]
        ]
        .drop_duplicates()
        .sort_values(["user_id", "day"])
    )
    days["island"] = days.day - pd.to_timedelta(
        days.groupby("user_id").cumcount() + 1, unit="D"
    )
    runs = days.groupby(["user_id", "island"]).size()
    want_longest = runs.groupby("user_id").max()
    want_days = runs.groupby("user_id").sum()
    assert (got.longest_streak == want_longest).all()
    assert (got.n_active_days == want_days).all()


def test_source_tv_shift_vs_pandas(spark):
    """TV distance replayed in pandas from raw token counts,
    including the absent-token correction term."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    got = (
        REGISTRY["x50_source_tv_shift"][0](spark, SF)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    corpus = Counter()
    per_src: dict[str, Counter] = {}
    for _, r in docs.iterrows():
        toks = r["text"].strip().split()
        corpus.update(toks)
        per_src.setdefault(r["source"], Counter()).update(toks)
    M = sum(corpus.values())
    for src, cnt in per_src.items():
        ns = sum(cnt.values())
        tv = 0.5 * sum(
            abs(cnt.get(t, 0) / ns - m / M) for t, m in corpus.items()
        )
        assert got.loc[src, "n_tokens"] == ns
        assert abs(got.loc[src, "tv_vs_corpus"] - tv) < 1e-12
        assert 0.0 <= got.loc[src, "tv_vs_corpus"] <= 1.0


def test_hll_cumulative_exact_arm_and_monotonicity(spark):
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    pdf = (
        REGISTRY["k4_hll_cumulative"][0](spark, SF)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = pd.to_datetime(ev.ts).dt.normalize()
    want = (
        ev.groupby("user_id").day.min().value_counts().sort_index().cumsum()
    )
    assert pdf.exact_users_to_date.iloc[-1] == ev.user_id.nunique()
    assert (pdf.new_users.cumsum() == pdf.exact_users_to_date).all()
    # exact arm matches the pandas first-seen replay on arrival days
    got = pdf.set_index(pd.to_datetime(pdf.day)).exact_users_to_date
    for d, v in want.items():
        assert got.loc[d] == v
    # cumulative-merge property: the estimate is non-decreasing
    assert (pdf.hll_estimate.diff().dropna() >= -1e-9).all()
    assert (
        pdf.rel_err
        == (pdf.hll_estimate - pdf.exact_users_to_date)
        / pdf.exact_users_to_date
    ).all()


def test_source_modularity_identities(spark):
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    r = REGISTRY["g4_source_modularity"][0](spark, SF).toPandas().iloc[0]
    assert r.intra_edges <= r.m_edges
    assert r.q_den == 4 * r.m_edges * r.m_edges
    assert r.q_num == 4 * r.m_edges * r.intra_edges - r.sum_deg_sq
    assert abs(r.modularity - r.q_num / r.q_den) < 1e-15
    assert -1.0 <= r.modularity <= 1.0


def test_mmr_vs_numpy_greedy(spark):
    """Full numpy replay of the pool build + greedy MMR selection."""
    import numpy as np

    from stampede_to_fresco_etl_spark.catalog import (
        _MMR_K, _MMR_LAM, _MMR_POOL, REGISTRY,
    )

    got = (
        REGISTRY["v13_mmr_diverse_topk"][0](spark, SF)
        .toPandas()
        .sort_values("sel_rank")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.stack(emb.embedding.to_numpy()).astype("float64")
    ids = emb.vec_id.to_numpy()
    q = V[ids == 0][0]
    sims = V @ q / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:_MMR_POOL]
    pool_ids, pool_rel = ids[order], sims[order]
    Vp = V[order]
    Pn = Vp / np.linalg.norm(Vp, axis=1, keepdims=True)
    S = Pn @ Pn.T
    sel = [int(np.lexsort((pool_ids, -pool_rel))[0])]
    for _ in range(_MMR_K - 1):
        best, best_score = None, None
        for c in range(len(pool_ids)):
            if c in sel:
                continue
            sc = _MMR_LAM * pool_rel[c] - (1 - _MMR_LAM) * max(
                S[c][s] for s in sel
            )
            if (
                best is None
                or sc > best_score + 1e-12
                or (abs(sc - best_score) <= 1e-12
                    and pool_ids[c] < pool_ids[best])
            ):
                best, best_score = c, sc
        sel.append(best)
    assert list(got.vec_id) == [int(pool_ids[s]) for s in sel]
    assert got.sel_rank.tolist() == list(range(1, _MMR_K + 1))
    # diversity property: picks 2..k are never the pure-relevance order
    assert (got.mmr_score.iloc[1:] <= got.rel.iloc[1:] + 1e-12).all()


def test_mmr_select_matches_distributed(spark):
    """Bit-parity pin for the r13 driver-side greedy: mmr_select must
    reproduce the r12 DISTRIBUTED formulation exactly — same picks,
    same doubles — because the Python replay uses the same left-fold
    IEEE ops as the engine's `cosine`.  The distributed form is
    re-created inline here as the oracle."""
    from pyspark.sql import Row

    from stampede_to_fresco_etl_spark.operators.similarity import (
        as_double_vec,
        cosine,
        mmr_select,
    )

    pool = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", as_double_vec("embedding").alias("v"))
        .orderBy("vec_id")
        .limit(12)
        .withColumn(
            "rel",
            cosine(
                F.col("v"),
                F.expr(
                    "transform(v, x -> CAST(0.5 AS DOUBLE) * x)"
                ),
            ),
        )
    )
    k, lam = 5, 0.7
    got = [
        tuple(r)
        for r in mmr_select(pool, "vec_id", "v", "rel", k=k, lam=lam)
        .orderBy("sel_rank")
        .collect()
    ]

    # the r12 distributed rounds, inline (eager checkpoints for
    # simplicity — values are what matters)
    pairs = (
        pool.select(F.col("vec_id").alias("__ida"), F.col("v").alias("__va"))
        .crossJoin(
            pool.select(
                F.col("vec_id").alias("__idb"), F.col("v").alias("__vb")
            )
        )
        .where(F.col("__ida") != F.col("__idb"))
        .select(
            "__ida",
            "__idb",
            cosine(F.col("__va"), F.col("__vb")).alias("__sim"),
        )
        .localCheckpoint()
    )
    rel = pool.select(
        F.col("vec_id").alias("__id"), F.col("rel").alias("__rel")
    )
    selected = (
        rel.orderBy(F.col("__rel").desc(), "__id")
        .limit(1)
        .select(
            "__id",
            "__rel",
            F.col("__rel").alias("__score"),
            F.lit(1).cast("long").alias("sel_rank"),
        )
        .localCheckpoint()
    )
    for i in range(2, k + 1):
        msim = (
            pairs.join(
                selected.select(F.col("__id").alias("__idb")), "__idb"
            )
            .groupBy("__ida")
            .agg(F.max("__sim").alias("__msim"))
        )
        cand = rel.join(selected.select("__id"), "__id", "left_anti")
        scored = cand.join(msim, cand["__id"] == msim["__ida"]).select(
            "__id",
            "__rel",
            (
                F.lit(lam) * F.col("__rel")
                - F.lit(1.0 - lam) * F.col("__msim")
            ).alias("__score"),
        )
        pick = (
            scored.orderBy(F.col("__score").desc(), "__id")
            .limit(1)
            .withColumn("sel_rank", F.lit(i).cast("long"))
        )
        selected = selected.unionByName(pick).localCheckpoint()
    want = [
        (r["sel_rank"], r["__id"], r["__rel"], r["__score"])
        for r in selected.orderBy("sel_rank").collect()
    ]
    assert got == want  # ids AND doubles, bit-exact


def test_kmeans_refine_improves_balance_and_counts(spark):
    from stampede_to_fresco_etl_spark.catalog import _KM_CELLS, REGISTRY

    pdf = REGISTRY["v14_kmeans_refine"][0](spark, SF).toPandas()
    n = pd.read_parquet(f"{SF}/embeddings.parquet").shape[0]
    assert pdf.n_iter1.sum() == n
    assert pdf.n_iter2.sum() == n
    assert len(pdf) <= _KM_CELLS
    assert (pdf.sse >= 0).all()


def test_mmr_plan_pool_is_take_ordered(spark):
    """The pool must come from TakeOrdered (map-side partial top-k),
    never a global Sort of the scored corpus."""
    from stampede_to_fresco_etl_spark.catalog import (
        _MMR_POOL, N_PROBES,
    )
    from stampede_to_fresco_etl_spark.operators.similarity import (
        as_double_vec, cosine,
    )
    from stampede_to_fresco_etl_spark.catalog import load

    emb = load(spark, SF, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("v")
    )
    q = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id", "v", cosine(F.col("v"), F.col("qv")).alias("rel")
    )
    pool = scored.orderBy(F.col("rel").desc(), "vec_id").limit(_MMR_POOL)
    plan = _plan(pool)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_shot_boundaries_pair_structure(spark):
    """Frames come in pairs copying the same segment: odd frame_idx
    (intra-pair) diffs are exactly 0 and never boundaries; malformed
    payloads (doc_id % 7 == 0) surface as the single NULL row."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    pdf = REGISTRY["mm10_shot_boundaries"][0](spark, SF).toPandas()
    ok = pdf[pdf.frame_idx.notna()]
    bad = pdf[pdf.frame_idx.isna()]
    assert (bad.media_id % 7 == 0).all() and len(bad) > 0
    assert not (ok.media_id % 7 == 0).any()
    intra = ok[ok.frame_idx % 2 == 1]
    assert (intra["diff"] == 0).all()
    assert (~intra.is_boundary).all()
    # every media with 6 frames emits exactly 5 pair rows
    assert (ok.groupby("media_id").size() == 5).all()
    assert (ok.is_boundary == (ok["diff"] > 8)).all()


def test_doc_token_frame_survives_eviction(spark):
    """bench.py's _free_blocks unpersists every lingering RDD between
    timed runs.  The cross-query shared token projection must SURVIVE
    that (recompute via lineage), not crash with
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the failure mode of a
    localCheckpoint-backed cache."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    fn = REGISTRY["x1_token_stats"][0]
    first = fn(spark, SF).count()
    for r in spark.sparkContext._jsc.getPersistentRDDs().values():
        r.unpersist(False)
    assert fn(spark, SF).count() == first


def test_window_funnel_monotone_and_ordered(spark):
    """Funnel counts are non-increasing by stage, and a brute-force
    pandas replay of the greedy earliest-entry semantics agrees."""
    from stampede_to_fresco_etl_spark.catalog import (
        _A46_WINDOW_DAYS, REGISTRY,
    )

    pdf = (
        REGISTRY["a46_window_funnel"][0](spark, SF)
        .toPandas()
        .sort_values("stage")
        .reset_index(drop=True)
    )
    assert pdf.n_users.is_monotonic_decreasing
    ev = pd.read_parquet(f"{SF}/events.parquet")
    # the parquet ts is TIMESTAMP(NANOS); force ns before µs division
    # (a ms-precision read silently yields ms → a 1000× window)
    ev["us"] = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    horizon = _A46_WINDOW_DAYS * 86_400 * 1_000_000
    got = {1: 0, 2: 0, 3: 0}
    for _, g in ev.groupby("user_id"):
        sg = g[g.event_type == "signup"]
        if sg.empty:
            continue
        t1 = sg.us.min()
        got[1] += 1
        ck = g[(g.event_type == "click") & (g.us > t1)
               & (g.us <= t1 + horizon)]
        if ck.empty:
            continue
        t2 = ck.us.min()
        got[2] += 1
        pu = g[(g.event_type == "purchase") & (g.us > t2)
               & (g.us <= t1 + horizon)]
        if not pu.empty:
            got[3] += 1
    assert dict(zip(pdf.stage, pdf.n_users)) == got


def test_sql_passthrough_is_verbatim(spark):
    """The registered-views SQL entry point: the SAME statement text
    runs on spark.sql and serves as the DuckDB oracle."""
    from stampede_to_fresco_etl_spark.catalog import (
        _SQL1_VERBATIM, REGISTRY,
    )

    fn, sql = REGISTRY["sql1_verbatim_passthrough"]
    assert sql == _SQL1_VERBATIM
    pdf = fn(spark, SF).toPandas()
    assert len(pdf) == 5 and (pdf.n_events > 0).all()


def test_vocab_rank_window_spec_is_explicit(spark):
    """x21/x22/x26's vocabulary id window must carry the explicit
    all-zeros partition key (dimension-sized by the min_count
    contract) so the 'No Partition Defined' warning stays a true
    canary; scripts/plan_audit.py enforces the same over the whole
    registry per round."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    for q in ("x21_build_vocab", "x22_encode_corpus",
              "x26_token_rarity"):
        df = REGISTRY[q][0](spark, SF)
        plan = _plan(df)
        for s in re.findall(r"windowspecdefinition\([^)]*\)", plan):
            first = s.split("(", 1)[1].split(",", 1)[0]
            assert "ASC" not in first and "DESC" not in first, (q, s)


def test_anova_f_vs_scipy_formula(spark):
    """F statistic replayed with numpy group moments on the
    floor-scaled values."""
    import numpy as np

    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    r = REGISTRY["a47_anova_f"][0](spark, SF).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(
        subset=["value"]
    )
    x = np.floor(ev.value.to_numpy() * 10000.0)
    g = ev.event_type.to_numpy()
    groups = [x[g == t] for t in sorted(set(g))]
    grand = x.mean()
    ssb = sum(len(a) * (a.mean() - grand) ** 2 for a in groups)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in groups)
    k, n = len(groups), len(x)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.k == k and r.n == n
    assert abs(r.f_stat - f) < 1e-9 * max(1.0, abs(f))
    assert abs(r.ssb - ssb / 1e8) < 1e-6
    assert abs(r.ssw - ssw / 1e8) < 1e-4


def test_threshold_sweep_monotone(spark):
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    pdf = (
        REGISTRY["x51_threshold_sweep"][0](spark, SF)
        .toPandas()
        .sort_values("threshold")
        .reset_index(drop=True)
    )
    assert pdf.n_pairs_ge.is_monotonic_decreasing
    assert (pdf.mean_jaccard_ge >= pdf.threshold).all()
    assert (pdf.mean_jaccard_ge <= 1.0).all()


def test_bollinger_bands_vs_pandas(spark):
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    got = REGISTRY["w19_bollinger_bands"][0](spark, SF).toPandas()
    g = got[got.event_type == "click"].sort_values("day")
    # a full window computes mean of the last 5 closes exactly
    c = g.close.to_numpy()
    m = g.mean5.to_numpy()
    s = g.sigma5.to_numpy()
    for i in range(4, len(c)):
        w = c[i - 4 : i + 1]
        assert abs(m[i] - w.mean()) < 1e-9
        assert abs(s[i] - w.std()) < 1e-6  # population std, N divisor
    assert (g.upper - g.mean5 - 2 * g.sigma5).abs().max() < 1e-12
    assert g.mean5.isna().sum() == 4  # first 4 rows lack the window


def test_write_with_manifest_roundtrip(spark, tmp_path):
    from stampede_to_fresco_etl_spark.catalog import load
    from stampede_to_fresco_etl_spark.sources.writers import (
        ManifestMismatchError,
        verify_manifest,
        write_with_manifest,
    )

    path = str(tmp_path / "snap")
    df = load(spark, SF, "events").select(
        "event_id", "event_type", "user_id"
    )
    m = write_with_manifest(df, path, partition_by=["event_type"])
    assert m["total_rows"] == df.count()
    assert m["n_files"] >= 5  # one per partition value at least
    v = verify_manifest(spark, path)
    assert v["total_rows"] == m["total_rows"]

    # corrupt: truncate one file -> size drift must be named
    import glob, os

    victim = sorted(glob.glob(f"{path}/**/*.parquet", recursive=True))[0]
    with open(victim, "r+b") as fh:
        fh.truncate(os.path.getsize(victim) - 1)
    try:
        verify_manifest(spark, path)
        raise AssertionError("expected ManifestMismatchError")
    except ManifestMismatchError as ex:
        assert "size drift" in str(ex)


def test_survivor_bias_cohort_arithmetic(spark):
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    pdf = (
        REGISTRY["x52_survivor_bias"][0](spark, SF)
        .toPandas()
        .set_index("cohort")
    )
    assert set(pdf.index) == {"kept", "dropped", "corpus"}
    assert (
        pdf.loc["kept", "n_docs"] + pdf.loc["dropped", "n_docs"]
        == pdf.loc["corpus", "n_docs"]
    )
    # quality-argmax keep: kept cohort can't be worse than the corpus
    assert pdf.loc["kept", "mean_quality"] >= pdf.loc[
        "corpus", "mean_quality"
    ] - 1e-12


def test_recall_nprobe_curve_monotone(spark):
    from stampede_to_fresco_etl_spark.catalog import (
        _V15_NPROBES, REGISTRY,
    )

    pdf = (
        REGISTRY["v15_recall_nprobe_curve"][0](spark, SF)
        .toPandas()
        .sort_values("n_probe")
        .reset_index(drop=True)
    )
    assert list(pdf.n_probe) == list(_V15_NPROBES)
    # more probed cells can only add candidates: recall is monotone
    assert pdf.mean_recall.is_monotonic_increasing
    assert (pdf.mean_recall <= 1.0).all() and (
        pdf.mean_recall >= 0.0
    ).all()


def test_shared_pair_frames_survive_eviction(spark):
    """Same contract as the token projection: every shared pair
    cache must self-heal (persist lineage) after a caller unpersists
    all RDDs — not crash on missing checkpoint blocks."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    for q in ("d5_dup_clusters", "d2_minhash_lsh", "d12_semdedup"):
        fn = REGISTRY[q][0]
        first = fn(spark, SF).count()
        for r in spark.sparkContext._jsc.getPersistentRDDs().values():
            r.unpersist(False)
        assert fn(spark, SF).count() == first


def test_lsh_pairs_between_structure(spark):
    """Incremental LSH (d15's kernel): identical docs across the
    split collide with est_jaccard 1.0; the batch side never joins
    itself (no new×new pair even for identical new docs); each
    candidate appears exactly once with the new doc on the left."""
    from stampede_to_fresco_etl_spark.operators.dedup import (
        lsh_pairs_between,
        minhash_signatures,
    )

    body = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, body),            # indexed
        (2, body),            # new — dup of 1 and of 3
        (3, body),            # new — dup of 1, but NOT paired with 2
        (4, "one two three four five six seven eight nine"),  # indexed
        (5, "совсем другой текст без общих шинглов вообще да"),  # new
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = minhash_signatures(
        docs.filter(F.col("doc_id").isin(1, 4)), "doc_id", "text", 6
    )
    new = minhash_signatures(
        docs.filter(~F.col("doc_id").isin(1, 4)), "doc_id", "text", 6
    )
    out = lsh_pairs_between(new, idx, num_hashes=6, bands=3).collect()
    pairs = {(r["new_doc"], r["indexed_doc"]): r["est_jaccard"] for r in out}
    assert pairs[(2, 1)] == 1.0
    assert pairs[(3, 1)] == 1.0
    assert (2, 3) not in pairs and (3, 2) not in pairs  # never new×new
    assert (4, 1) not in pairs and (1, 4) not in pairs  # never idx×idx
    assert all(a in (2, 3, 5) and b in (1, 4) for a, b in pairs)
    assert len(out) == len(pairs)  # one row per candidate


def test_d15_split_is_x11_convention(spark):
    """d15's batch/index split must reproduce with the salted-hash
    convention (deterministic, engine-independent): both sides are
    non-empty at sf0.001 and partition the doc_id set exactly."""
    from stampede_to_fresco_etl_spark.catalog import (
        INGEST_IDX_BOUND,
        INGEST_SPLIT_SALT,
    )
    from stampede_to_fresco_etl_spark.functions import md5_int63

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    h = md5_int63("doc_id", salt=INGEST_SPLIT_SALT)
    n_idx = docs.filter(h < F.lit(INGEST_IDX_BOUND)).count()
    n_new = docs.filter(h >= F.lit(INGEST_IDX_BOUND)).count()
    assert n_idx > 0 and n_new > 0
    assert n_idx + n_new == docs.count()
    assert n_idx > n_new  # ~80/20


def test_rolling_wau_vs_bruteforce(spark):
    """w20's lag/explode kernel vs the O(days×users) definition."""
    import datetime as dt

    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    got = {
        r["day"]: r["wau"]
        for r in REGISTRY["w20_rolling_wau"][0](spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    active = {(r["user_id"], r["d"]) for r in ev.distinct().collect()}
    days = sorted({d for _, d in active})
    d0, d1 = days[0], days[-1]
    spine = [
        d0 + dt.timedelta(days=i) for i in range((d1 - d0).days + 1)
    ]
    assert set(got) == set(spine)  # full spine, zeros included
    for day in spine:
        want = len(
            {
                u
                for u, d in active
                if day - dt.timedelta(days=6) <= d <= day
            }
        )
        assert got[day] == want, day


def test_rolling_wau_window_is_user_partitioned(spark):
    """w20 plan canary: the only window spec partitions by user_id —
    no data-sized single-partition sort anywhere."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    plan = _plan(REGISTRY["w20_rolling_wau"][0](spark, SF))
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs
    for s in specs:
        assert s.split("(", 1)[1].split(",", 1)[0].startswith("user_id"), s


def test_inverted_index_invariants(spark):
    """x53: postings materialize iff df ≤ cap; the list length equals
    df; ids are ascending; df/total_tf match a brute-force count."""
    from collections import Counter

    from stampede_to_fresco_etl_spark.catalog import (
        REGISTRY,
        X53_POSTINGS_DF_CAP,
    )

    out = REGISTRY["x53_inverted_index"][0](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    df_b: Counter = Counter()
    tf_b: Counter = Counter()
    post_b: dict[str, set] = {}
    for r in docs:
        toks = r["text"].strip().split()
        tf_b.update(toks)
        for t in set(toks):
            df_b[t] += 1
            post_b.setdefault(t, set()).add(r["doc_id"])
    assert len(out) == len(df_b)
    for r in out:
        t = r["token"]
        assert r["df"] == df_b[t]
        assert r["total_tf"] == tf_b[t]
        if r["df"] <= X53_POSTINGS_DF_CAP:
            ids = [int(x) for x in r["postings"].split(",")]
            assert ids == sorted(post_b[t])
        else:
            assert r["postings"] is None


def test_probe_stored_bands_equals_on_the_fly(spark):
    """d15 steady state: probing a STORED band table
    (band_signatures written to parquet, the 100 TB index artifact)
    returns exactly the pairs of the on-the-fly indexed_sigs form."""
    import tempfile

    from stampede_to_fresco_etl_spark.operators.dedup import (
        band_signatures,
        lsh_pairs_between,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    idx = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    si = minhash_signatures(idx, "doc_id", "text", 6)
    sn = minhash_signatures(new, "doc_id", "text", 6)
    path = tempfile.mkdtemp() + "/bands"
    band_signatures(si, 6, 3).write.parquet(path)

    def key(rows):
        return {(r["new_doc"], r["indexed_doc"], r["est_jaccard"]) for r in rows}

    direct = key(lsh_pairs_between(sn, si, 6, 3).collect())
    stored = key(
        lsh_pairs_between(
            sn,
            indexed_bands=spark.read.parquet(path),
            num_hashes=6,
            bands=3,
        ).collect()
    )
    assert direct == stored and direct


def test_v16_incremental_ann_invariants(spark):
    """Each incoming vector appears at most once (top-1), its match
    is on the indexed side of the split, cos_sim ∈ [-1, 1], and the
    probe join is NOT hint-forced broadcast (the batch side is data-
    sized; AQE may still choose broadcast at runtime — the design
    point is no static gigabyte-broadcast hint)."""
    from stampede_to_fresco_etl_spark.catalog import (
        INGEST_IDX_BOUND,
        INGEST_SPLIT_SALT,
        REGISTRY,
    )
    from stampede_to_fresco_etl_spark.functions import md5_int63

    df = REGISTRY["v16_incremental_ann"][0](spark, SF)
    assert "ResolvedHint" not in df._jdf.queryExecution().analyzed().toString()
    rows = df.collect()
    assert rows
    new_ids = [r["new_id"] for r in rows]
    assert len(new_ids) == len(set(new_ids))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    h = md5_int63("vec_id", salt=INGEST_SPLIT_SALT)
    idx_ids = {
        r["vec_id"]
        for r in emb.filter(h < F.lit(INGEST_IDX_BOUND)).collect()
    }
    for r in rows:
        assert r["new_id"] not in idx_ids
        assert r["indexed_id"] in idx_ids
        assert -1.0 - 1e-9 <= r["cos_sim"] <= 1.0 + 1e-9


def test_banded_index_bucketed_probe_shuffles_batch_only(spark, tmp_path):
    """The 100 TB claim in dedup_stream's docstring, executed: a band
    table stored with bucketBy(band_idx, band_key) is probed by a new
    batch with the INDEX side read bucket-aligned (Bucketed: true,
    no Exchange above its scan) — only the batch side shuffles into
    the existing buckets.  And the bucketed probe returns exactly the
    on-the-fly pairs."""
    from stampede_to_fresco_etl_spark.operators.dedup import (
        band_signatures,
        lsh_pairs_between,
        minhash_signatures,
    )
    from stampede_to_fresco_etl_spark.sources.writers import (
        write_bucketed_table,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    idx_sigs = minhash_signatures(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text", 6
    )
    new_sigs = minhash_signatures(
        docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text", 6
    ).localCheckpoint()
    table = "band_index_probe_test"
    write_bucketed_table(
        band_signatures(idx_sigs, 6, 3),
        table,
        ["band_idx", "band_key"],
        num_buckets=8,
        path=str(tmp_path / "bandidx"),
    )
    try:
        out = lsh_pairs_between(
            new_sigs,
            indexed_bands=spark.table(table),
            num_hashes=6,
            bands=3,
            materialize=False,
        )
        conf = spark.conf
        old_aqe = conf.get("spark.sql.adaptive.enabled")
        old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(out)
        finally:
            conf.set("spark.sql.adaptive.enabled", old_aqe)
            conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        assert "Bucketed: true" in plan, plan
        band_exchanges = len(
            re.findall(r"Arguments: hashpartitioning\(band_idx", plan)
        )
        assert band_exchanges == 1, plan  # the batch side, nothing else

        want = {
            (r["new_doc"], r["indexed_doc"], r["est_jaccard"])
            for r in lsh_pairs_between(
                new_sigs, idx_sigs, 6, 3, materialize=False
            ).collect()
        }
        got = {
            (r["new_doc"], r["indexed_doc"], r["est_jaccard"])
            for r in out.collect()
        }
        assert got == want and got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_seasonal_dow_vs_pandas(spark):
    """w21 replayed in pandas: day totals, weekday means, and the
    exact residual rationals."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    got = REGISTRY["w21_seasonal_dow"][0](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = pd.to_datetime(ev.ts).dt.normalize()
    ev["vi"] = (ev.value * 10000.0).apply(__import__("math").floor)
    daily = (
        ev.groupby(["event_type", "day"]).vi.sum().rename("tot").reset_index()
    )
    daily["dow"] = (
        (daily.day - pd.Timestamp("1970-01-01")).dt.days % 7
    ).astype(int)
    dw = daily.groupby(["event_type", "dow"]).tot.agg(["sum", "count"])
    assert len(got) == len(daily)
    g = got.set_index(["event_type", pd.to_datetime(got.day)])
    for _, r in daily.iterrows():
        row = g.loc[(r.event_type, r.day)]
        s, n = dw.loc[(r.event_type, r.dow)]
        assert row["dow"] == r.dow
        assert row["resid_num"] == r.tot * n - s
        assert row["resid_den"] == n
        assert row["day_total"] == r.tot / 10000.0


def test_pii_redaction_counts_and_placeholders(spark):
    """x54: every injected span is found and redacted — mod-0 docs
    report exactly one email, mod-1 exactly one phone, mod-2 none
    (corpus text itself is PII-free), and re-running the redaction
    expressions over the redacted text finds nothing."""
    from stampede_to_fresco_etl_spark.catalog import REGISTRY

    rows = REGISTRY["x54_pii_redaction"][0](spark, SF).collect()
    assert rows
    for r in rows:
        m = r["doc_id"] % 3
        assert (r["n_emails"], r["n_phones"]) == (
            (1, 0) if m == 0 else (0, 1) if m == 1 else (0, 0)
        ), r
    # one fingerprint row per source doc, none dropped by the scrub
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    red = REGISTRY["x54_pii_redaction"][0](spark, SF)
    joined = docs.select("doc_id").join(
        red.select("doc_id", "red_fp"), "doc_id"
    )
    assert joined.count() == docs.count()


def test_target_encoding_vs_pandas(spark):
    """x56 rationals replayed in pandas: LOO = (Σcat − y)/(n−1),
    smoothed = (Σcat·N + m·Σg)/((n+m)·N); singleton categories NULL."""
    from stampede_to_fresco_etl_spark.catalog import (
        REGISTRY,
        X56_SMOOTH_M,
    )

    got = REGISTRY["x56_target_encoding"][0](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["vi"] = (ev.value * 10000.0).apply(__import__("math").floor)
    cat = ev.groupby("event_type").vi.agg(["sum", "count"])
    gs, gn = ev.vi.sum(), len(ev)
    assert len(got) == len(ev)
    g = got.set_index("event_id")
    for _, r in ev.iterrows():
        s, n = cat.loc[r.event_type]
        row = g.loc[r.event_id]
        if n > 1:
            assert row["loo_num"] == s - row["vi"]
            assert row["loo_den"] == n - 1
        else:
            assert pd.isna(row["loo_num"]) and pd.isna(row["loo_den"])
        assert row["sm_num"] == s * gn + X56_SMOOTH_M * gs
        assert row["sm_den"] == (n + X56_SMOOTH_M) * gn
