"""Round-8 operators: property/kernel tests for the new registry
queries (exactness itself is covered by test_oracle_parity, which
parametrizes over every REGISTRY entry — these pin the semantics the
oracle compare can't see: invariants, determinism, artifact reuse)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.catalog import REGISTRY, load

SF = "/root/testdata/sf0.001"


def _q(name):
    return REGISTRY[name][0]


def test_time_weighted_avg_fixture(spark, tmp_path):
    # one type, one day: value 10.0 holds 6h, value 20.0 holds the
    # remaining 18h -> twa = (10*6 + 20*18) / 24 = 17.5
    rows = [
        (1, "2024-03-01 00:00:00", 10.0),
        (2, "2024-03-01 06:00:00", 20.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).select(
        "event_id",
        F.to_timestamp("ts").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("a").alias("event_type"),
        "value",
        F.lit(None).cast("string").alias("props"),
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = _q("t18_time_weighted_avg")(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 2
    assert r["twa_den"] == 24 * 3600 * 1_000_000
    assert abs(r["twa"] - 17.5) < 1e-12


def test_value_windows_ignore_nulls(spark):
    pdf = (
        _q("w22_value_windows")(spark, SF)
        .toPandas()
        .sort_values(["event_type", "day", "event_id"])
    )
    # every 7th event is nulled, and carried == vn wherever vn exists
    nulled = pdf[pdf.vn.isna()]
    assert (nulled.index.size > 0) and (
        pdf.loc[~pdf.vn.isna(), "carried"]
        == pdf.loc[~pdf.vn.isna(), "vn"]
    ).all()
    # carried on a null row equals that row's prev_nn (ffill contract)
    n = nulled.dropna(subset=["prev_nn"])
    assert (n.carried == n.prev_nn).all()


def test_cuped_reduces_to_raw_when_theta_zero_cov(spark):
    row = _q("a48_cuped")(spark, SF).collect()[0]
    # internal consistency: effect_cuped = effect_raw when theta == 0;
    # generally the adjustment must be finite and the exact sums
    # must satisfy the covariance identity sign
    assert row["n_users"] == row["n_t"] + (row["n_users"] - row["n_t"])
    assert row["theta"] == row["theta"]  # not NaN
    assert abs(row["effect_cuped"]) < float("inf")


def test_bloom_fpr_no_false_negatives(spark):
    row = _q("k6_bloom_fpr_audit")(spark, SF).collect()[0]
    assert row["n_fn"] == 0  # Bloom contract
    assert row["n_flagged"] >= row["n_members"]
    assert row["n_fp"] == row["n_flagged"] - row["n_members"]
    if row["fpr"] is not None:
        assert 0.0 <= row["fpr"] <= 1.0


def test_prorated_allocation_conserves_cents(spark):
    per_month = _q("t19_prorated_allocation")(spark, SF).toPandas()
    li = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders")
    total_cents = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0).cast("long")
            ).alias("c")
        )
        .collect()[0]["c"]
    )
    allocated = int(per_month.alloc_cents.sum())
    # floored integer shares never exceed the source amount, and the
    # rounding loss is < months-per-line pennies
    assert allocated <= total_cents
    assert total_cents - allocated <= int(per_month.n_allocs.sum())


def test_quota_redistribute_invariants(spark):
    pdf = _q("x58_quota_redistribute")(spark, SF).toPandas()
    assert (pdf.extra_tokens <= pdf.surplus).all()
    assert (pdf.final_quota <= pdf.avail_tokens).all()
    assert int(pdf.extra_tokens.sum()) <= int(pdf.deficit.sum())
    capped = pdf[pdf.deficit > 0]
    assert (capped.extra_tokens == 0).all()


def test_label_propagation_deterministic_and_valid(spark):
    a = _q("g5_label_propagation")(spark, SF).toPandas()
    b = _q("g5_label_propagation")(spark, SF).toPandas()
    a = a.sort_values("doc_id", ignore_index=True)
    b = b.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    # labels are node ids from the graph
    assert set(a.label) <= set(a.doc_id)


def test_bm25_stored_index_matches_direct(spark):
    from stampede_to_fresco_etl_spark.catalog import _X57_TERMS

    top = _q("x57_bm25_stored_index")(spark, SF).toPandas()
    assert len(top) > 0 and top.score.is_monotonic_decreasing
    docs = load(spark, SF, "documents").toPandas()
    hit = docs[docs.doc_id == int(top.doc_id.iloc[0])].text.iloc[0]
    assert any(t in hit.split() for t in _X57_TERMS)


def test_incremental_exact_dedup_flags(spark):
    pdf = _q("d16_incremental_exact_dedup")(spark, SF).toPandas()
    assert ((pdf.known == 1) == (pdf.n_known_copies > 0)).all()
    # probing again in the same session reuses the artifact and
    # returns identical rows (snapshot determinism)
    again = _q("d16_incremental_exact_dedup")(spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        pdf.sort_values("doc_id", ignore_index=True),
        again.sort_values("doc_id", ignore_index=True),
    )


def test_url_parse_depth_and_tlds(spark):
    pdf = _q("f19_url_parse")(spark, SF).toPandas()
    assert set(pdf.tld) <= {"com", "org", "net"}
    assert (pdf.max_depth <= 3).all() and (pdf.max_depth >= 0).all()
    assert (pdf.n_domains <= pdf.n_urls).all()


def test_whitespace_scrub_accounting(spark):
    pdf = _q("f20_whitespace_scrub")(spark, SF).toPandas()
    assert (pdf.n_changed <= pdf.n_docs).all()
    assert (pdf.chars_removed >= pdf.n_changed).all()  # >=1 char each


def test_pq_adc_self_distance_minimal(spark):
    """ADC distance of a probe to ITSELF must equal its own
    quantization (reconstruction) error — and no other vector can
    beat a perfect-code match on a probe that is also a codeword."""
    top = _q("v17_pq_adc_topk")(spark, SF).toPandas()
    from stampede_to_fresco_etl_spark.catalog import (
        _V17_PROBES,
        _V17_TOPK,
    )

    assert set(top.probe_id) == set(range(_V17_PROBES))
    for p, grp in top.groupby("probe_id"):
        assert len(grp) == _V17_TOPK
        assert grp.adc_dist.is_monotonic_increasing
        assert (grp.adc_dist >= 0).all()
    # probes are codewords (vec_id < K), so their own code row has
    # zero subspace distance in every table -> self adc == 0 exactly
    self_rows = top[top.probe_id == top.vec_id]
    assert (self_rows.adc_dist == 0.0).all() and len(self_rows) == 3


def test_adc_recall_bounds_and_self_hit(spark):
    pdf = _q("x59_adc_recall_audit")(spark, SF).toPandas()
    from stampede_to_fresco_etl_spark.catalog import _V17_PROBES

    assert len(pdf) == _V17_PROBES
    assert ((pdf.recall >= 0) & (pdf.recall <= 1)).all()
    # a probe is its own exact-L2 nearest neighbor AND its ADC self
    # distance is 0 (codeword probe), so recall can never be 0
    assert (pdf.n_hits >= 1).all()


def test_ingest_report_partition_of_batch(spark):
    """The four categories partition every batch doc exactly once,
    and the category flags agree with the stage operators."""
    pdf = _q("x60_ingest_report")(spark, SF).toPandas()
    assert (
        pdf.n_dropped + pdf.n_exact_dup + pdf.n_near_dup + pdf.n_admitted
        == pdf.n_batch
    ).all()
    assert int(pdf.n_batch.sum()) > 0
    # cross-check the batch size against the split convention
    from stampede_to_fresco_etl_spark.catalog import (
        INGEST_IDX_BOUND,
        INGEST_SPLIT_SALT,
    )
    from stampede_to_fresco_etl_spark.functions import md5_int63

    docs = load(spark, SF, "documents")
    n_batch = docs.filter(
        md5_int63("doc_id", salt=INGEST_SPLIT_SALT)
        >= F.lit(INGEST_IDX_BOUND)
    ).count()
    assert int(pdf.n_batch.sum()) == n_batch


def test_two_proportion_z_pandas_replay(spark):
    import math

    row = _q("a50_two_proportion_z")(spark, SF).collect()[0]
    ev = load(spark, SF, "events").toPandas()
    ev = ev[ev.user_id.notna()]
    conv = (
        ev.assign(p=(ev.event_type == "purchase").astype(int))
        .groupby("user_id")["p"]
        .sum()
        .ge(2)
        .astype(int)
    )
    arms = conv.index.astype("int64") % 2
    n_t, n_c = int((arms == 1).sum()), int((arms == 0).sum())
    c_t = int(conv[arms == 1].sum())
    c_c = int(conv[arms == 0].sum())
    assert (row["n_t"], row["n_c"], row["c_t"], row["c_c"]) == (
        n_t, n_c, c_t, c_c,
    )
    pp = (c_t + c_c) / (n_t + n_c)
    se = math.sqrt(pp * (1 - pp) * (1 / n_t + 1 / n_c))
    if se > 0:
        assert abs(row["z"] - (c_t / n_t - c_c / n_c) / se) < 1e-12


def test_business_day_lag_weekday_table(spark):
    """The F(d) weekday prefix function must agree with a direct
    Python weekday count on a span of dates."""
    import datetime as dt

    from stampede_to_fresco_etl_spark.catalog import _T20_PARTIAL

    def F_of(d):
        return 5 * ((d + 1) // 7) + _T20_PARTIAL[(d + 1) % 7]

    epoch = dt.date(1970, 1, 1)
    acc = 0
    for d in range(0, 400):
        if (epoch + dt.timedelta(days=d)).weekday() < 5:
            acc += 1
        assert F_of(d) == acc, d
    pdf = _q("t20_business_day_lag")(spark, SF).toPandas()
    assert len(pdf) > 0
    assert (pdf.max_lag >= 0).all() and (pdf.lag_sum >= 0).all()
    # a group mean never exceeds the group sum of non-negative lags
    assert (pdf.mean_lag <= pdf.lag_sum).all()


def test_prorated_overlap_identity_hypothesis():
    """Pure arithmetic property of t19's allocation formula: the
    month overlaps of any interval partition it exactly — Σ overlap
    days over the spanned months == total interval days (so the
    un-floored allocation shares sum to the full price)."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=20000),
        st.integers(min_value=0, max_value=3000),
    )
    def check(od, span):
        sd = od + span
        epoch = dt.date(1970, 1, 1)
        d0 = epoch + dt.timedelta(days=od)
        d1 = epoch + dt.timedelta(days=sd)
        mi0 = d0.year * 12 + d0.month
        mi1 = d1.year * 12 + d1.month
        total = 0
        for mi in range(mi0, mi1 + 1):
            y, m = (mi - 1) // 12, (mi - 1) % 12 + 1
            m0 = (dt.date(y, m, 1) - epoch).days
            ny, nm = (y, m + 1) if m < 12 else (y + 1, 1)
            m1 = (dt.date(ny, nm, 1) - epoch).days - 1
            total += min(sd, m1) - max(od, m0) + 1
        assert total == sd - od + 1

    check()


def test_adc_recall_audit_knobs(spark):
    """x59's deployment knobs: the arrow exact engine must reproduce
    the column engine's audit rows (top-k sets match; d² ulp noise
    cannot flip a set on this data), and probe sampling must return
    exactly the strided probe subset with unchanged per-probe rows."""
    from stampede_to_fresco_etl_spark.catalog import adc_recall_audit

    sf = "/root/testdata/sf0.001"
    full = {
        (r["probe_id"], r["n_hits"], r["recall"])
        for r in adc_recall_audit(spark, sf).collect()
    }
    arrow = {
        (r["probe_id"], r["n_hits"], r["recall"])
        for r in adc_recall_audit(spark, sf, exact_engine="arrow").collect()
    }
    assert arrow == full and len(full) == 3
    sampled = {
        (r["probe_id"], r["n_hits"], r["recall"])
        for r in adc_recall_audit(spark, sf, probe_sample_mod=2).collect()
    }
    assert sampled == {t for t in full if t[0] % 2 == 0}
