"""Property-based tests (hypothesis) for the semantic-trap functions
of SURVEY §7.3 — each Spark expression is checked against a plain
Python reference implementation over generated inputs."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark import functions as ef

ids = st.one_of(
    st.from_regex(r"(job|jobID|JOB)?[0-9]{0,6}", fullmatch=True),
    st.text(
        alphabet="abcXYZ0123456789_",
        min_size=0,
        max_size=12,
    ),
)


def py_normalize(s: str) -> str:
    m = re.search(r"(\d+)$", s)
    return m.group(1) if m else s


def py_replace_first(s: str, old: str, new: str) -> str:
    return s.replace(old, new, 1)


@pytest.fixture(scope="module")
def run_batch(spark):
    def fn(values, expr_builder):
        df = spark.createDataFrame([(v,) for v in values], ["s"])
        return [r["v"] for r in df.select(expr_builder(F.col("s")).alias("v")).collect()]

    return fn


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(ids, min_size=1, max_size=30, unique=True))
def test_normalize_job_id_property(run_batch, values):
    got = run_batch(values, ef.normalize_job_id)
    assert got == [py_normalize(v) for v in values]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(ids, min_size=1, max_size=30, unique=True))
def test_finalize_jid_property(run_batch, values):
    got = run_batch(values, ef.finalize_jid)
    want = [
        py_replace_first(py_replace_first(v, "ID", ""), "job", "JOB") + "_S"
        for v in values
    ]
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="abcdIDjob ", min_size=0, max_size=20),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_replace_first_property(run_batch, values):
    got = run_batch(values, lambda c: ef.replace_first(c, "ID", "#"))
    assert got == [py_replace_first(v, "ID", "#") for v in values]


# ---------------------------------------------------------------------------
# As-of join vs a brute-force Python reference over generated inputs:
# for every left row, the matched payload must be the max right ts
# <= left ts for the key (None when no such row).
# ---------------------------------------------------------------------------

asof_inputs = st.tuples(
    st.lists(  # left: (key, ts_seconds)
        st.tuples(st.sampled_from("ab"), st.integers(0, 50)),
        min_size=1, max_size=15,
    ),
    st.lists(  # right: (key, ts_seconds) — deduped per (key, ts)
        st.tuples(st.sampled_from("ab"), st.integers(0, 50)),
        min_size=0, max_size=10, unique=True,
    ),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(asof_inputs)
def test_asof_join_property(spark, pair):
    import datetime as dt

    from pyspark.sql import Row

    from stampede_to_fresco_etl_spark.operators.asof import asof_join

    lrows, rrows = pair
    base = dt.datetime(2013, 3, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [Row(eid=i, k=k, ts=ts(s)) for i, (k, s) in enumerate(lrows)]
    )
    rschema = "k string, ts timestamp, v double"
    right = spark.createDataFrame(
        [Row(k=k, ts=ts(s), v=float(s)) for (k, s) in rrows], schema=rschema
    )
    out = {
        r["eid"]: (r["asof_ts"], r["v"])
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    assert len(out) == len(lrows)
    for i, (k, s) in enumerate(lrows):
        cand = [rs for (rk, rs) in rrows if rk == k and rs <= s]
        want = (ts(max(cand)), float(max(cand))) if cand else (None, None)
        assert out[i] == want, (i, k, s)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),   # shard
            st.integers(min_value=1, max_value=500),  # token count
        ),
        min_size=1,
        max_size=40,
    )
)
def test_pack_chunks_property(spark, rows):
    """pack_chunks invariants vs a sequential Python reference:
    identical chunk ids, positions contiguous from 1, chunk start
    offsets below budget boundaries."""
    from stampede_to_fresco_etl_spark.operators.sampling import pack_chunks

    budget = 700
    data = [(s, i, n) for i, (s, n) in enumerate(rows)]
    df = spark.createDataFrame(data, ["shard", "doc", "n"])
    got = {
        (r["shard"], r["doc"]): (r["chunk_id"], r["chunk_pos"])
        for r in pack_chunks(df, ["shard"], "doc", "n", budget).collect()
    }
    # python reference: same start-offset rule
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for s, d, n in data:
        by_shard.setdefault(s, []).append((d, n))
    for s, docs in by_shard.items():
        cum = 0
        pos: dict[int, int] = {}
        for d, n in sorted(docs):
            chunk = (cum) // budget
            cum += n
            pos[chunk] = pos.get(chunk, 0) + 1
            assert got[(s, d)] == (chunk, pos[chunk]), (s, d)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=40,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_property(spark, edges):
    """CC labels must equal a Python union-find ground truth on
    arbitrary small graphs (self-loops dropped)."""
    from stampede_to_fresco_etl_spark.operators.dedup import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["node"]: r["cc"] for r in connected_components(df).collect()
    }
    assert got == want


def test_rolling_stats_matches_bruteforce_random(spark):
    """rolling_stats vs a plain-Python trailing-window recompute over
    a pseudo-random (seeded) series with ties and gaps."""
    import datetime as dt
    import hashlib

    from pyspark.sql import Row

    from stampede_to_fresco_etl_spark.operators.windows import rolling_stats

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        h = int(hashlib.md5(f"r{i}".encode()).hexdigest()[:8], 16)
        key = f"k{h % 5}"
        sec = h % 900            # ties + gaps inside a 15-min span
        val = (h >> 8) % 1000    # integers: exact sums
        rows.append(Row(k=key, eid=i, ts=t0 + dt.timedelta(seconds=sec), v=val))

    W = 120
    got = {
        r["eid"]: r
        for r in rolling_stats(
            spark.createDataFrame(rows), ["k"], "ts", "v", W,
            extra_cols=["eid"],
        ).collect()
    }
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for r in rows:
        frame = [
            x.v
            for x in by_key[r.k]
            if r.ts - dt.timedelta(seconds=W) <= x.ts <= r.ts
        ]
        g = got[r.eid]
        assert g["roll_n"] == len(frame), r
        assert g["roll_sum"] == sum(frame), r
        assert g["roll_min"] == min(frame) and g["roll_max"] == max(frame)


def test_hist_quantile_within_bin_width_of_truth(spark):
    """Histogram-sketch quantiles must land within one bin width of
    the true order statistic for in-range data."""
    import hashlib

    from pyspark.sql import Row

    from stampede_to_fresco_etl_spark.operators.sketches import (
        hist_quantile,
        hist_sketch,
    )

    vals = [
        (int(hashlib.md5(f"v{i}".encode()).hexdigest()[:8], 16) % 10_000)
        / 10.0
        for i in range(1000)
    ]  # uniform-ish in [0, 1000)
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    LO, HI, BINS = 0.0, 1000.0, 100
    width = (HI - LO) / BINS
    sk = hist_sketch(df, ["g"], "v", LO, HI, BINS)
    out = hist_quantile(
        sk, {"p10": 0.1, "p50": 0.5, "p90": 0.9}, LO, HI, BINS
    ).first()
    s = sorted(vals)
    import math

    for name, q in (("p10", 0.1), ("p50", 0.5), ("p90", 0.9)):
        true = s[math.ceil(q * len(s)) - 1]
        est = out[name]
        assert est <= true < est + width, (name, est, true)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet="abcdefgh", min_size=1, max_size=6
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_bloom_merge_associativity_property(spark, values, n_splits):
    """Any partitioning of the input into n sketches OR-merges to the
    whole-corpus sketch, and every inserted value probes true."""
    from stampede_to_fresco_etl_spark.operators.sketches import (
        bloom_merge,
        bloom_query,
        bloom_sketch,
    )

    rows = [("g", v, i) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "g string, v string, i int")
    whole = bloom_sketch(df, ["g"], "v", 3, 256)
    parts = [
        bloom_sketch(df.filter(F.col("i") % n_splits == p),
                     ["g"], "v", 3, 256)
        for p in range(n_splits)
    ]
    nonempty = [p for p in parts if p.count() > 0]
    merged = bloom_merge(*nonempty)
    assert merged.collect() == whole.collect()
    probe = bloom_query(merged, sorted(set(values)), ["g"], 3, 256)
    assert all(r["maybe_member"] for r in probe.collect())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_group_zscore_property(spark, rows):
    """Per group: z has mean ~0; zero-variance groups yield NULL;
    output z matches a plain-Python recompute on floor-scaled ints."""
    import math

    from stampede_to_fresco_etl_spark.operators.stats import group_zscore

    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    )
    got = group_zscore(df, ["g"], "v").collect()

    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(math.floor(float(v) * 10000.0))
    for r in got:
        xs = by_g[r["g"]]
        n, s = len(xs), sum(xs)
        q = sum(x * x for x in xs)
        mean = s / n
        var = q / n - mean * mean
        x = math.floor(float(r["v"]) * 10000.0)
        if var <= 0.0 or math.sqrt(var) == 0.0:
            assert r["z"] is None
        else:
            assert r["z"] == pytest.approx(
                (x - mean) / math.sqrt(var), rel=1e-9, abs=1e-9
            )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=0, max_size=20
        ),
        min_size=1,
        max_size=12,
    )
)
def test_repetition_signals_property(spark, docs):
    """dup_ngram_ratio equals the plain-Python recompute on arbitrary
    token lists (including too-short docs -> NULL)."""
    from stampede_to_fresco_etl_spark.operators.text import (
        repetition_signals,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_2grams"], r["dup_2gram_ratio"])
        for r in repetition_signals(df, "doc_id", "text", ns=(2,)).collect()
    }
    for i, toks in enumerate(docs):
        # Spark's split on a whitespace-only/empty string yields one
        # empty token, matching " ".join semantics here
        toks = [t for t in toks] if toks else [""]
        grams = [
            f"{toks[j]} {toks[j + 1]}" for j in range(len(toks) - 1)
        ]
        n, ratio = got[i]
        assert n == len(grams)
        if grams:
            assert ratio == pytest.approx(
                1.0 - len(set(grams)) / len(grams)
            )
        else:
            assert ratio is None


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),       # user
            st.integers(min_value=0, max_value=10_000),  # minutes
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_property(spark, events):
    """Funnel counts equal a plain-Python recompute, and stages are
    monotonically non-increasing."""
    import datetime as dt

    from stampede_to_fresco_etl_spark.catalog import REGISTRY  # noqa: F401

    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, base + dt.timedelta(minutes=m), et) for u, m, et in events
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    firsts = df.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(
                f"t_{s}"
            )
            for s in ("view", "click", "purchase")
        ]
    )
    clicked = F.col("t_click") > F.col("t_view")
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    row = firsts.agg(
        F.count("t_view").alias("v"),
        F.count(F.when(clicked, 1)).alias("c"),
        F.count(F.when(purchased, 1)).alias("p"),
    ).collect()[0]
    # python reference
    per_user: dict = {}
    for u, m, et in events:
        if et in ("view", "click", "purchase"):
            d = per_user.setdefault(u, {})
            d[et] = min(d.get(et, m), m)
    v = sum(1 for d in per_user.values() if "view" in d)
    c = sum(
        1
        for d in per_user.values()
        if "view" in d and "click" in d and d["click"] > d["view"]
    )
    p = sum(
        1
        for d in per_user.values()
        if "view" in d and "click" in d and "purchase" in d
        and d["click"] > d["view"] and d["purchase"] > d["click"]
    )
    assert (row["v"], row["c"], row["p"]) == (v, c, p)
    assert row["v"] >= row["c"] >= row["p"]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group
            st.integers(min_value=-(10**6), max_value=10**6),  # value_i
        ),
        min_size=1,
        max_size=60,
    )
)
def test_positional_median_property(spark, rows):
    """The a16 middle-row selection rule (row_number over the total
    order, FLOOR-pinned indices) reproduces statistics.median on
    arbitrary integer multisets — including ties, negatives, and
    single-element groups."""
    import statistics

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["g", "value_i", "rid"])
    w = W.partitionBy("g").orderBy("value_i", "rid")
    cnt = W.partitionBy("g")
    ranked = df.select(
        "g",
        "value_i",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cnt).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("long"))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2).cast("long"))
    )
    got = {
        r["g"]: r["m"]
        for r in mid.groupBy("g")
        .agg(
            (
                F.sum("value_i").cast("double") / F.count("*")
            ).alias("m")
        )
        .collect()
    }
    by_g: dict[int, list[int]] = {}
    for g, v, _ in data:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        assert got[g] == float(statistics.median(vals)), (g, vals)


# ---------------------------------------------------------------------------
# r5c kernels: interval coalesce and the CUSUM prefix-sum identity
# ---------------------------------------------------------------------------

intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),   # start
        st.integers(min_value=0, max_value=120),   # duration
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(intervals)
def test_coalesce_intervals_property(spark, ivs):
    """Windowed sweep-line ≡ sequential sweep-line on generated
    interval sets (touching intervals merge; zero-length allowed;
    duplicates allowed)."""
    from stampede_to_fresco_etl_spark.operators.windows import (
        coalesce_intervals,
    )

    rows = [
        (1, i, s, s + d) for i, (s, d) in enumerate(ivs)
    ]
    df = spark.createDataFrame(rows, ["k", "rid", "s", "e"])
    got = sorted(
        (r["span_start"], r["span_end"], r["n_merged"])
        for r in coalesce_intervals(
            df, ["k"], "s", "e", order_extra=["rid"]
        ).collect()
    )
    pairs = sorted((s, s + d) for s, d in ivs)
    want = []
    cs, ce, n = pairs[0][0], pairs[0][1], 1
    for s, e in pairs[1:]:
        if s > ce:
            want.append((cs, ce, n))
            cs, ce, n = s, e, 1
        else:
            ce, n = max(ce, e), n + 1
    want.append((cs, ce, n))
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=40,
    )
)
def test_cusum_prefix_identity_property(spark, ys):
    """S_t = P_t − min(0, min_{i≤t} P_i) (two running windows) ≡ the
    sequential recurrence S_t = max(0, S_{t−1} + y_t), on arbitrary
    integer increments."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [(1, i, y) for i, y in enumerate(ys)], ["k", "seq", "y"]
    )
    w = (
        W.partitionBy("k")
        .orderBy("seq")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        df.withColumn("pt", F.sum("y").over(w))
        .withColumn("minp", F.min(F.col("pt")).over(w))
        .withColumn(
            "s", F.col("pt") - F.least(F.col("minp"), F.lit(0))
        )
        .orderBy("seq")
        .collect()
    )
    s = 0
    for row, y in zip(out, ys):
        s = max(0, s + y)
        assert row["s"] == s


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # user
            st.integers(min_value=0, max_value=25),  # day offset
        ),
        min_size=1,
        max_size=120,
    )
)
def test_rolling_wau_property(spark, events):
    """w20's lag/explode kernel == the O(days×users) definition on
    random (user, day) activity sets: full spine, zeros included."""
    import datetime as dt

    from pyspark.sql import Window as W

    base = dt.date(2024, 3, 1)
    rows = [(u, base + dt.timedelta(days=d)) for u, d in events]
    ud = spark.createDataFrame(rows, "user_id long, d date").distinct()
    nxt = F.lead("d").over(W.partitionBy("user_id").orderBy("d"))
    cover = ud.select("user_id", "d", nxt.alias("nxt")).select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"),
                F.least(
                    F.date_add(F.col("d"), 6),
                    F.coalesce(
                        F.date_sub("nxt", 1), F.date_add(F.col("d"), 6)
                    ),
                ),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    counts = cover.groupBy("day").agg(F.count("*").alias("wau"))
    spine = ud.agg(F.min("d").alias("d0"), F.max("d").alias("d1")).select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias(
            "day"
        )
    )
    got = {
        r["day"]: r["wau"]
        for r in spine.join(counts, "day", "left")
        .select("day", F.coalesce("wau", F.lit(0)).alias("wau"))
        .collect()
    }
    active = {(u, d) for u, d in rows}
    days = sorted({d for _, d in active})
    spine_py = [
        days[0] + dt.timedelta(days=i)
        for i in range((days[-1] - days[0]).days + 1)
    ]
    assert set(got) == set(spine_py)
    for day in spine_py:
        want = len(
            {
                u
                for u, d in active
                if day - dt.timedelta(days=6) <= d <= day
            }
        )
        assert got[day] == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "aa bb cc dd ee ff gg",
                "aa bb cc dd ee ff hh",
                "xx yy zz ww vv uu tt",
                "mm nn oo pp qq rr ss",
                "aa bb cc xx yy zz ww",
            ]
        ),
        min_size=2,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_incremental_lsh_split_invariance_property(spark, texts, mod):
    """For ANY split of a random corpus, intra(A) ∪ intra(B) ∪
    cross(B→A) == full-corpus LSH candidates (unordered)."""
    from stampede_to_fresco_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_pairs_between,
        minhash_signatures,
    )

    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = docs.filter(F.col("doc_id") % (mod + 1) == 0)
    b = docs.filter(F.col("doc_id") % (mod + 1) != 0)
    sall = minhash_signatures(docs, "doc_id", "text", 6)
    sa = minhash_signatures(a, "doc_id", "text", 6)
    sb = minhash_signatures(b, "doc_id", "text", 6)

    def key(x, y):
        return (min(x, y), max(x, y))

    inc = set()
    for sigs, side in ((sa, a), (sb, b)):
        if side.count():
            for r in lsh_candidate_pairs(sigs, 6, 3).collect():
                inc.add(key(r["doc_a"], r["doc_b"]))
    if a.count() and b.count():
        for r in lsh_pairs_between(sb, sa, 6, 3).collect():
            inc.add(key(r["new_doc"], r["indexed_doc"]))
    full = {
        key(r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sall, 6, 3).collect()
    }
    assert inc == full
