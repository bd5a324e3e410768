"""Unit tests for cluster resolution (connected components), the KMV
distinct sketch, and the keyword/heavy-hitter/redaction text ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.operators.dedup import (
    connected_components,
    dup_clusters,
)
from stampede_to_fresco_etl_spark.operators.sketches import kmv_distinct
from stampede_to_fresco_etl_spark.operators.text import (
    heavy_hitters,
    keyword_topk,
    redact,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["doc_a", "doc_b"])


def test_cc_chain_converges_to_min(spark):
    # chain 1-2-3-4 plus disjoint pair 10-11: diameter-3 graph
    cc = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    )
    got = {r["node"]: r["cc"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_cycle_and_reversed_edges(spark):
    # cycle 5-6-7-5 with edges in arbitrary orientation
    cc = connected_components(_pairs(spark, [(6, 5), (7, 6), (5, 7)]))
    got = {r["node"]: r["cc"] for r in cc.collect()}
    assert got == {5: 5, 6: 5, 7: 5}


def test_cc_max_iter_caps_sweeps(spark):
    # labels start from the neighbor-min SEED (= one propagation
    # sweep), then one pure-propagation loop sweep moves them one
    # more hop — the cap binds before the chain end catches up
    cc = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4)]), max_iter=1, halving=False,
        small_graph_edges=0,  # force the distributed sweep path —
        # the small-graph union-find always converges fully and
        # max_iter has nothing to cap there
    )
    got = {r["node"]: r["cc"] for r in cc.collect()}
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert got[4] == 2  # seed put it at 3; the single sweep at 2


def test_cc_halving_collapses_long_chain(spark):
    # a 65-node chain has diameter 64 > 10 sweeps of pure
    # propagation; path halving converges in O(log d)
    edges = [(i, i + 1) for i in range(64)]
    cc = connected_components(
        _pairs(spark, edges), max_iter=10,
        small_graph_edges=0,  # distributed path — halving is what's
        # under test, and the union-find fast path never sweeps
    )
    got = {r["cc"] for r in cc.collect()}
    assert got == {0}


def test_dup_clusters_planted_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "the quick brown fox jumps over the lazy dog again"),
        (3, "totally different text with no overlap at all here ok"),
        (4, "the quick brown fox jumps over the lazy dog indeed"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dup_clusters(df, "doc_id", "text", min_jaccard=0.3).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out}
    # 1,2,4 cluster together under min id 1; 3 shares no pair at 0.3
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[4] == (1, False)
    assert 3 not in got


def test_kmv_matches_exact_below_k(spark):
    df = spark.range(40).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    row = kmv_distinct(df, "grp", "v", k=64).collect()[0]
    assert row["exact_distinct"] == 40
    assert row["sketch_size"] == 40
    assert row["est_distinct"] == 40.0


def test_kmv_estimate_within_bound(spark):
    # 5000 distinct values, k=64: expected rel-err ~ 1/sqrt(62) ≈ 13%
    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    row = kmv_distinct(df, "grp", "v", k=64).collect()[0]
    assert row["exact_distinct"] == 5000
    assert row["sketch_size"] == 64
    rel_err = abs(row["est_distinct"] - 5000.0) / 5000.0
    assert rel_err < 0.4, rel_err


def test_kmv_duplicate_insensitive(spark):
    # each value appears 7 times — the sketch must not change
    base = spark.range(500).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    dup = base.crossJoin(spark.range(7).select(F.lit(1).alias("one"))).select(
        "grp", "v"
    )
    a = kmv_distinct(base, "grp", "v", k=32).collect()[0]
    b = kmv_distinct(dup, "grp", "v", k=32).collect()[0]
    assert a["kth_hash"] == b["kth_hash"]
    assert a["est_distinct"] == b["est_distinct"]


def test_keyword_topk_prefers_rare_terms(spark):
    rows = [
        (1, "common rare1 common common"),
        (2, "common common common"),
        (3, "common rare2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = keyword_topk(df, "doc_id", "text", k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' is in every doc (df=3, idf=(3-3+.5)/3.5≈0.14); the
    # rare terms (df=1) score tf=1 × idf=(3-1+.5)/1.5 ≈ 1.67
    assert top[1] == "rare1"
    assert top[3] == "rare2"
    assert all(r["rank"] == 1 for r in out)


def test_heavy_hitters_rank_and_ties(spark):
    rows = [
        ("en", "b b b a a c"),
        ("en", "a"),
        ("fr", "x y y"),
    ]
    df = spark.createDataFrame(rows, ["lang", "text"])
    out = heavy_hitters(df, "lang", "text", k=2).collect()
    en = sorted(
        [(r["rank"], r["term"], r["n"]) for r in out if r["lang"] == "en"]
    )
    # a and b tie at 3 — lexicographic tie-break puts a first
    assert en == [(1, "a", 3), (2, "b", 3)]
    fr = sorted(
        [(r["rank"], r["term"], r["n"]) for r in out if r["lang"] == "fr"]
    )
    assert fr == [(1, "y", 2), (2, "x", 1)]


def test_redact_strips_planted_email(spark):
    rows = [
        (1, "hello contact_1@example.com world"),
        (2, "no pii here"),
        (3, "two a.b-c@x.org and d_e@y.net hits"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in redact(df, "doc_id", "text").collect()}
    assert out[1]["n_hits_before"] == 1 and out[1]["n_hits_after"] == 0
    assert out[1]["redacted"] == "hello <EMAIL> world"
    assert out[2]["n_hits_before"] == 0
    assert out[2]["redacted"] == "no pii here"
    assert out[3]["n_hits_before"] == 2 and out[3]["n_hits_after"] == 0


def test_kmv_merge_equals_union_sketch(spark):
    """Mergeability: merge(sketch(A), sketch(B)) == sketch(A ∪ B)."""
    from stampede_to_fresco_etl_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    base = spark.range(3000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v")
    )
    a = base.filter(F.col("v") % 3 != 0)
    b = base.filter(F.col("v") % 2 == 0)  # overlaps a
    merged = kmv_merge(
        kmv_sketch(a, "grp", "v", k=32).union(
            kmv_sketch(b, "grp", "v", k=32)
        ),
        "grp",
        k=32,
    ).collect()[0]
    union = a.union(b)
    direct = kmv_merge(
        kmv_sketch(union, "grp", "v", k=32), "grp", k=32
    ).collect()[0]
    assert merged["kth_hash"] == direct["kth_hash"]
    assert merged["est_distinct"] == direct["est_distinct"]


def test_hist_sketch_merge_and_quantiles(spark):
    """Histogram sketch algebra: split-sketch-merge equals the
    direct sketch; quantile walk hits hand-computed edges; under/
    overflow land in their sentinel slots."""
    from pyspark.sql import Row

    from stampede_to_fresco_etl_spark.operators.sketches import (
        hist_merge,
        hist_quantile,
        hist_sketch,
    )

    rows = [Row(g="a", v=float(x)) for x in range(100)]  # 0..99
    rows += [Row(g="a", v=-5.0), Row(g="a", v=1000.0)]   # under+over
    rows += [Row(g="b", v=10.0)] * 4
    df = spark.createDataFrame(rows)
    LO, HI, BINS = 0.0, 100.0, 10

    direct = hist_sketch(df, ["g"], "v", LO, HI, BINS)
    d = {r["g"]: r for r in direct.collect()}
    assert d["a"]["n"] == 102
    assert d["a"]["counts"][0] == 1          # underflow
    assert d["a"]["counts"][BINS + 1] == 1   # overflow
    assert d["a"]["counts"][1] == 10         # [0, 10)
    assert d["b"]["counts"][2] == 4          # 10 -> second bin

    # split along an arbitrary predicate, merge -> identical sketch
    s1 = hist_sketch(df.filter(F.col("v") < 50), ["g"], "v", LO, HI, BINS)
    s2 = hist_sketch(df.filter(F.col("v") >= 50), ["g"], "v", LO, HI, BINS)
    m = {r["g"]: r for r in hist_merge(s1, s2).collect()}
    for g in ("a", "b"):
        assert m[g]["counts"] == d[g]["counts"]
        assert m[g]["n"] == d[g]["n"]

    qs = {r["g"]: r for r in hist_quantile(
        direct, {"p50": 0.5, "p100": 1.0}, LO, HI, BINS
    ).collect()}
    # group a: ceil(.5*102)=51 -> cum reaches 51 in bin [40,50) (1
    # underflow + 50 values 0..49) -> left edge 40.0
    assert qs["a"]["p50"] == 40.0
    # p100 -> overflow bin -> clamps to hi
    assert qs["a"]["p100"] == 100.0
    assert qs["b"]["p50"] == 10.0


def test_cms_sketch_merge_and_overestimate(spark):
    """CMS properties: split-sketch-merge equals direct sketch;
    estimates are never UNDER the true count; absent items estimate
    only collision mass."""
    from pyspark.sql import Row

    from stampede_to_fresco_etl_spark.operators.sketches import (
        cms_merge,
        cms_query,
        cms_sketch,
    )

    rows = (
        [Row(i=n, v="alpha") for n in range(50)]
        + [Row(i=n + 100, v="beta") for n in range(30)]
        + [Row(i=n + 200, v=f"tail{n}") for n in range(20)]
    )
    df = spark.createDataFrame(rows)
    W = 32

    direct = cms_sketch(df, [], "v", 4, W)
    s1 = cms_sketch(df.filter(F.col("i") < 120), [], "v", 4, W)
    s2 = cms_sketch(df.filter(F.col("i") >= 120), [], "v", 4, W)
    merged = cms_merge(s1, s2)

    d = {r["row"]: r["counters"] for r in direct.collect()}
    m = {r["row"]: r["counters"] for r in merged.collect()}
    assert d == m  # merge exactness

    est = {
        r["item"]: r["est_count"]
        for r in cms_query(merged, ["alpha", "beta", "absent"], [], W).collect()
    }
    assert est["alpha"] >= 50 and est["beta"] >= 30  # never under
    # absent item: at most the collision mass of one 32-wide row
    assert 0 <= est["absent"] <= 100
    # per-row totals always equal n
    assert all(sum(c) == 100 for c in d.values())


def test_hist_sketch_null_values_excluded(spark):
    """A NULL value must not become a NULL map key (runtime kill) —
    it is excluded from every bin and from n (ADVICE r3)."""
    from stampede_to_fresco_etl_spark.operators.sketches import hist_sketch

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 5.0), ("b", None)],
        "g string, v double",
    )
    out = {r["g"]: r for r in
           hist_sketch(df, ["g"], "v", 0.0, 10.0, 5).collect()}
    assert out["a"]["n"] == 2
    assert sum(out["a"]["counts"]) == 2
    # a group with ONLY nulls has no observations -> no sketch row
    assert "b" not in out


def test_cms_sketch_null_items_excluded(spark):
    from stampede_to_fresco_etl_spark.operators.sketches import (
        cms_query,
        cms_sketch,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "x"), ("a", "y")],
        "g string, item string",
    )
    sk = cms_sketch(df, ["g"], "item", depth=2, width=64)
    got = {r["item"]: r["est_count"] for r in
           cms_query(sk, ["x", "y"], ["g"], width=64).collect()}
    # CMS overestimates but never under; nulls contribute nothing
    assert got["x"] >= 2 and got["y"] >= 1
    assert got["x"] + got["y"] <= 3 + 1  # width 64 >> 2 items: exact


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted value must probe true (no false negatives);
    OR-merge of half-sketches equals the whole-corpus sketch."""
    from stampede_to_fresco_etl_spark.operators.sketches import (
        bloom_merge,
        bloom_query,
        bloom_sketch,
    )

    vals = [f"v{i}" for i in range(40)]
    df = spark.createDataFrame(
        [("g", v, i) for i, v in enumerate(vals)], "g string, v string, i int"
    )
    whole = bloom_sketch(df, ["g"], "v", 4, 1024)
    halves = [
        bloom_sketch(df.filter(F.col("i") % 2 == p), ["g"], "v", 4, 1024)
        for p in (0, 1)
    ]
    merged = bloom_merge(*halves)
    assert merged.collect() == whole.collect()

    got = {r["item"]: r["maybe_member"] for r in
           bloom_query(merged, vals + ["absent1", "absent2"],
                       ["g"], 4, 1024).collect()}
    assert all(got[v] for v in vals)  # no false negatives, ever
    # 40 items in 1024 bits: fp rate ~1e-4 — absents must read false
    assert not got["absent1"] and not got["absent2"]


def test_bloom_null_values_excluded(spark):
    from stampede_to_fresco_etl_spark.operators.sketches import (
        bloom_query,
        bloom_sketch,
    )

    df = spark.createDataFrame(
        [("g", "x"), ("g", None)], "g string, v string"
    )
    sk = bloom_sketch(df, ["g"], "v", 4, 512)
    got = {r["item"]: r["maybe_member"] for r in
           bloom_query(sk, ["x", "y"], ["g"], 4, 512).collect()}
    assert got["x"] and not got["y"]


def test_cc_small_mode_equals_distributed(spark):
    """The driver-side union-find fast path and the distributed
    sweep path must label identically — component-min semantics,
    bit for bit — on a graph mixing cliques, chains, and a bridge."""
    edges = (
        [(a, b) for a in (10, 11, 12) for b in (11, 12, 13) if a < b]
        + [(i, i + 1) for i in range(20, 27)]       # chain
        + [(13, 20)]                                # bridge
        + [(100, 101), (102, 103), (101, 102)]      # merged pairs
        + [(200, 201)]                              # island
    )
    p = _pairs(spark, edges)
    small = {
        (r["node"], r["cc"])
        for r in connected_components(p).collect()
    }
    dist = {
        (r["node"], r["cc"])
        for r in connected_components(p, small_graph_edges=0).collect()
    }
    assert small == dist
    # everything 10..27 is one component labeled by its minimum
    assert all(cc == 10 for n, cc in small if 10 <= n <= 27)
