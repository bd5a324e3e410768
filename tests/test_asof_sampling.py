"""As-of join, sessionization, and curation-sampling tests —
hand-computed fixtures for the temporal/curation operator family."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from stampede_to_fresco_etl_spark.operators.asof import asof_join
from stampede_to_fresco_etl_spark.operators.sampling import (
    quantile_filter,
    quantile_thresholds,
    stratified_sample,
)
from stampede_to_fresco_etl_spark.operators.windows import sessionize


def t(m, s=0):
    return dt.datetime(2013, 3, 1, 10, m, s)


def test_asof_join_basic_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [
            Row(eid=1, k="u1", ts=t(0)),     # before any right -> null
            Row(eid=2, k="u1", ts=t(5)),     # exactly at right ts -> inclusive
            Row(eid=3, k="u1", ts=t(7)),     # between -> :05 row
            Row(eid=4, k="u1", ts=t(20)),    # after both -> :10 row
            Row(eid=5, k="u2", ts=t(6)),     # other key -> its own row
            Row(eid=6, k="u3", ts=t(6)),     # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="u1", ts=t(5), v=50.0),
            Row(k="u1", ts=t(10), v=100.0),
            Row(k="u2", ts=t(1), v=7.0),
        ]
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"])
    rows = {r["eid"]: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[1]["v"] is None and rows[1]["asof_ts"] is None
    assert rows[2]["v"] == 50.0 and rows[2]["asof_ts"] == t(5)
    assert rows[3]["v"] == 50.0
    assert rows[4]["v"] == 100.0 and rows[4]["asof_ts"] == t(10)
    assert rows[5]["v"] == 7.0
    assert rows[6]["v"] is None

    inner = asof_join(left, right, ["k"], "ts", "ts", ["v"], how="inner")
    assert {r["eid"] for r in inner.collect()} == {2, 3, 4, 5}


def test_asof_join_null_keys_never_match(spark):
    # SQL/DuckDB ASOF semantics: NULL keys match nothing — neither a
    # NULL-key right row nor each other (ADVICE r2: partitionBy would
    # otherwise group NULLs together and enrich NULL from NULL).
    left = spark.createDataFrame(
        [
            Row(eid=1, k=None, ts=t(10)),   # null key -> unmatched
            Row(eid=2, k="u1", ts=t(10)),   # normal match
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=None, ts=t(5), v=99.0),   # null-key right row: dropped
            Row(k="u1", ts=t(5), v=50.0),
        ]
    )
    out = {r["eid"]: r for r in asof_join(
        left, right, ["k"], "ts", "ts", ["v"]).collect()}
    assert len(out) == 2
    assert out[1]["v"] is None and out[1]["asof_ts"] is None
    assert out[2]["v"] == 50.0

    inner = asof_join(left, right, ["k"], "ts", "ts", ["v"], how="inner")
    assert {r["eid"] for r in inner.collect()} == {2}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [Row(eid=1, k="u", ts=t(30))]  # 25 min after the right row
    )
    right = spark.createDataFrame([Row(k="u", ts=t(5), v=1.0)])
    fresh = asof_join(
        left, right, ["k"], "ts", "ts", ["v"], tolerance_sec=1800
    ).first()
    assert fresh["v"] == 1.0
    stale = asof_join(
        left, right, ["k"], "ts", "ts", ["v"], tolerance_sec=600
    ).first()
    assert stale["v"] is None and stale["asof_ts"] is None


def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [
            Row(k="u", eid=1, ts=t(0)),
            Row(k="u", eid=2, ts=t(10)),       # 10 min gap, same session
            Row(k="u", eid=3, ts=t(50)),       # 40 min gap -> new session
            Row(k="u", eid=4, ts=t(55)),
            Row(k="v", eid=5, ts=t(0)),        # other key: own session 1
        ]
    )
    s = sessionize(df, ["k"], "ts", gap_sec=1800, order_cols=["ts", "eid"])
    got = {r["eid"]: r["session_seq"] for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_stratified_sample_deterministic_and_bounded(spark):
    rows = [
        Row(stratum="a" if i % 3 else "b", rid=i) for i in range(90)
    ]
    df = spark.createDataFrame(rows)
    s1 = stratified_sample(df, "stratum", "rid", 10).collect()
    s2 = stratified_sample(df, "stratum", "rid", 10).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # replayable
    per = {}
    for r in s1:
        per.setdefault(r["stratum"], set()).add(r["rid"])
    assert all(len(v) == 10 for v in per.values())
    # a different salt draws a different sample
    s3 = stratified_sample(df, "stratum", "rid", 10, salt="other").collect()
    assert {r["rid"] for r in s3} != {r["rid"] for r in s1}


def test_quantile_threshold_and_filter_exact(spark):
    # scores 0.0 .. 0.9: ceil(0.75 * 10) = 8 -> threshold bucket is the
    # 8th smallest (0.7); filter keeps scores >= 0.7
    rows = [Row(g="x", rid=i, score=i / 10.0) for i in range(10)]
    df = spark.createDataFrame(rows)
    th = quantile_thresholds(df, "g", "score", q=0.75).first()
    assert th["threshold_bucket"] == 7000 and th["n_group"] == 10
    kept = sorted(
        r["rid"] for r in quantile_filter(df, "g", "score", 0.75).collect()
    )
    assert kept == [7, 8, 9]


def test_pack_chunks_budget_rule(spark):
    from stampede_to_fresco_etl_spark.operators.sampling import pack_chunks
    from pyspark.sql import functions as F

    rows = [
        ("s", 1, 300), ("s", 2, 300), ("s", 3, 300),  # cum 300/600/900
        ("s", 4, 600),                                 # cum 1500
        ("t", 9, 100),
    ]
    df = spark.createDataFrame(rows, ["shard", "doc", "n"])
    out = pack_chunks(df, ["shard"], "doc", "n", budget=512)
    got = {
        (r["shard"], r["doc"]): (r["chunk_id"], r["chunk_pos"], r["cum_tokens"])
        for r in out.collect()
    }
    # chunk = floor((cum - n)/512): doc1 (0)/512=0; doc2 300/512=0;
    # doc3 600/512=1; doc4 900/512=1 (overruns by design); t restarts
    assert got[("s", 1)] == (0, 1, 300)
    assert got[("s", 2)] == (0, 2, 600)
    assert got[("s", 3)] == (1, 1, 900)
    assert got[("s", 4)] == (1, 2, 1500)
    assert got[("t", 9)] == (0, 1, 100)


def test_mixture_sample_deterministic_and_nested(spark):
    from stampede_to_fresco_etl_spark.operators.sampling import (
        mixture_sample,
    )
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("dom"),
        F.col("id").alias("doc"),
    )
    lo = mixture_sample(df, "dom", "doc", {"a": 0.2, "b": 1.0})
    hi = mixture_sample(df, "dom", "doc", {"a": 0.6, "b": 1.0})
    lo_ids = {r["doc"] for r in lo.collect()}
    hi_ids = {r["doc"] for r in hi.collect()}
    # raising a weight only ADDS survivors (threshold moves, hashes fixed)
    assert lo_ids <= hi_ids
    # domain b at weight 1.0 is fully kept
    assert sum(1 for i in lo_ids if i % 2 == 1) == 1000
    # domain a at 0.2 keeps roughly 20% (hash-uniform; wide tolerance)
    n_a = sum(1 for i in lo_ids if i % 2 == 0)
    assert 100 < n_a < 300
    # rerun is bit-identical
    again = {r["doc"] for r in
             mixture_sample(df, "dom", "doc", {"a": 0.2, "b": 1.0}).collect()}
    assert again == lo_ids


def test_mixture_sample_default_weight_drops_unknown(spark):
    from stampede_to_fresco_etl_spark.operators.sampling import (
        mixture_sample,
    )
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.lit("unknown").alias("dom"), F.col("id").alias("doc")
    )
    assert mixture_sample(df, "dom", "doc", {"a": 1.0}).count() == 0


def test_dataset_split_partitions_everything(spark):
    from stampede_to_fresco_etl_spark.operators.sampling import dataset_split
    from pyspark.sql import functions as F

    df = spark.range(5000).select(F.col("id").alias("doc"))
    out = dataset_split(df, "doc", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000
    assert 3800 < counts["train"] < 4200
    assert 300 < counts["val"] < 700
    assert 300 < counts["test"] < 700
    # deterministic: same assignment on rerun
    a = {(r["doc"], r["split"]) for r in out.collect()}
    b = {(r["doc"], r["split"]) for r in dataset_split(
        df, "doc", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b


def test_dataset_split_growing_train_only_steals_from_val(spark):
    from stampede_to_fresco_etl_spark.operators.sampling import dataset_split
    from pyspark.sql import functions as F

    df = spark.range(2000).select(F.col("id").alias("doc"))
    small = dataset_split(df, "doc", {"train": 0.5, "val": 0.5})
    big = dataset_split(df, "doc", {"train": 0.7, "val": 0.3})
    small_train = {r["doc"] for r in small.collect() if r["split"] == "train"}
    big_train = {r["doc"] for r in big.collect() if r["split"] == "train"}
    # boundary only moves right: train grows monotonically
    assert small_train <= big_train


def test_percentile_summary_hand_check(spark):
    from pyspark.sql import functions as F

    from stampede_to_fresco_etl_spark.operators.sampling import (
        percentile_summary,
    )

    # scores 0.01 .. 1.00: pXX = ceil(q*100)-th smallest value
    df = spark.range(1, 101).select(
        F.lit("g").alias("grp"), (F.col("id") / 100.0).alias("s")
    )
    row = percentile_summary(
        df, "grp", "s", {"p50": 0.5, "p95": 0.95, "p99": 0.99}
    ).collect()[0]
    assert row["n_group"] == 100
    assert row["p50"] == 0.50
    assert row["p95"] == 0.95
    assert row["p99"] == 0.99


def test_percentile_summary_negative_scores(spark):
    from pyspark.sql import functions as F

    from stampede_to_fresco_etl_spark.operators.sampling import (
        percentile_summary,
    )

    # scores -0.50 .. +0.49 — bucket floor must handle negatives
    df = spark.range(100).select(
        F.lit("g").alias("grp"), ((F.col("id") - 50) / 100.0).alias("s")
    )
    row = percentile_summary(df, "grp", "s", {"p50": 0.5}).collect()[0]
    assert row["p50"] == -0.01  # 50th of -0.50..0.49


def test_dataset_split_remainder_goes_to_last(spark):
    from pyspark.sql import functions as F

    from stampede_to_fresco_etl_spark.operators.sampling import dataset_split

    df = spark.range(1000).select(F.col("id").alias("doc"))
    out = dataset_split(df, "doc", {"train": 0.1, "rest": 0.0})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # rest gets everything past the 10% boundary despite weight 0.0
    assert counts["rest"] > 800
    assert sum(counts.values()) == 1000
