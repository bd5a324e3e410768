"""SQL-surface and interval-join variant tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from stampede_to_fresco_etl_spark.catalog import register_tables
from stampede_to_fresco_etl_spark.operators.interval_join import interval_join


def test_register_tables_sql_surface(spark):
    register_tables(spark, "/root/testdata/sf0.001")
    got = spark.sql(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    ).collect()
    assert sum(r["n"] for r in got) == spark.table("events").count()
    # timestamps were converted from nanos -> usable in SQL predicates
    n = spark.sql(
        "SELECT count(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'"
    ).first()["n"]
    assert 0 < n < spark.table("events").count()


def test_bucketed_interval_join_equals_broadcast(spark):
    # the shuffled fallback must produce exactly the broadcast result
    from stampede_to_fresco_etl_spark.catalog import _jobs, load

    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "events")
    jobs = _jobs(spark, sf)
    from stampede_to_fresco_etl_spark.operators.interval_join import (
        bucketed_interval_join,
    )

    broad = interval_join(
        e, jobs, "user_id", "j_user", "ts", "jstart", "jend"
    )
    buck = bucketed_interval_join(
        e, jobs, "user_id", "j_user", "ts", "jstart", "jend",
        bucket_seconds=6 * 3600,
    )
    cols = ["event_id", "j_user", "day"]
    a = sorted(tuple(r) for r in broad.select(*cols).collect())
    b = sorted(tuple(r) for r in buck.select(*cols).collect())
    assert a == b and len(a) > 0


def test_bucketed_interval_join_degenerate_interval(spark):
    # start == end (exclusive end) must yield zero matches, not a
    # sequence() crash from a descending bucket range.
    from stampede_to_fresco_etl_spark.operators.interval_join import (
        bucketed_interval_join,
    )

    base = dt.datetime(2013, 3, 1, 10, 0, 0)
    events = spark.createDataFrame([Row(k=1, ts=base)])
    iv = spark.createDataFrame(
        [
            Row(ik=1, lo=base, hi=base),  # degenerate
            # end lands at the very start of the lo bucket
            Row(ik=1, lo=base, hi=base + dt.timedelta(microseconds=1)),
        ]
    )
    out = bucketed_interval_join(
        events, iv, "k", "ik", "ts", "lo", "hi", bucket_seconds=3600
    )
    assert out.count() == 1  # only the 1-μs interval matches ts == lo


def test_interval_join_inclusive_end_legacy(spark):
    # legacy consumer_2 used inclusive ends (SURVEY §7.3 trap 5)
    base = dt.datetime(2013, 3, 1, 10, 0, 0)
    events = spark.createDataFrame(
        [Row(k=1, ts=base + dt.timedelta(seconds=s)) for s in (0, 30, 60)]
    )
    iv = spark.createDataFrame(
        [Row(ik=1, lo=dt.datetime(2013, 3, 1, 10, 0, 0),
             hi=dt.datetime(2013, 3, 1, 10, 1, 0))]
    )
    exclusive = interval_join(
        events, iv, "k", "ik", "ts", "lo", "hi"
    ).count()
    inclusive = interval_join(
        events, iv, "k", "ik", "ts", "lo", "hi", inclusive_end=True
    ).count()
    assert exclusive == 2   # :60 excluded
    assert inclusive == 3   # :60 included
