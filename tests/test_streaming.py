"""Streaming-mode tests: exactly-once incremental ingest, watermarked
dedup, and the windowed rollup — all with availableNow triggers so
they run deterministically in CI."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from stampede_to_fresco_etl_spark.schemas import FRESCO_LONG
from stampede_to_fresco_etl_spark.streaming.ingest import (
    minute_rollup,
    read_event_stream,
    run_incremental_pipeline,
)


def event(jid, host, t, ev, val):
    return Row(**{"Job Id": jid, "Host": host, "Timestamp": t,
                  "Event": ev, "Value": val, "Units": "GB"})


def ts(m, s=0):
    return dt.datetime(2013, 3, 1, 10, m, s)


def _write_batch(spark, path, rows, mode="append"):
    spark.createDataFrame(rows, schema=FRESCO_LONG).coalesce(1).write.mode(
        mode
    ).parquet(path)


def test_incremental_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        event("JOB1", "h1", ts(0), "memused", 1.0),
        event("JOB1", "h1", ts(1), "memused", 2.0),
        # duplicate row in the same batch -> dropped by dedup
        event("JOB1", "h1", ts(1), "memused", 2.0),
    ]
    _write_batch(spark, landing, batch1)
    q = run_incremental_pipeline(spark, landing, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert set(got.select("date").distinct().toPandas()["date"].astype(str)) == {
        "2013-03-01"
    }

    # second arrival: one new row; rerun drains ONLY the new file
    _write_batch(spark, landing, [event("JOB1", "h2", ts(2), "memused", 3.0)])
    q2 = run_incremental_pipeline(spark, landing, out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    assert got2.count() == 3  # old rows not re-ingested (exactly-once)

    # third run with nothing new: no change
    q3 = run_incremental_pipeline(spark, landing, out, ckpt)
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3


def test_minute_rollup_stream(spark, tmp_path):
    landing = str(tmp_path / "landing")
    _write_batch(
        spark,
        landing,
        [
            event("JOB1", "h1", ts(0, 10), "memused", 2.0),
            event("JOB1", "h1", ts(0, 50), "memused", 4.0),
            event("JOB1", "h1", ts(1, 10), "memused", 10.0),
        ],
    )
    stream = read_event_stream(spark, landing)
    rollup = minute_rollup(stream)
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode + availableNow: windows whose watermark passed are
    # emitted; with a 10-minute watermark the first window closes once
    # the 10:01 event arrives... final watermark = max_ts - 10min,
    # so no window is final yet -> rows may be 0.  Use complete-mode
    # run to check the aggregation itself.
    q2 = (
        rollup.writeStream.format("memory")
        .queryName("rollup_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.sql(
        "select * from rollup_complete order by window_start"
    ).collect()
    assert len(rows) == 2
    assert rows[0]["avg_value"] == 3.0 and rows[0]["n_samples"] == 2
    assert rows[1]["avg_value"] == 10.0 and rows[1]["n_samples"] == 1


def test_session_rollup_merges_across_batches(spark, tmp_path):
    """Two micro-batches whose events fall within the gap must merge
    into ONE session; an event past the gap opens a new session."""
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType, TimestampType,
    )

    from stampede_to_fresco_etl_spark.streaming.ingest import session_rollup

    schema = StructType(
        [
            StructField("Host", StringType()),
            StructField("Timestamp", TimestampType()),
            StructField("Value", DoubleType()),
        ]
    )
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    from datetime import datetime

    t = datetime(2024, 1, 1, 10, 0, 0)

    def at(minutes):
        return t.replace(hour=10 + (minutes // 60), minute=minutes % 60)

    # batch 1: two events 5 min apart (same session, 10-min gap)
    write_batch(
        [("h1", at(0), 1.0), ("h1", at(5), 2.0)], "b1"
    )
    # batch 2: 8 min later (still same session), then 40 min later
    # (new session), then a far-future event to advance the watermark
    write_batch(
        [
            ("h1", at(13), 3.0),
            ("h1", at(53), 4.0),
            ("h1", at(300), 9.0),
        ],
        "b2",
    )
    stream = spark.readStream.schema(schema).parquet(landing)
    q = (
        session_rollup(
            stream, ["Host"], gap="10 minutes", watermark="1 minute"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["session_start"].minute, r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    # closed sessions: events at minutes 0,5,13 merged (watermark
    # passed); the minute-53 singleton also closed by the far-future
    # event.  The future event's own session stays open (not emitted).
    assert (0, 3, 6.0) in got
    assert (53, 1, 4.0) in got
    assert all(s != 300 for s, _, _ in got)


def test_stream_stream_attribution_join(spark, tmp_path):
    """Stream-stream watermarked join == the batch join on the same
    data, across micro-batch boundaries: clicks and purchases land in
    SEPARATE files (separate micro-batches under maxFilesPerTrigger),
    and a purchase still finds a click that arrived in an earlier
    batch as long as the watermark hasn't evicted it."""
    from stampede_to_fresco_etl_spark.streaming.ingest import (
        stream_stream_attribution_join,
    )

    p_dir = str(tmp_path / "purchases")
    c_dir = str(tmp_path / "clicks")

    def t(m, s=0):
        return dt.datetime(2024, 1, 1, 12, m, s)

    clicks = [
        Row(click_id=1, c_user_id=7, c_ts=t(0)),
        Row(click_id=2, c_user_id=7, c_ts=t(30)),
        Row(click_id=3, c_user_id=9, c_ts=t(5)),
        Row(click_id=4, c_user_id=7, c_ts=t(50)),  # after the purchase
    ]
    purchases = [
        Row(purchase_id=100, user_id=7, p_ts=t(40)),
        Row(purchase_id=101, user_id=9, p_ts=t(59)),  # 54 min gap
    ]
    c_schema = "click_id long, c_user_id long, c_ts timestamp"
    p_schema = "purchase_id long, user_id long, p_ts timestamp"
    spark.createDataFrame(clicks, c_schema).coalesce(1).write.parquet(c_dir)
    spark.createDataFrame(purchases, p_schema).coalesce(1).write.parquet(
        p_dir
    )

    joined = stream_stream_attribution_join(
        spark.readStream.schema(p_schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(p_dir),
        spark.readStream.schema(c_schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(c_dir),
        lookback_seconds=45 * 60,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT purchase_id, click_id FROM attrib")
        .collect()
    }
    # purchase 100 (user 7, 12:40): clicks at 12:00 (40m back, inside
    # 45m) and 12:30; NOT the 12:50 click (after). purchase 101
    # (user 9, 12:59): the 12:05 click is 54m back — outside lookback.
    assert got == {(100, 1), (100, 2)}


def test_streaming_upsert_converges_to_batch_kernel(spark, tmp_path):
    """The foreachBatch upsert snapshot equals the batch latest-wins
    kernel over everything that ever arrived, across TWO separate
    drains (state carried through the snapshot, exactly-once through
    the checkpoint), including key overwrites between waves."""
    from stampede_to_fresco_etl_spark.streaming.ingest import (
        run_upsert_stream,
    )

    landing = str(tmp_path / "landing")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, ts timestamp, v string"

    def t(m):
        return dt.datetime(2024, 2, 1, 9, m)

    wave1 = [Row(k=1, ts=t(0), v="a"), Row(k=2, ts=t(1), v="b"),
             Row(k=1, ts=t(2), v="c")]
    spark.createDataFrame(wave1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    q = run_upsert_stream(
        spark, landing, snap, ckpt, schema, ["k"], ["ts"]
    )
    q.awaitTermination(120)
    got1 = {(r.k, r.v) for r in spark.read.parquet(snap).collect()}
    assert got1 == {(1, "c"), (2, "b")}

    # wave 2: overwrite k=2, insert k=3; k=1 must survive untouched
    wave2 = [Row(k=2, ts=t(10), v="B2"), Row(k=3, ts=t(11), v="d")]
    spark.createDataFrame(wave2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    q2 = run_upsert_stream(
        spark, landing, snap, ckpt, schema, ["k"], ["ts"]
    )
    q2.awaitTermination(120)
    got2 = {(r.k, r.v) for r in spark.read.parquet(snap).collect()}
    assert got2 == {(1, "c"), (2, "B2"), (3, "d")}
    assert spark.read.parquet(snap).count() == 3  # one row per key

    # third drain with nothing new: checkpoint skips all files, the
    # snapshot is untouched (exactly-once + idempotent merge)
    q3 = run_upsert_stream(
        spark, landing, snap, ckpt, schema, ["k"], ["ts"]
    )
    q3.awaitTermination(120)
    got3 = {(r.k, r.v) for r in spark.read.parquet(snap).collect()}
    assert got3 == got2


def test_streaming_kmv_maintenance_equals_batch(spark, tmp_path):
    """The mergeable-sketch streaming story, proven: per-micro-batch
    KMV sketches accumulated into a state dir (foreachBatch append)
    and merged equal the batch sketch over everything that ever
    arrived — no rescan of history, state bounded at k hashes per
    group."""
    from stampede_to_fresco_etl_spark.operators.sketches import (
        kmv_distinct,
        kmv_merge,
        kmv_sketch,
    )

    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    schema = "g string, v long"
    waves = [
        [Row(g="a", v=i) for i in range(0, 300)]
        + [Row(g="b", v=i) for i in range(0, 40)],
        [Row(g="a", v=i) for i in range(150, 450)]  # overlap with wave 1
        + [Row(g="b", v=i) for i in range(20, 60)],
    ]
    for w in waves:
        spark.createDataFrame(w, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def merge_batch(batch_df, batch_id):
        kmv_sketch(batch_df, "g", "v", k=64).write.mode("append").parquet(
            state
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = {
        (r.g, r.sketch_size, r.kth_hash, r.est_distinct)
        for r in kmv_merge(
            spark.read.parquet(state), "g", k=64
        ).collect()
    }
    whole = spark.createDataFrame(waves[0] + waves[1], schema)
    batch = {
        (r.g, r.sketch_size, r.kth_hash, r.est_distinct)
        for r in kmv_distinct(
            whole, "g", "v", k=64, with_exact=False
        ).collect()
    }
    assert merged == batch
    # below-k group is EXACT (b has 60 distinct < k)
    est = {g: e for g, _, _, e in merged}
    assert est["b"] == 60.0
