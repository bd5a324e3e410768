"""Streaming CUSUM ≡ batch CUSUM: the real events table split into
three chronological micro-batches must reproduce the catalog
`w11_cusum_drift` output exactly — statistic, flags, and the state
carried across every batch boundary."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from stampede_to_fresco_etl_spark.catalog import (
    REGISTRY,
    _two_middle_sum,
    load,
)
from stampede_to_fresco_etl_spark.streaming.cusum_stream import (
    streaming_cusum,
)

SF = "/root/testdata/sf0.001"

IN_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("ts_us", LongType(), True),
        StructField("v", LongType(), True),
    ]
)


def _prepared(spark):
    e = load(spark, SF, "events").filter(F.col("value").isNotNull())
    return e.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * F.lit(10000.0))
        .cast("long")
        .alias("v"),
    )


def _calibration(spark):
    base = _prepared(spark)
    med = _two_middle_sum(base, "v", "med2")
    devs = base.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("v") * 2 - F.col("med2"))
    )
    mad = _two_middle_sum(devs, "dev", "mad2")
    rows = med.join(mad, "event_type").collect()
    return {r["event_type"]: (r["med2"], r["mad2"]) for r in rows}


def _run(spark, landing, ckpt, out_dir, calibration):
    stream = spark.readStream.schema(IN_SCHEMA).parquet(landing)
    out = streaming_cusum(stream, calibration)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_cusum_equals_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    cal = _calibration(spark)
    data = (
        _prepared(spark)
        .orderBy("ts_us", "event_id")
        .toPandas()
    )
    n = len(data)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        chunk = data.iloc[cuts[i]:cuts[i + 1]]
        spark.createDataFrame(chunk, IN_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        _run(spark, landing, ckpt, out_dir, cal)

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    want = (
        REGISTRY["w11_cusum_drift"][0](spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(got) == len(want)
    assert (got.index == want.index).all()
    assert (got.event_type == want.event_type).all()
    assert (got.cusum == want.cusum).all()          # exact, not approx
    assert (got.drift_flag == want.drift_flag).all()
    assert got.drift_flag.sum() > 0                  # alarms do fire


def test_streaming_cusum_uncalibrated_key_skipped(spark, tmp_path):
    import pandas as pd

    landing = str(tmp_path / "landing")
    chunk = pd.DataFrame(
        {
            "event_id": [1, 2],
            "event_type": ["known", "mystery"],
            "ts_us": [1_000_000, 2_000_000],
            "v": [100, 200],
        }
    )
    spark.createDataFrame(chunk, IN_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _run(
        spark,
        landing,
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        {"known": (100, 50)},
    )
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert list(got.event_type) == ["known"]


def test_streaming_cusum_late_event_flagged_not_folded(spark, tmp_path):
    """Out-of-order guard (ADVICE r5): an event older than the key's
    last processed timestamp must NOT be folded into the
    path-dependent S_t — it surfaces with a NULL statistic, and the
    in-order events' values are exactly what they would have been
    had the late row never arrived."""
    import pandas as pd

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    cal = {"k": (100, 50)}

    b1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "event_type": ["k", "k"],
            "ts_us": [1_000_000, 2_000_000],
            "v": [100, 120],
        }
    )
    # event 3 is LATE (ts before batch 1's last), event 4 in order
    b2 = pd.DataFrame(
        {
            "event_id": [3, 4],
            "event_type": ["k", "k"],
            "ts_us": [1_500_000, 3_000_000],
            "v": [500, 80],
        }
    )
    for chunk in (b1, b2):
        spark.createDataFrame(chunk, IN_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        _run(spark, landing, ckpt, out_dir, cal)

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert list(got.index) == [1, 2, 3, 4]
    assert pd.isna(got.loc[3, "cusum"]) and pd.isna(
        got.loc[3, "drift_flag"]
    )
    # replay 1,2,4 in order through the recurrence: S from (pt, minp)
    med2, mad2 = cal["k"]
    pt = minp = 0
    want = {}
    for eid, v in [(1, 100), (2, 120), (4, 80)]:
        pt += v * 2 - med2 - mad2
        minp = min(minp, pt)
        want[eid] = (pt - min(minp, 0)) / 20000.0
    for eid, s in want.items():
        assert got.loc[eid, "cusum"] == s, (eid, got.loc[eid, "cusum"])
