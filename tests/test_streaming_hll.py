"""Streaming HLL ≡ batch HLL: the events table split into three
chronological micro-batches must leave register state identical to
the batch register fold — bucket for bucket — and therefore an
identical cardinality estimate (the k2/k4 arithmetic)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from stampede_to_fresco_etl_spark.catalog import load
from stampede_to_fresco_etl_spark.streaming.hll_stream import (
    estimate_from_registers,
    hll_register_projection,
    streaming_hll_registers,
)

SF = "/root/testdata/sf0.001"

IN_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("ts_us", LongType(), True),
    ]
)


def _prepared(spark):
    return load(spark, SF, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )


def _run(spark, landing, ckpt, out_dir):
    stream = spark.readStream.schema(IN_SCHEMA).parquet(landing)
    out = streaming_hll_registers(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    data = _prepared(spark).orderBy("ts_us", "user_id").toPandas()
    n = len(data)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        chunk = data.iloc[cuts[i]:cuts[i + 1]]
        spark.createDataFrame(chunk, IN_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        _run(spark, landing, ckpt, out_dir)

    emitted = spark.read.parquet(out_dir).toPandas()
    # the LATEST value per bucket is the register state; emissions
    # are monotone per bucket so max == latest
    got = emitted.groupby("b").m.max().to_dict()

    batch = (
        hll_register_projection(_prepared(spark))
        .groupBy("b")
        .agg(F.max("r").alias("m"))
        .toPandas()
    )
    want = dict(zip(batch.b, batch.m))
    assert got == want

    # identical registers => identical estimate.  No tightness bound
    # here: at sf0.001 there are ~15 distinct users against 128
    # registers, far below the raw-estimate regime (k2/k4 report the
    # same bias via rel_err); register equality IS the contract.
    est = estimate_from_registers(got)
    assert est == estimate_from_registers(want)
    assert est > 0 and len(got) > 0


def test_streaming_hll_emits_only_on_rise(spark, tmp_path):
    """Re-feeding the SAME data must emit nothing new: register
    maxima cannot rise on duplicate input (idempotent update
    stream)."""
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    data = _prepared(spark).limit(200).toPandas()
    spark.createDataFrame(data, IN_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _run(spark, landing, ckpt, out_dir)
    n_first = len(spark.read.parquet(out_dir).toPandas())

    spark.createDataFrame(data, IN_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _run(spark, landing, ckpt, out_dir)
    n_second = len(spark.read.parquet(out_dir).toPandas())
    assert n_first > 0
    assert n_second == n_first
