"""step-1 derivation tests — hand-computed golden values for the rate
kernels and gauge projections (SURVEY §5.1, §7.3 traps 1/2)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from stampede_to_fresco_etl_spark.pipeline import step1

TS = "02/27/2013 13:0{m}:0{s}"


def t(m, s=1):
    return f"02/27/2013 13:0{m}:0{s}"


def _block_rows():
    # two devices per ts -> device rollup; +1024 total sectors over 10s
    return [
        Row(jobID="job1", node="NODE1", timestamp="02/27/2013 13:00:00",
            device="sda", rd_sectors=1000.0, wr_sectors=0.0),
        Row(jobID="job1", node="NODE1", timestamp="02/27/2013 13:00:00",
            device="sdb", rd_sectors=500.0, wr_sectors=500.0),
        Row(jobID="job1", node="NODE1", timestamp="02/27/2013 13:00:10",
            device="sda", rd_sectors=1512.0, wr_sectors=0.0),
        Row(jobID="job1", node="NODE1", timestamp="02/27/2013 13:00:10",
            device="sdb", rd_sectors=1012.0, wr_sectors=500.0),
        # counter reset -> negative delta -> dropped
        Row(jobID="job1", node="NODE1", timestamp="02/27/2013 13:00:20",
            device="sda", rd_sectors=0.0, wr_sectors=0.0),
        Row(jobID="job1", node="NODE1", timestamp="02/27/2013 13:00:20",
            device="sdb", rd_sectors=0.0, wr_sectors=0.0),
    ]


def test_block_rate_golden(spark):
    df = spark.createDataFrame(_block_rows())
    out = step1.process_block(df).collect()
    # first sample dropped (null delta), reset dropped -> exactly 1 row
    assert len(out) == 1
    r = out[0]
    assert r["Job Id"] == "JOB1"
    assert r["Host"] == "NODE1"
    assert r["Event"] == "block"
    assert r["Units"] == "GB/s"
    expected = 1024 * 512 / 10 / 2**30
    assert math.isclose(r["Value"], expected, rel_tol=1e-12)


def test_block_sub_100ms_dropped(spark):
    rows = [
        Row(jobID="j", node="n", timestamp="2013-02-27 13:00:00",
            device="sda", rd_sectors=0.0, wr_sectors=0.0),
        # parses to the SAME second -> dt=0 < 0.1 -> dropped
        Row(jobID="j", node="n", timestamp="2013-02-27 13:00:00",
            device="sdb", rd_sectors=10.0, wr_sectors=0.0),
    ]
    df = spark.createDataFrame(rows)
    # both rows collapse into one ts by the device rollup -> no deltas
    assert step1.process_block(df).count() == 0


def test_cpu_golden(spark):
    # 2 cores; over 10s: user +80, idle +120, others 0 => 40% user
    def core(ts, dev, user, idle):
        return Row(jobID="77", node="n1", timestamp=ts, device=dev,
                   user=user, nice=0.0, system=0.0, idle=idle,
                   iowait=0.0, irq=0.0, softirq=0.0)

    rows = [
        core("02/27/2013 13:00:00", "cpu0", 100.0, 100.0),
        core("02/27/2013 13:00:00", "cpu1", 100.0, 100.0),
        core("02/27/2013 13:00:10", "cpu0", 140.0, 160.0),
        core("02/27/2013 13:00:10", "cpu1", 140.0, 160.0),
        # zero total delta -> dropped
        core("02/27/2013 13:00:20", "cpu0", 140.0, 160.0),
        core("02/27/2013 13:00:20", "cpu1", 140.0, 160.0),
    ]
    out = step1.process_cpu(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["Event"] == "cpuuser"
    assert r["Units"] == "CPU %"
    assert math.isclose(r["Value"], 40.0, rel_tol=1e-12)
    assert r["Job Id"] == "77"


def test_cpu_negative_individual_delta_kept(spark):
    # Reference parity (data_processor.py:209-211): the ONLY delta
    # filter is total > 0 — a negative single-column delta (e.g. after
    # a core-count change) is KEPT and the ratio clipped into [0,100].
    def snap(ts, user, idle):
        return Row(jobID="77", node="n1", timestamp=ts, device="cpu0",
                   user=user, nice=0.0, system=0.0, idle=idle,
                   iowait=0.0, irq=0.0, softirq=0.0)

    rows = [
        snap("02/27/2013 13:00:00", 100.0, 100.0),
        # user -50, idle +150 => total +100 > 0; user ratio clips to 0
        snap("02/27/2013 13:00:10", 50.0, 250.0),
    ]
    out = step1.process_cpu(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["Value"] == 0.0


def test_cpu_null_device_dropped(spark):
    # Reference drops null-device rows before the core rollup
    # (data_processor.py:164-166).
    def snap(ts, dev, user):
        return Row(jobID="77", node="n1", timestamp=ts, device=dev,
                   user=user, nice=0.0, system=0.0, idle=0.0,
                   iowait=0.0, irq=0.0, softirq=0.0)

    rows = [
        snap("02/27/2013 13:00:00", "cpu0", 100.0),
        snap("02/27/2013 13:00:10", "cpu0", 150.0),
        # null device: excluded from the rollup entirely
        snap("02/27/2013 13:00:10", None, 1000.0),
    ]
    out = step1.process_cpu(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["Value"] == 100.0  # 50/50, not polluted by the null row


def test_llite_golden(spark):
    rows = [
        Row(jobID="job9", node="n2", timestamp="02/27/2013 13:00:00",
            read_bytes=0.0, write_bytes=0.0),
        Row(jobID="job9", node="n2", timestamp="02/27/2013 13:00:10",
            read_bytes=2.0 * 2**20, write_bytes=2.0 * 2**20),
    ]
    out = step1.process_llite(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["Event"] == "nfs"
    assert r["Units"] == "MB/s"
    # 4 MiB over 10s = 0.4 MB/s
    assert math.isclose(r["Value"], 0.4, rel_tol=1e-12)


def test_mem_golden(spark):
    rows = [
        Row(jobID="job5", node="n3", timestamp="02/27/2013 13:00:00",
            MemTotal=8.0 * 2**30, MemFree=4.0 * 2**30,
            MemUsed=4.0 * 2**30, FilePages=1.0 * 2**30),
        # MemUsed < FilePages -> memused_minus_diskcache clips to 0
        Row(jobID="job5", node="n3", timestamp="02/27/2013 13:00:10",
            MemTotal=8.0 * 2**30, MemFree=7.5 * 2**30,
            MemUsed=0.5 * 2**30, FilePages=1.0 * 2**30),
    ]
    out = step1.process_mem(spark.createDataFrame(rows))
    vals = {
        (r["Event"], r["Timestamp"].second): r["Value"] for r in out.collect()
    }
    assert math.isclose(vals[("memused", 0)], 4.0, rel_tol=1e-12)
    assert math.isclose(vals[("memused_minus_diskcache", 0)], 3.0, rel_tol=1e-12)
    assert vals[("memused_minus_diskcache", 10)] == 0.0
    assert out.count() == 4


def test_union_relaxed_missing_columns(spark):
    # U1 vertical_relaxed: frames with missing columns union with
    # typed nulls (data_processor.py:419-420)
    from pyspark.sql import Row as R

    a = spark.createDataFrame([R(x=1, y="a")])
    b = spark.createDataFrame([R(x=2, z=3.5)])
    out = a.unionByName(b, allowMissingColumns=True)
    rows = {r["x"]: r for r in out.collect()}
    assert rows[1]["y"] == "a" and rows[1]["z"] is None
    assert rows[2]["y"] is None and rows[2]["z"] == 3.5


def test_union_schema(spark):
    block = spark.createDataFrame(_block_rows())
    mem_rows = [
        Row(jobID="job5", node="n3", timestamp="02/27/2013 13:00:00",
            MemTotal=1.0, MemFree=0.5, MemUsed=0.5, FilePages=0.1),
    ]
    out = step1.transform_node_data(
        block=block, mem=spark.createDataFrame(mem_rows)
    )
    assert out.columns == ["Job Id", "Host", "Timestamp", "Event", "Value", "Units"]
    assert out.count() == 3
