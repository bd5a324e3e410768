"""Incremental step-1: the full telemetry→FRESCO derivation running
as Structured Streaming, with lag state crossing file waves — the
streaming output after draining everything must equal the batch
pipeline over the same rows."""

from __future__ import annotations

import pytest

from stampede_to_fresco_etl_spark.pipeline.step1 import transform_node_data
from stampede_to_fresco_etl_spark.schemas import (
    BLOCK_RAW,
    CPU_RAW,
    LLITE_RAW,
    MEM_RAW,
)
from stampede_to_fresco_etl_spark.streaming.step1_stream import (
    read_fresco_output,
    run_step1_incremental,
)


def t(s):
    return f"2013-03-01 10:00:{s:02d}"


# wave → node → metric → csv body.  Two devices for block (rollup),
# two cores for cpu; the 10:00:20 samples arrive in WAVE 2, so their
# deltas only exist if lag state crossed the wave boundary.
WAVES = [
    {
        "NODE1": {
            "block": (
                "jobID,node,timestamp,device,rd_sectors,wr_sectors\n"
                f"job1,NODE1,{t(0)},sda,1000,500\n"
                f"job1,NODE1,{t(0)},sdb,2000,500\n"
                f"job1,NODE1,{t(10)},sda,3000,1500\n"
                f"job1,NODE1,{t(10)},sdb,4000,1500\n"
            ),
            "cpu": (
                "jobID,node,timestamp,device,user,nice,system,idle,"
                "iowait,irq,softirq\n"
                f"job1,NODE1,{t(0)},0,100,0,50,850,0,0,0\n"
                f"job1,NODE1,{t(0)},1,200,0,50,750,0,0,0\n"
                f"job1,NODE1,{t(10)},0,400,0,100,1500,0,0,0\n"
                f"job1,NODE1,{t(10)},1,500,0,100,1400,0,0,0\n"
            ),
            # llite has NO device column (LLITE_RAW is 5 fields;
            # reference step-1/data_processor.py:235 reads exactly
            # jobID,node,timestamp,read_bytes,write_bytes)
            "llite": (
                "jobID,node,timestamp,read_bytes,write_bytes\n"
                f"job1,NODE1,{t(0)},1048576,0\n"
                f"job1,NODE1,{t(10)},3145728,1048576\n"
            ),
            "mem": (
                "jobID,node,timestamp,MemTotal,MemFree,MemUsed,"
                "FilePages\n"
                f"job1,NODE1,{t(0)},8589934592,4294967296,"
                "4294967296,1073741824\n"
            ),
        },
    },
    {
        "NODE1": {
            # continuation files: first sample diffs against wave 1
            "block_0002": (
                "jobID,node,timestamp,device,rd_sectors,wr_sectors\n"
                f"job1,NODE1,{t(20)},sda,5000,2500\n"
                f"job1,NODE1,{t(20)},sdb,6000,2500\n"
            ),
            "cpu_0002": (
                "jobID,node,timestamp,device,user,nice,system,idle,"
                "iowait,irq,softirq\n"
                f"job1,NODE1,{t(20)},0,700,0,150,2150,0,0,0\n"
                f"job1,NODE1,{t(20)},1,800,0,150,2050,0,0,0\n"
            ),
            "llite_0002": (
                "jobID,node,timestamp,read_bytes,write_bytes\n"
                f"job1,NODE1,{t(20)},5242880,2097152\n"
            ),
            "mem_0002": (
                "jobID,node,timestamp,MemTotal,MemFree,MemUsed,"
                "FilePages\n"
                f"job1,NODE1,{t(20)},8589934592,2147483648,"
                "6442450944,2147483648\n"
            ),
        },
    },
]


def _write_wave(base, wave):
    for node, files in wave.items():
        d = base / node
        d.mkdir(parents=True, exist_ok=True)
        for name, body in files.items():
            (d / f"{name}.csv").write_text(body)


def _drain(qs):
    for q in qs:
        q.awaitTermination(120)


def _rows(spark, path):
    return {
        (r["Event"], r["Host"], str(r["Timestamp"])): r["Value"]
        for r in read_fresco_output(spark, path).collect()
    }


def test_streaming_step1_matches_batch_across_waves(spark, tmp_path):
    landing = tmp_path / "landing"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    for wave in WAVES:
        _write_wave(landing, wave)
        _drain(run_step1_incremental(spark, str(landing), out, ckpt))

    got = _rows(spark, out)

    # batch over the SAME rows (all waves together, per metric glob)
    def rd(schema, name):
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .csv(f"{landing}/*/{name}*.csv")
        )

    batch = transform_node_data(
        block=rd(BLOCK_RAW, "block"),
        cpu=rd(CPU_RAW, "cpu"),
        llite=rd(LLITE_RAW, "llite"),
        mem=rd(MEM_RAW, "mem"),
    )
    want = {
        (r["Event"], r["Host"], str(r["Timestamp"])): r["Value"]
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k

    # the wave-crossing deltas specifically (state carried):
    # block 10:00:20: Δsectors=(5000+2500+6000+2500)-(3000+1500+4000+1500)
    #               = 6000 -> 6000*512/10/2^30 GB/s
    assert got[("block", "NODE1", "2013-03-01 10:00:20")] == pytest.approx(
        6000 * 512 / 10 / 2**30
    )
    # cpuuser 10:00:20: userΔ=600, totalΔ=(700+800+150+150+2150+2050)
    #                  -(400+500+100+100+1500+1400) = 6000-4000 = 2000 -> 30.0%
    # (denominator includes the user column: reference
    #  step-1/data_processor.py:192-211 sums ALL jiffy columns)
    assert got[("cpuuser", "NODE1", "2013-03-01 10:00:20")] == pytest.approx(
        600 / 2000 * 100
    )
    # nfs 10:00:20: Δbytes=(5242880+2097152)-(3145728+1048576)=3145728
    #             -> 3 MB over 10 s
    assert got[("nfs", "NODE1", "2013-03-01 10:00:20")] == pytest.approx(0.3)
    # mem gauges exist for both waves (stateless)
    assert ("memused", "NODE1", "2013-03-01 10:00:20") in got


def test_streaming_step1_drops_out_of_order_cpu(spark, tmp_path):
    """A later wave REPLAYS an old cpu snapshot (ts at/before the lag
    state): dt <= 0, so it must emit no cpuuser row instead of rating
    against stale state (ADVICE r3 — dt filter now enforced)."""
    landing = tmp_path / "landing"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_wave(landing, WAVES[0])
    _drain(run_step1_incremental(spark, str(landing), out, ckpt))

    # wave 2: one duplicate of the 10:00:10 snapshot (dt == 0) and one
    # strictly earlier snapshot (dt < 0)
    _write_wave(landing, {
        "NODE1": {
            "cpu_0002": (
                "jobID,node,timestamp,device,user,nice,system,idle,"
                "iowait,irq,softirq\n"
                f"job1,NODE1,{t(10)},0,400,0,100,1500,0,0,0\n"
                f"job1,NODE1,{t(10)},1,500,0,100,1400,0,0,0\n"
                f"job1,NODE1,{t(5)},0,900,0,300,3000,0,0,0\n"
                f"job1,NODE1,{t(5)},1,950,0,300,2900,0,0,0\n"
            ),
        },
    })
    _drain(run_step1_incremental(spark, str(landing), out, ckpt))

    got = _rows(spark, out)
    cpu_rows = sorted(k for k in got if k[0] == "cpuuser")
    # only the legitimate wave-1 delta at 10:00:10 exists; nothing at
    # 10:00:05 and no second row for the replayed 10:00:10
    assert cpu_rows == [("cpuuser", "NODE1", "2013-03-01 10:00:10")]
