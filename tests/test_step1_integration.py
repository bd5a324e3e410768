"""Directory-level step-1 integration: real CSV files on disk, two
nodes, all four metric types, date-partitioned output."""

from __future__ import annotations

import pytest

from stampede_to_fresco_etl_spark.pipeline.step1 import run_step1


@pytest.fixture()
def node_dirs(tmp_path):
    n1 = tmp_path / "in" / "NODE1"
    n2 = tmp_path / "in" / "NODE2"
    n1.mkdir(parents=True)
    n2.mkdir(parents=True)
    n1.joinpath("block.csv").write_text(
        "jobID,node,timestamp,device,rd_sectors,wr_sectors\n"
        "job1,NODE1,03/01/2013 10:00:00,sda,0,0\n"
        "job1,NODE1,03/01/2013 10:00:10,sda,1024,0\n"
    )
    n1.joinpath("mem.csv").write_text(
        "jobID,node,timestamp,MemTotal,MemFree,MemUsed,FilePages\n"
        "job1,NODE1,03/01/2013 10:00:00,8589934592,4294967296,"
        "4294967296,1073741824\n"
    )
    n2.joinpath("cpu.csv").write_text(
        "jobID,node,timestamp,device,user,nice,system,idle,iowait,irq,"
        "softirq\n"
        "job2,NODE2,03/02/2013 11:00:00,cpu0,100,0,0,100,0,0,0\n"
        "job2,NODE2,03/02/2013 11:00:10,cpu0,180,0,0,120,0,0,0\n"
    )
    n2.joinpath("llite.csv").write_text(
        "jobID,node,timestamp,read_bytes,write_bytes\n"
        "job2,NODE2,03/02/2013 11:00:00,0,0\n"
        "job2,NODE2,03/02/2013 11:00:10,1048576,1048576\n"
    )
    return str(tmp_path / "in"), str(tmp_path / "out")


def test_run_step1_end_to_end(spark, node_dirs):
    input_dir, output_dir = node_dirs
    out = run_step1(spark, input_dir, output_dir)
    rows = {(r["Event"], r["Host"]): r for r in out.collect()}
    # block: 1024 sectors / 10 s; cpu: 80/(80+20)*100 = 80%;
    # llite: 2 MiB / 10 s = 0.2 MB/s; mem: 4 GiB -> 4.0 / 3.0
    assert abs(rows[("block", "NODE1")]["Value"] - 1024 * 512 / 10 / 2**30) < 1e-15
    assert rows[("cpuuser", "NODE2")]["Value"] == 80.0
    assert rows[("nfs", "NODE2")]["Value"] == 0.2
    assert rows[("memused", "NODE1")]["Value"] == 4.0
    assert rows[("memused_minus_diskcache", "NODE1")]["Value"] == 3.0
    assert len(rows) == 5

    # partitioned daily output on disk
    got = spark.read.parquet(output_dir)
    assert got.count() == 5
    dates = {str(r["date"]) for r in got.select("date").distinct().collect()}
    assert dates == {"2013-03-01", "2013-03-02"}


def test_run_step1_missing_metric_types(spark, tmp_path):
    d = tmp_path / "in" / "NODE9"
    d.mkdir(parents=True)
    d.joinpath("mem.csv").write_text(
        "jobID,node,timestamp,MemTotal,MemFree,MemUsed,FilePages\n"
        "job9,NODE9,03/01/2013 10:00:00,100,50,50,10\n"
    )
    out = run_step1(spark, str(tmp_path / "in"))
    assert out.count() == 2  # memused + memused_minus_diskcache only
