"""CLI entry points: the runnable twins of the reference's step
scripts, driven end-to-end through `cli.main` on real files —
step1 alone, then the chained `pipeline` subcommand (step1 → step2 →
step3), asserting the final wide table carries the step-3 suffixes
and the expected job."""

from __future__ import annotations

import pytest

from stampede_to_fresco_etl_spark.cli import main


@pytest.fixture()
def raw_dirs(tmp_path):
    n1 = tmp_path / "in" / "NODE1"
    n1.mkdir(parents=True)
    n1.joinpath("block.csv").write_text(
        "jobID,node,timestamp,device,rd_sectors,wr_sectors\n"
        "job1,NODE1,03/01/2013 10:00:00,sda,0,0\n"
        "job1,NODE1,03/01/2013 10:00:10,sda,1024,0\n"
    )
    n1.joinpath("mem.csv").write_text(
        "jobID,node,timestamp,MemTotal,MemFree,MemUsed,FilePages\n"
        "job1,NODE1,03/01/2013 10:00:10,8589934592,4294967296,"
        "4294967296,1073741824\n"
    )
    n2 = tmp_path / "in" / "NODE2"
    n2.mkdir(parents=True)
    n2.joinpath("cpu.csv").write_text(
        "jobID,node,timestamp,device,user,nice,system,idle,iowait,irq,"
        "softirq\n"
        "job1,NODE2,03/01/2013 10:00:00,cpu0,100,0,0,100,0,0,0\n"
        "job1,NODE2,03/01/2013 10:00:10,cpu0,180,0,0,120,0,0,0\n"
    )
    n2.joinpath("llite.csv").write_text(
        "jobID,node,timestamp,read_bytes,write_bytes\n"
        "job1,NODE2,03/01/2013 10:00:00,0,0\n"
        "job1,NODE2,03/01/2013 10:00:10,1048576,1048576\n"
    )
    acct = tmp_path / "acct.csv"
    acct.write_text(
        "jobID,user,account,jobname,queue,nnodes,ncpus,walltime,"
        "start,end,submit,exit_status\n"
        "1,alice,acctA,jobA,normal,1,16,3600,"
        "03/01/2013 10:00:00,03/01/2013 10:02:00,03/01/2013 09:55:00,0\n"
    )
    return tmp_path


def test_cli_step1(spark, raw_dirs):
    out = str(raw_dirs / "long")
    rc = main(["step1", "--input", str(raw_dirs / "in"), "--output", out])
    assert rc == 0
    got = spark.read.parquet(out)
    events = {r["Event"] for r in got.select("Event").distinct().collect()}
    assert events == {
        "block", "memused", "memused_minus_diskcache", "cpuuser", "nfs"
    }


def test_cli_full_pipeline(spark, raw_dirs):
    out = str(raw_dirs / "final")
    rc = main(
        [
            "pipeline",
            "--input", str(raw_dirs / "in"),
            "--accounting", str(raw_dirs / "acct.csv"),
            "--output", out,
        ]
    )
    assert rc == 0
    got = spark.read.parquet(out).collect()
    assert len(got) > 0
    r = got[0]
    # step-3 finalizers applied: jid suffixed, host suffixed (the
    # normalized jid is '1' — accounting key '1' matched metrics
    # 'job1' through normalize_job_id)
    assert r["jid"] == "1_S"
    assert r["host"].endswith("_S")
    # step-2 widened the block/mem events into columns
    cols = set(spark.read.parquet(out).columns)
    assert {"value_block", "value_memused", "host_list"} <= cols


def test_cli_stream_step1_drains_and_stops(spark, raw_dirs):
    out = str(raw_dirs / "stream_long")
    ckpt = str(raw_dirs / "ckpt")
    rc = main(
        [
            "stream-step1",
            "--input", str(raw_dirs / "in"),
            "--output", out,
            "--checkpoint", ckpt,
        ]
    )
    assert rc == 0
    from stampede_to_fresco_etl_spark.streaming.step1_stream import (
        read_fresco_output,
    )

    got = read_fresco_output(spark, out)
    events = {r["Event"] for r in got.select("Event").distinct().collect()}
    assert events == {
        "block", "memused", "memused_minus_diskcache", "cpuuser", "nfs"
    }


def test_cli_stepwise_handoff(spark, raw_dirs):
    """step1 | step2 | step3 as three separate CLI invocations — the
    file handoff between subcommands (what a scheduler would run as
    three jobs) produces the same wide table the chained `pipeline`
    subcommand builds."""
    long_dir = str(raw_dirs / "long2")
    wide_dir = str(raw_dirs / "wide2")
    final_dir = str(raw_dirs / "final2")
    assert main(["step1", "--input", str(raw_dirs / "in"),
                 "--output", long_dir]) == 0
    assert main(["step2", "--metrics", long_dir,
                 "--accounting", str(raw_dirs / "acct.csv"),
                 "--output", wide_dir]) == 0
    assert main(["step3", "--input", wide_dir,
                 "--output", final_dir]) == 0

    stepwise = spark.read.parquet(final_dir)
    assert stepwise.count() > 0
    assert {"value_block", "value_memused", "host_list"} <= set(
        stepwise.columns
    )
    r = stepwise.collect()[0]
    assert r["jid"] == "1_S" and r["host"].endswith("_S")


def test_cli_stream_step2_step3(spark, tmp_path):
    """stream-step2 then stream-step3 via the CLI: a FRESCO-long
    parquet landing dir + accounting CSV maintained into the wide
    table, then finalized — the full incremental chain as two shell
    commands."""
    import datetime as dt

    from pyspark.sql import Row

    from stampede_to_fresco_etl_spark.schemas import FRESCO_LONG

    def m(jid, host, t, event, value):
        return Row(**{"Job Id": jid, "Host": host, "Timestamp": t,
                      "Event": event, "Value": value, "Units": "x"})

    t0 = dt.datetime(2013, 3, 1, 10, 0, 30)
    rows = [
        m("JOB100", "h1", t0, "cpuuser", 10.0),
        m("JOB100", "h2", dt.datetime(2013, 3, 1, 10, 0, 40),
          "memused", 4.0),
    ]
    landing = str(tmp_path / "landing")
    spark.createDataFrame(rows, FRESCO_LONG).coalesce(1).write.parquet(
        landing
    )
    acct_csv = tmp_path / "acct.csv"
    acct_csv.write_text(
        "jobID,user,account,jobname,queue,nnodes,ncpus,walltime,"
        "start,end,submit,exit_status\n"
        "job100,alice,acc,jn,normal,2,32,3600,"
        "03/01/2013 10:00:30,03/01/2013 10:02:00,"
        "03/01/2013 09:55:30,0\n"
    )
    wide = str(tmp_path / "wide")
    final = str(tmp_path / "final")
    assert main([
        "stream-step2",
        "--landing", landing,
        "--accounting", str(acct_csv),
        "--state", str(tmp_path / "state"),
        "--output", wide,
        "--checkpoint", str(tmp_path / "ck2"),
    ]) == 0
    w = spark.read.parquet(wide)
    assert w.count() > 0
    assert {"value_cpuuser", "value_memused", "host_list"} <= set(w.columns)

    assert main([
        "stream-step3",
        "--landing", wide,
        "--output", final,
        "--checkpoint", str(tmp_path / "ck3"),
        "--schema-from", wide,
    ]) == 0
    f = spark.read.parquet(final).collect()
    assert len(f) > 0
    assert all(r["jid"].endswith("_S") for r in f)
