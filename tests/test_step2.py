"""step-2 interval join / window / pivot tests — hand-computed
fixtures covering SURVEY §7.3 traps 4/5/6/7/10."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from stampede_to_fresco_etl_spark.pipeline.step2 import run_step2
from stampede_to_fresco_etl_spark.schemas import OUTPUT_COLUMNS


def ts(m, s=0):
    return dt.datetime(2013, 3, 1, 10, m, s)


def metric(jid, host, t, event, value):
    return Row(**{"Job Id": jid, "Host": host, "Timestamp": t,
                  "Event": event, "Value": value, "Units": "x"})


def acct(jid, start, end, user="alice"):
    f = "%m/%d/%Y %H:%M:%S"
    return Row(jobID=jid, user=user, account="acc", jobname="jn",
               queue="normal", nnodes=2, ncpus=32, walltime=3600,
               start=start.strftime(f), end=end.strftime(f),
               submit=(start - dt.timedelta(minutes=5)).strftime(f),
               exit_status="0")


def test_step2_end_to_end(spark):
    # job JOB100 runs [10:00:30, 10:02:00); metrics on 2 hosts
    metrics = spark.createDataFrame(
        [
            metric("JOB100", "h1", ts(0, 30), "cpuuser", 10.0),
            metric("JOB100", "h1", ts(0, 45), "cpuuser", 20.0),   # same bucket
            metric("JOB100", "h1", ts(1, 45), "cpuuser", 50.0),   # bucket 2
            metric("JOB100", "h2", ts(0, 40), "memused", 4.0),
            # at exactly end -> excluded (exclusive end, trap 5)
            metric("JOB100", "h1", ts(2, 0), "cpuuser", 99.0),
            # outside any job -> dropped
            metric("JOB999", "h1", ts(0, 40), "cpuuser", 77.0),
        ]
    )
    accounting = spark.createDataFrame(
        [
            acct("job100", ts(0, 30), ts(2, 0)),
            # invalid range start >= end -> skipped (P9)
            acct("job200", ts(1, 0), ts(1, 0)),
        ]
    )
    out = run_step2(metrics, accounting)
    assert out.columns == OUTPUT_COLUMNS
    rows = {(r["host"], r["time"]): r for r in out.collect()}
    assert len(rows) == 3

    # bucket 1 h1: [10:00:30, 10:01:30) -> mid 10:01:00; mean(10,20)=15
    r = rows[("h1", dt.datetime(2013, 3, 1, 10, 1, 0))]
    assert r["value_cpuuser"] == 15.0
    assert r["value_gpu"] is None
    assert r["value_memused"] is None  # pivot backfill (trap 6)
    assert r["host_list"] == "h1,h2"   # sorted across the job (trap 7)
    assert r["jid"] == "100"           # normalized digits
    assert r["nhosts"] == 2 and r["ncores"] == 32 and r["timelimit"] == 3600
    assert r["username"] == "alice" and r["exitcode"] == "0"
    assert r["start_time"] == ts(0, 30) and r["end_time"] == ts(2, 0)

    # bucket 2 h1: [10:01:30, 10:02:00) clamped at end -> mid 10:01:45
    r2 = rows[("h1", dt.datetime(2013, 3, 1, 10, 1, 45))]
    assert r2["value_cpuuser"] == 50.0

    # h2 bucket 1 -> only memused
    r3 = rows[("h2", dt.datetime(2013, 3, 1, 10, 1, 0))]
    assert r3["value_memused"] == 4.0
    assert r3["value_cpuuser"] is None


def test_host_list_per_job_record(spark):
    # '123' and 'job123' both normalize to jid '123' (the collision
    # normalize_job_id is designed for) but are distinct accounting
    # rows with different windows — host lists must NOT merge across
    # them (consumer.py:403-404 builds the list per job record).
    # Empty-string hosts are dropped (filter(None, hosts)).
    metrics = spark.createDataFrame(
        [
            metric("123", "a1", ts(0, 40), "cpuuser", 1.0),
            metric("123", "", ts(0, 50), "cpuuser", 2.0),     # empty host
            metric("job123", "b1", ts(10, 10), "cpuuser", 3.0),
            metric("job123", "b2", ts(10, 20), "cpuuser", 4.0),
        ]
    )
    accounting = spark.createDataFrame(
        [
            acct("123", ts(0, 30), ts(2, 0)),
            acct("job123", ts(10, 0), ts(12, 0), user="bob"),
        ]
    )
    out = run_step2(metrics, accounting)
    lists = {
        (r["start_time"], r["host"]): r["host_list"] for r in out.collect()
    }
    assert lists[(ts(0, 30), "a1")] == "a1"       # not merged with b*
    assert lists[(ts(0, 30), "")] == "a1"         # empty host filtered
    assert lists[(ts(10, 0), "b1")] == "b1,b2"
    assert lists[(ts(10, 0), "b2")] == "b1,b2"


def test_parse_accounting_null_submit_dropped(spark):
    from stampede_to_fresco_etl_spark.pipeline.step2 import parse_accounting

    good = acct("1", ts(0, 0), ts(1, 0))
    bad = Row(**{**good.asDict(), "jobID": "2", "submit": "not-a-time"})
    out = parse_accounting(spark.createDataFrame([good, bad]))
    assert [r["jobID"] for r in out.collect()] == ["1"]


def test_step3_finalize(spark):
    from stampede_to_fresco_etl_spark.pipeline.step3 import finalize

    df = spark.createDataFrame(
        [Row(jid="jobID123", host="h1", host_list="h1,h2", username="u",
             other="keep")]
    )
    r = finalize(df).first()
    # 'ID' stripped first -> 'job123'; then 'job'->'JOB'; then _S
    assert r["jid"] == "JOB123_S"
    assert r["host"] == "h1_S"
    assert r["host_list"] == "h1,h2_S"
    assert r["username"] == "u_S"
    assert r["other"] == "keep"
