"""End-to-end incremental step-2: the full wide-table dataflow
(join + job-aligned window + pivot + host_list) maintained per
micro-batch via foreachBatch, with a mid-stream crash + restart —
the streaming twin of pipeline.step2.join_and_widen must converge to
the batch result on the same data (VERDICT r2 item 5).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import Row

from stampede_to_fresco_etl_spark.pipeline.step2 import (
    join_and_widen,
    parse_accounting,
)
from stampede_to_fresco_etl_spark.schemas import FRESCO_LONG, OUTPUT_COLUMNS
from stampede_to_fresco_etl_spark.streaming.step2_stream import (
    run_step2_incremental,
)


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


# three arrival files; the SAME (job, host, bucket) group receives
# rows in different files, so the batch-boundary merge is exercised
# (mean is only correct if sum/count state merges across batches)
FILES = [
    [
        metric("JOB100", "h1", ts(0, 30), "cpuuser", 10.0),
        metric("JOB100", "h2", ts(0, 40), "memused", 4.0),
    ],
    [
        # same bucket as file 1's first row -> merged mean (10+20)/2
        metric("JOB100", "h1", ts(0, 45), "cpuuser", 20.0),
        metric("JOB100", "h1", ts(1, 45), "cpuuser", 50.0),
        # new host appears late -> host_list must grow to h1,h2,h3
        metric("JOB100", "h3", ts(1, 40), "memused", 6.0),
    ],
    [
        # month boundary: a second job in April reopens only 2013-04
        metric("JOB200", "h9", dt.datetime(2013, 4, 2, 1, 0, 30),
               "cpuuser", 7.0),
        # same JOB100 bucket again -> mean becomes (10+20+30)/3
        metric("JOB100", "h1", ts(0, 50), "cpuuser", 30.0),
    ],
]

ACCT_ROWS = [
    acct("job100", ts(0, 30), ts(2, 0)),
    acct("job200", dt.datetime(2013, 4, 2, 1, 0, 0),
         dt.datetime(2013, 4, 2, 2, 0, 0), user="bob"),
]


def _sorted_pdf(df):
    pdf = df.select(*OUTPUT_COLUMNS).toPandas()
    pdf = pdf.sort_values(["jid", "host", "time"], ignore_index=True)
    for c in pdf.columns:
        if pdf[c].dtype.kind == "M":
            pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf


@pytest.fixture()
def dirs(tmp_path):
    return {k: str(tmp_path / k) for k in ("landing", "state", "out", "ckpt")}


def _write_file(spark, landing, rows):
    spark.createDataFrame(rows, schema=FRESCO_LONG).coalesce(1).write.mode(
        "append"
    ).parquet(landing)


def _batch_expected(spark):
    metrics = spark.createDataFrame(
        [r for f in FILES for r in f], schema=FRESCO_LONG
    )
    accounting = parse_accounting(spark.createDataFrame(ACCT_ROWS))
    return _sorted_pdf(join_and_widen(metrics, accounting))


def test_streaming_step2_equals_batch_after_kill_recover(spark, dirs):
    accounting = parse_accounting(spark.createDataFrame(ACCT_ROWS))
    for rows in FILES:
        _write_file(spark, dirs["landing"], rows)

    # crash the query after micro-batch 1's state commit but before
    # Spark commits the offset — the batch will REPLAY with the same
    # id on restart, and the marker protocol must not double-count
    class Boom(Exception):
        pass

    crashed = {"done": False}

    def hook(batch_id):
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise Boom("injected crash after batch 1 commit")

    q = run_step2_incremental(
        spark, dirs["landing"], accounting, dirs["state"], dirs["out"],
        dirs["ckpt"], max_files_per_trigger=1, batch_hook=hook,
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    assert crashed["done"]

    # restart from the same checkpoint: batch 1 replays (skip-merge
    # path), batch 2 runs fresh; the stream drains and stops
    q2 = run_step2_incremental(
        spark, dirs["landing"], accounting, dirs["state"], dirs["out"],
        dirs["ckpt"], max_files_per_trigger=1,
    )
    q2.awaitTermination(120)

    got = _sorted_pdf(spark.read.parquet(dirs["out"]))
    want = _batch_expected(spark)
    # sum order differs between one-shot and merged partials — values
    # equal to FP round-off, structure exact
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)

    # the merged group really did accumulate across three files
    r = got[(got.host == "h1") & (got.time == ts(1, 0))].iloc[0]
    assert r["value_cpuuser"] == pytest.approx(20.0)  # (10+20+30)/3
    assert r["host_list"] == "h1,h2,h3"


def test_streaming_step2_incremental_arrival(spark, dirs):
    """Files arriving across separate drains (no crash): each drain
    picks up only the new file and converges to the batch result."""
    accounting = parse_accounting(spark.createDataFrame(ACCT_ROWS))
    for i, rows in enumerate(FILES):
        _write_file(spark, dirs["landing"], rows)
        q = run_step2_incremental(
            spark, dirs["landing"], accounting, dirs["state"],
            dirs["out"], dirs["ckpt"],
        )
        q.awaitTermination(120)

    got = _sorted_pdf(spark.read.parquet(dirs["out"]))
    want = _batch_expected(spark)
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)

    # April's job landed in its own month partition
    months = {
        r["month"]
        for r in spark.read.parquet(dirs["out"])
        .selectExpr("date_format(time, 'yyyy-MM') as month")
        .distinct()
        .collect()
    }
    assert months == {"2013-03", "2013-04"}


def test_streaming_step2_cross_month_late_host(spark, dirs):
    """A job spanning a month boundary gains a NEW host in a batch
    whose rows land only in the later month: the earlier month's
    partition must still be rewritten with the grown host_list
    (regression: months were derived from the batch's partial, so
    2013-02 kept host_list='h1' while batch said 'h1,h2')."""
    feb = dt.datetime(2013, 2, 28, 23, 59, 30)
    mar = dt.datetime(2013, 3, 1, 0, 0, 30)
    files = [
        # batch 0: host h1 on both sides of the boundary
        [
            metric("JOB300", "h1", feb, "cpuuser", 10.0),
            metric("JOB300", "h1", mar, "cpuuser", 20.0),
        ],
        # batch 1: host h2 appears, MARCH ONLY
        [metric("JOB300", "h2", mar, "memused", 4.0)],
    ]
    acct_rows = [
        acct(
            "job300",
            dt.datetime(2013, 2, 28, 23, 0, 0),
            dt.datetime(2013, 3, 1, 1, 0, 0),
        )
    ]
    accounting = parse_accounting(spark.createDataFrame(acct_rows))
    for rows in files:
        _write_file(spark, dirs["landing"], rows)
        q = run_step2_incremental(
            spark, dirs["landing"], accounting, dirs["state"],
            dirs["out"], dirs["ckpt"],
        )
        q.awaitTermination(120)

    out = spark.read.parquet(dirs["out"])
    feb_lists = {
        r["host_list"]
        for r in out.filter("date_format(time, 'yyyy-MM') = '2013-02'")
        .select("host_list")
        .distinct()
        .collect()
    }
    assert feb_lists == {"h1,h2"}

    # and the whole table still equals the batch plan on the same data
    metrics = spark.createDataFrame(
        [r for f in files for r in f], schema=FRESCO_LONG
    )
    got = _sorted_pdf(out)
    want = _sorted_pdf(join_and_widen(metrics, accounting))
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)


def test_marker_and_months_are_one_atomic_unit(spark, dirs):
    """r7: the touched-month list lives INSIDE the snapshot as its
    commit marker (_MONTHS) — one artifact, not two.  Drives the
    foreachBatch body directly through every crash window:

      (a) after the parquet job but BEFORE the marker → the snapshot
          is NOT committed; a replay re-merges without double-count;
      (b) after the marker → committed; a replay skips the merge,
          reads the months from the marker, and the rewrite is
          byte-stable.
    """
    from stampede_to_fresco_etl_spark.streaming import step2_stream as S

    accounting = parse_accounting(spark.createDataFrame(ACCT_ROWS))
    batch0 = spark.createDataFrame(FILES[0], schema=FRESCO_LONG)
    batch1 = spark.createDataFrame(FILES[1], schema=FRESCO_LONG)

    S.apply_step2_batch(
        spark, batch0, 0, accounting, dirs["state"], dirs["out"]
    )
    assert S._committed_ids(spark, dirs["state"]) == [0]
    assert S._read_marker(spark, f"{dirs['state']}/v0") == ["2013-03"]

    # crash window (a): kill the marker write — batch 1's snapshot
    # parquet lands but the commit never happens
    real_write = S._write_marker

    def boom(*a, **k):
        raise RuntimeError("injected crash before marker")

    S._write_marker = boom
    try:
        with pytest.raises(RuntimeError):
            S.apply_step2_batch(
                spark, batch1, 1, accounting, dirs["state"], dirs["out"]
            )
    finally:
        S._write_marker = real_write
    # snapshot dir exists but is NOT committed (no marker) — replay
    # must re-merge from v0, not read the orphan
    assert S._committed_ids(spark, dirs["state"]) == [0]

    # replay batch 1 (same id, same rows) — exactly-once: the merge
    # runs once on top of v0, and the marker commits atomically
    S.apply_step2_batch(
        spark, batch1, 1, accounting, dirs["state"], dirs["out"]
    )
    assert S._committed_ids(spark, dirs["state"]) == [0, 1]
    months = S._read_marker(spark, f"{dirs['state']}/v1")
    assert months == ["2013-03"]

    # crash window (b): replay an ALREADY-committed batch — the merge
    # is skipped (state unchanged), months come from the marker, and
    # the output rewrite is idempotent
    before = _sorted_pdf(spark.read.parquet(dirs["out"]))
    state_before = (
        spark.read.parquet(f"{dirs['state']}/v1").orderBy("jid").collect()
    )
    S.apply_step2_batch(
        spark, batch1, 1, accounting, dirs["state"], dirs["out"]
    )
    after = _sorted_pdf(spark.read.parquet(dirs["out"]))
    state_after = (
        spark.read.parquet(f"{dirs['state']}/v1").orderBy("jid").collect()
    )
    pd.testing.assert_frame_equal(before, after, check_exact=True)
    assert state_before == state_after

    # converged to the batch plan: (10+20)/2 cpuuser and h1,h2,h3
    metrics = spark.createDataFrame(
        FILES[0] + FILES[1], schema=FRESCO_LONG
    )
    want = _sorted_pdf(join_and_widen(metrics, accounting))
    pd.testing.assert_frame_equal(
        after, want, check_exact=False, rtol=1e-12
    )


def test_streaming_step3_finalize_matches_batch(spark, tmp_path):
    """Streaming finalize over arriving wide files equals batch
    finalize on the same rows; replays are exactly-once."""
    from stampede_to_fresco_etl_spark.pipeline.step3 import finalize
    from stampede_to_fresco_etl_spark.streaming.step3_stream import (
        run_step3_incremental,
    )

    rows = [
        ("IDjob123", "c1", "c1,c2", "alice"),
        ("job77", "c9", "c9", "bob"),
    ]
    schema = "jid string, host string, host_list string, username string"
    landing, out, ckpt = (str(tmp_path / d) for d in ("l", "o", "c"))

    for i, r in enumerate(rows):
        spark.createDataFrame([r], schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        q = run_step3_incremental(
            spark, landing, out, ckpt,
            spark.read.parquet(landing).schema, partition_col=None,
        )
        q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, finalize(
        spark.createDataFrame(rows, schema)).collect()))
    assert got == want
    assert got[0][0].startswith("JOB")  # ID stripped, job->JOB
    assert all(r[1].endswith("_S") and r[3].endswith("_S") for r in got)
