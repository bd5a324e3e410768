"""End-to-end golden test (SURVEY §5.2): synthetic raw node CSVs +
accounting CSV → step-1 → step-2 → step-3, compared against an
INDEPENDENT implementation of the same semantics in DuckDB SQL.

The fixture exercises the documented traps: multi-device rollup,
counter reset, first-sample drop, job-aligned buckets with a clamped
final interval, missing pivot events, job-id normalization, and the
step-3 string finalizers.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from stampede_to_fresco_etl_spark.pipeline.step1 import (
    process_block,
    process_mem,
    transform_node_data,
)
from stampede_to_fresco_etl_spark.pipeline.step2 import run_step2
from stampede_to_fresco_etl_spark.pipeline.step3 import finalize
from stampede_to_fresco_etl_spark.schemas import (
    ACCOUNTING_RAW,
    BLOCK_RAW,
    MEM_RAW,
    OUTPUT_COLUMNS,
)

BLOCK_CSV = [
    # job100/n1: two devices, +1024 total sectors over 10s, then reset
    ("job100", "n1", "03/01/2013 10:00:30", "sda", 1000.0, 0.0),
    ("job100", "n1", "03/01/2013 10:00:30", "sdb", 500.0, 500.0),
    ("job100", "n1", "03/01/2013 10:00:40", "sda", 1512.0, 0.0),
    ("job100", "n1", "03/01/2013 10:00:40", "sdb", 1012.0, 500.0),
    ("job100", "n1", "03/01/2013 10:00:50", "sda", 0.0, 0.0),  # reset
    ("job100", "n1", "03/01/2013 10:00:50", "sdb", 0.0, 0.0),
    # second interval after reset: +2048 over 70s (crosses buckets)
    ("job100", "n1", "03/01/2013 10:02:00", "sda", 2048.0, 0.0),
    ("job100", "n1", "03/01/2013 10:02:00", "sdb", 0.0, 0.0),
    # metric outside any job window
    ("job999", "n9", "03/01/2013 10:00:35", "sda", 5.0, 5.0),
]

MEM_CSV = [
    # job100/n2: gauges only (no cpu events on n2 -> pivot backfill)
    ("jobID100", "n2", "03/01/2013 10:00:45", 8.0 * 2**30, 4.0 * 2**30,
     4.0 * 2**30, 1.0 * 2**30),
    ("jobID100", "n2", "03/01/2013 10:01:45", 8.0 * 2**30, 7.0 * 2**30,
     1.0 * 2**30, 2.0 * 2**30),  # MemUsed < FilePages -> clip
]

ACCT_CSV = [
    # start 10:00:30, end 10:02:00 (exclusive) -> buckets :30/:90(clamped)
    ("100", "alice", "acctA", "jobA", "normal", 2, 32, 3600,
     "03/01/2013 10:00:30", "03/01/2013 10:02:00", "03/01/2013 09:55:30", "0"),
    # invalid: start == end -> dropped
    ("200", "bob", "acctB", "jobB", "debug", 1, 16, 60,
     "03/01/2013 10:01:00", "03/01/2013 10:01:00", "03/01/2013 10:00:00", "1"),
]

GOLDEN_SQL = r"""
WITH block_raw AS (
  SELECT * FROM df_block
),
block_parsed AS (
  SELECT jobID, node,
         strptime(ts_str, '%m/%d/%Y %H:%M:%S') AS ts,
         rd + wr AS sectors
  FROM (SELECT jobID, node, timestamp AS ts_str, rd_sectors AS rd,
               wr_sectors AS wr FROM block_raw)
),
block_rollup AS (
  SELECT jobID, node, ts, sum(sectors) AS total
  FROM block_parsed GROUP BY jobID, node, ts
),
block_delta AS (
  SELECT jobID, node, ts,
         total - lag(total) OVER w AS d,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0 AS dt
  FROM block_rollup
  WINDOW w AS (PARTITION BY jobID, node ORDER BY ts)
),
block_events AS (
  SELECT regexp_replace(regexp_replace(jobID, 'jobID', 'JOB', 'g'),
                        'job', 'JOB', 'g') AS jid_f,
         node AS host, ts,
         'block' AS event,
         GREATEST(d * 512.0 / dt / 1073741824.0, 0.0) AS value
  FROM block_delta
  WHERE d IS NOT NULL AND d >= 0 AND dt >= 0.1
),
mem_raw AS (SELECT * FROM df_mem),
mem_events AS (
  SELECT regexp_replace(regexp_replace(jobID, 'jobID', 'JOB', 'g'),
                        'job', 'JOB', 'g') AS jid_f,
         node AS host,
         strptime(timestamp, '%m/%d/%Y %H:%M:%S') AS ts,
         e.event,
         CASE e.event
           WHEN 'memused' THEN GREATEST(MemUsed / 1073741824.0, 0.0)
           ELSE GREATEST((MemUsed - FilePages) / 1073741824.0, 0.0)
         END AS value
  FROM mem_raw,
       (SELECT 'memused' AS event UNION ALL
        SELECT 'memused_minus_diskcache') e
),
events AS (
  SELECT * FROM block_events UNION ALL SELECT * FROM mem_events
),
acct AS (
  SELECT jobID, "user", account, jobname, queue, nnodes, ncpus, walltime,
         strptime(start, '%m/%d/%Y %H:%M:%S') AS jstart,
         strptime("end", '%m/%d/%Y %H:%M:%S') AS jend,
         strptime(submit, '%m/%d/%Y %H:%M:%S') AS jsubmit,
         exit_status,
         COALESCE(NULLIF(regexp_extract(jobID, '(\d+)$', 1), ''), jobID)
           AS jid
  FROM df_acct
  WHERE strptime(start, '%m/%d/%Y %H:%M:%S')
        < strptime("end", '%m/%d/%Y %H:%M:%S')
),
joined AS (
  SELECT e.*, a.jid, a."user" AS username, a.account, a.jobname, a.queue,
         a.nnodes, a.ncpus, a.walltime, a.jstart, a.jend, a.jsubmit,
         a.exit_status
  FROM (SELECT *,
          COALESCE(NULLIF(regexp_extract(jid_f, '(\d+)$', 1), ''), jid_f)
            AS m_jid
        FROM events) e
  JOIN acct a ON e.m_jid = a.jid
   AND e.ts >= a.jstart AND e.ts < a.jend
),
bucketed AS (
  SELECT *,
    epoch_us(jstart)
      + ((epoch_us(ts) - epoch_us(jstart))
         - ((epoch_us(ts) - epoch_us(jstart)) % 60000000)) AS lo_us
  FROM joined
),
bucketed2 AS (
  SELECT *, LEAST(lo_us + 60000000, epoch_us(jend)) AS hi_us FROM bucketed
),
hl AS (
  -- per accounting row (jid, start, end), empty hosts dropped
  SELECT jid, jstart, jend,
         string_agg(host, ',' ORDER BY host) AS host_list
  FROM (SELECT DISTINCT jid, jstart, jend, host FROM joined
        WHERE host IS NOT NULL AND host <> '')
  GROUP BY jid, jstart, jend
),
agg AS (
  SELECT jid, host, make_timestamp((lo_us + hi_us) // 2) AS time,
         jsubmit, jstart, jend, walltime, nnodes, ncpus, account, queue,
         jobname, exit_status, username, event,
         avg(value) AS avg_value
  FROM bucketed2
  GROUP BY ALL
)
SELECT make_timestamp(epoch_us(agg.time)) AS time,
       jsubmit AS submit_time, agg.jstart AS start_time,
       agg.jend AS end_time,
       walltime AS timelimit, nnodes AS nhosts, ncpus AS ncores,
       account, queue,
       host || '_S' AS host,
       regexp_replace(regexp_replace(agg.jid, 'ID', ''), 'job', 'JOB')
         || '_S' AS jid,
       jobname, exit_status AS exitcode,
       hl.host_list || '_S' AS host_list,
       username || '_S' AS username,
       avg(CASE WHEN event = 'cpuuser' THEN avg_value END) AS value_cpuuser,
       CAST(NULL AS DOUBLE) AS value_gpu,
       avg(CASE WHEN event = 'memused' THEN avg_value END) AS value_memused,
       avg(CASE WHEN event = 'memused_minus_diskcache' THEN avg_value END)
         AS value_memused_minus_diskcache,
       avg(CASE WHEN event = 'nfs' THEN avg_value END) AS value_nfs,
       avg(CASE WHEN event = 'block' THEN avg_value END) AS value_block
FROM agg JOIN hl ON agg.jid = hl.jid
                AND agg.jstart = hl.jstart AND agg.jend = hl.jend
GROUP BY ALL
"""


@pytest.fixture()
def golden():
    con = duckdb.connect()
    con.register("df_block", pd.DataFrame(
        BLOCK_CSV,
        columns=["jobID", "node", "timestamp", "device", "rd_sectors",
                 "wr_sectors"],
    ))
    con.register("df_mem", pd.DataFrame(
        MEM_CSV,
        columns=["jobID", "node", "timestamp", "MemTotal", "MemFree",
                 "MemUsed", "FilePages"],
    ))
    con.register("df_acct", pd.DataFrame(
        ACCT_CSV,
        columns=["jobID", "user", "account", "jobname", "queue", "nnodes",
                 "ncpus", "walltime", "start", "end", "submit",
                 "exit_status"],
    ))
    return con.sql(GOLDEN_SQL).df()


def test_pipeline_matches_independent_golden(spark, golden):
    block = spark.createDataFrame(
        [dict(zip(BLOCK_RAW.fieldNames(), r)) for r in BLOCK_CSV], BLOCK_RAW
    )
    mem = spark.createDataFrame(
        [dict(zip(MEM_RAW.fieldNames(), r)) for r in MEM_CSV], MEM_RAW
    )
    acct = spark.createDataFrame(
        [dict(zip(ACCOUNTING_RAW.fieldNames(), r)) for r in ACCT_CSV],
        ACCOUNTING_RAW,
    )
    metrics = transform_node_data(block=block, mem=mem)
    wide = finalize(run_step2(metrics, acct))
    assert wide.columns == OUTPUT_COLUMNS

    got = wide.toPandas()
    want = golden
    got = got[sorted(got.columns)].sort_values(
        by=["jid", "host", "time"], ignore_index=True
    )
    want = want[sorted(want.columns)].sort_values(
        by=["jid", "host", "time"], ignore_index=True
    )
    for c in got.columns:
        if str(want[c].dtype).startswith("datetime"):
            got[c] = pd.to_datetime(got[c]).astype("datetime64[us]")
            want[c] = want[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # spot-check the physics: block rate in bucket [10:00:30,10:01:30)
    r = got[(got.host == "n1_S")
            & (got.time == pd.Timestamp("2013-03-01 10:01:00"))]
    assert len(r) == 1
    expected_rate = 1024 * 512 / 10 / 2**30
    assert abs(r.iloc[0]["value_block"] - expected_rate) < 1e-12
    # mem clip row: memused_minus_diskcache clipped to 0 in bucket 2
    r2 = got[(got.host == "n2_S")
             & (got.time == pd.Timestamp("2013-03-01 10:01:45"))]
    assert len(r2) == 1
    assert r2.iloc[0]["value_memused_minus_diskcache"] == 0.0
    assert r2.iloc[0]["value_memused"] == 1.0
    # step-2 jid is the normalized digit string; step-3 appends _S
    # (the 'job'->'JOB' rules only fire for non-numeric fallback ids).
    # job999 metrics and job200 accounting must not appear.
    assert set(got["jid"]) == {"100_S"}
    assert (got["host_list"] == "n1,n2_S").all()
