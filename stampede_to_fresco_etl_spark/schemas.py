"""Explicit StructTypes for every dataset the engine touches.

The reference declares schemas as dtype-override dicts passed to its
readers (step-1/data_processor.py:89-93,148-153,235-239,300-302;
step-2/consumer.py:184-189).  Production paths here never rely on
schema inference — explicit StructTypes give stable plans, full
predicate pushdown, and PERMISSIVE-mode bad-record handling.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Raw node-telemetry CSVs (step-1 inputs).  Timestamps arrive as strings
# in %m/%d/%Y %H:%M:%S and are parsed by the pipeline, mirroring
# step-1/data_processor.py:102 (non-strict parse → null → dropped).
# ---------------------------------------------------------------------------

def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


def _d(name: str) -> StructField:
    return StructField(name, DoubleType(), True)


#: block.csv — block-device cumulative I/O counters
#: (step-1/data_processor.py:89-93)
BLOCK_RAW = StructType(
    [_s("jobID"), _s("node"), _s("timestamp"), _s("device"),
     _d("rd_sectors"), _d("wr_sectors")]
)

#: cpu.csv — per-core cumulative jiffy counters
#: (step-1/data_processor.py:148-153)
JIFFY_COLS = ["user", "nice", "system", "idle", "iowait", "irq", "softirq"]
CPU_RAW = StructType(
    [_s("jobID"), _s("node"), _s("timestamp"), _s("device")]
    + [_d(c) for c in JIFFY_COLS]
)

#: llite.csv — Lustre client cumulative byte counters
#: (step-1/data_processor.py:235-239)
LLITE_RAW = StructType(
    [_s("jobID"), _s("node"), _s("timestamp"),
     _d("read_bytes"), _d("write_bytes")]
)

#: mem.csv — memory gauges in bytes (step-1/data_processor.py:300-302)
MEM_RAW = StructType(
    [_s("jobID"), _s("node"), _s("timestamp"),
     _d("MemTotal"), _d("MemFree"), _d("MemUsed"), _d("FilePages")]
)

# ---------------------------------------------------------------------------
# FRESCO long/EAV event table — the engine's central abstraction
# (step-1/data_processor.py:132-140).
# ---------------------------------------------------------------------------

FRESCO_EVENTS = ["cpuuser", "memused", "memused_minus_diskcache", "nfs", "block"]

FRESCO_LONG = StructType(
    [
        StructField("Job Id", StringType(), True),
        StructField("Host", StringType(), True),
        StructField("Timestamp", TimestampType(), True),
        StructField("Event", StringType(), True),
        StructField("Value", DoubleType(), True),
        StructField("Units", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Job-accounting CSV (step-2 input; schema dict step-2/consumer.py:184-189).
# start/end/submit arrive as strings (%m/%d/%Y %H:%M:%S) and are parsed.
# ---------------------------------------------------------------------------

ACCOUNTING_RAW = StructType(
    [
        _s("jobID"), _s("user"), _s("account"), _s("jobname"), _s("queue"),
        StructField("nnodes", LongType(), True),
        StructField("ncpus", LongType(), True),
        StructField("walltime", LongType(), True),
        _s("start"), _s("end"), _s("submit"),
        _s("exit_status"),
    ]
)

#: Parsed accounting table used by the join (timestamps materialized).
ACCOUNTING = StructType(
    [
        _s("jobID"), _s("user"), _s("account"), _s("jobname"), _s("queue"),
        StructField("nnodes", LongType(), True),
        StructField("ncpus", LongType(), True),
        StructField("walltime", LongType(), True),
        StructField("start", TimestampType(), True),
        StructField("end", TimestampType(), True),
        StructField("submit", TimestampType(), True),
        _s("exit_status"),
    ]
)

# ---------------------------------------------------------------------------
# Wide joined output — 21 fixed columns (OUTPUT_COLUMNS,
# step-2/consumer.py:29-34; row template step-2/etl_utils.py:24-54).
# ---------------------------------------------------------------------------

OUTPUT_COLUMNS = [
    "time", "submit_time", "start_time", "end_time", "timelimit",
    "nhosts", "ncores", "account", "queue", "host", "jid", "jobname",
    "exitcode", "host_list", "username",
    "value_cpuuser", "value_gpu", "value_memused",
    "value_memused_minus_diskcache", "value_nfs", "value_block",
]

WIDE_OUTPUT = StructType(
    [
        StructField("time", TimestampType(), True),
        StructField("submit_time", TimestampType(), True),
        StructField("start_time", TimestampType(), True),
        StructField("end_time", TimestampType(), True),
        StructField("timelimit", LongType(), True),
        StructField("nhosts", LongType(), True),
        StructField("ncores", LongType(), True),
        _s("account"), _s("queue"), _s("host"), _s("jid"), _s("jobname"),
        _s("exitcode"), _s("host_list"), _s("username"),
        _d("value_cpuuser"), _d("value_gpu"), _d("value_memused"),
        _d("value_memused_minus_diskcache"), _d("value_nfs"), _d("value_block"),
    ]
)
