"""Chained streaming golden test: raw node CSVs → incremental step-1
→ incremental step-2 → incremental step-3, each stage a Structured
Streaming query reading the previous stage's sink — the whole
reference pipeline running continuously — compared against the batch
path (transform_node_data → join_and_widen → finalize) on the same
rows.

Chaining notes exercised here:
  - step-2 reads step-1's per-metric/date-partitioned sink tree via
    recursiveFileLookup (Timestamp lives in rows, date only in dirs);
  - step-3 streams over step-2's output AFTER the step-2 drain: the
    wide table is overwrite-maintained (dynamic month partitions), so
    a long-lived deployment re-finalizes rewritten months from
    step-2's touched-month records instead of a file stream — the
    single-drain chain here is the converged case.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import Row

from stampede_to_fresco_etl_spark.pipeline.step1 import transform_node_data
from stampede_to_fresco_etl_spark.pipeline.step2 import (
    join_and_widen,
    parse_accounting,
)
from stampede_to_fresco_etl_spark.pipeline.step3 import finalize
from stampede_to_fresco_etl_spark.schemas import (
    BLOCK_RAW,
    CPU_RAW,
    LLITE_RAW,
    MEM_RAW,
    OUTPUT_COLUMNS,
)
from stampede_to_fresco_etl_spark.streaming.step1_stream import (
    read_fresco_output,
    run_step1_incremental,
)
from stampede_to_fresco_etl_spark.streaming.step2_stream import (
    run_step2_incremental,
)
from stampede_to_fresco_etl_spark.streaming.step3_stream import (
    run_step3_incremental,
)
from tests.test_streaming_step1 import WAVES, _drain, _write_wave


def acct_row():
    f = "%m/%d/%Y %H:%M:%S"
    start = dt.datetime(2013, 3, 1, 10, 0, 0)
    end = dt.datetime(2013, 3, 1, 10, 1, 0)
    return Row(jobID="job1", user="alice", account="acc", jobname="jn",
               queue="normal", nnodes=1, ncpus=16, walltime=3600,
               start=start.strftime(f), end=end.strftime(f),
               submit=(start - dt.timedelta(minutes=5)).strftime(f),
               exit_status="0")


def _sorted_pdf(df):
    pdf = df.select(*OUTPUT_COLUMNS).toPandas()
    pdf = pdf.sort_values(["jid", "host", "time"], ignore_index=True)
    for c in pdf.columns:
        if pdf[c].dtype.kind == "M":
            pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf


def test_three_stage_streaming_chain_equals_batch(spark, tmp_path):
    landing = tmp_path / "raw"
    long_out = str(tmp_path / "long")
    wide_out = str(tmp_path / "wide")
    final_out = str(tmp_path / "final")
    ck1, ck2, ck3 = (str(tmp_path / c) for c in ("ck1", "ck2", "ck3"))
    state = str(tmp_path / "state")

    accounting = parse_accounting(spark.createDataFrame([acct_row()]))

    # stage 1: two CSV waves drain through incremental step-1
    for wave in WAVES:
        _write_wave(landing, wave)
        _drain(run_step1_incremental(spark, str(landing), long_out, ck1))

    # stage 2: incremental step-2 over step-1's sink tree
    q2 = run_step2_incremental(
        spark, long_out, accounting, state, wide_out, ck2,
        recursive=True,
    )
    q2.awaitTermination(120)

    # stage 3: incremental step-3 over the (converged) wide table
    wide_schema = spark.read.parquet(wide_out).schema
    q3 = run_step3_incremental(
        spark, wide_out, final_out, ck3, wide_schema,
    )
    q3.awaitTermination(120)

    got = _sorted_pdf(spark.read.parquet(final_out))

    # batch path on the same raw rows
    def rd(schema, name):
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .csv(f"{landing}/*/{name}*.csv")
        )

    long_batch = transform_node_data(
        block=rd(BLOCK_RAW, "block"),
        cpu=rd(CPU_RAW, "cpu"),
        llite=rd(LLITE_RAW, "llite"),
        mem=rd(MEM_RAW, "mem"),
    )
    want = _sorted_pdf(finalize(join_and_widen(long_batch, accounting)))

    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)
    # the finalizers really ran on the streamed output (jid was
    # already digit-normalized upstream, so only the suffix applies)
    assert all(got["jid"].str.endswith("_S"))
    assert all(got["host"].str.endswith("_S"))
    assert all(got["username"].str.endswith("_S"))


def test_chain_crash_between_step2_commit_and_step3_pickup(spark, tmp_path):
    """Chain-level crash-replay (VERDICT r4 item 6): the per-stage
    crash tests each kill ONE stage; this kills the whole chain at its
    most delicate seam — stage-2 has COMMITTED its state snapshot for
    a micro-batch but the offset is not yet committed, and stage-3 has
    not picked anything up — then restarts all three stages and
    requires exact convergence to the batch golden.

    What must compose correctly across the restart: step-1's file
    source re-lists and drains nothing new (its sink is already
    complete); step-2 REPLAYS the crashed batch id against
    already-committed state — the versioned-marker protocol must take
    the skip-merge path, not double-count — then drains the remaining
    batches and overwrites the touched months; step-3's first pickup
    then finalizes the CONVERGED wide table exactly once."""
    landing = tmp_path / "raw"
    long_out = str(tmp_path / "long")
    wide_out = str(tmp_path / "wide")
    final_out = str(tmp_path / "final")
    ck1, ck2, ck3 = (str(tmp_path / c) for c in ("ck1", "ck2", "ck3"))
    state = str(tmp_path / "state")

    accounting = parse_accounting(spark.createDataFrame([acct_row()]))

    # stage 1: both CSV waves drain through incremental step-1
    for wave in WAVES:
        _write_wave(landing, wave)
        _drain(run_step1_incremental(spark, str(landing), long_out, ck1))

    # stage 2, first attempt: the chain dies after micro-batch 0's
    # state commit — before its offset commits, and before stage-3
    # ever starts
    class Boom(Exception):
        pass

    crashed = {"done": False}

    def hook(batch_id):
        if batch_id == 0 and not crashed["done"]:
            crashed["done"] = True
            raise Boom("chain killed after step-2 state commit")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    q2 = run_step2_incremental(
        spark, long_out, accounting, state, wide_out, ck2,
        recursive=True, max_files_per_trigger=1, batch_hook=hook,
    )
    with pytest.raises(StreamingQueryException):
        q2.awaitTermination(120)
    assert crashed["done"]

    # restart ALL THREE stages
    _drain(run_step1_incremental(spark, str(landing), long_out, ck1))
    q2b = run_step2_incremental(
        spark, long_out, accounting, state, wide_out, ck2,
        recursive=True, max_files_per_trigger=1,
    )
    q2b.awaitTermination(120)
    wide_schema = spark.read.parquet(wide_out).schema
    q3 = run_step3_incremental(
        spark, wide_out, final_out, ck3, wide_schema,
    )
    q3.awaitTermination(120)

    got = _sorted_pdf(spark.read.parquet(final_out))

    def rd(schema, name):
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .csv(f"{landing}/*/{name}*.csv")
        )

    long_batch = transform_node_data(
        block=rd(BLOCK_RAW, "block"),
        cpu=rd(CPU_RAW, "cpu"),
        llite=rd(LLITE_RAW, "llite"),
        mem=rd(MEM_RAW, "mem"),
    )
    want = _sorted_pdf(finalize(join_and_widen(long_batch, accounting)))

    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)
    # replay idempotence: the suffix applied exactly once, and no
    # duplicate (jid, host, time) rows survived the crash-replay
    assert all(got["jid"].str.endswith("_S"))
    assert not any(got["jid"].str.endswith("_S_S"))
    assert not got.duplicated(["jid", "host", "time"]).any()
