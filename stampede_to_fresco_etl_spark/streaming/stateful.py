"""Custom stateful streaming operator: the W1 lag-difference rate
kernel over an unbounded stream.

Batch mode derives rates with a window function (operators/rates.py);
a stream cannot — the previous sample of a (job, host) key may have
arrived in an earlier micro-batch.  `applyInPandasWithState` keeps
exactly that state: the last (timestamp, value) per key, so deltas
are continuous across micro-batch boundaries.

Semantics match the batch kernel (step-1/data_processor.py:113-129
edge rules): first sample of a key emits nothing; negative deltas
(counter reset) and Δt < min_dt are dropped — but still advance the
state, exactly like the batch `diff()` over the full series.

Scale notes: state is one (long, double) pair per live (job, host)
key — ~24 bytes × #active keys, bounded by cluster size × concurrent
jobs, not by history.  Arrow batches keep the Python exchange
vectorized.  State never expires here (NoTimeout) because HPC jobs
end and their keys stop arriving; add a ProcessingTimeTimeout to
reap dead keys if key cardinality is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from stampede_to_fresco_etl_spark.operators.rates import MIN_DT_SECONDS

RATE_OUTPUT = StructType(
    [
        StructField("job_id", StringType(), True),
        StructField("host", StringType(), True),
        StructField("ts_us", LongType(), True),
        StructField("rate_per_sec", DoubleType(), True),
    ]
)

#: state: last sample of the key that crossed previous batches
RATE_STATE = StructType(
    [
        StructField("last_ts_us", LongType(), True),
        StructField("last_value", DoubleType(), True),
    ]
)


def _rate_fn(min_dt: float, scale: float):
    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        job_id, host = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts_us", ignore_index=True)

        ts = rows["ts_us"].tolist()
        vals = rows["value"].tolist()
        if state.exists:
            last_ts, last_val = state.get
        else:
            last_ts, last_val = None, None

        out_ts, out_rate = [], []
        for t, v in zip(ts, vals):
            if last_ts is not None:
                dt = (t - last_ts) / 1_000_000.0
                delta = v - last_val
                if dt >= min_dt and delta >= 0:
                    out_ts.append(t)
                    out_rate.append(delta * scale / dt)
            # every sample advances the lag state, even when the rate
            # row is dropped (matches batch diff() semantics)
            last_ts, last_val = t, v

        if last_ts is not None:
            state.update((int(last_ts), float(last_val)))
        if out_ts:
            yield pd.DataFrame(
                {
                    "job_id": job_id,
                    "host": host,
                    "ts_us": out_ts,
                    "rate_per_sec": out_rate,
                }
            )

    return update


def streaming_rate(
    stream: DataFrame,
    key_cols: tuple[str, str] = ("Job Id", "Host"),
    ts_col: str = "Timestamp",
    value_col: str = "Value",
    min_dt: float = MIN_DT_SECONDS,
    scale: float = 1.0,
) -> DataFrame:
    """Continuous per-key rate stream from cumulative-counter events.

    Input: a streaming DataFrame with key columns + timestamp +
    value.  Output: (job_id, host, ts_us, rate_per_sec) rows in
    append mode, one per valid consecutive-sample pair — including
    pairs that straddle micro-batches."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_cols[0]).alias("job_id"),
        F.col(key_cols[1]).alias("host"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(value_col).alias("value"),
    )
    return prepared.groupBy("job_id", "host").applyInPandasWithState(
        _rate_fn(min_dt, scale),
        outputStructType=RATE_OUTPUT,
        stateStructType=RATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
