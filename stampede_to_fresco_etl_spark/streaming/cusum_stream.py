"""Streaming CUSUM drift detection — w11's change-point statistic
run incrementally over an unbounded stream.

Batch mode (catalog `w11_cusum_drift`) computes
S_t = P_t − min(0, min_{i≤t} P_i) with two running windows; a stream
cannot window over history it no longer holds.  But the identity
needs only TWO integers of state per key — the running prefix sum
P_t and its running minimum — so `applyInPandasWithState` carries
exactly that pair across micro-batches and every arriving event
emits its S_t and alarm flag continuously.

Calibration (the robust target/slack med2/mad2 per key, ×2 integer
scale as in the batch query) is computed OFFLINE on history and
passed in as a plain dict — the standard split for drift monitors:
the baseline is a batch artifact, the detector is the stream.  An
event whose key has no calibration is ignored (emitting S_t against
a zero baseline would alarm on every row).

Scale notes: state is two bigints per key (event_type cardinality —
tiny); the path-dependence CUSUM needs is exactly why this is a
stateful operator and not a windowed aggregate.  Arrow batches keep
the per-row loop vectorizable in blocks; rows are processed in
(ts_us, event_id) order within each batch, so chronological file
arrival gives the exact batch semantics (proved by the
batch≡stream test).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CUSUM_OUTPUT = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("cusum", DoubleType(), True),
        StructField("drift_flag", BooleanType(), True),
    ]
)

#: state: (running prefix sum P_t, running min of P, last processed
#: event time) per key.  last_ts guards the recurrence against
#: out-of-order arrival: CUSUM is path-dependent, so folding a late
#: event into S_t would silently corrupt every subsequent value of
#: the key.  Late rows are emitted with NULL statistic instead
#: (degrade detectably, not silently).
CUSUM_STATE = StructType(
    [
        StructField("pt", LongType(), True),
        StructField("minp", LongType(), True),
        StructField("last_ts", LongType(), True),
    ]
)


def streaming_cusum(
    events: DataFrame,
    calibration: dict[str, tuple[int, int]],
    threshold_mads: int = 6,
) -> DataFrame:
    """events: streaming frame with (event_id long, event_type
    string, ts_us long, v long) — v floor-scaled ×10000 as
    everywhere in the catalog.  calibration: event_type →
    (med2, mad2) at ×2 scale, from the batch positional-median
    helper.  Emits one row per in-calibration event."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (et,) = key
        if et not in calibration:
            return
        med2, mad2 = calibration[et]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(
            ["ts_us", "event_id"], ignore_index=True
        )
        pt, minp, last_ts = (
            state.get if state.exists else (0, 0, -(1 << 62))
        )

        out_id, out_s2, late_id = [], [], []
        for eid, ts, v in zip(
            rows["event_id"], rows["ts_us"], rows["v"]
        ):
            # CUSUM is path-dependent: an event older than the last
            # processed one cannot be retro-folded into S_t without
            # corrupting every later value of this key.  Emit it
            # with a NULL statistic so out-of-order input degrades
            # DETECTABLY instead of silently.
            if int(ts) < last_ts:
                late_id.append(int(eid))
                continue
            last_ts = int(ts)
            pt += int(v) * 2 - med2 - mad2
            minp = min(minp, pt)
            out_id.append(int(eid))
            out_s2.append(pt - min(minp, 0))

        state.update((int(pt), int(minp), int(last_ts)))
        if out_id:
            s2 = pd.Series(out_s2, dtype="int64")
            yield pd.DataFrame(
                {
                    "event_id": pd.Series(out_id, dtype="int64"),
                    "event_type": et,
                    "cusum": s2 / 20000.0,
                    "drift_flag": s2 > threshold_mads * mad2,
                }
            )
        if late_id:
            yield pd.DataFrame(
                {
                    "event_id": pd.Series(late_id, dtype="int64"),
                    "event_type": et,
                    "cusum": pd.Series(
                        [None] * len(late_id), dtype="float64"
                    ),
                    "drift_flag": pd.Series(
                        [None] * len(late_id), dtype="object"
                    ),
                }
            )

    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=CUSUM_OUTPUT,
            stateStructType=CUSUM_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
