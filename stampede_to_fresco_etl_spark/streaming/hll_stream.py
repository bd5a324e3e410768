"""Streaming HyperLogLog distinct-count maintenance — k4's
cumulative-distinct series run incrementally over an unbounded
stream.

Batch mode (catalog `k2_hll_distinct` / `k4_hll_cumulative`) folds
per-day register maxima; a stream maintains the SAME registers
continuously.  The state is sharded BY REGISTER: the group key is
the HLL bucket (md5 low bits), so each of the 2^p groups carries ONE
integer of state (its register's running maximum) and updates in
parallel — there is no single-key bottleneck and no per-user state.
An output row is emitted only when a register's maximum RISES, so
the sink sees a monotone, idempotent update stream: the current
cardinality estimate is one fold over the latest value per bucket
(estimate arithmetic identical to the batch queries, so
batch ≡ stream is exact — proved register-for-register by
tests/test_streaming_hll.py).

Scale notes: state is 2^p ints total (one per group) regardless of
stream length or user cardinality; the bucket/rho projection is
stateless vectorized column math BEFORE the shuffle; the stateful
shuffle is keyed by bucket — 2^p keys spread across executors.  At
100 TB/day this is the standard sketch-maintenance topology: tiny
sharded state, mergeable, and the serving side reads `max(m) per b`
from the sink at any time for an as-of estimate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from stampede_to_fresco_etl_spark.functions import md5_int63

HLL_P = 7
HLL_M = 1 << HLL_P
HLL_WBITS = 60 - HLL_P
HLL_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << 52)

HLL_OUTPUT = StructType(
    [
        StructField("b", LongType(), False),
        StructField("m", IntegerType(), False),
    ]
)

HLL_STATE = StructType([StructField("m", IntegerType(), True)])


def hll_register_projection(
    df: DataFrame, id_col: str = "user_id", salt: str = "hllts"
) -> DataFrame:
    """(b, r): HLL bucket and rank for each row — the stateless
    vectorized projection shared by the batch queries and the
    stream (identical arithmetic to catalog k2/k4)."""
    h = md5_int63(F.col(id_col), salt=salt)
    w = F.shiftright(h, HLL_P)
    rho = (
        F.when(w > 0, F.lit(HLL_WBITS + 1) - F.length(F.bin(w)))
        .otherwise(F.lit(HLL_WBITS + 1))
        .cast("int")
    )
    return df.select(
        F.pmod(h, F.lit(HLL_M)).alias("b"), rho.alias("r")
    )


def streaming_hll_registers(
    ids: DataFrame, id_col: str = "user_id", salt: str = "hllts"
) -> DataFrame:
    """ids: streaming frame containing `id_col`.  Emits (b, m) rows
    whenever register b's maximum rises; the latest m per b is the
    current register state."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (b,) = key
        cur = state.get[0] if state.exists else 0
        mx = cur
        for pdf in pdfs:
            if len(pdf):
                mx = max(mx, int(pdf["r"].max()))
        if mx > cur:
            state.update((int(mx),))
            yield pd.DataFrame(
                {
                    "b": pd.Series([b], dtype="int64"),
                    "m": pd.Series([mx], dtype="int32"),
                }
            )

    return (
        hll_register_projection(ids, id_col=id_col, salt=salt)
        .groupBy("b")
        .applyInPandasWithState(
            update,
            outputStructType=HLL_OUTPUT,
            stateStructType=HLL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def estimate_from_registers(registers: dict[int, int]) -> float:
    """The raw HLL estimate from {bucket: max rank} — identical
    arithmetic to the batch queries' fold.

    m is clamped to 52 before the shift: rank can reach
    HLL_WBITS + 1 = 54 (a 53-bit hash window of 0 or 1 — probability
    ~2^-52 per hash), where `1 << (52 - m)` would go negative and
    raise instead of degrading (ADVICE r7).  The clamp floors such a
    register's contribution at 1/2^52 — within the estimator's noise
    for an event this rare.  The batch k2/k4 shiftleft expressions
    share the same latent edge; Spark's shiftleft on a negative count
    wraps (mod 64) rather than raising, so the clamp is noted beside
    them rather than applied."""
    s_used = sum(1 << (52 - min(m, 52)) for m in registers.values())
    s_total = s_used + (HLL_M - len(registers)) * (1 << 52)
    return HLL_NUM / float(s_total)
