"""As-of (nearest-preceding-event) join — the temporal-enrichment
operator Spark's join planner lacks natively.

The reference joins metrics to the accounting record whose interval
CONTAINS the sample (step-2/consumer.py:340-394); the as-of variant —
"attach the most recent right-side row at or before my timestamp" —
is the other canonical telemetry enrichment (config pushes, state
changes, checkpoints).  A naive formulation (`l.ts >= r.ts` as the
only non-equi predicate + row_number) degenerates to a
BroadcastNestedLoopJoin plus a per-key mega-partition.

Spark-first formulation: UNION + single ordered window.

    union(left tagged 0, right tagged 1)
      → Window.partitionBy(key).orderBy(ts, tag DESC, tiebreak)
      → last non-null right payload via last(ignorenulls=True)
      → keep left rows

One shuffle, keyed by the join key (high cardinality → even spread);
no nested loop, no per-key funnel.  Right rows sort BEFORE left rows
at an equal timestamp, giving the inclusive `r.ts <= l.ts` semantic.
This is the standard distributed as-of shape (kdb/duckdb ASOF JOIN
re-expressed as a merge); DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_sec: float | None = None,
    how: str = "left",
) -> DataFrame:
    """Attach, to every left row, the latest right row with
    ``right.ts <= left.ts`` for the same key.

    value_cols: right-side columns to carry over (emitted as-is, plus
    ``asof_ts`` = the matched right timestamp).
    tolerance_sec: if set, matches older than the tolerance are
    nulled (kdb ``wj``-style staleness bound).
    how: 'left' keeps unmatched left rows (null payload); 'inner'
    drops them.

    The right side must be unique per (key, right_ts) — pre-aggregate
    otherwise, or which same-instant row wins is undefined (the same
    caveat DuckDB's ASOF JOIN carries).

    NULL join keys never match (SQL / DuckDB ASOF semantics): null-key
    right rows are dropped, and null-key left rows bypass the window
    entirely — emitted unmatched under ``how='left'``, dropped under
    ``'inner'``.  The bypass also keeps every null-key row out of the
    single ``partitionBy(NULL)`` mega-partition the window would
    otherwise funnel them into.
    """
    lcols = left.columns
    any_key_null = None
    for k in key_cols:
        cond = F.col(k).isNull()
        any_key_null = cond if any_key_null is None else (any_key_null | cond)
    left_null = left.filter(any_key_null)
    left = left.filter(~any_key_null)
    right = right.filter(~any_key_null)
    payload = F.when(
        F.col("__tag") == 1,
        F.struct(F.col(right_ts).alias("ts"), *[F.col(c) for c in value_cols]),
    )

    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__tag", F.lit(0)
    )
    r_tagged = right.withColumn("__ts", F.col(right_ts)).withColumn(
        "__tag", F.lit(1)
    )
    # align schemas: each side gets the other's missing columns as nulls
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts"), F.col("__tag").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m", F.last(payload, ignorenulls=True).over(w)
    ).filter(F.col("__tag") == 0)

    out = matched.select(
        *lcols,
        F.col("__m.ts").alias("asof_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )
    if tolerance_sec is not None:
        fresh = (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("asof_ts"))
        ) <= F.lit(int(tolerance_sec * 1_000_000))
        out = out.select(
            *lcols,
            *[
                F.when(fresh, F.col(c)).alias(c)
                for c in ["asof_ts", *value_cols]
            ],
        )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    else:
        # null-key left rows re-enter unmatched (asof_ts/payload null)
        out = out.unionByName(left_null, allowMissingColumns=True)
    return out
