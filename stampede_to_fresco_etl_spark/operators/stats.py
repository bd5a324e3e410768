"""Table statistics collection — the ANALYZE pass a 100 TB lakehouse
runs so planners (and humans) can size joins, pick broadcast sides,
and prune scans without touching the data again.

One full scan computes every column's row/null/distinct counts and
min/max in a single aggregation job; the long-form result (one row
per column) then comes from an in-row `stack` unpivot of the 1-row
aggregate — no second pass, no per-column jobs.

Distinct counts are EXACT (`count(distinct)`) here because the stats
table doubles as an oracle-checkable query; Spark expands multiple
exact distincts into one Expand-based pass (data × #cols rows through
the shuffle).  At 100 TB swap `exact_ndv=False` to
`approx_count_distinct` (HLL, one pass, ~2% error) — the estimate is
engine-specific, which is fine for planner stats and wrong for
oracles, hence the switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_ndv: bool = True,
) -> DataFrame:
    """Per-column stats in long form: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) — one row per requested column.

    min/max are cast to double, so `cols` must be numeric/castable
    (string-typed min/max would need engine-specific formatting to
    compare, which is exactly what a stats oracle cannot tolerate)."""
    cols = cols or [
        c for c, t in df.dtypes
        if t in ("int", "bigint", "double", "float", "smallint", "tinyint")
    ]
    ndv = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            ndv(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select("column", "n_rows", "n_nulls", "n_distinct",
             "min_value", "max_value")


def group_zscore(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "z",
    scale: float = 10000.0,
) -> DataFrame:
    """Per-group z-score feature normalization — the standard scaling
    step before training on numeric features, as one group aggregate
    + one broadcast-back join (no window; group stats are one row per
    group, so the join side is dimension-sized at any corpus scale).

    Cross-engine exact by the repo's floor-scaling recipe: values are
    floor-scaled to integers (4 implied decimals), whose per-group
    sum S and sum-of-squares Q are EXACT integers in any engine
    (decimal-summed here, HUGEINT in DuckDB); mean and population std
    then derive from (S, Q, n) with the identical double expression
    mean = S/n, var = Q/n − mean², so every engine rounds the same
    way.  Zero-variance groups yield NULL (nullif guard), matching
    SQL semantics.

    The z is computed on the SCALED integers — the scale factor
    cancels in (x − μ)/σ, so the result equals the z-score of the
    floor-scaled values (documented quantization: values are read at
    4-decimal precision, the same contract every fsum query uses).
    """
    xs = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    scaled = df.withColumn("__xs", xs)
    stats = scaled.groupBy(*group_cols).agg(
        F.count("__xs").alias("__n"),
        F.sum("__xs").alias("__s"),
        F.sum(F.col("__xs").cast("decimal(38,0)") * F.col("__xs"))
        .cast("double")
        .alias("__q"),
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    var = F.col("__q") / F.col("__n").cast("double") - mean * mean
    enriched = scaled.join(F.broadcast(stats), group_cols)
    z = (F.col("__xs").cast("double") - mean) / F.nullif(
        F.sqrt(var), F.lit(0.0)
    )
    return enriched.withColumn(out_col, z).drop("__xs", "__n", "__s", "__q")
