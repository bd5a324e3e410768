"""Long→wide pivot with fixed schema — SURVEY §2.4 A6/A7.

The reference pivots Event values into columns then spends ~30 lines
backfilling typed null columns for events that never occurred
(step-2/consumer.py:438-442,527-548).  Passing the explicit value list
to Spark's pivot fixes the schema by construction AND skips the extra
distinct-scan job Spark otherwise runs — both a correctness and a
scale win (SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.schemas import FRESCO_EVENTS


def pivot_events(
    df: DataFrame,
    group_cols: list[str],
    event_col: str = "Event",
    value_col: str = "avg_value",
    events: list[str] | None = None,
    prefix: str = "value_",
    agg: str = "first",
) -> DataFrame:
    """Pivot event rows into `value_<event>` columns with a stable,
    fully-typed schema.  Missing events yield typed null columns
    automatically (SURVEY §7.3 trap 6)."""
    events = events if events is not None else FRESCO_EVENTS
    agg_expr = getattr(F, agg)(value_col)
    wide = df.groupBy(*group_cols).pivot(event_col, events).agg(agg_expr)
    for e in events:
        wide = wide.withColumnRenamed(e, f"{prefix}{e}")
    return wide


def with_null_column(df: DataFrame, name: str, dtype: str = "double") -> DataFrame:
    """Typed always-null column — `value_gpu` (no GPU data on
    Stampede; step-2/consumer.py:489-490, SURVEY §7.3 trap 10)."""
    return df.withColumn(name, F.lit(None).cast(dtype))
