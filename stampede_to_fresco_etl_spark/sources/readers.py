"""Robust readers — SURVEY §2.1 S1-S4.

Reference behaviors re-expressed on Spark's reader options:
  - dtype overrides + null-token list + schema-subset tolerance
    (`_read_csv_robust`, step-1/data_processor.py:53-84) → explicit
    schema + nullValue options + PERMISSIVE mode;
  - lazy scans with pushdown (step-2/consumer.py:178-290) → Catalyst
    does projection/predicate pushdown automatically;
  - case-insensitive column resolution with renaming
    (step-2/consumer.py:244-260) → explicit lowercase-match rename.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Null tokens accepted in raw CSVs (step-1/data_processor.py:60-66).
NULL_VALUES = ["", "NA", "NULL", "null", "N/A"]


def read_csv_robust(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType,
    header: bool = True,
    select: list[str] | None = None,
) -> DataFrame:
    """CSV scan with explicit schema, null tokens, permissive
    bad-record handling, and optional column-subset projection
    (step-1/data_processor.py:53-84).  Missing files / empty files
    surface as empty DataFrames rather than errors when the glob
    matches nothing is left to the caller."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("nullValue", "NA")
    )
    df = reader.csv(paths)
    if select:
        present = set(df.columns)
        df = df.select(*[c for c in select if c in present])
    return df


def read_parquet_resolved(
    spark: SparkSession,
    paths: str | list[str],
    want_cols: list[str],
) -> DataFrame:
    """Parquet scan with case-insensitive column resolution: each
    wanted column is matched against the file's columns ignoring case
    and renamed to the canonical spelling
    (step-2/consumer.py:244-260)."""
    if isinstance(paths, str):
        paths = [paths]
    df = spark.read.parquet(*paths)
    lower_map = {c.lower(): c for c in df.columns}
    exprs = []
    for want in want_cols:
        actual = lower_map.get(want.lower())
        if actual is None:
            exprs.append(F.lit(None).alias(want))
        else:
            exprs.append(F.col(f"`{actual}`").alias(want))
    return df.select(*exprs)
