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
from pyspark.sql.types import StringType, StructType

#: Null tokens accepted in raw CSVs (step-1/data_processor.py:63 —
#: ``null_values=["", "NA", "NULL"]``).
NULL_VALUES = ["", "NA", "NULL"]


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
    matches nothing is left to the caller.

    Null-token emulation: Spark's csv reader takes a single
    ``nullValue``, so the reference's multi-token list is reproduced
    as (a) the default empty-string → null rule, (b) PERMISSIVE
    parse-failure → null for non-string columns ("NA"/"NULL" don't
    parse as numbers), and (c) an explicit post-read token → null
    rewrite for string columns."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    df = reader.csv(paths)
    tokens = [t for t in NULL_VALUES if t]  # "" is the reader default
    string_cols = {
        f.name for f in schema.fields if isinstance(f.dataType, StringType)
    }
    df = df.select(
        *[
            F.when(~F.col(c).isin(tokens), F.col(c)).alias(c)
            if c in string_cols
            else F.col(c)
            for c in df.columns
        ]
    )
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
