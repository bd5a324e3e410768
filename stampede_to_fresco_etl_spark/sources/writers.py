"""Sinks — SURVEY §2.1 S5-S7, S10.

The reference's hand-rolled atomic temp+rename appends, per-target
locks and daily-file merge daemons (step-1/appender.py:215-323,
step-1/mover.py) are replaced by Spark's committers + Hive-style
partitioned layout: one `write.partitionBy("date")` makes the daily
files, `mode("append")` makes incremental merge safe, and dynamic
partition overwrite makes reprocessing idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
    sort_within_partitions: list[str] | None = None,
) -> None:
    """zstd parquet sink with optional Hive partitioning and
    within-partition sort (keeps (job,node,ts) runs contiguous so
    downstream window shuffles read pre-clustered data —
    step-1/transformer.py:323; step-2/consumer.py:556-562)."""
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table — the
    co-located-join layout for repeated large joins on the same key
    (SURVEY M6: bucket metrics by jid/month so the step-2 join and
    re-derivations shuffle neither side).  Two tables bucketed the
    same way join with ZERO Exchange in the plan."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("compression", "zstd")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (rough-drafts/combine_transformed_monthly_data.py:119)."""
    df.write.mode(mode).option("header", "true").csv(path)


def convert_csv_to_parquet(
    spark, csv_path: str, parquet_path: str, schema=None
) -> bool:
    """CSV→Parquet conversion (S7,
    rough-drafts/combine_transformed_monthly_data.py:189-212).  The
    reference's write-temp/re-read-validate/atomic-replace dance is
    subsumed by Spark's output committer; we validate by re-reading
    the row count."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(csv_path)
    n = df.count()
    df.write.mode("overwrite").option("compression", "zstd").parquet(parquet_path)
    return spark.read.parquet(parquet_path).count() == n
