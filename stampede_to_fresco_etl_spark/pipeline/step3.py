"""step-3 parity: string finalization of the wide table.

Reference: step-3/final_cleanup.py:22-96 — a 100-process in-place
parquet rewrite.  Spark shape (SURVEY §3.3): one job, four withColumn
transforms, write-aside (never in-place).  Per-file process pools
become task parallelism for free.

Semantics (final_cleanup.py:40-75):
  jid       : strip FIRST 'ID', FIRST 'job'→'JOB', append '_S'
  host      : append '_S'
  host_list : append '_S'   (applied to the whole comma-joined string,
              exactly as the reference does)
  username  : append '_S'
All replaces are first-occurrence (Polars .str.replace) — SURVEY §7.3
trap 8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from stampede_to_fresco_etl_spark.functions import finalize_jid, with_suffix


def finalize(df: DataFrame) -> DataFrame:
    out = df
    if "jid" in df.columns:
        out = out.withColumn("jid", finalize_jid("jid"))
    for c in ("host", "host_list", "username"):
        if c in df.columns:
            out = out.withColumn(c, with_suffix(c, "_S"))
    return out
