"""Derive a larger scale factor from the driver's sf0.1 testdata by
key-offset replication (SCALE.md §sf1 rehearsal).

The driver's generator is not available, so sfN ≈ sf0.1 × N replicas
with foreign keys kept consistent (facts replicate with per-table key
strides; region/nation dims stay single-copy, so dim joins keep their
selectivity).  Two tables need content transforms so similarity
structure scales LINEARLY instead of quadratically across replicas:

  - documents: every token gets a per-replica suffix (a token
    bijection preserves every within-replica shingle-set size and
    intersection EXACTLY, while cross-replica Jaccard drops to 0 —
    without this, 10 copies of each text mean 45 extra exact-dup
    pairs per doc and the near-dup pair space grows 100×, a data
    artifact, not an engine property).
  - embeddings: per-replica cyclic dimension rotation (orthogonal ⇒
    all within-replica cosines preserved; cross-replica pairs
    decorrelate).

Replica 0 is byte-identical to sf0.1, so every sf0.1 result is a
subset of the scaled corpus' replica-0 slice.

Run:  python scripts/make_sf_scaled.py [factor] [out_dir]
Default: 10 → /root/repo/testdata_sf1 (gitignored).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from stampede_to_fresco_etl_spark.catalog import load  # noqa: E402
from stampede_to_fresco_etl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

#: per-table key strides (≳10× the sf0.1 max key, so replicas never
#: collide and keys stay recognizably grouped per replica)
STRIDE = {
    "c_custkey": 100_000,
    "o_orderkey": 1_000_000,
    "o_custkey": 100_000,
    "l_orderkey": 1_000_000,
    "l_partkey": 100_000,
    "l_suppkey": 10_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
    "doc_id": 100_000,
    "vec_id": 10_000,
}

FACT_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]
DIM_TABLES = ["region", "nation"]


def replicate(df, factor: int):
    rep = df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    for c in df.columns:
        if c in STRIDE:
            rep = rep.withColumn(c, F.col(c) + F.col("__r") * STRIDE[c])
    return rep


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    spark = get_spark(app_name="make-sf-scaled")
    spark.sparkContext.setLogLevel("ERROR")

    for name in DIM_TABLES:
        load(spark, SRC, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    for name in FACT_TABLES:
        df = load(spark, SRC, name)
        rep = replicate(df, factor)
        if name == "documents":
            # token bijection per replica: suffix every token; doc 0
            # keeps the original text
            rep = rep.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(
                                w, F.lit("r"), F.col("__r").cast("string")
                            ),
                        ),
                        " ",
                    )
                ),
            ).withColumn("n_chars", F.length("text"))
        elif name == "embeddings":
            # cyclic rotation by replica index (orthogonal transform)
            n = F.size("embedding")
            rep = rep.withColumn(
                "__k", F.col("__r") % n
            ).withColumn(
                "embedding",
                F.when(F.col("__k") == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice(
                            F.col("embedding"),
                            F.col("__k") + F.lit(1),
                            n - F.col("__k"),
                        ),
                        F.slice(F.col("embedding"), F.lit(1), F.col("__k")),
                    )
                ),
            ).drop("__k")
        (
            rep.drop("__r")
            .repartition(32)
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(f"{out}/{name}.parquet")
        )
        print(name, "done")


if __name__ == "__main__":
    main()
