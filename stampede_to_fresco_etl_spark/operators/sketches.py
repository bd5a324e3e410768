"""Cardinality sketches for corpus statistics at 100 TB.

KMV (k-minimum-values) distinct counting: hash every value with a
cryptographic hash, keep the k smallest hashes per group, and
estimate |distinct| from the k-th order statistic u_(k) as
(k-1) / (u_(k) / 2^60) (md5_int63 hashes span 60 bits).  (Bar-Yossef et al. '02 "Counting distinct
elements in a data stream"; the KMV form is Beyer et al. SIGMOD '07.)

Why not approx_count_distinct (HLL)?  Spark's HLL is
engine-specific — its estimate is not reproducible outside Spark and
can change across versions.  KMV with an md5-derived hash is
deterministic BY CONSTRUCTION: the sketch (the k hashes) and the
estimate are bit-identical in any engine, so the whole operator is
oracle-checkable, auditable, and mergeable (union-of-sketches =
sketch-of-union — take the k smallest of the union).

Scale: the expensive step is reducing n rows to k order statistics
per group.  That is the same shape as ANN top-k, so it reuses
similarity.partial_topk's salted two-stage window — per-shard top-k
then a tiny re-rank — never a per-group mega-partition, never a
collect_set of the whole hash universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import md5_int63

#: The hash-space width used to normalize the k-th order statistic.
#: md5_int63 yields 15 hex digits = 60 bits, so hashes are uniform in
#: [0, 2^60) — 2^60 exactly as a double.
_HASH_SPACE = 1152921504606846976.0


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group_col, exact_distinct, sketch_size, kth_hash,
    est_distinct).  `exact_distinct` rides along for error
    measurement (it reuses the same distinct shuffle); at 100 TB a
    caller would drop it and keep only the sketch aggregation.
    Groups with fewer than k distinct values fall back to the exact
    count (the sketch holds the whole universe)."""
    from stampede_to_fresco_etl_spark.operators.similarity import partial_topk

    hashed = df.select(
        F.col(group_col),
        md5_int63(F.col(value_col), salt="kmv").alias("h"),
    ).distinct()
    # k smallest hashes == top-k by negated hash; ties impossible
    # post-distinct, id tie-breaker is the hash itself.
    scored = hashed.select(group_col, "h", (-F.col("h")).alias("neg"))
    top = partial_topk(scored, group_col, "h", k, sim_col="neg")
    sketch = top.groupBy(group_col).agg(
        F.max("h").alias("kth_hash"),
        F.count("*").alias("sketch_size"),
    )
    exact = hashed.groupBy(group_col).agg(
        F.count("*").alias("exact_distinct")
    )
    est = F.when(
        F.col("exact_distinct") >= k,
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
        / F.col("kth_hash").cast("double"),
    ).otherwise(F.col("exact_distinct").cast("double"))
    return (
        exact.join(sketch, group_col)
        .select(
            group_col,
            "exact_distinct",
            "sketch_size",
            "kth_hash",
            est.alias("est_distinct"),
        )
    )
