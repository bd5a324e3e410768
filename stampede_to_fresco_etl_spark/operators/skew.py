"""Skew & co-location tools for 100 TB runs.

Two mechanisms the engine leans on when AQE's automatic skew-join
splitting isn't enough (SURVEY §4 / M6):

  - **two-phase salted aggregation**: a hot grouping key (one job
    with 10⁸ metric rows) overloads a single reducer; salting splits
    it across `salt` partial groups, then a second tiny aggregation
    merges partials.  Exact for decomposable aggregates (sum, count,
    min, max).
  - **salted broadcast-side replication join**: for a skewed equi-join
    where the build side is small, replicate each build row `salt`
    times and key the probe side by a deterministic salt so one hot
    key fans across `salt` reducers.  (With AQE skew-join on this is
    rarely needed; kept for the aggregation-skew case AQE does not
    cover.)

Salts are deterministic (pmod of xxhash64 over row identity), never
rand(): retries and speculative tasks must agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Aggregates that decompose as agg(agg(partials)) == agg(all).
_MERGE = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    aggs: output_name -> (fn, column) with fn in {sum, count, min,
    max}.  count is summed at merge.  Result equals the direct
    groupBy exactly (integer/decomposable aggregates only — don't put
    avg here, express it as sum/count).
    """
    salt_col = (
        salt_on
        if salt_on is not None
        else F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(salt))
    )
    partial_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{out}"))
        elif fn in _MERGE:
            partial_exprs.append(_MERGE[fn](col).alias(f"__p_{out}"))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    partial = df.withColumn("__salt", salt_col).groupBy(
        *keys, "__salt"
    ).agg(*partial_exprs)

    merge_exprs = []
    for out, (fn, _col) in aggs.items():
        merge_fn = F.sum if fn == "count" else _MERGE[fn]
        merge_exprs.append(merge_fn(f"__p_{out}").alias(out))
    return partial.groupBy(*keys).agg(*merge_exprs)


def replicate_salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: replicate the small build side `salt` times,
    give each probe row a deterministic salt, join on (key, salt).
    Row multiplicity is exactly preserved (each probe row matches the
    single replica carrying its salt)."""
    build_rep = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    probe_s = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt)),
    )
    out = probe_s.join(build_rep, on=[key, "__salt"], how=how)
    return out.drop("__salt")
