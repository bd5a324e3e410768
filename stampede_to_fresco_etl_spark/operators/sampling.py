"""Dataset-curation sampling for training-data pipelines:
deterministic stratified sampling and exact quantile thresholds.

Both operators avoid the two standard scale traps:
  - `df.sampleBy` / `rand()` are engine- and run-specific; curation
    decisions must be REPRODUCIBLE, so selection is ranked on a
    salted md5 of the row id (uniform, deterministic, replayable in
    any engine — the same trick as the dedup fingerprints);
  - per-stratum ranking via `Window.partitionBy(stratum)` funnels
    every stratum into one reducer; the sampler instead uses the
    salted two-stage window shape (`operators/similarity.
    partial_topk`'s pattern): rank within (stratum, input partition)
    — spread across all reducers, Tungsten sort — then re-rank the
    ≤ shards × n survivors.

Quantile thresholds use a fixed-resolution histogram (floor-scaled
buckets → groupBy count → per-stratum cumulative walk over at most
`resolution · score_range` bucket rows).  Exact at the stated
resolution in any engine — unlike `percentile_approx`, whose sketch
is engine-specific — and never materializes a stratum on one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import md5_int63


def _partial_min_n(
    df: DataFrame, group_col: str, id_col: str, rank_col: str, n: int
) -> DataFrame:
    """Bottom-n by (rank, id) per group as ONE rank window: the
    ``row_number() ≤ n`` filter gets Spark's ``WindowGroupLimit``
    Partial prune below the exchange, so each map task ships only its
    local bottom-n per group — the same reducer-side load as the
    r4–r12 hand-rolled salted two-stage form, minus its redundant
    (group, spark_partition_id()) exchange round (see
    similarity.partial_topk, r13).  Chosen over collect_list+
    array_sort truncation for the same measured reason as there
    (~60× slower on big groups).  All-long sort keys → exact order."""
    order = [F.col(rank_col), F.col(id_col)]
    w_final = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn(
            "sample_rank", F.row_number().over(w_final).cast("long")
        )
        .filter(F.col("sample_rank") <= n)
        .select(group_col, id_col, "sample_rank")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic n-per-stratum sample: the n rows whose salted
    md5(id) ranks smallest within each stratum.

    Changing `salt` draws an independent sample; the same salt always
    draws the same rows (curation decisions are replayable and
    auditable).  Output: (stratum, id, sample_rank ∈ [1, n])."""
    scored = df.select(
        F.col(stratum_col),
        F.col(id_col),
        md5_int63(F.col(id_col), salt=salt).alias("__h"),
    )
    return _partial_min_n(scored, stratum_col, id_col, "__h", n_per_stratum)


def quantile_thresholds(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q: float,
    resolution: int = 10_000,
) -> DataFrame:
    """Per-group q-quantile threshold, exact at 1/resolution score
    granularity: the smallest score bucket b = floor(score·res) whose
    cumulative count reaches ceil(q · n_group).

    Histogram (groupBy, map-side combined) + a window over the SMALL
    per-group bucket list — the group's raw rows never gather on one
    node.  Output: (group, threshold_bucket, n_group)."""
    b = df.select(
        F.col(group_col),
        F.floor(F.col(score_col) * F.lit(float(resolution)))
        .cast("long")
        .alias("__b"),
    )
    hist = b.groupBy(group_col, "__b").agg(F.count("*").alias("__c"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = hist.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(w_all)
    )
    reached = cum.filter(
        F.col("__cum") >= F.ceil(F.lit(float(q)) * F.col("__n"))
    )
    return reached.groupBy(group_col).agg(
        F.min("__b").alias("threshold_bucket"),
        F.first("__n").alias("n_group"),
    )


def quantile_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q: float,
    resolution: int = 10_000,
) -> DataFrame:
    """Keep rows whose score reaches their group's q-quantile bucket
    (e.g. q=0.75 → top quartile by quality score per language).  The
    tiny threshold table broadcasts; the data side stays a scan +
    filter."""
    th = quantile_thresholds(df, group_col, score_col, q, resolution)
    bucket = F.floor(F.col(score_col) * F.lit(float(resolution))).cast("long")
    return (
        df.withColumn("__b", bucket)
        .join(F.broadcast(th), group_col)
        .filter(F.col("__b") >= F.col("threshold_bucket"))
        .drop("__b", "threshold_bucket", "n_group")
    )


def pack_chunks(
    df: DataFrame,
    shard_cols: list[str],
    order_col: str,
    size_col,
    budget: int,
) -> DataFrame:
    """Sequence packing: assign ordered documents to fixed-budget
    training chunks by cumulative token count — the step that turns a
    curated corpus into model-ready sequences.

    Chunking rule: a doc starts a new chunk when the RUNNING TOTAL
    BEFORE it has crossed a budget boundary — chunk_id =
    floor((cumsum - size) / budget).  A chunk may overrun the budget
    by (at most) its final document; trainers truncate or wrap the
    tail.  This start-offset rule (rather than exact greedy bin
    packing, whose sequential remainder state doesn't distribute) is
    what makes the operator ONE window expression — and therefore
    engine-portable and exact.

    Scale: packing is inherently sequential WITHIN a shard, so the
    window partitions by `shard_cols` (a training shard: a language,
    a source, a date bucket — whatever the pipeline shards output
    by).  One reducer per shard is the contract, not a bug; at 100 TB
    you pack thousands of shards in parallel, never one global
    stream.  All arithmetic is integer (token counts), so any engine
    reproduces the same chunk ids.

    Output: df + (chunk_id, chunk_pos, cum_tokens)."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("cum_tokens", F.sum(size.cast("long")).over(w))
    chunk = F.floor(
        (F.col("cum_tokens") - size.cast("long"))
        / F.lit(int(budget))
    ).cast("long")
    out = out.withColumn("chunk_id", chunk)
    w_pos = Window.partitionBy(*shard_cols, "chunk_id").orderBy(order_col)
    return out.withColumn(
        "chunk_pos", F.row_number().over(w_pos).cast("long")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture sampling: keep each row with its
    domain's probability, decided by a salted md5 of the row id —
    the domain-reweighting step of a training-data pipeline (e.g.
    downsample web crawl, upsample reference text).

    Selection is `hash(id) < floor(weight * 2^60)`: a pure integer
    compare against a per-domain constant, so the SAME rows are kept
    on every run, on any engine, at any parallelism — re-running the
    pipeline with a tweaked mixture only moves the boundary, it
    doesn't reshuffle survivors.  No shuffle: scan + filter.

    Output: input rows that survive, plus the decision hash
    (audit column)."""
    h = md5_int63(F.col(id_col), salt=salt)
    hash_space = 1 << 60
    thresholds = {
        d: min(int(w * hash_space), hash_space) for d, w in weights.items()
    }
    expr = F.lit(int(default_weight * hash_space)).cast("long")
    for d in sorted(thresholds):
        expr = F.when(
            F.col(domain_col) == d, F.lit(thresholds[d]).cast("long")
        ).otherwise(expr)
    return df.withColumn("mix_hash", h).filter(
        F.col("mix_hash") < expr
    )


def dataset_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in a
    split by where its salted 60-bit md5 hash falls among cumulative
    fraction boundaries.  Membership is a pure function of the row id
    — stable under reprocessing, engine changes, and repartitioning,
    and growing one split's fraction only migrates rows across the
    moved boundary.  Scan + integer compares: no shuffle, no RNG.

    `fractions` maps split name → fraction; they must sum to ≤ 1
    (remainder rows get the LAST split listed — pass fractions that
    sum to 1 for a total partition).  Boundary order follows the
    dict's iteration order.

    Output: input rows + (split, split_hash)."""
    hash_space = 1 << 60
    h = md5_int63(F.col(id_col), salt=salt)
    out = df.withColumn("split_hash", h)
    names = list(fractions)
    cum = 0.0
    bounds: list[tuple[str, int]] = []
    for name in names[:-1]:
        cum += fractions[name]
        bounds.append((name, min(int(cum * hash_space), hash_space)))
    # build innermost-last so the chain checks the smallest cumulative
    # boundary first (earlier splits win)
    chain = F.lit(names[-1])
    for name, b in reversed(bounds):
        chain = F.when(F.col("split_hash") < b, F.lit(name)).otherwise(chain)
    return out.withColumn("split", chain)


def percentile_summary(
    df: DataFrame,
    group_col: str,
    score_col: str,
    qs: dict[str, float],
    resolution: int = 10_000,
) -> DataFrame:
    """Multi-quantile summary per group (e.g. {"p50": .5, "p95": .95,
    "p99": .99}), exact at 1/resolution score granularity, from ONE
    histogram pass: every requested quantile is a conditional-min
    aggregate over the same cumulative bucket walk, so adding
    quantiles adds zero shuffles.  Quantile values are
    bucket/resolution doubles — deterministic in any engine, unlike
    percentile_approx's engine-specific sketch.

    Output: (group, n_group, <one column per qs key>)."""
    b = df.select(
        F.col(group_col),
        F.floor(F.col(score_col) * F.lit(float(resolution)))
        .cast("long")
        .alias("__b"),
    )
    hist = b.groupBy(group_col, "__b").agg(F.count("*").alias("__c"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = hist.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(w_all)
    )
    aggs = [
        (
            F.min(
                F.when(
                    F.col("__cum")
                    >= F.ceil(F.lit(float(q)) * F.col("__n")),
                    F.col("__b"),
                )
            ).cast("double")
            / F.lit(float(resolution))
        ).alias(name)
        for name, q in qs.items()
    ]
    return cum.groupBy(group_col).agg(
        F.first("__n").alias("n_group"), *aggs
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k: int,
) -> DataFrame:
    """Per-group cap: keep the first `k` rows of each group under
    `order_cols` — the per-source / per-domain quota a curation
    pipeline applies so one crawl domain cannot dominate the corpus
    (e.g. keep the 1,000 highest-quality pages per domain).

    `order_cols` must be a DETERMINISTIC total order within each
    group (include the id as final tie-break) or the kept set is
    engine-dependent.

    Scale shape: one row_number window — a single exchange keyed by
    the group.  Group sizes here are per-DOMAIN (bounded by crawl
    breadth), so a hot group holds at most that domain's docs, not
    the corpus; for adversarially hot groups at tiny k, rank within
    (group, input-partition) first and re-rank the ≤ shards·k
    survivors — `stratified_sample`'s salted two-stage shape.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
