"""Cardinality sketches for corpus statistics at 100 TB.

KMV (k-minimum-values) distinct counting: hash every value with a
cryptographic hash, keep the k smallest distinct hashes per group,
and estimate |distinct| from the k-th order statistic u_(k) as
(k-1) / (u_(k) / 2^60) (md5_int63 hashes span 60 bits).
(Bar-Yossef et al. '02 "Counting distinct elements in a data
stream"; the KMV form is Beyer et al. SIGMOD '07.)

Why not approx_count_distinct (HLL)?  Spark's HLL is
engine-specific — its estimate is not reproducible outside Spark and
can change across versions.  KMV with an md5-derived hash is
deterministic BY CONSTRUCTION: the sketch (the k hashes) and the
estimate are bit-identical in any engine, so the whole operator is
oracle-checkable, auditable, and mergeable (union-of-sketches =
sketch-of-union — take the k smallest of the union).

Scale: the sketch needs each group's k smallest DISTINCT hashes, but
it never pre-deduplicates the input.  Stage 1 is a dense_rank window
keyed by (group, input-partition): dense_rank ≤ k keeps every copy
of a shard's k smallest distinct values — and any value among the
GLOBAL k smallest distinct has fewer than k smaller distinct values
in every shard, so it always survives.  Only the survivors
(≤ shards × k distinct values, plus their in-shard copies) are
deduplicated and re-ranked.  That is ONE full-data exchange
(measured 2× faster than distinct-then-rank at 100M rows); the
optional exact count adds the second, genuinely unavoidable,
count-distinct exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import md5_int63

#: The hash-space width used to normalize the k-th order statistic.
#: md5_int63 yields 15 hex digits = 60 bits, so hashes are uniform in
#: [0, 2^60) — 2^60 exactly as a double.
_HASH_SPACE = 1152921504606846976.0


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """The sketch itself: each group's k smallest distinct 60-bit
    hashes, as (group, h) rows — persist these per partition/day and
    combine with `kmv_merge` instead of rescanning history."""
    hashed = df.select(
        F.col(group_col),
        md5_int63(F.col(value_col), salt="kmv").alias("h"),
    )
    # stage 1: per (group, input-partition) dense_rank — keeps all
    # copies of each shard's k smallest distinct values, no pre-dedup
    w_shard = Window.partitionBy(group_col, "__pid").orderBy("h")
    survivors = (
        hashed.withColumn("__pid", F.spark_partition_id())
        .withColumn("__r", F.dense_rank().over(w_shard))
        .filter(F.col("__r") <= k)
        .select(group_col, "h")
        .dropDuplicates([group_col, "h"])
    )
    # stage 2: global re-rank of ≤ shards × k distinct values
    w_final = Window.partitionBy(group_col).orderBy("h")
    return (
        survivors.withColumn("__r", F.row_number().over(w_final))
        .filter(F.col("__r") <= k)
        .select(group_col, "h")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group_col, exact_distinct, sketch_size, kth_hash,
    est_distinct) — without `with_exact`, the exact_distinct column
    (and its count-distinct exchange) is dropped and the below-k
    fallback uses sketch_size (identical when distinct < k: the
    sketch then holds the whole universe).  `exact_distinct` exists
    for error measurement; sketch-only is the 100 TB mode."""
    top = kmv_sketch(df, group_col, value_col, k)
    sketch = top.groupBy(group_col).agg(
        F.max("h").alias("kth_hash"),
        F.count("*").alias("sketch_size"),
    )
    if with_exact:
        hashed = df.select(
            F.col(group_col),
            md5_int63(F.col(value_col), salt="kmv").alias("h"),
        )
        exact = hashed.groupBy(group_col).agg(
            F.count_distinct("h").alias("exact_distinct")
        )
        est = F.when(
            F.col("exact_distinct") >= k,
            F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
            / F.col("kth_hash").cast("double"),
        ).otherwise(F.col("exact_distinct").cast("double"))
        return exact.join(sketch, group_col).select(
            group_col,
            "exact_distinct",
            "sketch_size",
            "kth_hash",
            est.alias("est_distinct"),
        )
    est = F.when(
        F.col("sketch_size") >= k,
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
        / F.col("kth_hash").cast("double"),
    ).otherwise(F.col("sketch_size").cast("double"))
    return sketch.select(
        group_col, "sketch_size", "kth_hash", est.alias("est_distinct")
    )


def kmv_merge(sketches: DataFrame, group_col: str, k: int) -> DataFrame:
    """Merge per-partition/per-day KMV sketches: the k smallest of
    the union of k-smallest sets IS the union's sketch.  Input:
    (group, h) rows from multiple sketches; output matches
    kmv_distinct(with_exact=False)."""
    w = Window.partitionBy(group_col).orderBy("h")
    top = (
        sketches.dropDuplicates([group_col, "h"])
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
    )
    sk = top.groupBy(group_col).agg(
        F.max("h").alias("kth_hash"),
        F.count("*").alias("sketch_size"),
    )
    est = F.when(
        F.col("sketch_size") >= k,
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
        / F.col("kth_hash").cast("double"),
    ).otherwise(F.col("sketch_size").cast("double"))
    return sk.select(
        group_col, "sketch_size", "kth_hash", est.alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# Mergeable fixed-range histogram sketch — the quantile half of the
# sketch algebra (KMV covers distinct counts).  Counts are exact
# integers, so merge is an associative elementwise sum and every
# estimate is deterministic in any engine — the same reproducibility
# argument that picked KMV over HLL applies vs t-digest /
# percentile_approx, whose centroid layouts are engine-specific.
# ---------------------------------------------------------------------------


def hist_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Per-group fixed-range histogram: `bins` equal buckets over
    [lo, hi) plus an underflow slot (index 0) and an overflow slot
    (index bins+1).  Output: (group..., counts array<long>, n long).

    Shuffle shape: one (group, bin) hash-agg with map-side combine —
    the full-data exchange carries 8-byte partials, never values —
    then a tiny per-group assembly of at most bins+2 rows into the
    dense array (bounded collect, scale-safe by construction).

    Merge sketches from different sources/partitions with
    `hist_merge`; extract quantiles with `hist_quantile`.  The merge
    is exact: sketch(A) ⊕ sketch(B) = sketch(A ∪ A B) because counts
    are plain integers.

    NULL values are excluded: a null has no position on [lo, hi) —
    it is neither underflow nor overflow — so it contributes to no
    bin and not to `n`.  (Without the filter a null bin index would
    become a NULL map key and kill the job at runtime.)
    """
    width = (float(hi) - float(lo)) / int(bins)
    idx = (
        F.when(F.col(value_col) < F.lit(float(lo)), F.lit(0))
        .when(F.col(value_col) >= F.lit(float(hi)), F.lit(bins + 1))
        .otherwise(
            (
                F.floor(
                    (F.col(value_col) - F.lit(float(lo))) / F.lit(width)
                )
                + F.lit(1)
            ).cast("int")
        )
    )
    binned = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, idx.alias("__bin")
    )
    per_bin = binned.groupBy(*group_cols, "__bin").agg(
        F.count("*").alias("__c")
    )
    dense = (
        per_bin.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__bin"), F.col("__c")))
            ).alias("__m")
        )
        .select(
            *group_cols,
            F.transform(
                F.sequence(F.lit(0), F.lit(bins + 1)),
                # try_element_at: ANSI element_at raises on a missing
                # map key; absent bins mean zero observations
                lambda i: F.coalesce(
                    F.try_element_at(F.col("__m"), i),
                    F.lit(0).cast("long"),
                ),
            ).alias("counts"),
        )
        .withColumn(
            "n",
            F.aggregate(
                F.col("counts"),
                F.lit(0).cast("long"),
                lambda acc, c: acc + c,
            ),
        )
    )
    return dense


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram sketches over the same (lo, hi, bins) layout:
    union + per-group elementwise array sum.  Counts are integers, so
    the merge is associative/commutative — sketches built per
    partition, per day, or per source combine into the global
    histogram exactly."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c not in ("counts", "n")]
    lst = F.collect_list("counts")
    return (
        merged.groupBy(*keys)
        .agg(
            F.aggregate(
                F.slice(lst, 2, F.size(lst) - 1),
                F.element_at(lst, 1),
                lambda acc, x: F.zip_with(
                    acc, x, lambda a, b: a + b
                ),
            ).alias("counts"),
            F.sum("n").alias("n"),
        )
    )


def hist_quantile(
    sketch: DataFrame,
    qs: dict[str, float],
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, the
    LEFT EDGE of the first bin whose cumulative count reaches
    ceil(q·n) — deterministic, exact to one bin width, identical in
    any engine.  Underflow resolves to lo − width (a sentinel edge:
    the true quantile lies below the sketch range); overflow to hi.

    All in-row array arithmetic (the sketch frame has one row per
    group): the cumulative walk is O(bins) per quantile with no
    shuffle beyond the sketch itself."""
    width = (float(hi) - float(lo)) / int(bins)
    c = F.col("counts")
    outs = []
    for name, q in qs.items():
        target = F.ceil(F.lit(float(q)) * F.col("n"))
        # first index i (0-based) with cumsum(counts[0..i]) >= target
        idx = F.array_min(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(bins + 2)),
                    lambda i: F.when(
                        F.aggregate(
                            F.slice(c, 1, i),
                            F.lit(0).cast("long"),
                            lambda acc, x: acc + x,
                        )
                        >= target,
                        i - 1,
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        )
        outs.append(
            (F.lit(float(lo)) + (idx.cast("double") - F.lit(1.0)) * F.lit(width))
            .alias(name)
        )
    keys = [k for k in sketch.columns if k not in ("counts", "n")]
    return sketch.select(*keys, F.col("n"), *outs)


# ---------------------------------------------------------------------------
# Count-min sketch — the frequency third of the sketch algebra
# (KMV: distinct counts; histogram: quantiles; CMS: per-item counts).
# Cormode & Muthukrishnan '05: depth independent hash rows of width
# counters; est(count(v)) = min over rows of the counter v hashes to
# — always an OVERestimate, within εN w.h.p. for width ≈ e/ε.
# md5-salted hashing keeps the sketch deterministic and
# reproducible in any engine (same argument as KMV vs HLL).
# ---------------------------------------------------------------------------


def _cms_bucket(value: F.Column, row: F.Column, width: int) -> F.Column:
    """Hash row r's bucket for a value: 60-bit md5 window of
    'cms{r}:{value}', mod width — the same recipe md5_int63 uses, so
    a DuckDB oracle reproduces it verbatim."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"),
                        row.cast("string"),
                        F.lit(":"),
                        value.cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-group count-min sketch: (group..., row long, counters
    array<long>) — one output row per hash row, so merge and query
    stay flat joins/aggregations.

    Shuffle shape: the input explodes ×depth (one salted hash per
    row), then ONE (group, row, bucket) hash-agg with map-side
    combine — the exchange carries 8-byte partials bounded by
    depth × width per group, never raw values.  Counters are exact
    integers, so `cms_merge` (elementwise sum) is associative and
    sketch-per-partition → merge equals sketch-of-all.

    NULL values are excluded — a null item has no hash bucket (its
    md5 would be null and become a NULL map key, killing the job);
    count nulls separately if they matter."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    binned = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(value_col).alias("__v"),
        rows,
    ).select(
        *group_cols,
        "row",
        _cms_bucket(F.col("__v"), F.col("row"), width).alias("bucket"),
    )
    per_bucket = binned.groupBy(*group_cols, "row", "bucket").agg(
        F.count("*").alias("c")
    )
    return (
        per_bucket.groupBy(*group_cols, "row")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket"), F.col("c")))
            ).alias("__m")
        )
        .select(
            *group_cols,
            "row",
            F.transform(
                F.sequence(F.lit(0), F.lit(width - 1)),
                lambda i: F.coalesce(
                    F.try_element_at(F.col("__m"), i.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("counters"),
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS frames of identical (depth, width) layout: union +
    per-(group, row) elementwise counter sum."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c != "counters"]
    lst = F.collect_list("counters")
    return merged.groupBy(*keys).agg(
        F.aggregate(
            F.slice(lst, 2, F.size(lst) - 1),
            F.element_at(lst, 1),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("counters")
    )


def cms_query(
    sketch: DataFrame,
    items: list[str],
    group_cols: list[str],
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for literal `items`: per group and
    item, min over hash rows of the counter the item hashes to.
    Output: (group..., item, est_count).  The probe list is a
    broadcast-exploded literal array — no second pass over data."""
    probes = F.explode(
        F.array(*[F.lit(i) for i in items])
    ).alias("item")
    probed = sketch.select(*group_cols, "row", "counters", probes)
    bucket = _cms_bucket(F.col("item"), F.col("row"), width)
    per_row = probed.select(
        *group_cols,
        "item",
        F.element_at(
            F.col("counters"), (bucket + F.lit(1)).cast("int")
        ).alias("c"),
    )
    return per_row.groupBy(*group_cols, "item").agg(
        F.min("c").alias("est_count")
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch — the fourth leg of the mergeable
# sketch algebra (KMV: distinct count, histogram: quantiles, CMS:
# point frequency, Bloom: membership).  The reference pipeline's
# skip-set (step-2 anti-join of already-processed folders) is an
# exact small-set membership test; at 100 TB the same question —
# "was this doc id / URL / content digest already ingested?" — needs
# a fixed-size answer.  A Bloom bitmap answers it in O(bits) space
# with no false negatives, and OR-merge makes it buildable
# per-partition / per-day and combinable, like every sketch here.
#
# Hashing is the md5 60-bit-window recipe shared with CMS/minhash,
# so a SQL oracle reproduces the bitmap bit-for-bit.  Words are 32
# bits wide (stored in longs): 1 << bit stays positive on every
# engine, sidestepping 64-bit shift sign-wrap differences.
# ---------------------------------------------------------------------------

_BLOOM_WORD_BITS = 32


def _bloom_pos(
    value: F.Column, i: F.Column, m_bits: int, hasher: str = "md5"
) -> F.Column:
    """Hash i's bit position for a value.

    hasher="md5": md5('bloom{i}:{value}') 60-bit window mod m_bits —
    md5_int63's recipe, reproducible in DuckDB SQL (oracle-exact;
    b1's contract).  hasher="xxhash": xxhash64(value, i) mod m_bits —
    JVM-native, ~10× cheaper per probe; use when the sketch is a
    Spark-internal runtime filter whose oracle checks the JOIN
    RESULT, not the bit positions (j12)."""
    if hasher == "xxhash":
        return F.pmod(F.xxhash64(value, i), F.lit(m_bits))
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bloom"),
                        i.cast("string"),
                        F.lit(":"),
                        value.cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(m_bits),
    )


def bloom_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    num_hashes: int = 4,
    width_bits: int = 2048,
    hasher: str = "md5",
) -> DataFrame:
    """Per-group Bloom filter: (group..., words array<long>) with
    `width_bits` bits packed 32 per word.  No false negatives;
    false-positive rate ≈ (1 − e^(−k·n/m))^k.  `hasher` picks the
    bit-position hash (see _bloom_pos) — probes MUST use the same.

    Shuffle shape: input explodes ×k hashes, then ONE
    (group, word) hash-agg with map-side OR-combine — the exchange
    carries 8-byte word partials bounded by k × width/32 per group,
    never values — then a tiny per-group assembly into the dense
    array (≤ width/32 rows per group, bounded by construction).

    `bloom_merge` (elementwise OR) is associative/commutative and
    lossless: bloom(A) | bloom(B) == bloom(A ∪ B) exactly.

    NULL values are excluded — a null has no hash position; count
    nulls separately if they matter."""
    if width_bits % _BLOOM_WORD_BITS != 0:
        raise ValueError("width_bits must be a multiple of 32")
    n_words = width_bits // _BLOOM_WORD_BITS
    hashes = F.explode(
        F.sequence(F.lit(0), F.lit(num_hashes - 1))
    ).alias("i")
    pos = _bloom_pos(F.col("__v"), F.col("i"), width_bits, hasher)
    positions = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("__v"), hashes)
        .select(
            *group_cols,
            (pos / _BLOOM_WORD_BITS).cast("int").alias("word"),
            F.pmod(pos, F.lit(_BLOOM_WORD_BITS)).cast("int").alias("bit"),
        )
        .select(
            *group_cols,
            "word",
            F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"),
        )
    )
    per_word = positions.groupBy(*group_cols, "word").agg(
        F.bit_or("mask").alias("w")
    )
    # dense assembly: union a zero row per (group, word) slot and
    # re-aggregate, then sort-and-project the collected structs.
    # The obvious alternative — try_element_at(map, i) inside a
    # transform over the word index — is O(width²) interpreted ops
    # per group (MapType access is a linear scan and higher-order
    # lambdas don't codegen): measured 5.1 s for ONE 8192-word
    # sketch vs ~0.1 s for this shape (r6, j12 diet).
    zeros = (
        per_word.select(*group_cols)
        .distinct()
        .select(
            *group_cols,
            F.explode(
                F.sequence(F.lit(0), F.lit(n_words - 1))
            ).alias("word"),
            F.lit(0).cast("long").alias("w"),
        )
    )
    dense = (
        per_word.unionByName(zeros)
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("w").alias("w"))
    )
    return dense.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word", "w"))),
            lambda s: s["w"],
        ).alias("words")
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Bloom frames of identical (num_hashes, width_bits)
    layout: union + per-group elementwise word OR."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c != "words"]
    lst = F.collect_list("words")
    return merged.groupBy(*keys).agg(
        F.aggregate(
            F.slice(lst, 2, F.size(lst) - 1),
            F.element_at(lst, 1),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a.bitwiseOR(b)),
        ).alias("words")
    )


def bloom_query(
    sketch: DataFrame,
    items: list,
    group_cols: list[str],
    num_hashes: int = 4,
    width_bits: int = 2048,
) -> DataFrame:
    """Membership probes for literal `items`: (group..., item,
    maybe_member boolean) — true iff EVERY hash position's bit is
    set.  False ⇒ definitely absent; true ⇒ present or a false
    positive at the configured rate."""
    probes = F.explode(
        F.array(*[F.lit(i) for i in items])
    ).alias("item")
    probed = sketch.select(*group_cols, "words", probes).withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1)))
    )
    pos = _bloom_pos(F.col("item"), F.col("i"), width_bits)
    probed = probed.select(
        *group_cols,
        "item",
        F.element_at(
            F.col("words"), (pos / _BLOOM_WORD_BITS).cast("int") + F.lit(1)
        ).alias("w"),
        F.pmod(pos, F.lit(_BLOOM_WORD_BITS)).cast("int").alias("bit"),
    )
    hit = F.expr("w & shiftleft(CAST(1 AS BIGINT), bit)") != 0
    return (
        probed.select(*group_cols, "item", hit.alias("__hit"))
        .groupBy(*group_cols, "item")
        .agg(F.every("__hit").alias("maybe_member"))
    )
