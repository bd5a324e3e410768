"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the core scrubbing passes of a training-data pipeline.

Design for 100 TB:
  - exact dedup is a single hash-aggregate on a 128-bit digest (never
    on the raw text — shuffle bytes drop ~100×);
  - near-dup avoids the O(n²) pair space via LSH banding: only docs
    sharing a band key meet in the join, and the band join is an
    equi-join Catalyst can shuffle-hash on the band key;
  - all hashes are md5-derived (functions.md5_int63) so signatures
    are reproducible in any engine (and testable against DuckDB).

SimHash/MinHash math follows the published constructions (Broder '97
resemblance sketches; Charikar '02 random hyperplane rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stampede_to_fresco_etl_spark.functions import (
    md5_int63,
    minhash_slot_expr,
)
from stampede_to_fresco_etl_spark.operators.text import tokens, word_shingles


def exact_duplicate_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Group identical texts by md5 digest: (fingerprint, keep_id,
    n_dups).  keep_id = min id is the canonical survivor."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per distinct text."""
    w_min = exact_duplicate_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(w_min, on=id_col, how="inner")


def _shingled(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) exploded distinct shingle sets.

    The token array is materialized as a column BEFORE the shingle
    transform: Spark does no common-subexpression elimination inside
    lambda bodies, so inlining `split()` would re-run the regex split
    for every element_at (measured ~10× slower).

    Per-doc set semantics come from `array_distinct` BEFORE the
    explode — in-row, zero shuffle — rather than a `.distinct()` on
    the exploded frame, which would shuffle every (doc, shingle) row
    (at 100 TB that is a full-corpus exchange spent deduplicating
    within-document repeats that the array op removes for free).

    Without the distinct's exchange the explode inherits the scan's
    partitioning, so a small input (one parquet file) would leave the
    tokenize+explode single-threaded: spread the RAW doc frame (pre-
    tokenize, so the shuffle carries text, not the larger token
    arrays) across the cluster when — and only when — the scan has
    fewer partitions than cores.  A 100 TB scan already has thousands
    of splits and skips this."""
    raw = df.select(F.col(id_col).alias("doc"), F.col(text_col))
    par = df.sparkSession.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() < par:
        raw = raw.repartition(par)
    toks = raw.select("doc", tokens(F.col(text_col)).alias("t"))
    return toks.select(
        "doc",
        F.explode(F.array_distinct(word_shingles(F.col("t"), k))).alias(
            "shingle"
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signature per doc: mh_j = min over shingles of the
    j-salted md5 hash.  One explode + one hash-aggregate; num_hashes
    min-aggregations ride the same shuffle."""
    # NOT _shingled: MIN is duplicate-insensitive, so the distinct's
    # extra shuffle is pure waste here — aggregate straight off the
    # explode (map-side partial min, one shuffle of 8-byte partials).
    toks = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("t")
    )
    sh = toks.select(
        "doc", F.explode(word_shingles(F.col("t"), shingle_k)).alias("shingle")
    )
    # hash slots projected ONCE before the aggregate: Spark does no
    # CSE across aggregate expressions, so inlined minhash_slot would
    # recompute each salted md5 per slot instead of ceil(k/2) times
    # total (the same trap simhash hit — see that fix's measurement)
    # slots and min-aggregates as parsed SQL strings, not Column
    # chains: one py4j round trip per expression instead of ~8 per
    # slot — the per-CALL plan-construction wall sits on the ingest/
    # report paths that rebuild batch signatures every call (r12;
    # same measurement as the simhash F.expr fix)
    sh = sh.selectExpr(
        "doc",
        *[
            f"{minhash_slot_expr('shingle', j)} as __h{j}"
            for j in range(num_hashes)
        ],
    )
    aggs = [F.expr(f"min(__h{j})").alias(f"mh{j}") for j in range(num_hashes)]
    return sh.groupBy("doc").agg(*aggs)


def band_signatures(
    signatures: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """The exploded LSH band table: one row per (doc, band) carrying
    (doc, mh0..mh{k-1}, band_idx, band_key) — built with ONE
    posexplode, no N self-unions.

    This is the STORED form of an LSH index at scale: a deployment
    writes this table bucketed by (band_idx, band_key) beside the
    corpus snapshot, and every future ingest batch probes it with a
    band equi-join that shuffles only the batch side
    (`lsh_pairs_between(indexed_bands=...)`) — the index is banded
    once per snapshot, never per probe."""
    rows = num_hashes // bands
    band_keys = [
        F.concat_ws("_", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
        for b in range(bands)
    ]
    return signatures.select(
        F.col("doc"),
        *[F.col(f"mh{j}") for j in range(num_hashes)],
        F.posexplode(F.array(*band_keys)).alias("band_idx", "band_key"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair.  Output: (doc_a, doc_b, est_jaccard) with
    doc_a < doc_b; est_jaccard = fraction of equal signature slots.

    The band table is built with one posexplode (no N self-unions),
    and the pair join is an equi-join on (band_idx, band_key).

    `materialize` localCheckpoints the (small) signature table so the
    self-join doesn't recompute the shingle-explode + hash job for
    each side — Spark does not reuse the exchange here (measured 2×).
    On a cluster with preemptible executors, swap for
    persist(DISK_ONLY) or a checkpoint dir."""
    if materialize:
        signatures = signatures.localCheckpoint()
    banded = band_signatures(signatures, num_hashes, bands)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            *[
                (F.col(f"l.mh{j}") == F.col(f"r.mh{j}"))
                .cast("int")
                .alias(f"eq{j}")
                for j in range(num_hashes)
            ],
        )
        .distinct()
    )
    est = sum(F.col(f"eq{j}") for j in range(num_hashes)) / F.lit(
        float(num_hashes)
    )
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    return lsh_candidate_pairs(sigs, num_hashes, bands)


def lsh_pairs_between(
    new_sigs: DataFrame,
    indexed_sigs: DataFrame | None = None,
    num_hashes: int = 8,
    bands: int = 4,
    materialize: bool = True,
    indexed_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental LSH: candidate pairs between an incoming batch and
    an already-indexed corpus — never indexed×indexed.  This is the
    production ingestion path at 100 TB: the index side's band table
    (`band_signatures`) is computed once per corpus snapshot and
    STORED (bucketed by band key); each new batch hashes only its own
    delta and probes the stored buckets with a band equi-join, so
    per-batch cost is O(|batch| + matches), independent of corpus
    size.  The full-corpus pair stage (`lsh_candidate_pairs`) is the
    bootstrap; this is the steady state.

    Pass `indexed_bands` (the stored band table) to probe without
    re-banding the index — the steady-state form; `indexed_sigs`
    bands on the fly for one-shot use.

    Output: (new_doc, indexed_doc, est_jaccard).  No `doc <` tiebreak
    — the two sides are disjoint by construction, so every candidate
    appears exactly once with the incoming doc on the left."""
    if (indexed_sigs is None) == (indexed_bands is None):
        raise ValueError(
            "exactly one of indexed_sigs / indexed_bands required"
        )
    if materialize:
        new_sigs = new_sigs.localCheckpoint()
        if indexed_sigs is not None:
            indexed_sigs = indexed_sigs.localCheckpoint()
    if indexed_bands is None:
        indexed_bands = band_signatures(indexed_sigs, num_hashes, bands)

    left = band_signatures(new_sigs, num_hashes, bands).alias("l")
    right = indexed_bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key")),
        )
        .select(
            F.col("l.doc").alias("new_doc"),
            F.col("r.doc").alias("indexed_doc"),
            *[
                (F.col(f"l.mh{j}") == F.col(f"r.mh{j}"))
                .cast("int")
                .alias(f"eq{j}")
                for j in range(num_hashes)
            ],
        )
        .distinct()
    )
    est = sum(F.col(f"eq{j}") for j in range(num_hashes)) / F.lit(
        float(num_hashes)
    )
    return pairs.select("new_doc", "indexed_doc", est.alias("est_jaccard"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    min_jaccard: float = 0.0,
    max_shingle_df: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs that share
    at least one shingle.  |A∩B| via a self-equi-join on the shingle,
    |A∪B| = |A| + |B| - |A∩B|.

    `max_shingle_df` caps the inverted index: shingles appearing in
    more than that many documents (boilerplate, stopword n-grams) are
    removed from the shingle universe BEFORE the self-join.  A hot
    shingle with document frequency f contributes f(f-1)/2 rows to
    the join — one boilerplate header shared by 10⁶ docs would emit
    5·10¹¹ pairs — so at scale the cap is what keeps the join
    output linear.  Semantics stay EXACT over the filtered universe:
    the df filter is applied to sizes and intersections alike, so
    jaccard values for surviving shingle sets are true Jaccard
    similarities of (set minus hot shingles), and any engine can
    reproduce the result with the same HAVING df <= cap filter.

    `prefix_filter=True` (requires min_jaccard > 0) switches candidate
    generation to the AllPairs/PPJoin prefix scheme (Bayardo et al.
    WWW'07; Xiao et al. WWW'08) with bit-identical output — see
    `_jaccard_pairs_prefix`."""
    if prefix_filter:
        if min_jaccard <= 0.0:
            raise ValueError("prefix_filter requires min_jaccard > 0")
        return _jaccard_pairs_prefix(
            df, id_col, text_col, shingle_k, min_jaccard, max_shingle_df
        )
    # ONE pipeline from tokenize through the df cap into the
    # materialization: the cap is a count-over-shingle WINDOW (not the
    # former groupBy + broadcast-anti-join, which scanned the shingle
    # frame twice and raised a broadcast barrier), and the
    # localCheckpoint lands AFTER the filter so the cached blocks hold
    # only surviving rows — the sizes aggregate and both self-join
    # sides then read the smaller filtered set.  Measured on the d5
    # pair stage at sf0.1: 2.9 s → 2.0 s.
    sh = _shingled(df, id_col, text_col, shingle_k)
    if max_shingle_df is not None:
        sh = (
            sh.withColumn(
                "df", F.count("*").over(Window.partitionBy("shingle"))
            )
            .filter(F.col("df") <= max_shingle_df)
            .drop("df")
        )
    sh = sh.localCheckpoint()
    # post-cap set sizes: a doc-keyed partial aggregate (map-side
    # combined — the shuffle carries doc-count partials, not rows)
    # broadcast back onto the shingle rows.  Replaces the former
    # count-over-doc window, whose exchange moved the ENTIRE shingle
    # frame by doc between the cap and the join; the sizes frame is
    # corpus-cardinality (one row per doc), always broadcastable
    # relative to its fact side.
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    sh = sh.join(F.broadcast(sizes), "doc")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    out = inter.select(
        "doc_a",
        "doc_b",
        (
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast(
                "double"
            )
        ).alias("jaccard"),
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


def shingle_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    min_containment: float = 0.6,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Directed set-CONTAINMENT over the same shingle universe as
    `ngram_jaccard_pairs`: for every candidate pair, |A∩B|/|A| and
    |A∩B|/|B|, kept when either side is ≥ `min_containment`.

    Containment is the asymmetric relation Jaccard hides: a short
    quote or boilerplate template fully CONTAINED in a long document
    has high containment but near-zero Jaccard (the union is
    dominated by the long side).  This is the detector for
    template/boilerplate extraction and quote-chain tracing, where
    the question is "is A inside B", not "are A and B the same".

    Scale shape is identical to the Jaccard join — shingle-equi-join
    with sizes riding as group keys, hot-shingle df cap bounding the
    pair space — and the two containments are pinned divisions of
    the same exact integers, so the oracle reproduces them
    bit-for-bit."""
    sh = _shingled(df, id_col, text_col, shingle_k)
    if max_shingle_df is not None:
        sh = (
            sh.withColumn(
                "df", F.count("*").over(Window.partitionBy("shingle"))
            )
            .filter(F.col("df") <= max_shingle_df)
            .drop("df")
        )
    sh = sh.localCheckpoint()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    sh = sh.join(F.broadcast(sizes), "doc")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    ca = F.col("inter").cast("double") / F.col("sz_a").cast("double")
    cb = F.col("inter").cast("double") / F.col("sz_b").cast("double")
    return inter.select(
        "doc_a",
        "doc_b",
        "inter",
        ca.alias("containment_a"),
        cb.alias("containment_b"),
    ).filter(
        (F.col("containment_a") >= min_containment)
        | (F.col("containment_b") >= min_containment)
    )


def _jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    min_jaccard: float,
    max_shingle_df: int | None,
) -> DataFrame:
    """AllPairs/PPJoin-style prefix-filtered set-similarity join —
    same output as the naive path, candidate space cut from "share
    ANY shingle" to "share a RARE PREFIX shingle".

    With every doc's shingle set ordered by one global total order
    (rare-first: ascending document frequency, shingle as tie-break),
    a pair with J ≥ t must share its globally-smallest common shingle
    inside BOTH docs' prefixes of length |d| − ⌈t·|d|⌉ + 1 (if all
    common shingles sat in A's last ⌈t|A|⌉−1 positions, the overlap
    bound |A∩B| ≥ ⌈t·|A|⌉ would already be violated).  So the
    inverted-index self-join runs over prefixes only, plus the length
    filter t·|A| ≤ |B| ≤ |A|/t; survivors are verified EXACTLY with
    an in-row `array_intersect` — no second pass over the index.

    Why it matters at 100 TB: the naive join's output is Σ_s df(s)²
    over ALL shingles; the prefix join sums only over prefix
    occurrences, and rare-first ordering makes prefix shingles the
    LOW-df ones.  At t=0.8 (the usual near-dup setting) prefixes are
    ~20% of each doc, shrinking candidate volume ~25× before any
    Jaccard is computed; the verification step then moves one ~50-
    element array pair per candidate instead of re-joining the index.
    Float-boundary safety: prefix lengths and length filters use a
    1e-9 slack so IEEE rounding can only ADD candidates (verification
    keeps the result exact), never drop one.

    Shuffles: shingle-df join (vocab-keyed), one groupBy(doc) to
    build ordered arrays, the prefix equi-join, and two array
    fetch joins — each keyed on doc or shingle, none carrying the
    full n² pair space.

    Measured honestly (scripts/ppjoin_rehearsal.py; full table in
    SCALE.md §ppjoin): the NAIVE path wins on short uniform docs
    (2.5 s vs 8.3 s at t=0.3 on the sf0.1 shape) AND on uniform
    mid-df corpora regardless of Σ df² mass (6.8 s vs 10.6 s at
    t=0.8 with everyone at df≈100 — equal dfs degenerate rare-first
    ordering to its tie-break, a few tie-winning shingles become
    prefix-hot, and array-shipping verification loses to 8-byte count
    partials).  PREFIX wins in its design regime — heavy-tailed df
    with a hot head, UNCAPPED exact semantics, high t: measured
    3.0 s vs 14.6 s (4.9×) at t=0.8 on a Zipf-head corpus whose
    df≈2,400 head alone feeds the naive join ~70M candidates while
    never entering any rare-first prefix.  Guidance: prefix for
    uncapped exact joins at t ≳ 0.7 on heavy-tailed corpora; naive
    (+cap, which removes the head at the cost of filtered-universe
    semantics) otherwise.  Both paths are output-identical (pinned by
    test), so the choice is a pure physical knob.
    """
    t = float(min_jaccard)
    sh = _shingled(df, id_col, text_col, shingle_k).localCheckpoint()
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    if max_shingle_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_shingle_df)
    # inner join doubles as the hot-shingle anti-join (capped vocab)
    ranked = sh.join(dfreq, "shingle")
    sets = (
        ranked.groupBy("doc")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("df"), F.col("shingle")))
                ),
                lambda s: s.getField("shingle"),
            ).alias("arr")
        )
        .withColumn("sz", F.size("arr"))
        # conservative prefix length: floor with slack ≥ the exact
        # sz − ceil(t·sz) + 1, so rounding can only widen the prefix
        .withColumn(
            "pref_len",
            F.col("sz")
            - F.floor(F.lit(t) * F.col("sz") - F.lit(1e-9)).cast("int")
            + F.lit(1),
        )
        .localCheckpoint()
    )
    pref = sets.select(
        F.col("doc"),
        F.col("sz"),
        F.explode(F.slice(F.col("arr"), 1, F.col("pref_len"))).alias(
            "shingle"
        ),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc"))
            # length filter: J ≥ t forces t·|A| ≤ |B| ≤ |A|/t
            & (
                F.col("b.sz")
                >= F.lit(t) * F.col("a.sz") - F.lit(1e-9)
            )
            & (
                F.col("a.sz")
                >= F.lit(t) * F.col("b.sz") - F.lit(1e-9)
            ),
        )
        .select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
        .distinct()
    )
    verified = (
        cand.join(
            sets.select(
                F.col("doc").alias("doc_a"),
                F.col("arr").alias("arr_a"),
                F.col("sz").alias("sz_a"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc").alias("doc_b"),
                F.col("arr").alias("arr_b"),
                F.col("sz").alias("sz_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b")))
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= min_jaccard)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    materialize: bool = True,
    halving: bool = True,
    small_graph_edges: int = 50_000,
    pairs_unique: bool = False,
) -> DataFrame:
    """Resolve duplicate-pair output into clusters: every node gets
    the MINIMUM id reachable through the pair graph as its cluster
    id (min-label propagation to a fixed point).

    This is the step a training-data pipeline runs after LSH/Jaccard
    pair generation — pairs say "these two are dups", clusters say
    "keep exactly one of these five".  The canonical survivor is the
    node whose id equals the cluster id.

    Scale design: each sweep is (a) neighbor-min propagation — an
    edge-keyed join + min-aggregate, both shuffling on the node id —
    and (b) with `halving`, one pointer-halving self-join
    (cc ← cc's cc, the path-halving step of parallel union-find /
    Hash-to-Min, Rastogi et al. ICDE '13).  Neighbor-min alone
    converges in graph-DIAMETER sweeps — fine for near-dup graphs
    (unions of near-cliques, diameter 2-4), quadratic-feeling on
    chains; the halving join cuts that to O(log diameter): a
    1M-edge/100-diameter chain graph converges in 8 sweeps (measured
    ~35 s local[32]) where pure propagation caps out at 25 sweeps
    unconverged (~100 s).  Each sweep localCheckpoints the (node,
    cc) frame — ids only, ~16 bytes/row — to cut the iterative
    lineage; swap for checkpoint() on preemptible clusters.

    Each sweep is exactly ONE Spark job: the changed-flag is computed
    inline as a column (post-propagation cc ≠ entry cc — the
    propagation phase alone decides convergence, which is exact: a
    propagation fixed point on the symmetric edge set forces labels
    constant-and-minimal per component, making halving the identity
    there), and its max is collected via `Observation` during the
    localCheckpoint's own materializing action — convergence
    detection adds no join, no shuffle, and no probe job.  (With
    ``materialize=False`` a `limit(1).count()` probe triggers the
    sweep instead.)

    Output: (node, cc) — one row per node that appears in `pairs`.
    Emits a RuntimeWarning if `max_iter` is exhausted before the fixed
    point: labels are then a valid refinement (every labelled pair IS
    connected) but one true cluster may still carry several ids.

    `pairs_unique=True` asserts the input holds each undirected pair
    at most once with a_col < b_col (true for every pair generator in
    this module — their pairs are grouped/deduped by construction), so
    the symmetrized edge frame is distinct by construction and the
    edge-dedup shuffle is skipped.  Duplicate edges would not corrupt
    the result either way (min is duplicate-insensitive); the flag is
    purely a physical-plan knob.
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if not pairs_unique:
        sym = sym.distinct()
    small = False
    if materialize:
        # adaptive physical mode: after a Jaccard/LSH threshold the
        # surviving pair graph is often tiny relative to the corpus.
        # When the edge list is below `small_graph_edges`, the
        # iterative distributed sweeps are pure fixed overhead and a
        # driver union-find resolves the same labels in milliseconds.
        # r13 session 2: the smallness probe IS the edge collect —
        # `limit(cap+1).collect()` is one incremental job (CollectLimit
        # short-circuits partitions once cap+1 rows arrive), and a
        # result within the cap is by definition the COMPLETE edge
        # set, so the small path pays neither the r12 shape's
        # checkpoint write nor its separate collect job.  Only a
        # big graph (probe truncated) pays the checkpoint, which the
        # sweep loop wants anyway for lineage truncation.
        rows = sym.limit(small_graph_edges + 1).collect()
        small = len(rows) <= small_graph_edges
        if not small:
            sym = sym.localCheckpoint()
        if small:
            # Small-graph FAST PATH: union-find on the driver.  The
            # threshold bounds what `.collect()` materializes as
            # PYTHON objects — Row + dict-entry overhead is ~10× the
            # raw 16 bytes/edge, so 50k symmetrized edges is tens of
            # MB of driver heap, not hundreds (the 500k default this
            # replaced would have been; ADVICE r5).  The iterative
            # distributed sweeps pay a FIXED per-sweep price (job
            # scheduling + broadcast builds + checkpoint) that data
            # size cannot amortize: measured 6.0 s for 3 sweeps over
            # a 2 114-edge graph where path-compressed union-find
            # resolves the same labels in milliseconds.  Output is
            # bit-identical (every node labeled with its component
            # MINIMUM); the distributed sweep loop below remains the
            # big-graph path and the materialize=False debug path.
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:
                    parent[x], x = r, parent[x]
                return r

            for row in rows:
                a, b = row[0], row[1]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
            comp_min: dict = {}
            for n in parent:
                r = find(n)
                m = comp_min.get(r)
                if m is None or n < m:
                    comp_min[r] = n
            out_schema = T.StructType(
                [
                    T.StructField(
                        "node", pairs.schema[a_col].dataType, True
                    ),
                    T.StructField(
                        "cc", pairs.schema[a_col].dataType, True
                    ),
                ]
            )
            return pairs.sparkSession.createDataFrame(
                [(n, comp_min[find(n)]) for n in parent], out_schema
            )
    # (the driver union-find above handles every small graph, so the
    # sweeps below never broadcast — big-graph path only)
    # Sweep-0 seed: label(n) = min(n, min neighbor) — the result of
    # one propagation sweep over identity labels, computed as a single
    # groupBy on the edge frame instead of the full join + aggregate +
    # join machinery of a loop sweep.  The node set is exactly the
    # src set (sym is symmetric), so this also replaces the old
    # distinct-nodes exchange: same shuffle count as identity seeding,
    # one fewer loop sweep.  Near-clique dup graphs that converged in
    # 3 sweeps (2 propagate + 1 confirm) now take 2.  The cc(n) ≤ n /
    # cc-in-component invariants the convergence proof rests on hold
    # for the seed by construction.
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("nbr"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("nbr")).alias("cc"),
        )
    )
    if materialize:
        labels = labels.localCheckpoint()
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("cc").alias("nbr_cc")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nbr_cc").alias("nbr_cc"))
        )
        new_labels = (
            labels.join(
                nbr_min.select(F.col("src").alias("node"), "nbr_cc"),
                "node",
                "left",
            )
            .select(
                "node",
                F.col("cc").alias("__old"),
                F.least(
                    F.col("cc"), F.coalesce(F.col("nbr_cc"), F.col("cc"))
                ).alias("cc"),
            )
        )
        # convergence flag = PROPAGATION-phase change only, measured
        # before halving.  At a propagation fixed point on the
        # symmetric edge set, cc(n) ≤ cc(nbr) for every edge in both
        # directions forces labels constant per component, and the
        # cc(n) ≤ n invariant forces that constant to be the
        # component minimum — so halving is the identity there too,
        # and stopping on the propagation flag alone is exact.  On
        # chain graphs it can stop a sweep earlier than the combined
        # flag (halving keeps reshuffling pointers after propagation
        # has quiesced); it is never later.
        new_labels = new_labels.withColumn(
            "__chg", F.col("cc") != F.col("__old")
        )
        if halving:
            # path halving: follow the label one hop (cc ← label(cc)).
            # label(cc) ≤ cc and stays in the component, so the min
            # invariant holds while long chains collapse doubly fast.
            lut = new_labels.select(
                F.col("node").alias("cc"), F.col("cc").alias("cc2")
            )
            new_labels = new_labels.join(lut, "cc", "left").select(
                "node",
                "__chg",
                F.coalesce(F.col("cc2"), F.col("cc")).alias("cc"),
            )
        new_labels = new_labels.select("node", "cc", "__chg")
        if materialize:
            # the convergence metric rides the checkpoint job itself
            # (Observation populates during the materializing action),
            # so each sweep is exactly ONE Spark job — no probe job
            obs = Observation()
            new_labels = new_labels.observe(
                obs, F.max("__chg").alias("chg")
            ).localCheckpoint()
            changed = 1 if obs.get["chg"] else 0
        else:
            changed = new_labels.filter(F.col("__chg")).limit(1).count()
        labels = new_labels.select("node", "cc")
        if changed == 0:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: no fixed point after {max_iter} "
            "sweeps; a true cluster may still carry multiple labels — "
            "raise max_iter (sweeps needed ≈ log2(graph diameter) "
            "with halving=True)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    min_jaccard: float = 0.3,
    max_shingle_df: int | None = 100,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end near-dup clustering: n-gram Jaccard pairs →
    connected components → (doc_id, cluster_id, is_canonical).

    Output covers only docs that appear in at least one near-dup
    pair.  To deduplicate the corpus, LEFT-join this onto it and keep
    rows where ``is_canonical`` is true OR null — docs with no
    near-duplicate never enter the pair graph and must survive.

    ``pairs``: a precomputed (doc_a, doc_b)-unique pair frame (e.g. a
    shared/materialized pair stage) — when given, the shingle/join
    stage is skipped entirely and the shingle parameters are unused.
    Every consumer of the same corpus snapshot should pass the same
    shared frame: the pair stage dominates dedup cost and is pure."""
    if pairs is None:
        pairs = ngram_jaccard_pairs(
            df, id_col, text_col,
            shingle_k=shingle_k,
            min_jaccard=min_jaccard,
            max_shingle_df=max_shingle_df,
        )
    # pair output is grouped on (doc_a, doc_b) with doc_a < doc_b —
    # unique by construction, so CC can skip its edge-dedup shuffle
    cc = connected_components(pairs, "doc_a", "doc_b", pairs_unique=True)
    return cc.select(
        F.col("node").alias(id_col),
        F.col("cc").alias("cluster_id"),
        (F.col("node") == F.col("cc")).alias("is_canonical"),
    )


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
) -> DataFrame:
    """SimHash per doc (Charikar random-hyperplane sketch over the
    token multiset): bit b is the sign of Σ_tokens ±1 where the sign
    comes from bit b of the token's md5 hash.  One explode + one
    aggregate; `bits` sums ride the same shuffle."""
    # hash projected ONCE before the aggregate: Spark does no CSE
    # across aggregate expressions, so an inlined md5_int63 would be
    # recomputed per bit — `bits`× the md5 work (measured 3.7s → ~1s
    # at 32 bits, sf0.1)
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("doc", md5_int63(F.col("tok")).alias("hv"))
    # expressions built as SQL strings, one F.expr per aggregate and
    # one for the bit-pack: the Column-API form was ~8 py4j round
    # trips per bit and the per-CALL plan-construction wall is on the
    # serving path (0.56 s -> 0.12 s at 32 bits, r12); the parsed
    # trees are the same integer-exact CASE/sum expressions
    aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright(hv, {b}) & 1) = 1 "
            "THEN 1 ELSE -1 END)"
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy("doc").agg(*aggs)
    pack = "CAST(0 AS BIGINT)" + "".join(
        f" + (CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return sums.select("doc", F.expr(pack).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs: (doc_a, doc_b, hamming) with
    doc_a < doc_b and popcount(sig_a XOR sig_b) ≤ max_hamming —
    signature generation (`simhash`) completed into the pair join a
    dedup pipeline actually runs.

    Candidate generation is the pigeonhole band trick (Charikar's
    block-permutation scheme, Manku et al. WWW'07 simplified to one
    split): the signature splits into max_hamming+1 contiguous bit
    bands, and a pair within Hamming distance ≤ max_hamming differs
    in at most max_hamming bands, so at least ONE band matches
    exactly.  The self-join is therefore a (band_id, band_bits)
    equi-join — candidate volume is Σ over bands of same-band-value
    pair counts, never n² — followed by an exact popcount verify.
    A qualifying pair can meet in several bands, so candidates are
    de-duplicated BEFORE the verify (cheaper than after: the dedup
    keys are two longs).

    At 100 TB: the equi-join shuffles (band, value)-keyed rows of
    three longs; hot bands (a common signature region) behave like
    hot shingles in the Jaccard path — raise `bits` or split skewed
    buckets with AQE; the verify is a per-row popcount, no shuffle.

    Size (bits, max_hamming) to the CORPUS, jointly, for two reasons
    (measured, SCALE.md §sf1): (a) band-bucket occupancy is
    ~n/2^(bits/bands) — once it exceeds O(1) the band join goes
    quadratic (50k docs at bits=32: 53 s; bits=48: 6.8 s); (b) bits
    also sets precision — hamming ≤ 3 on a 32-bit sketch is a LOOSER
    near-dup criterion than on 48 bits (3.31 M vs 224 k output pairs
    on the same corpus), so raising bits changes what "near-dup"
    means, not just the cost.  bits ≤ 63 (the signature packs into a
    signed long).
    """
    bands = max_hamming + 1
    # no checkpoint (r13): the band self-join's two sides duplicate
    # the signature subtree in the static plan, but the signature
    # aggregation's exchange is one canonical subtree that AQE's
    # stage cache materializes once per action (uncached parquet
    # base), so the explode+popcount work is NOT paid per side — and
    # the eager checkpoint was worse on every axis: it ran the whole
    # signature build as a serial construct-time job (~0.7 s of d6's
    # wall), pinned non-replayable blocks, and made the plan
    # unmemoizable.  Results are deterministic (md5 signatures), so
    # even an un-reused double evaluation is value-identical.
    sig = simhash(df, id_col, text_col, bits)
    width = bits // bands
    cuts = [
        (i * width, width if i < bands - 1 else bits - i * width)
        for i in range(bands)
    ]
    banded = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), start)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("bv"),
                    )
                    for i, (start, w) in enumerate(cuts)
                ]
            )
        ).alias("bk"),
    ).select("doc", "simhash", F.col("bk.band"), F.col("bk.bv"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        # full-row distinct, NOT dropDuplicates(["doc_a","doc_b"]):
        # ha/hb are functions of the ids (one signature per doc), so
        # the four-column group is the same set of pairs — but the
        # subset form plans first() aggregates for the carried
        # columns, measured 5x slower on this stage (1.9 s vs 0.4 s
        # exec at sf0.1, r12)
        .distinct()
    )
    ham = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    ).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_keep_best(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quality_col: str,
    shingle_k: int = 3,
    min_jaccard: float = 0.3,
    max_shingle_df: int | None = 100,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end near-dup deduplication, quality-aware: cluster the
    corpus (`dup_clusters`), then keep the HIGHEST-`quality_col` doc
    of each cluster (ties broken by smallest id) — the full curation
    flow a training-data pipeline runs, where the survivor should be
    the best copy, not an arbitrary one.  Docs with no near-duplicate
    form singleton clusters (cluster_id = own id) and always survive.

    Output: one row per surviving doc — (id, cluster_id, quality).

    Scale shape: the cluster frame is one row per doc THAT APPEARS IN
    A PAIR (typically a small fraction of the corpus), so the join
    back is dimension-sized; the survivor pick is one row_number
    window over cluster_id — a single exchange keyed by cluster, with
    per-cluster row counts bounded by cluster sizes, not the corpus.
    """
    clusters = dup_clusters(
        df, id_col, text_col,
        shingle_k=shingle_k,
        min_jaccard=min_jaccard,
        max_shingle_df=max_shingle_df,
        pairs=pairs,
    ).select(id_col, "cluster_id")
    joined = (
        df.select(id_col, F.col(quality_col).alias("quality"))
        .join(clusters, id_col, "left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, "cluster_id", "quality")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for each training doc, count the
    DISTINCT k-gram shingles it shares with the evaluation corpus —
    the overlap statistic behind the GPT-3/Llama-style n-gram
    decontamination pass (Brown et al. 2020 §C; 13-grams there, k is
    a knob here).  A curation pipeline drops or flags training docs
    whose count exceeds a threshold; returning the counts (rather
    than filtering) keeps the policy outside the operator.

    Output: (id, n_hits) — training docs with ≥1 shared shingle only;
    LEFT-join back and treat NULL as clean.

    Scale shape: the eval side of a decontamination job is a
    BENCHMARK SUITE — thousands of docs against a 100 TB corpus — so
    its distinct-shingle set is broadcast and the whole pass is one
    map-side semi-join + one aggregate keyed by doc id: the corpus
    shuffles only (doc, matched-shingle) hit rows, never the text.
    For an eval side too big to broadcast, drop the hint and the same
    plan becomes a shuffle equi-join on the shingle — still never
    quadratic.
    """
    tr = _shingled(train, id_col, text_col, shingle_k)
    ev = (
        _shingled(eval_df, id_col, text_col, shingle_k)
        .select("shingle")
        .distinct()
    )
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc")
        .agg(F.count("*").alias("n_hits"))
        .select(F.col("doc").alias(id_col), "n_hits")
    )



def fuzzy_string_pairs(
    df: DataFrame,
    key_col: str,
    str_col: str,
    block_cols: list[str] | None = None,
    max_dist: int = 2,
    method: str = "qgram",
    q: int = 2,
) -> DataFrame:
    """Blocked fuzzy self-join: all pairs (a, b), a.key < b.key, with
    levenshtein(a.str, b.str) <= max_dist, a.str != b.str — the
    record-linkage primitive for short-string near-dups (product
    names, author fields, normalized titles).

    Scale design, layer 1 — collapse identical strings FIRST: the
    candidate join runs over DISTINCT (block, string) values carrying
    their key lists, and key pairs are expanded only after the
    residual check.  Exact-duplicate strings can never appear in the
    output (str_a != str_b), yet at row level a string occurring m
    times costs m² candidates — on the replicated rehearsal corpus
    this dominated everything (SCALE.md r5/r6).  String-level
    blocking makes candidate volume a function of VOCABULARY, not
    row count; the expansion emits exactly the required output.

    Layer 2 — two block constructions on the same equi-join skeleton:

    ``method="qgram"`` (default) — q-gram-profile pigeonhole blocks
    (VERDICT r5 item 3; the PassJoin/qchunk filter family).  One edit
    adds/removes at most q q-grams from a string's q-gram MULTISET,
    so d edits perturb at most 2·d·q multiset elements;
    hash-partition the q-gram space into k = 2·d·q + 1 parts and at
    least one part's sub-multiset is IDENTICAL between any two
    strings within distance d.  Block key = (part_id, hash of the
    part's sorted q-grams): content-derived, so block occupancy
    tracks true near-dup groups instead of the weak (brand, length)
    key.  Each distinct string emits k rows; string pairs surviving
    the residual are deduped (a true pair can share up to k parts)
    with a distinct that is bounded by k·(matching string pairs).
    Strings shorter than q have an empty profile — all their parts
    collide, which is CORRECT (they must remain mutual candidates)
    and cheap (such strings are rare in name fields).

    ``method="length"`` — edit distance <= d implies
    |len(a) - len(b)| <= d, so strings bucket by floor(len / (d+1))
    and any qualifying pair's buckets differ by at most 1 — the left
    side joins on its OWN bucket while the right side fans out to
    (b-1, b, b+1).  Each qualifying string pair matches EXACTLY
    once, so no distinct is needed; candidate volume is bounded by
    per-(block, bucket) occupancy of DISTINCT strings — fine when
    the block key is diverse, quadratic in vocabulary collisions
    when it is not (the measured limit that motivated the qgram
    path)."""
    blocks = block_cols or []
    grouped = (
        df.groupBy(*blocks, F.col(str_col).alias("__str"))
        .agg(F.collect_list(key_col).alias("__keys"))
    )
    if method == "qgram":
        spairs = _fuzzy_qgram_string_pairs(grouped, blocks, max_dist, q)
    elif method == "length":
        spairs = _fuzzy_length_string_pairs(grouped, blocks, max_dist)
    else:
        raise ValueError(f"unknown blocking method: {method!r}")
    # expand each matching string pair to its key pairs; key sets of
    # distinct strings are disjoint, so every (key_a, key_b) arises
    # from exactly one string pair — no dedup needed here
    return (
        spairs.select(
            "dist", F.explode("__keys_a").alias("__ka"), "__keys_b"
        )
        .select("dist", "__ka", F.explode("__keys_b").alias("__kb"))
        .select(
            F.least("__ka", "__kb").alias("key_a"),
            F.greatest("__ka", "__kb").alias("key_b"),
            "dist",
        )
    )


def _fuzzy_length_string_pairs(
    grouped: DataFrame, blocks: list[str], max_dist: int
) -> DataFrame:
    """Length-bucket candidate join over distinct strings.  Output:
    (__keys_a, __keys_b, dist), each unordered string pair once
    (str_a < str_b canonicalizes; the right side's 3-bucket fan-out
    contains the left bucket at most once)."""
    width = max_dist + 1
    a = grouped.select(
        F.col("__str").alias("str_a"),
        F.col("__keys").alias("__keys_a"),
        (F.length("__str") / width).cast("long").alias("__bucket"),
        *[F.col(c).alias(f"__ba_{c}") for c in blocks],
    )
    b = grouped.select(
        F.col("__str").alias("str_b"),
        F.col("__keys").alias("__keys_b"),
        F.explode(
            F.sequence(
                (F.length("__str") / width).cast("long") - 1,
                (F.length("__str") / width).cast("long") + 1,
            )
        ).alias("__bucket_b"),
        *[F.col(c).alias(f"__bb_{c}") for c in blocks],
    )
    cond = F.col("__bucket") == F.col("__bucket_b")
    for c in blocks:
        cond = cond & (F.col(f"__ba_{c}") == F.col(f"__bb_{c}"))
    return (
        a.join(b, cond, "inner")
        .filter(
            (F.col("str_a") < F.col("str_b"))
            & (F.levenshtein("str_a", "str_b") <= max_dist)
        )
        .select(
            "__keys_a",
            "__keys_b",
            F.levenshtein("str_a", "str_b").alias("dist"),
        )
    )


def _fuzzy_qgram_string_pairs(
    grouped: DataFrame, blocks: list[str], max_dist: int, q: int
) -> DataFrame:
    """q-gram-profile pigeonhole candidate join over distinct strings
    (see fuzzy_string_pairs).  All signature math is pure Column
    expressions: the gram array via a transform over positions, each
    part's sub-multiset via filter + array_sort, its signature via
    xxhash64 — per-row, shuffle-free, whole-stage-codegen friendly."""
    k = 2 * max_dist * q + 1
    grams = F.when(
        F.length("__str") >= q,
        F.expr(
            f"transform(sequence(1, length(__str) - {q - 1}),"
            f" i -> substring(__str, i, {q}))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    sigs = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    "",
                    F.array_sort(
                        F.filter(
                            F.col("__grams"),
                            lambda g: F.pmod(F.xxhash64(g), F.lit(k))
                            == F.lit(p),
                        )
                    ),
                )
            )
            for p in range(k)
        ]
    )
    side = grouped.select(
        F.col("__str"),
        F.col("__keys"),
        *[F.col(c).alias(f"__blk_{c}") for c in blocks],
        grams.alias("__grams"),
    ).select(
        "__str",
        "__keys",
        *[f"__blk_{c}" for c in blocks],
        F.posexplode(sigs).alias("__part", "__sig"),
    )
    a = side.select(
        F.col("__str").alias("str_a"),
        F.col("__keys").alias("__keys_a"),
        *[F.col(f"__blk_{c}").alias(f"__ba_{c}") for c in blocks],
        "__part",
        "__sig",
    )
    b = side.select(
        F.col("__str").alias("str_b"),
        F.col("__keys").alias("__keys_b"),
        *[F.col(f"__blk_{c}").alias(f"__bb_{c}") for c in blocks],
        F.col("__part").alias("__part_b"),
        F.col("__sig").alias("__sig_b"),
    )
    cond = (F.col("__part") == F.col("__part_b")) & (
        F.col("__sig") == F.col("__sig_b")
    )
    for c in blocks:
        cond = cond & (F.col(f"__ba_{c}") == F.col(f"__bb_{c}"))
    return (
        a.join(b, cond, "inner")
        .filter(
            (F.col("str_a") < F.col("str_b"))
            & (F.levenshtein("str_a", "str_b") <= max_dist)
        )
        .select(
            "str_a",
            "str_b",
            *[f"__ba_{c}" for c in blocks],
            "__keys_a",
            "__keys_b",
            F.levenshtein("str_a", "str_b").alias("dist"),
        )
        # a true pair can match on up to k parts — collapse the
        # multiplicity; bounded by k × matching string pairs.  The
        # dedup key includes the block columns: the SAME string pair
        # occurring in two blocks is two outputs with disjoint keys.
        .dropDuplicates(
            ["str_a", "str_b", *[f"__ba_{c}" for c in blocks]]
        )
        .select("__keys_a", "__keys_b", "dist")
    )
