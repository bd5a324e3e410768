"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, document fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly) — no Python
UDFs.  Tokenization is whitespace-split; hashing is md5-based so
results are reproducible outside Spark (functions.md5_int63).

Scale notes: every operator here is embarrassingly parallel per-row
(no shuffle); shuffles only appear when a caller aggregates the
outputs.  At 100 TB the text column dominates I/O — callers should
project early so the parquet scan prunes to (id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import _col, md5_int63

#: Minimal English stopword list used by the quality/lang-id
#: heuristics (shared with the DuckDB oracles — keep sorted).
STOPWORDS = ["a", "an", "and", "is", "of", "the", "to"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(_col(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: unique tokens / total tokens — a cheap
    quality signal (boilerplate & spam score low)."""
    t = tokens(col)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t).cast(
        "double"
    )


def stopword_count(
    col: Column | str, stopwords: list[str] | None = None
) -> Column:
    sw = stopwords or STOPWORDS
    sw_arr = F.array(*[F.lit(w) for w in sw])
    return F.size(
        F.filter(tokens(col), lambda t: F.array_contains(sw_arr, t))
    ).cast("long")


def stopword_ratio(
    col: Column | str, stopwords: list[str] | None = None
) -> Column:
    return stopword_count(col, stopwords).cast("double") / token_count(
        col
    ).cast("double")


def lang_id(col: Column | str, threshold: float = 0.05) -> Column:
    """N-gram-free heuristic language ID: English if the stopword
    ratio clears the threshold.  (A production system would plug a
    real classifier into the same per-row contract.)"""
    return F.when(stopword_ratio(col) >= threshold, F.lit("en")).otherwise(
        F.lit("unk")
    )


def word_shingles(token_col: Column | str, k: int = 3) -> Column:
    """Positional k-word shingles (space-joined) over a token-array
    column — the dedup unit for MinHash / Jaccard.  Empty result for
    docs shorter than k tokens."""
    t = _col(token_col)
    idx = F.sequence(F.lit(1), F.size(t) - (k - 1))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j) for j in range(k)]
        ),
    )
    # sequence(1, n) runs DESCENDING when n < 1 — guard short docs
    # with an explicit empty array.
    return F.when(F.size(t) >= k, sh).otherwise(
        F.array().cast("array<string>")
    )


def min_shingle_fingerprint(token_col: Column | str, k: int = 3) -> Column:
    """Document fingerprint: lexicographic min of md5(shingle) — a
    1-permutation MinHash usable as a near-dup blocking key."""
    return F.array_min(
        F.transform(word_shingles(token_col, k), lambda s: F.md5(s))
    )


#: BPE-ish pre-tokenizer: the GPT-2 pattern simplified to the regex
#: subset Java regex and RE2 (DuckDB) interpret identically — ASCII
#: classes, no lookahead (RE2 has none), contractions first.  Counts
#: from it track real BPE pre-tokenization closely enough for corpus
#: budgeting; the ratio to whitespace words is the usual
#: tokens-per-word cost signal.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer (whitespace counts
    are in `token_count`; a pretraining budget wants both)."""
    return F.size(
        F.regexp_extract_all(_col(col), F.lit(BPE_ISH_PATTERN), 0)
    ).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing rolling-hash fingerprints (Schleimer et al., SIGMOD
    '03 — the MOSS scheme): hash every k-gram, slide a window of `w`
    consecutive hashes, keep each window's minimum; the distinct mins
    are the doc's fingerprints.  Guarantees: any shared run of
    k+w-1 tokens between two docs yields at least one SHARED
    fingerprint, while only ~2/(w+1) of hashes are kept — the
    position-robust blocking key for substring-level (not whole-doc)
    overlap detection that min_shingle_fingerprint's single global
    min cannot give.

    Docs with fewer than `w` k-grams keep the min of what exists (≥1
    fingerprint whenever the doc has ≥ k tokens).

    Output: (id, fingerprint) — one row per distinct fingerprint.

    Scale shape: hashing, windows and mins are all in-row array ops
    (zero shuffle, one scan); downstream grouping by fingerprint is
    the only exchange, carrying one 8-byte hash per kept window."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    # arrays materialized per projection — the _shingled no-CSE trap
    sh = base.select(
        F.col(id_col), word_shingles(F.col("__t"), k).alias("__sh")
    )
    h = sh.select(
        F.col(id_col),
        F.transform(F.col("__sh"), lambda s: md5_int63(s)).alias("__h"),
    )
    n = F.size(F.col("__h"))
    wins = (
        F.when(
            n >= w,
            F.transform(
                F.sequence(F.lit(1), n - w + 1),
                lambda i: F.array_min(F.slice(F.col("__h"), i, w)),
            ),
        )
        .when(n >= 1, F.array(F.array_min(F.col("__h"))))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return h.select(
        F.col(id_col),
        F.explode(F.array_distinct(wins)).alias("fingerprint"),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    lowercase: bool = True,
):
    """Tokenizer vocabulary construction: global token counts →
    min-count cutoff → contiguous id assignment by (count DESC,
    token ASC).

    Scale contract: the COUNT is the big step and it is fully
    distributed (explode + hash aggregate with map-side combine —
    the shuffle carries one row per distinct token per partition,
    not per occurrence).  The id-assignment window runs on the
    FILTERED vocabulary, which is dimension-sized no matter how big
    the corpus (min_count trims the hapax mass; real vocabularies
    are ≤ a few million rows), so the single-partition row_number is
    a dimension-side step — the same class as IVF's centroid
    collect — never a fact-table global sort."""
    c = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    counts = (
        df.select(F.explode(tokens(c)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    from pyspark.sql import Window as W

    # Explicit all-zeros partition key (catalog._zero_key's idiom:
    # a non-negative long >> 62 is always 0, and the expression is
    # non-foldable): semantically the same single partition, but the
    # spec is EXPLICIT, so Spark's "No Partition Defined" WindowExec
    # warning stays a true canary for data-sized serial windows —
    # this one is dimension-sized by the min_count contract above.
    order = W.partitionBy(
        F.shiftright(F.col("n_occurrences"), 62)
    ).orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return counts.select(
        (F.row_number().over(order) - 1).cast("long").alias("token_id"),
        "token",
        "n_occurrences",
    )


def keyword_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """TF-IDF-style keyword extraction: top-k terms per document by
    tf × idf, with the RATIONAL idf (N - df + 0.5)/(df + 0.5) —
    BM25's idf without the log.  Log-free on purpose: ln() is
    correctly rounded in neither JVM nor C libm, so a transcendental
    idf can drift 1 ulp between engines; the rational form is exact
    IEEE arithmetic on integers and reproduces bit-for-bit anywhere.

    Shuffle shape: one (doc, term) hash-agg for tf; df is a
    re-aggregate of tf (vocab-sized, broadcast back); top-k is the
    salted two-stage window (no per-doc mega-partition).

    Output: (id_col, term, score, rank), rank ∈ [1, k].
    """
    from stampede_to_fresco_etl_spark.operators.similarity import partial_topk

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = (
        F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col, "term",
            (F.col("tf").cast("double") * idf).alias("score"),
        )
    )
    return partial_topk(scored, id_col, "term", k, sim_col="score")


def heavy_hitters(
    df: DataFrame, group_col: str, text_col: str, k: int = 10
) -> DataFrame:
    """Top-k most frequent tokens per group (corpus frequency tables
    for LM data analysis).  Count hash-agg (map-side combine) +
    salted two-stage top-k.  Output: (group_col, term, n, rank)."""
    from stampede_to_fresco_etl_spark.operators.similarity import partial_topk

    toks = df.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    counts = toks.groupBy(group_col, "term").agg(F.count("*").alias("n"))
    return partial_topk(counts, group_col, "term", k, sim_col="n")


def quality_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style document quality heuristics (Rae et al. 2021,
    §A1.1 repetition/quality filters) as pure Column expressions —
    the signals a pretraining pipeline thresholds on before tokenizing
    100 TB of text.  Zero shuffle; one pass over (id, text).

    Output per doc:
      n_words            whitespace tokens
      mean_word_len      Σ len(word) / n_words
      alpha_word_ratio   words containing ≥1 ascii letter / n_words
      symbol_word_ratio  ('#' + '…'-as-'...') occurrences / n_words
      n_lines            newline-split line count
      bullet_line_ratio  lines starting '- ' or '* '
      ellipsis_line_ratio lines ending '...'
      dup_line_ratio     1 − distinct lines / lines
      dup_line_char_ratio 1 − chars in distinct lines / chars in lines

    All ratios are single IEEE divisions of exact integer counts, so
    any engine reproduces them bit-for-bit (the same reason
    keyword_topk uses a rational idf)."""
    t = F.col(text_col)
    toks = tokens(t)
    lines = F.split(t, "\n")
    n_words = F.size(toks).cast("long")
    n_lines = F.size(lines).cast("long")
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    alpha_words = F.size(
        F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    symbols = (
        F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
        + (
            F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))
        ) / F.lit(3)
    ).cast("long")
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("- ") | l.startswith("* "),
        )
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.endswith("..."))
    ).cast("long")
    dlines = F.array_distinct(lines)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    dline_chars = F.aggregate(
        dlines, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        (dbl(word_chars) / dbl(n_words)).alias("mean_word_len"),
        (dbl(alpha_words) / dbl(n_words)).alias("alpha_word_ratio"),
        (dbl(symbols) / dbl(n_words)).alias("symbol_word_ratio"),
        n_lines.alias("n_lines"),
        (dbl(bullet_lines) / dbl(n_lines)).alias("bullet_line_ratio"),
        (dbl(ellipsis_lines) / dbl(n_lines)).alias("ellipsis_line_ratio"),
        (F.lit(1.0) - dbl(F.size(dlines)) / dbl(n_lines)).alias(
            "dup_line_ratio"
        ),
        (F.lit(1.0) - dbl(dline_chars) / dbl(F.nullif(line_chars, F.lit(0))))
        .alias("dup_line_char_ratio"),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style duplicate n-gram fractions (Rae et al. 2021,
    §A1.1 "fraction of duplicate n-grams") — the repetition signals a
    pretraining filter thresholds on, complementing quality_signals'
    line-level dup ratios with token-level ones.

    Per doc and per n in `ns`:
      n_{n}grams          total positional word n-grams (with repeats)
      dup_{n}gram_ratio   1 − distinct n-grams / total (NULL when the
                          doc has no n-gram of that length)

    Scale shape: pure Column expressions over the in-row token array
    (word_shingles without the dedup) — zero shuffle, no explode; the
    whole computation pipelines inside the scan stage at any corpus
    size.  Ratios are single IEEE divisions of exact integer counts,
    reproducible bit-for-bit in any engine.

    The token array AND each n-gram array are materialized as columns
    through intermediate projections: Spark does no CSE inside lambda
    bodies or across expression trees, so inlining `tokens()` into
    word_shingles' element_at lambda re-runs the regex split per
    element — O(|doc|²) splits per doc (the _shingled trap; measured
    here as 25.6 s → 0.5 s at sf0.1)."""
    base = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    grams = base.select(
        F.col(id_col),
        *[
            word_shingles(F.col("__toks"), n).alias(f"__g{n}")
            for n in ns
        ],
    )
    cols: list[Column] = [F.col(id_col)]
    for n in ns:
        g = F.col(f"__g{n}")
        total = F.size(g).cast("long")
        distinct = F.size(F.array_distinct(g)).cast("long")
        cols.append(total.alias(f"n_{n}grams"))
        cols.append(
            F.when(
                total > 0,
                F.lit(1.0)
                - distinct.cast("double") / total.cast("double"),
            ).alias(f"dup_{n}gram_ratio")
        )
    return grams.select(*cols)


#: Email pattern restricted to the regex subset (char classes, +,
#: bracketed literal dot) that Java regex and RE2 interpret
#: identically — keep engine-portable.
EMAIL_PATTERN = r"[a-z0-9._-]+@[a-z0-9.-]+[.][a-z]+"


def redact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pattern: str = EMAIL_PATTERN,
    mask: str = "<EMAIL>",
) -> DataFrame:
    """PII scrubbing pass: count pattern hits, replace every match
    with the mask token, count residuals (0 when the mask can't
    re-match), fingerprint the result.  Pure per-row Column
    expressions — no shuffle, no Python.

    Output: (id_col, n_hits_before, n_hits_after, redacted_digest,
    redacted)."""
    t = F.col(text_col)
    red = F.regexp_replace(t, pattern, mask)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(pattern)).cast("long").alias("n_hits_before"),
        F.regexp_count(red, F.lit(pattern)).cast("long").alias(
            "n_hits_after"
        ),
        F.md5(red).alias("redacted_digest"),
        red.alias("redacted"),
    )
