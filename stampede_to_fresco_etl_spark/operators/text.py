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

from pyspark.sql import Column
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.functions import _col

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
