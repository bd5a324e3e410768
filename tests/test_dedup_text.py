"""Unit tests for the dedup + text-analysis operators on tiny
hand-checked corpora."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.operators import text as T
from stampede_to_fresco_etl_spark.operators.dedup import (
    exact_dedup,
    exact_duplicate_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)


def docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_exact_dedup(spark):
    df = docs_df(spark, ["aa bb", "aa bb", "cc dd", "aa bb"])
    groups = exact_duplicate_groups(df, "doc_id", "text").collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in groups}
    assert by_keep == {0: 3, 2: 1}
    kept = exact_dedup(df, "doc_id", "text")
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]


def test_word_shingles_and_fingerprint(spark):
    df = docs_df(spark, ["a b c d", "x y"])
    out = df.select(
        "doc_id", T.word_shingles(T.tokens("text")).alias("sh")
    ).collect()
    sh = {r["doc_id"]: r["sh"] for r in out}
    assert sh[0] == ["a b c", "b c d"]
    assert sh[1] == []  # shorter than k -> empty, not descending-seq junk
    fp = df.select(
        T.min_shingle_fingerprint(T.tokens("text")).alias("f")
    ).collect()
    assert fp[0]["f"] is not None and fp[1]["f"] is None


def test_minhash_identical_docs_full_signature_match(spark):
    df = docs_df(
        spark,
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",
            "completely different words appear in this one here",
        ],
    )
    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=6)
    rows = {r["doc"]: [r[f"mh{j}"] for j in range(6)] for r in sigs.collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]
    pairs = minhash_lsh_pairs(df, "doc_id", "text", num_hashes=6, bands=3)
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert got[(0, 1)] == 1.0
    assert (0, 2) not in got and (1, 2) not in got


def test_ngram_jaccard_exact_value(spark):
    # doc0 shingles: {a b c, b c d}; doc1: {a b c, b c x}
    # inter=1, union=3 -> 1/3
    df = docs_df(spark, ["a b c d", "a b c x"])
    out = ngram_jaccard_pairs(df, "doc_id", "text").collect()
    assert len(out) == 1
    assert math.isclose(out[0]["jaccard"], 1 / 3, rel_tol=1e-12)


def test_ngram_jaccard_hot_shingle_cap(spark):
    # 200 docs all share one boilerplate shingle ("common header x");
    # each also has a unique tail.  Uncapped, the hot shingle alone
    # emits 200*199/2 = 19900 pairs; with the df cap it is dropped
    # from the universe, so only the two near-dup docs pair up.
    texts = [f"common header x unique{i} tail{i} end{i}" for i in range(200)]
    texts.append("common header x unique0 tail0 end0")  # true dup of doc 0
    df = docs_df(spark, texts)
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", max_shingle_df=50, min_jaccard=0.5
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in capped] == [(0, 200)]
    # post-cap universes of docs 0/200 are identical -> jaccard 1.0
    assert capped[0]["jaccard"] == 1.0
    # uncapped at the same threshold: hot shingle drags unrelated
    # pairs in at jaccard 1/9 < 0.5, so the near-dup answer is the
    # same — the cap only removes join-explosion work, checked above
    uncapped = ngram_jaccard_pairs(
        df, "doc_id", "text", min_jaccard=0.5
    ).collect()
    assert len(uncapped) == 1


def test_simhash_similar_docs_close(spark):
    df = docs_df(
        spark,
        [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",
            "one two three four five six seven eight",
        ],
    )
    rows = {r["doc"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(rows[0], rows[1]) < hamming(rows[0], rows[2])


def test_stopword_and_lang(spark):
    df = docs_df(spark, ["the cat is on the mat", "xyz qrs tuv"])
    out = df.select(
        "doc_id",
        T.stopword_count("text").alias("n"),
        T.lang_id("text").alias("lang"),
    ).collect()
    got = {r["doc_id"]: (r["n"], r["lang"]) for r in out}
    assert got[0] == (3, "en")  # the, is, the
    assert got[1] == (0, "unk")


def test_token_stats(spark):
    df = docs_df(spark, ["a a b"])
    r = df.select(
        T.token_count("text").alias("n"),
        T.distinct_token_ratio("text").alias("r"),
    ).first()
    assert r["n"] == 3
    assert math.isclose(r["r"], 2 / 3, rel_tol=1e-12)


def test_prefix_filter_jaccard_output_identical(spark):
    """AllPairs/PPJoin prefix path must be output-identical to the
    naive inverted-index join at every threshold (it is a candidate-
    pruning scheme + exact verification, never an approximation)."""
    from stampede_to_fresco_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = [
        Row(doc_id=1, text="a b c d e f g h"),
        Row(doc_id=2, text="a b c d e f g z"),     # high overlap w/ 1
        Row(doc_id=3, text="a b c x y z q w"),     # partial overlap
        Row(doc_id=4, text="p q r s t u v w"),
        Row(doc_id=5, text="p q r s t u v w"),     # exact dup of 4
        Row(doc_id=6, text="completely different tokens only here"),
        Row(doc_id=7, text="a b"),                 # shorter than k
    ]
    df = spark.createDataFrame(rows)
    for t in (0.1, 0.3, 0.5, 0.8, 0.99):
        naive = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", 3, t, None
            ).collect()
        }
        pp = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", 3, t, None, prefix_filter=True
            ).collect()
        }
        assert pp == naive, f"divergence at t={t}"
    # exact duplicate survives at the top threshold
    top = ngram_jaccard_pairs(
        df, "doc_id", "text", 3, 0.99, None, prefix_filter=True
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in top} == {(4, 5)}

    # hot-shingle cap applies identically on both paths
    capped_naive = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", 3, 0.2, 2
        ).collect()
    }
    capped_pp = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", 3, 0.2, 2, prefix_filter=True
        ).collect()
    }
    assert capped_pp == capped_naive

    with pytest.raises(ValueError):
        ngram_jaccard_pairs(
            df, "doc_id", "text", 3, 0.0, None, prefix_filter=True
        )


def test_simhash_pairs_planted_near_dup(spark):
    """Two docs differing by one token must pair with small Hamming;
    an unrelated doc must not pair with either (32-bit sigs)."""
    from stampede_to_fresco_etl_spark.operators.dedup import simhash_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base.replace("lazy", "sleepy")
    other = "completely different content about spark catalyst engine " * 4
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_pairs(df, "doc_id", "text",
                                  bits=32, max_hamming=6).collect()}
    assert (1, 2) in got and got[(1, 2)] <= 6
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_pairs_multiband_collision_unique(spark):
    """A pair whose signatures match in EVERY band (identical docs)
    meets in all max_hamming+1 bands — the candidate dedup (full-row
    distinct since r12; ha/hb are functions of the ids) must still
    emit exactly ONE row for it, with hamming 0."""
    from stampede_to_fresco_etl_spark.operators.dedup import simhash_pairs

    text = "identical content repeated for signature stability " * 4
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = simhash_pairs(
        df, "doc_id", "text", bits=32, max_hamming=3
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in rows] == [
        (1, 2, 0)
    ]


def test_dedup_keep_best_picks_highest_quality(spark):
    """Planted near-dup trio: the survivor is the max-quality member
    (NOT the min id); singletons always survive."""
    from stampede_to_fresco_etl_spark.operators.dedup import dedup_keep_best

    base = "alpha beta gamma delta epsilon zeta eta theta " * 5
    df = spark.createDataFrame(
        [
            (1, base + "iota", 0.2),
            (2, base + "kappa", 0.9),   # best copy, higher id
            (3, base + "lambda", 0.5),
            (9, "totally unrelated text about nothing shared here "
                "with more words than shingles need", 0.1),
        ],
        "doc_id long, text string, quality double",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_keep_best(
        df, "doc_id", "text", "quality", min_jaccard=0.3,
        max_shingle_df=None,
    ).collect()}
    assert got == {2: 1, 9: 9}  # doc 2 survives cluster 1; 9 singleton
