"""Similarity search over embedding columns (`array<float>`):
brute-force cosine top-k as the exact baseline, and a sign-LSH
(random-hyperplane) bucketed variant as the scale path.

Determinism: dot products are left-to-right folds (F.aggregate over
zip_with) so results are bit-reproducible and checkable against a
DuckDB list_reduce oracle.  LSH hyperplanes are derived from md5
(functions.md5_int63), not an RNG, so bucket assignments are stable
across runs and engines.

Scale notes (100 TB / 10⁹ vectors):
  - brute force is a broadcast of the (small) probe set against the
    corpus — one scan, no shuffle, top-k via per-probe window;
  - sign-LSH cuts the candidate set ~2^planes×; buckets become the
    equi-join key so Catalyst shuffles only bucket-matched pairs;
    recall is tuned by planes (fewer planes = bigger buckets) and by
    probing neighboring buckets (multi-probe) if needed;
  - for IVF-style partitioning, replace the bucket id with a learned
    centroid id — the dataflow (bucket equi-join + window top-k) is
    identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

import hashlib


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product — deterministic double sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_with_norms(
    a: Column, b: Column, a_nrm: Column, b_nrm: Column
) -> Column:
    """Cosine from precomputed norms.  The denominator is nullif-
    guarded: a zero-norm (all-zero) vector yields null similarity
    instead of an ANSI DIVIDE_BY_ZERO error (Spark 4 runs ANSI mode
    by default); nulls sort last / fail thresholds, so zero vectors
    simply never match."""
    return _dot(a, b) / F.nullif(a_nrm * b_nrm, F.lit(0.0))


def cosine(a: Column, b: Column) -> Column:
    return cosine_with_norms(a, b, _norm(a), _norm(b))


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast probes × corpus, rank per probe.
    Ties broken by corpus id for determinism.

    Output: (probe_id, vec_id, cos_sim, rank)."""
    p = probes.select(
        F.col(probe_id_col),
        as_double_vec(vec_col).alias("p_vec"),
    ).withColumn("p_nrm", _norm(F.col("p_vec")))
    c = corpus.select(
        F.col(id_col), as_double_vec(vec_col).alias("c_vec")
    ).withColumn("c_nrm", _norm(F.col("c_vec")))
    # norms precomputed per vector (identical values, 3x fewer folds
    # than re-deriving them inside every pair's cosine)
    scored = c.crossJoin(F.broadcast(p)).select(
        probe_id_col,
        id_col,
        cosine_with_norms(
            F.col("p_vec"), F.col("c_vec"),
            F.col("p_nrm"), F.col("c_nrm"),
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(num_planes: int, dim: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG
    state, reproducible across engines and runs."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            v = int(h[:15], 16) % 2001 - 1000
            row.append(v / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit p = (vec · plane_p) > 0."""
    bucket: Column = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(w)) for w in plane])
        bucket = bucket + F.when(
            _dot(vec, lit_plane) > 0, F.lit(1 << p)
        ).otherwise(0)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    k: int = 10,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: bucket both sides with sign-LSH,
    equi-join on the bucket, rank within it.  Recall < 1 by design;
    the exact variant is the oracle for recall measurement."""
    planes = hyperplanes(num_planes, dim)
    c = corpus.select(
        F.col(id_col), as_double_vec(vec_col).alias("c_vec")
    ).withColumn("bucket", lsh_bucket(F.col("c_vec"), planes)).withColumn(
        "c_nrm", _norm(F.col("c_vec"))
    )
    p = probes.select(
        F.col(probe_id_col), as_double_vec(vec_col).alias("p_vec")
    ).withColumn("bucket", lsh_bucket(F.col("p_vec"), planes)).withColumn(
        "p_nrm", _norm(F.col("p_vec"))
    )
    scored = c.join(F.broadcast(p), "bucket").select(
        probe_id_col,
        id_col,
        cosine_with_norms(
            F.col("p_vec"), F.col("c_vec"),
            F.col("p_nrm"), F.col("c_nrm"),
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: cluster the corpus with
    seeded KMeans, assign every vector to its nearest centroid, and
    search each probe only in its `n_probe` nearest cells.

    This is the production-scale ANN layout: the centroid id becomes
    a partition/bucket key, so a query touches n_probe/n_centroids of
    the corpus.  Recall is tuned by n_probe; n_probe == n_centroids
    degrades gracefully to exact search.  Deterministic via the seed.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(id_col), as_double_vec(vec_col).alias("c_vec")
    ).withColumn("features", array_to_vector(F.col("c_vec")))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(c)
    assigned = model.transform(c).select(
        id_col, "c_vec", F.col("prediction").alias("cell")
    )

    centroids = [
        [float(x) for x in center] for center in model.clusterCenters()
    ]
    cent_lits = F.array(
        *[F.array(*[F.lit(x) for x in ctr]) for ctr in centroids]
    )

    p = probes.select(
        F.col(probe_id_col), as_double_vec(vec_col).alias("p_vec")
    ).withColumn("p_nrm", _norm(F.col("p_vec")))  # once, BEFORE explode
    # distance of the probe to every centroid -> n_probe nearest cells
    dists = F.transform(
        cent_lits,
        lambda ctr: F.aggregate(
            F.zip_with(F.col("p_vec"), ctr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    p = p.withColumn("d", dists)
    p = p.withColumn(
        "cells",
        F.expr(
            "slice(transform(array_sort("
            "transform(sequence(0, size(d) - 1), "
            "          i -> struct(element_at(d, i + 1) AS dist, i AS idx)), "
            "(l, r) -> CASE WHEN l.dist < r.dist THEN -1 "
            "          WHEN l.dist > r.dist THEN 1 ELSE 0 END), "
            f"s -> s.idx), 1, {n_probe})"
        ),
    )
    p = p.select(
        probe_id_col, "p_vec", "p_nrm", F.explode("cells").alias("cell")
    )
    scored = assigned.withColumn("c_nrm", _norm(F.col("c_vec"))).join(
        F.broadcast(p), "cell"
    ).select(
        probe_id_col,
        id_col,
        cosine_with_norms(
            F.col("p_vec"), F.col("c_vec"),
            F.col("p_nrm"), F.col("c_nrm"),
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    min_cosine: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join:
    (id_a, id_b, cos_sim) with id_a < id_b and cos_sim >= threshold.
    The bucket equi-join bounds the pair space; exactness within a
    bucket is full cosine."""
    planes = hyperplanes(num_planes, dim)
    v = df.select(
        F.col(id_col).alias("vid"), as_double_vec(vec_col).alias("vec")
    ).withColumn("bucket", lsh_bucket(F.col("vec"), planes)).withColumn(
        "nrm", _norm(F.col("vec"))
    )
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            cosine_with_norms(
                F.col("a.vec"), F.col("b.vec"),
                F.col("a.nrm"), F.col("b.nrm"),
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cosine)
    )
