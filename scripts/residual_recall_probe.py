"""Raw vs RESIDUAL IVF-PQ encoding — the recall-per-byte comparison
that justifies v22/v23 (FAISS IVFPQ's by_residual=true default):
same cells, same n_probe, same code budget (M×K), same batch-probe
plan shape; only the encoding differs.  For every held-out probe the
exact L2 top-k over the indexed corpus is the truth set
(`exact_l2_topk_arrow`), and recall@k is averaged over all probes.

Run:  python scripts/residual_recall_probe.py [sf_dir]
      python scripts/residual_recall_probe.py --clustered [n] [dirout]
Default sf_dir: /root/testdata/sf0.1.

Prints one JSON line per encoding: {"encoding", "recall_at_k",
"probes", "wall_cold_s" (serving-artifact build + first probe),
"wall_warm_s" (repeat probe off the materialized layout)}.

`--clustered` first materializes a CONTROLLED corpus (deterministic
numpy seed): 16 well-separated cluster centers in 64-d, points =
center + small isotropic noise — the geometry IVF-PQ is built for —
and runs the same comparison on it.  Why both modes exist (r10
measurement): the driver's synthetic embeddings are isotropic
noise, so at this code budget (M=4 × K=16 over 64 dims) BOTH
encodings' quantization error swamps the spread between true
neighbors and recall@10 collapses to single digits for raw AND
residual — the corpus has no within-cell structure for the residual
codebook to spend its capacity on, and the comparison measures
noise.  On the clustered corpus the encodings separate: raw codes
must describe absolute cluster positions (centroid-scale error);
residual codes only describe the within-cluster noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from stampede_to_fresco_etl_spark.catalog import (  # noqa: E402
    INGEST_IDX_BOUND,
    INGEST_SPLIT_SALT,
    _V19_TOPK,
    load,
    q_ivfpq_batch_probe,
    q_ivfpq_residual_batch_probe,
)
from stampede_to_fresco_etl_spark.functions import md5_int63  # noqa: E402
from stampede_to_fresco_etl_spark.operators.similarity import (  # noqa: E402
    as_double_vec,
    exact_l2_topk_arrow,
)
from stampede_to_fresco_etl_spark.session import get_spark  # noqa: E402


def structured_experiment(spark, n: int = 20000) -> None:
    """The regime where residual encoding actually pays, isolated:
    64 clusters (MORE than the K=16 codewords a raw PQ codebook has
    per subspace), 64 Lloyd-refined cells.  The coarse quantizer then
    acts as a free first-stage codebook — residuals are within-
    cluster noise the PQ codewords can describe, while raw codes must
    cover 64 cluster positions with 16 codewords and cannot.  Both
    encodings run through ONE generic pipeline (raw = residual
    against a zero centroid matrix), so the comparison isolates the
    encoding.  Prints distortion and recall@10 per encoding."""
    import numpy as np

    from stampede_to_fresco_etl_spark.operators.similarity import (
        _nearest_cell,
        _nearest_cells,
        _sqdist,
        _with_centroid_col,
        lit_double_matrix,
        lit_double_vec,
        partial_topk,
        pq_encode,
        seed_centroids,
    )
    from stampede_to_fresco_etl_spark.catalog import (
        _PQ_DIMS,
        _PQ_K,
        _PQ_M,
    )

    n_cells, n_clusters, dim = 64, 64, _PQ_M * _PQ_DIMS
    rng = np.random.default_rng(11)
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    pts = centers[np.arange(n) % n_clusters] + rng.normal(
        0.0, 0.05, (n, dim)
    )
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, v array<double>",
    ).repartition(8)
    emb = emb.persist()
    idx = emb.filter(F.col("vec_id") % 10 != 0)
    probes_df = emb.filter(F.col("vec_id") % 10 == 0).limit(512)

    # Lloyd refinement: md5-seeded start, 5 exact-mean iterations
    cents = seed_centroids(idx, "vec_id", "v", n_cells)
    for _ in range(5):
        assigned = (
            _with_centroid_col(idx, cents)
            .withColumn(
                "d",
                F.transform(
                    F.col("__cents"),
                    lambda c: _sqdist(F.col("v"), c),
                ),
            )
            .select("vec_id", "v", _nearest_cell("d").alias("cell"))
        )
        mean_rows = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("mx"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = (
                float(r["mx"])
            )
        cents = [
            [by_cell[c][d] for d in range(dim)]
            if c in by_cell
            else cents[c]
            for c in range(n_cells)
        ]
    assigned = (
        _with_centroid_col(idx, cents)
        .withColumn(
            "d",
            F.transform(
                F.col("__cents"), lambda c: _sqdist(F.col("v"), c)
            ),
        )
        .select("vec_id", "v", _nearest_cell("d").alias("cell"))
        .persist()
    )

    probe_rows = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in probes_df.collect()
    ]
    truth: dict[int, set[int]] = {}
    for r in exact_l2_topk_arrow(
        idx.select("vec_id", F.col("v").alias("cv")), probe_rows, k=10
    ).collect():
        truth.setdefault(int(r["probe_id"]), set()).add(
            int(r["vec_id"])
        )

    zero = [[0.0] * dim for _ in range(n_cells)]
    for name, enc_cents in (("raw", zero), ("residual", cents)):
        enc_lit = lit_double_matrix(enc_cents)
        rv = F.zip_with(
            "v",
            F.element_at(enc_lit, F.col("cell") + 1),
            lambda a, b: a - b,
        )
        seeds_rows = (
            assigned.select(
                "vec_id", rv.alias("rv")
            )
            .orderBy("vec_id")
            .limit(_PQ_K)
            .collect()
        )
        seeds = [[float(x) for x in r["rv"]] for r in seeds_rows]
        coded = pq_encode(
            assigned.select("vec_id", "cell", rv.alias("rv")),
            seeds,
            id_col="vec_id",
            vec_col="rv",
            m=_PQ_M,
            dims=_PQ_DIMS,
        )
        # pq_encode projects (id, codes, recon_err); re-attach cell
        coded = coded.join(assigned.select("vec_id", "cell"), "vec_id")
        distortion = coded.agg(F.avg("recon_err")).collect()[0][0]

        # batch probe, v23's shape: route -> explode -> per-(probe,
        # cell) LUT columns -> cell equi-join -> ADC -> top-k
        pr = spark.createDataFrame(
            probe_rows, "probe_id long, pv array<double>"
        )
        routed = (
            _with_centroid_col(pr, cents)
            .withColumn(
                "d",
                F.transform(
                    F.col("__cents"),
                    lambda c: _sqdist(F.col("pv"), c),
                ),
            )
            .select(
                "probe_id",
                "pv",
                F.explode(_nearest_cells("pv", "d", 2)).alias("cell"),
            )
            .withColumn(
                "qr",
                F.zip_with(
                    "pv",
                    F.element_at(enc_lit, F.col("cell") + 1),
                    lambda a, b: a - b,
                ),
            )
        )

        def _lut(s: int):
            rsub = lit_double_matrix(
                [
                    sd[s * _PQ_DIMS : (s + 1) * _PQ_DIMS]
                    for sd in seeds
                ]
            )
            qsub = F.slice("qr", s * _PQ_DIMS + 1, _PQ_DIMS)
            return F.transform(
                rsub, lambda c: _sqdist(qsub, c)
            ).alias(f"lut{s}")

        routed = routed.select(
            "probe_id", "cell", *[_lut(s) for s in range(_PQ_M)]
        )
        adc = None
        for s in range(_PQ_M):
            term = F.element_at(
                F.col(f"lut{s}"), F.col(f"code{s}") + 1
            )
            adc = term if adc is None else adc + term
        scored = coded.join(routed, "cell").select(
            "probe_id", "vec_id", adc.alias("adc_dist")
        )
        got: dict[int, set[int]] = {}
        for r in partial_topk(
            scored, "probe_id", "vec_id", 10,
            sim_col="adc_dist", ascending=True,
        ).collect():
            got.setdefault(int(r["probe_id"]), set()).add(
                int(r["vec_id"])
            )
        recs = [
            len(got.get(p, set()) & t) / len(t)
            for p, t in truth.items()
            if t
        ]
        print(
            json.dumps(
                {
                    "experiment": "structured-64cluster-64cell-lloyd5",
                    "encoding": name,
                    "mean_distortion": round(float(distortion), 4),
                    "recall_at_10": round(sum(recs) / len(recs), 4),
                    "probes": len(recs),
                }
            )
        )


def make_clustered(spark, n: int, out_dir: str) -> str:
    """A deterministic clustered corpus: 16 separated centers in
    64-d, within-cluster noise 1/20th of the center scale."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 1.0, (16, 64))
    pts = centers[np.arange(n) % 16] + rng.normal(0.0, 0.05, (n, 64))
    rows = [
        (int(i), [float(x) for x in pts[i]]) for i in range(n)
    ]
    (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )
    return out_dir


def main() -> None:
    spark = get_spark()
    if len(sys.argv) > 1 and sys.argv[1] == "--structured":
        structured_experiment(
            spark, int(sys.argv[2]) if len(sys.argv) > 2 else 20000
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--clustered":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
        out = (
            sys.argv[3]
            if len(sys.argv) > 3
            else "/root/repo/.scratch/clustered_corpus"
        )
        sf_dir = make_clustered(spark, n, out)
    else:
        sf_dir = (
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
        )
    measure(spark, sf_dir)


def measure(spark, sf_dir: str) -> None:
    emb = load(spark, sf_dir, "embeddings")
    h = md5_int63("vec_id", salt=INGEST_SPLIT_SALT)
    corpus = emb.filter(h < F.lit(INGEST_IDX_BOUND)).select(
        "vec_id", as_double_vec("embedding").alias("cv")
    )
    probe_rows = [
        (int(r["vec_id"]), [float(x) for x in r["pv"]])
        for r in emb.filter(h >= F.lit(INGEST_IDX_BOUND))
        .select("vec_id", as_double_vec("embedding").alias("pv"))
        .collect()
    ]
    truth: dict[int, set[int]] = {}
    for r in exact_l2_topk_arrow(
        corpus, probe_rows, k=_V19_TOPK
    ).collect():
        truth.setdefault(int(r["probe_id"]), set()).add(int(r["vec_id"]))

    for name, fn in (
        ("raw", q_ivfpq_batch_probe),
        ("residual", q_ivfpq_residual_batch_probe),
    ):
        t0 = time.time()
        rows = fn(spark, sf_dir).collect()
        cold = time.time() - t0
        t0 = time.time()
        rows = fn(spark, sf_dir).collect()
        warm = time.time() - t0
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(int(r["probe_id"]), set()).add(
                int(r["vec_id"])
            )
        recs = [
            len(got.get(p, set()) & t) / len(t)
            for p, t in truth.items()
            if t
        ]
        print(
            json.dumps(
                {
                    "encoding": name,
                    "recall_at_k": round(sum(recs) / len(recs), 4),
                    "k": _V19_TOPK,
                    "probes": len(recs),
                    "wall_cold_s": round(cold, 2),
                    "wall_warm_s": round(warm, 2),
                    "sf_dir": sf_dir,
                }
            )
        )


if __name__ == "__main__":
    main()
