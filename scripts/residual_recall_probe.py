"""Raw vs RESIDUAL IVF-PQ encoding — the recall-per-byte comparison
that justifies v22/v23 (FAISS IVFPQ's by_residual=true default):
same cells, same n_probe, same code budget (M×K), same batch-probe
plan shape; only the encoding differs.  For every held-out probe the
exact L2 top-k over the indexed corpus is the truth set
(`exact_l2_topk_arrow`), and recall@k is averaged over all probes.

Run:  python scripts/residual_recall_probe.py [sf_dir]
Default sf_dir: /root/testdata/sf0.1.

Prints one JSON line per encoding: {"encoding", "recall_at_k",
"probes", "wall_cold_s" (serving-artifact build + first probe),
"wall_warm_s" (repeat probe off the materialized layout)}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
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
