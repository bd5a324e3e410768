"""One-off measurement for the x52/g4 densification caveat
(VERDICT r7 item 7): their 10× rehearsal ratios (6.14× / 4.29×) were
attributed to the replicated sf1 corpus densifying the shared
d5-config pair stage — replicas of one document pair with each
other, so pair volume grows ~quadratically in the replication factor
while a real corpus under the df cap grows ~linearly.  This probe
turns that argument into numbers: the d5-config pair stage (k=3,
jaccard ≥ 0.3, df-cap 100) at sf0.1 vs the replicated sf1, as
configured and with the cap tightened below the replica df blow-up.

Run:  python scripts/densification_probe.py
Prints one JSON line per (scale, cap) with pair count and wall.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SCALES = {"sf0.1": "/root/testdata/sf0.1", "sf1": "/root/repo/testdata_sf1"}
CAPS = (100, 32)


def main() -> int:
    from pyspark.sql import SparkSession

    from stampede_to_fresco_etl_spark.catalog import load
    from stampede_to_fresco_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for cap in CAPS:
        walls = {}
        for tag, sf_dir in SCALES.items():
            docs = load(spark, sf_dir, "documents")
            # warm the input scan so the wall is the pair stage
            docs.count()
            t0 = time.time()
            n = ngram_jaccard_pairs(
                docs, "doc_id", "text",
                shingle_k=3, min_jaccard=0.3, max_shingle_df=cap,
            ).count()
            walls[tag] = (round(time.time() - t0, 2), int(n))
        w01, n01 = walls["sf0.1"]
        w1, n1 = walls["sf1"]
        print(
            json.dumps(
                {
                    "cap": cap,
                    "sf0.1": {"wall_s": w01, "pairs": n01},
                    "sf1": {"wall_s": w1, "pairs": n1},
                    "wall_ratio": round(w1 / w01, 2),
                    "pair_ratio": round(n1 / max(n01, 1), 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
