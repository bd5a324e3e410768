"""10× rehearsal of the streaming ingest capstone (VERDICT r7
item 6): the gate→dedup-probe→admit pipeline at sf0.1 AND sf1
volume, bootstrap (80%) plus two steady batches of the SAME absolute
size at both scales — if the steady-batch wall is flat while the
indexed corpus grows 10×, the per-batch cost is corpus-size-
independent, which is the capstone's whole scaling claim.

Run:  python scripts/ingest_capstone_rehearsal.py [batch_docs]
Prints one JSON line per scale:
  {"sf_dir": ..., "bootstrap_docs": N, "bootstrap_s": w,
   "steady": [{"docs": n, "wall_s": w, "admitted": a, "dups": d}...]}
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
SF_DIRS = ("/root/testdata/sf0.1", "/root/repo/testdata_sf1")


def run_scale(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from stampede_to_fresco_etl_spark.catalog import load
    from stampede_to_fresco_etl_spark.streaming.ingest_pipeline import (
        run_ingest_pipeline,
    )

    work = Path(tempfile.mkdtemp(prefix="ingest_capstone_"))
    landing = str(work / "landing")
    dirs = {k: str(work / k) for k in ("drop", "dup", "admitted", "index")}
    ckpt = str(work / "ckpt")
    Path(landing).mkdir()

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_total = docs.count()
    # doc ids need not be contiguous (the replicated sf1 corpus
    # shifts replica ids) — take the 2·BATCH_DOCS highest ids as the
    # two steady waves (bounded collect), everything below as the
    # bootstrap.
    top = [
        r["doc_id"]
        for r in docs.select("doc_id")
        .orderBy(F.col("doc_id").desc())
        .limit(2 * BATCH_DOCS)
        .collect()
    ]
    b_mid, b_lo = top[BATCH_DOCS - 1], top[2 * BATCH_DOCS - 1]
    waves = [
        docs.filter(F.col("doc_id") < b_lo),
        docs.filter(
            (F.col("doc_id") >= b_lo) & (F.col("doc_id") < b_mid)
        ),
        docs.filter(F.col("doc_id") >= b_mid),
    ]
    boot_hi = b_lo
    out = {
        "sf_dir": sf_dir,
        "bootstrap_docs": int(n_total - 2 * BATCH_DOCS),
        "steady": [],
    }
    for i, wave in enumerate(waves):
        wave.write.mode("append").parquet(landing)
        t0 = time.time()
        run_ingest_pipeline(
            spark, landing, dirs["drop"], dirs["dup"], dirs["admitted"],
            dirs["index"], ckpt,
        ).awaitTermination(1200)
        wall = round(time.time() - t0, 2)
        if i == 0:
            out["bootstrap_s"] = wall
        else:
            admitted = (
                spark.read.parquet(dirs["admitted"])
                .filter(F.col("doc_id") >= boot_hi)
                .count()
            )
            # stream partitions are checkpoint-id + 1 (batch_id=0 is
            # reserved for the snapshot bootstrap)
            dups = spark.read.parquet(
                f"{dirs['dup']}/batch_id={i + 1}"
            ).count()
            out["steady"].append(
                {
                    "docs": BATCH_DOCS,
                    "wall_s": wall,
                    "admitted": int(admitted) if i == 1 else None,
                    "dups": int(dups),
                }
            )
    out["index_docs"] = int(
        spark.read.parquet(dirs["index"]).select("doc").distinct().count()
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in SF_DIRS:
        print(json.dumps(run_scale(spark, sf_dir)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
