"""10× rehearsal of the ENTITY delete daemon (r11): one takedown
feed fanned out to every artifact family, at sf0.1 AND sf1 —
bootstrap all six families, then two takedown waves of the SAME
absolute size at both scales through the real streaming runner
(`run_entity_delete_stream`, ONE landing dir + ONE checkpoint across
waves — the deployment shape; a fresh checkpoint per wave would
restart batch numbering and wave N+1's per-batch tombstone overwrite
would erase wave N's keys, which is exactly the daemon-contract
detail this rehearsal first got wrong and now pins).  If the
steady-wave wall is flat while
the corpus grows 10×, the per-wave cost is corpus-size-independent —
the daemon's O(batch keys) × families claim, executed.  After the
waves, one `erase_entities_compact` fold applies everything
physically; the rehearsal then verifies per-family that the RAW
(post-compaction) key sets equal bootstrap-minus-takedown exactly.

Run:  python scripts/entity_delete_rehearsal.py [wave_entities]
      python scripts/entity_delete_rehearsal.py [wave_entities] \
          --dirs=/root/testdata/sf0.1,/root/repo/testdata_sf10
          (e.g. the 100× proxy)
Prints one JSON line per scale:
  {"sf_dir": ..., "bootstrap_s": w, "families": 6,
   "waves": [{"entities": n, "wall_s": w}...], "compact_s": w,
   "families_exact": true}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_args = sys.argv[1:]
SF_DIRS = ("/root/testdata/sf0.1", "/root/repo/testdata_sf1")
for _a in list(_args):
    if _a.startswith("--dirs="):
        SF_DIRS = tuple(_a.split("=", 1)[1].split(","))
        _args.remove(_a)
WAVE_ENTITIES = int(_args[0]) if _args else 120


def run_scale(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from stampede_to_fresco_etl_spark import index_store
    from stampede_to_fresco_etl_spark.catalog import (
        MINHASH_BANDS,
        MINHASH_K,
        V16_CENTROIDS,
        V16_NPROBE,
        load,
    )
    from stampede_to_fresco_etl_spark.streaming.ann_stream import (
        apply_ann_batch,
    )
    from stampede_to_fresco_etl_spark.streaming.dedup_stream import (
        apply_dedup_batch,
    )
    from stampede_to_fresco_etl_spark.streaming.delete_stream import (
        run_entity_delete_stream,
    )
    from stampede_to_fresco_etl_spark.streaming.exact_fp_stream import (
        apply_exact_fp_batch,
    )
    from stampede_to_fresco_etl_spark.streaming.pq_codes_stream import (
        apply_pq_codes_batch,
    )
    from stampede_to_fresco_etl_spark.streaming.text_index_stream import (
        apply_text_index_batch,
    )

    tmp = Path(tempfile.mkdtemp(prefix="entity_del_"))
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    fams = {
        f: str(tmp / f)
        for f in (
            "exact_fp", "dedup", "postings", "doclen", "ann",
            "pq_codes",
        )
    }
    t0 = time.time()
    apply_exact_fp_batch(spark, docs, 0, fams["exact_fp"])
    apply_dedup_batch(
        spark, docs, 0, fams["dedup"], str(tmp / "m"),
        num_hashes=MINHASH_K, bands=MINHASH_BANDS,
    )
    apply_text_index_batch(
        spark, docs, 0, fams["postings"], fams["doclen"]
    )
    apply_ann_batch(
        spark, emb, 0, fams["ann"], str(tmp / "am"),
        str(tmp / "ac"), n_centroids=V16_CENTROIDS,
        n_probe=V16_NPROBE,
    )
    apply_pq_codes_batch(
        spark, emb, 0, fams["pq_codes"], str(tmp / "book")
    )
    bootstrap_s = round(time.time() - t0, 2)

    # deterministic takedown waves of FIXED absolute size at both
    # scales: the wave's keys are the corpus-independent variable
    doc_ids = [
        r["doc_id"]
        for r in docs.select("doc_id")
        .orderBy("doc_id")
        .limit(2 * WAVE_ENTITIES)
        .collect()
    ]
    waves, all_deleted = [], []
    land, ckpt = str(tmp / "land"), str(tmp / "ck")
    for w in range(2):
        batch_ids = doc_ids[w * WAVE_ENTITIES:(w + 1) * WAVE_ENTITIES]
        all_deleted.extend(batch_ids)
        ents = (
            docs.filter(F.col("doc_id").isin(batch_ids))
            .join(
                emb.filter(F.col("vec_id").isin(batch_ids)).select(
                    "vec_id"
                ),
                F.col("doc_id") == F.col("vec_id"),
                "full",
            )
            .select("doc_id", "text", "vec_id")
        )
        ents.coalesce(1).write.mode("append").parquet(land)
        t0 = time.time()
        run_entity_delete_stream(
            spark, land, fams, ckpt
        ).awaitTermination()
        waves.append(
            {
                "entities": len(batch_ids),
                "wall_s": round(time.time() - t0, 2),
            }
        )

    t0 = time.time()
    index_store.erase_entities_compact(spark, fams)
    compact_s = round(time.time() - t0, 2)

    # post-compaction RAW truth check per family
    del_docs = set(all_deleted)
    del_fps = {
        r["fp"]
        for r in docs.filter(F.col("doc_id").isin(all_deleted))
        .select(F.md5("text").alias("fp"))
        .collect()
    }
    vec_ids = {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    del_vecs = del_docs & vec_ids

    def keys(fam):
        col = index_store.ENTITY_FAMILIES[fam][0][0]
        return {
            r[col]
            for r in spark.read.option("basePath", fams[fam])
            .parquet(fams[fam])
            .select(col)
            .distinct()
            .collect()
        }

    all_docs = {r["doc_id"] for r in docs.select("doc_id").collect()}
    all_fps = {
        r["fp"]
        for r in docs.select(F.md5("text").alias("fp"))
        .distinct()
        .collect()
    }
    expect = {
        "exact_fp": all_fps - del_fps,
        "dedup": all_docs - del_docs,
        "postings": all_docs - del_docs,
        "doclen": all_docs - del_docs,
        "ann": vec_ids - del_vecs,
        "pq_codes": vec_ids - del_vecs,
    }
    ok = all(keys(f) == expect[f] for f in fams)
    return {
        "sf_dir": sf_dir,
        "bootstrap_s": bootstrap_s,
        "families": len(fams),
        "waves": waves,
        "compact_s": compact_s,
        "families_exact": bool(ok),
    }


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rc = 0
    for sf_dir in SF_DIRS:
        rec = run_scale(spark, sf_dir)
        print(json.dumps(rec), flush=True)
        if not rec["families_exact"]:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
