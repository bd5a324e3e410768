"""Probe-count scaling of the r12 one-declarative serving plans
(VERDICT r11 item 4 follow-through): SCALE.md r12 claims the
+0.4-0.7 s the declarative shape pays at the 3-probe calibration
size is "bought back the moment probe count grows" — this script
MEASURES that claim instead of asserting it.

Two serving families, probe counts 3 / 12 / 48, warm noop-sink
medians of 3 runs (artifact builds + LUT collects charged to an
untimed warmup, the frozen-core protocol):

- v17 flat ADC: the shipped one-scan plan (codes scan x broadcast
  LUT-row table + salted per-probe top-k window) vs a faithful
  reconstruction of the pre-r12 shape (one codes scan + inlined-LUT
  literals + TakeOrdered PER PROBE, unionAll'd) - the reconstruction
  is copied from the r12^ tree (`_pq_adc_from`/`_adc_expr`,
  catalog.py@7192ab8:19946-20050).
- v19 IVF-PQ serving: the shipped `_ivfpq_plan_probe(batch=False)`
  (in-plan routing, DPP-pruned cell join) vs the pre-r12
  `_ivfpq_probe` loop (driver-collected routing -> per-probe
  isin-pruned scan + TakeOrdered, unionAll'd,
  catalog.py@7192ab8:20822-20850).

Both reconstructions score with the same `_pq_dist_tables` values
the shipped plans use, so every (shape, n) pair returns identical
rows — the timing difference is purely plan shape.  The probe count
is swept by rebinding `catalog._V17_PROBES` (the module constant the
serving predicates read) for the duration of each config.

Run:  python scripts/probe_count_scaling.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PROBE_COUNTS = [3, 12, 48]
RUNS = 3


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from stampede_to_fresco_etl_spark import catalog as C
    from stampede_to_fresco_etl_spark import index_store
    from stampede_to_fresco_etl_spark.operators.similarity import (
        lit_double_vec,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def legacy_adc_expr(tab, p: int):
        # r12^ `_adc_expr`: per-probe LUTs inlined as array literals.
        adc = None
        for s in range(C._PQ_M):
            lut = lit_double_vec([float(v) for v in tab[(p, s)]])
            term = F.element_at(lut, F.col(f"code{s}") + 1)
            adc = term if adc is None else adc + term
        return adc

    def v17_legacy(n: int):
        tab = C._pq_dist_tables(spark, sf_dir, n)
        codes = index_store.read_pq_codes(
            spark, C._pq_codes_dir_cached(spark, sf_dir)
        ).select("vec_id", *[f"code{s}" for s in range(C._PQ_M)])
        outs = []
        for p in range(n):
            outs.append(
                codes.select(
                    F.lit(p).cast("long").alias("probe_id"),
                    "vec_id",
                    legacy_adc_expr(tab, p).alias("adc_dist"),
                )
                .orderBy(F.col("adc_dist").asc(), "vec_id")
                .limit(C._V17_TOPK)
            )
        out = outs[0]
        for t in outs[1:]:
            out = out.unionAll(t)
        return out

    def v17_declarative(n: int):
        tab = C._pq_dist_tables(spark, sf_dir, n)
        return C._pq_adc_from(
            spark, tab, C._pq_codes_dir_cached(spark, sf_dir)
        )

    def v19_legacy(n: int):
        emb = C.load(spark, sf_dir, "embeddings")
        serving, cent_dir = C._raw_ivfpq_serving(
            spark, sf_dir, C.V16_CENTROIDS
        )
        cells_of = C._ivfpq_probe_cells(
            spark, emb, cent_dir, C._V19_NPROBE
        )
        tab = C._pq_dist_tables(spark, sf_dir, n)
        ivfpq = index_store.read_ivfpq(spark, serving)
        outs = []
        for p in sorted(cells_of):
            outs.append(
                ivfpq.filter(F.col("cell").isin(cells_of[p]))
                .select(
                    F.lit(p).cast("long").alias("probe_id"),
                    "vec_id",
                    legacy_adc_expr(tab, p).alias("adc_dist"),
                )
                .orderBy(F.col("adc_dist").asc(), "vec_id")
                .limit(C._V19_TOPK)
            )
        out = outs[0]
        for t in outs[1:]:
            out = out.unionAll(t)
        return out

    def v19_declarative(n: int):
        serving, cent_dir = C._raw_ivfpq_serving(
            spark, sf_dir, C.V16_CENTROIDS
        )
        return C._ivfpq_plan_probe(
            spark, sf_dir, serving, cent_dir, C._V19_NPROBE, batch=False
        )

    shapes = {
        "v17_flat_adc": {
            "declarative": v17_declarative,
            "per_probe_loop": v17_legacy,
        },
        "v19_ivfpq_serving": {
            "declarative": v19_declarative,
            "per_probe_loop": v19_legacy,
        },
    }

    results: dict = {"sf_dir": sf_dir, "runs": RUNS, "configs": {}}
    saved = C._V17_PROBES
    try:
        for n in PROBE_COUNTS:
            C._V17_PROBES = n
            for fam, variants in shapes.items():
                # parity first: both shapes must return the same rows
                ref = None
                for shape, fn in variants.items():
                    rows = sorted(
                        (
                            (r["probe_id"], r["vec_id"])
                            for r in fn(n).collect()
                        )
                    )
                    if ref is None:
                        ref = rows
                    elif rows != ref:
                        raise AssertionError(
                            f"{fam} n={n}: {shape} disagrees with "
                            f"the declarative rows"
                        )
                for shape, fn in variants.items():
                    fn(n).write.format("noop").mode("overwrite").save()
                    walls = []
                    for _ in range(RUNS):
                        t0 = time.perf_counter()
                        fn(n).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        walls.append(
                            round(time.perf_counter() - t0, 3)
                        )
                    key = f"{fam}/n={n}/{shape}"
                    results["configs"][key] = {
                        "runs": walls,
                        "median": round(statistics.median(walls), 3),
                    }
                    print(key, results["configs"][key], flush=True)
    finally:
        C._V17_PROBES = saved

    print(json.dumps(results))
    if out_path:
        Path(out_path).write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
