"""IVF-PQ serving probe vs cell count — the inverse-scaling check.

The v19 serving layout is parquet partitioned BY CELL; a probe scans
n_probe cells' partitions.  Growing the cell count should SHRINK the
per-probe wall (each inverted list holds n_probe/n_cells of the
corpus), bounded below by per-file open overhead — the measurement
that justifies √N cells at deployment scale.  Uses the same warm
protocol as scripts/rehearse.py: artifact builds (ann assignment at
each cell count, the ivfpq join) are charged to an untimed warm
call; the timed number is the steady-state probe.

Run:  python scripts/ivfpq_cellcount_probe.py [sf_dir] [cells ...]
Default: /root/repo/testdata_sf1 at 16 and 64 cells.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    cells = [int(a) for a in sys.argv[2:]] or [16, 64]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from stampede_to_fresco_etl_spark.catalog import _V19_NPROBE, _ivfpq_topk

    from stampede_to_fresco_etl_spark import index_store

    for n in cells:
        df = _ivfpq_topk(spark, sf_dir, n, _V19_NPROBE)
        df.write.format("noop").mode("overwrite").save()  # warm + build
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            _ivfpq_topk(spark, sf_dir, n, _V19_NPROBE).write.format(
                "noop"
            ).mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        walls.sort()
        # the quantity that scales: candidate rows actually scanned
        # behind the partition filter (wall at this sf is per-call
        # overhead-bound; at 10^9 vectors the scan IS the cost)
        path = (
            f"{index_store._scratch()}/index_store/ivfpq/"
            f"{index_store._key(sf_dir)}_{n}c"
        )
        total = index_store.read_ivfpq(spark, path).count()
        scanned = 0
        import pyspark.sql.functions as F

        serving = index_store.read_ivfpq(spark, path)
        from stampede_to_fresco_etl_spark.catalog import (
            INGEST_IDX_BOUND,
            INGEST_SPLIT_SALT,
            _V17_PROBES,
        )

        # re-derive each probe's cells exactly as the query does
        from stampede_to_fresco_etl_spark.catalog import load
        from stampede_to_fresco_etl_spark.operators.similarity import (
            _nearest_cells,
            _sqdist,
            _with_centroid_col,
            as_double_vec,
        )
        from stampede_to_fresco_etl_spark.functions import md5_int63

        emb = load(spark, sf_dir, "embeddings")
        idx = emb.filter(
            md5_int63("vec_id", salt=INGEST_SPLIT_SALT)
            < F.lit(INGEST_IDX_BOUND)
        )
        _i, cent_dir = index_store.ann_index_dirs(spark, sf_dir, idx, n)
        cents = index_store.read_ann_centroids(spark, cent_dir)
        probes = emb.filter(F.col("vec_id") < _V17_PROBES).select(
            "vec_id", as_double_vec("embedding").alias("pv")
        )
        pc = (
            _with_centroid_col(probes, cents)
            .withColumn(
                "d",
                F.transform(
                    F.col("__cents"), lambda c: _sqdist(F.col("pv"), c)
                ),
            )
            .select(
                "vec_id",
                F.explode(
                    _nearest_cells("pv", "d", _V19_NPROBE)
                ).alias("cell"),
            )
            .collect()
        )
        for r in pc:
            scanned += serving.filter(
                F.col("cell") == int(r["cell"])
            ).count()
        print(
            f"cells={n:4d} n_probe={_V19_NPROBE}: "
            f"median {walls[1]:.2f}s (runs {[round(w, 2) for w in walls]}), "
            f"rows scanned {scanned}/{total} "
            f"({100.0 * scanned / total:.1f}% of corpus across "
            f"{_V17_PROBES} probes)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
