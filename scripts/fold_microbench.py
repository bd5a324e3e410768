"""Microbench: interpreted-fold variants for `_sqdist` (r12).

The r10 negative result (similarity.py NOTE) killed the UNROLLED
64-term expansion — the giant codegen'd expression blows the JIT
per-method budget and runs 5x slower than the fold.  This measures a
different shape that was never tried: an index-based left fold over a
LITERAL int array,

    aggregate(array(0..63), 0.0D,
              (acc, i) -> acc + (a[i]-b[i]) * (a[i]-b[i]))

which performs the IDENTICAL IEEE op sequence as the zip_with fold
(same adds, same order — bit-exact twin) but never materializes the
per-pair 64-element squared-diff array that zip_with allocates.

Run: python scripts/fold_microbench.py [n_pairs] [runs]
Prints per-variant wall seconds and cross-checks bit-exactness of all
variants against the zip_with fold on a sample.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from stampede_to_fresco_etl_spark.session import get_spark  # noqa: E402

DIM = 64


def zipwith_fold(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def idx_fold_sql(a: str, b: str, dim: int) -> str:
    idx = ",".join(str(i) for i in range(dim))
    return (
        f"aggregate(array({idx}), 0.0D, "
        f"(acc, i) -> acc + (({a}[i])-({b}[i])) * (({a}[i])-({b}[i])))"
    )


def seq_fold_sql(a: str, b: str) -> str:
    # per-row sequence() allocation instead of a literal index array
    return (
        f"aggregate(sequence(0, size({a}) - 1), 0.0D, "
        f"(acc, i) -> acc + (({a}[i])-({b}[i])) * (({a}[i])-({b}[i])))"
    )


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="fold-microbench")
    sc = spark.sparkContext

    # deterministic synthetic pairs: two dim-64 double vectors per row
    base = spark.range(n_pairs).repartition(sc.defaultParallelism)
    va = F.expr(
        "transform(sequence(0, %d), i -> cast(pmod(id * 31 + i * 7, 997) "
        "as double) / 997.0D)" % (DIM - 1)
    )
    vb = F.expr(
        "transform(sequence(0, %d), i -> cast(pmod(id * 17 + i * 13, 991) "
        "as double) / 991.0D)" % (DIM - 1)
    )
    pairs = base.select(va.alias("a"), vb.alias("b")).localCheckpoint()

    variants = {
        "zipwith_fold": lambda df: df.select(
            zipwith_fold(F.col("a"), F.col("b")).alias("d")
        ),
        "idx_fold_lit": lambda df: df.select(
            F.expr(idx_fold_sql("a", "b", DIM)).alias("d")
        ),
        "seq_fold": lambda df: df.select(
            F.expr(seq_fold_sql("a", "b")).alias("d")
        ),
    }

    # bit-exactness cross-check on a sample
    chk = pairs.limit(2000)
    ref = [
        r["d"]
        for r in chk.select(
            zipwith_fold(F.col("a"), F.col("b")).alias("d")
        ).collect()
    ]
    for name, make in variants.items():
        got = [r["d"] for r in make(chk).collect()]
        same = all(x == y for x, y in zip(ref, got)) and len(ref) == len(got)
        print(f"bitexact {name}: {same}")
        if not same:
            return 1

    for name, make in variants.items():
        df = make(pairs)
        sc.setJobDescription(f"warm:{name}")
        df.select(F.sum("d")).collect()  # warm
        walls = []
        for r in range(runs):
            sc.setJobDescription(f"{name}:{r}")
            t0 = time.time()
            df.select(F.sum("d")).collect()
            walls.append(time.time() - t0)
        print(f"{name}: " + " ".join(f"{w:.3f}" for w in walls))
    return 0


if __name__ == "__main__":
    sys.exit(main())
