"""Registry-wide window-spec audit: fail if ANY query's optimized
plan contains an UNPARTITIONED window spec (the data-sized serial
window shape — o2's pre-r7 plan; the r6 verdict's perf_weak class).

Every intentional single-partition window in the repo carries an
explicit all-zeros partition key (`catalog._zero_key` / the
`>> 62` idiom), so a windowspecdefinition whose first argument is an
ORDER BY expression is always a bug: either a forgotten explicit
spec (x21/x22/x26, fixed r7) or a genuine scale-killer.

Run:  python scripts/plan_audit.py            # full registry
      python scripts/plan_audit.py d5 w19     # name substrings
Exit 0 iff no offenders.  Plans only — nothing is executed beyond
plan-build collects (IVF seeds, kmeans calibration).
"""

from __future__ import annotations

import re
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    from stampede_to_fresco_etl_spark.catalog import REGISTRY
    from stampede_to_fresco_etl_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.001"
    needles = sys.argv[1:]
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad: list[tuple[str, str]] = []
    names = [
        n
        for n in sorted(REGISTRY)
        if not needles or any(s in n for s in needles)
    ]
    for name in names:
        fn, _sql = REGISTRY[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 — report and continue
            bad.append((name, f"PLAN ERROR: {str(ex)[:120]}"))
            continue
        for s in re.findall(r"windowspecdefinition\([^)]*\)", plan):
            first = s.split("(", 1)[1].split(",", 1)[0]
            if "ASC" in first or "DESC" in first:
                bad.append((name, s[:120]))
                break
    print(f"PLAN AUDIT: {len(names)} queries, {len(bad)} offenders")
    for n, s in bad:
        print(f"  {n} | {s}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
