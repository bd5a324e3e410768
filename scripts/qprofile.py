"""Per-query wall breakdown for the optimization rounds: where does a
timed bench call actually spend its time?

For each named query this reports, separately:
  - construct_s: Python-side DataFrame construction (catalog fn call —
    includes any session-cached artifact build on the FIRST call, so
    the steady-state number is the 2nd+ call);
  - explain_s: analysis + optimization wall (explain("formatted"),
    plan printed to plans/r12/<q>_<label>.txt on request);
  - exec runs: warm noop-sink walls (construct + execute, the bench's
    timed shape), with per-job wall attribution from the UI REST API
    when the UI is on.

Run:  python scripts/qprofile.py [--plans=label] [--runs=N] q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(spark):
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app_id}/jobs"
        with urllib.request.urlopen(url, timeout=5) as r:
            return json.load(r)
    except Exception:
        return []


def main() -> int:
    args = sys.argv[1:]
    plans_label = None
    runs = 3
    names = []
    for a in args:
        if a.startswith("--plans="):
            plans_label = a.split("=", 1)[1]
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        else:
            names.append(a)

    from stampede_to_fresco_etl_spark.catalog import (
        REGISTRY,
        warm_shared_frames,
    )
    from stampede_to_fresco_etl_spark.session import get_spark

    spark = get_spark(
        app_name="qprofile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    warm_shared_frames(spark, SF_DIR)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn, _sql = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"{name}: first construct")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_construct_first = time.perf_counter() - t0

        t0 = time.perf_counter()
        df2 = fn(spark, SF_DIR)
        t_construct_warm = time.perf_counter() - t0

        t0 = time.perf_counter()
        plan = df2._sc._jvm.PythonSQLUtils.explainString(
            df2._jdf.queryExecution(), "formatted"
        )
        t_explain = time.perf_counter() - t0
        if plans_label:
            with open(
                os.path.join(plans_dir, f"{name}_{plans_label}.txt"), "w"
            ) as f:
                f.write(plan)

        # one untimed warm execution (bench's warmup shape)
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()

        walls = []
        job_breakdowns = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            before_jobs = {j["jobId"] for j in _jobs(spark)}
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
            time.sleep(0.2)
            new = [
                j
                for j in _jobs(spark)
                if j["jobId"] not in before_jobs
            ]
            import datetime

            def _ts(s):
                return datetime.datetime.strptime(
                    s[:23], "%Y-%m-%dT%H:%M:%S.%f"
                )

            job_breakdowns.append(
                [
                    (
                        j.get("jobId"),
                        round(
                            (
                                _ts(j["completionTime"])
                                - _ts(j["submissionTime"])
                            ).total_seconds(),
                            2,
                        )
                        if j.get("completionTime")
                        else None,
                        j.get("numTasks"),
                    )
                    for j in sorted(new, key=lambda j: j["jobId"])
                ]
            )
        print(
            json.dumps(
                {
                    "query": name,
                    "construct_first_s": round(t_construct_first, 3),
                    "construct_warm_s": round(t_construct_warm, 3),
                    "explain_s": round(t_explain, 3),
                    "exec_walls_s": [round(w, 3) for w in walls],
                    "n_jobs_last_run": len(job_breakdowns[-1])
                    if job_breakdowns
                    else None,
                    "jobs_last_run": job_breakdowns[-1]
                    if job_breakdowns
                    else None,
                }
            )
        )
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
