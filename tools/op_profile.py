#!/usr/bin/env python
"""Per-query optimization profiler (guide §1: measure first).

For each named query: capture `.explain("formatted")` to
plans/r12/<name>_<tag>.txt, run N timed passes against the noop sink
(guide §1.4 — times the computation, not result pickling), and pull the
per-JOB wall-time breakdown from the Spark UI REST API so the time can
be attributed to jobs (persist materializations, localCheckpoints,
broadcast builds, the final action) instead of guessed at.

Usage:
  python tools/op_profile.py [--sf-dir DIR] [--passes N] [--tag before]
                             [--sink noop|collect] name [name ...]

Output: one JSON line per query on stdout
  {"name": ..., "passes": [sec...], "min": ..., "jobs": [
     {"desc": ..., "sec": ...}, ...]}  (jobs from the LAST pass only)
plus the plan file under plans/r12/.

The timed action defaults to the noop sink; --sink collect reproduces
bench.py's methodology (the driver contract) for comparability.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transit_feed_etl_spark.caching import release_caches
from transit_feed_etl_spark.queries import QUERIES
from transit_feed_etl_spark.session import get_spark


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def _jobs_since(spark, first_job_id: int) -> list[dict]:
    app = spark.sparkContext.applicationId
    jobs = _rest(spark, f"applications/{app}/jobs?status=succeeded")
    out = []
    for j in jobs:
        if j["jobId"] < first_job_id:
            continue
        t0 = j.get("submissionTime")
        t1 = j.get("completionTime")
        if not (t0 and t1):
            continue
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f"
        sec = (
            datetime.strptime(t1.replace("GMT", ""), fmt)
            - datetime.strptime(t0.replace("GMT", ""), fmt)
        ).total_seconds()
        out.append(
            {
                "jobId": j["jobId"],
                "desc": (j.get("description") or j.get("name") or "")[:120],
                "sec": round(sec, 3),
                "stages": j.get("numCompletedStages", 0),
                "tasks": j.get("numCompletedTasks", 0),
            }
        )
    return sorted(out, key=lambda x: x["jobId"])


def _next_job_id(spark) -> int:
    app = spark.sparkContext.applicationId
    try:
        jobs = _rest(spark, f"applications/{app}/jobs")
        return max((j["jobId"] for j in jobs), default=-1) + 1
    except Exception:
        return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--tag", default=None, help="plan file suffix (before/after)")
    ap.add_argument("--sink", choices=("noop", "collect"), default="collect")
    ap.add_argument("--plans-dir", default=None)
    args = ap.parse_args()

    # the engine session disables the UI; the profiler needs the REST
    # API for per-job attribution, so re-enable it here only
    spark = get_spark(
        app_name="op_profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1000).selectExpr("sum(id)").collect()  # session warmup

    plans_dir = args.plans_dir or os.path.join(
        os.path.dirname(__file__), "..", "plans", "r12"
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        q = QUERIES[name]
        if args.tag:
            df = q.builder(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
            release_caches()
        passes = []
        jobs: list[dict] = []
        for i in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            first_id = _next_job_id(spark)
            t0 = time.perf_counter()
            df = q.builder(spark, args.sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            passes.append(round(time.perf_counter() - t0, 3))
            if i == args.passes - 1:
                try:
                    jobs = _jobs_since(spark, first_id)
                except Exception:
                    jobs = []
            spark.catalog.clearCache()
            release_caches()
            spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "name": name,
                    "sink": args.sink,
                    "passes": passes,
                    "min": min(passes),
                    "n_jobs": len(jobs),
                    "job_sec_sum": round(sum(j["sec"] for j in jobs), 3),
                    "jobs": jobs,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
