#!/usr/bin/env python
"""Per-query optimization profiler (round 13).

For each named query (or the N slowest from a bench JSON): time it the way
the bench does (.collect(), median of passes), count the Spark jobs it
launches (job-group scoped), and dump .explain("formatted") to
plans/<round>/<query>_<tag>.txt (no dump when --tag is omitted).

Usage:
  python tools/profile_queries.py [--tag before|after] [--passes 2]
         [--round r14] [--sf-dir /root/testdata/sf0.1] query [query ...]

Prints one JSON line per query: {"query": ..., "sec": median, "jobs": n,
"passes": [...]}. "jobs" counts the Spark jobs of the FINAL pass only
(earlier passes may launch extra one-time jobs, e.g. state-cache builds).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None,
                    help="dump plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--round", default="r14", help="plans/ subdir for dumps")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from covid_19_data_engineering_spark.plans.registry import all_queries
    from covid_19_data_engineering_spark.session import get_spark

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    sc = spark.sparkContext
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.queries:
        if name not in queries:
            print(json.dumps({"query": name, "error": "not registered"}))
            continue
        walls: list[float] = []
        jobs = 0
        for i in range(args.passes):
            group = f"{name}-p{i}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(name)
            start = time.perf_counter()
            df = queries[name](spark, args.sf_dir)
            df.collect()
            walls.append(time.perf_counter() - start)
            tracker = sc.statusTracker()
            jobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup("idle", "idle")
        if args.tag:
            import contextlib
            import io
            df = queries[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as fh:
                fh.write(buf.getvalue())
        med = sorted(walls)[len(walls) // 2]
        print(json.dumps({
            "query": name, "sec": round(med, 3), "jobs": jobs,
            "passes": [round(w, 3) for w in walls],
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
