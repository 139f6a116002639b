#!/usr/bin/env python
"""Per-entry profiling harness for the optimization rounds.

For each named registry entry (default: the bench HEADLINE list), this
times `fn(spark, sf_dir).count()` (bench parity) AND a noop-sink write
(guide §1.4 — forces every column, so plan-level column pruning can't
hide work), counts the Spark jobs each invocation launches (driver
round-trips are a first-order cost at bench scale), and captures
`explain("formatted")` to a plans directory.

Usage:
  python tools/profile_entries.py [--sf DIR] [--runs N] [--plans DIR]
                                  [--noop] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deployment_spark import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    def _positive(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("--runs must be >= 1")
        return n

    ap.add_argument("--runs", type=_positive, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain output")
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink write")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE
    from deployment_spark.queries import REGISTRY

    spark = get_spark(app_name="profile-entries")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.names or HEADLINE
    tracker = spark.sparkContext.statusTracker()

    # Warm pass at the smallest SF (bench parity: codegen/JIT outside
    # the timed region).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != args.sf:
        for name in names:
            try:
                REGISTRY[name][0](spark, warm_dir).count()
            except Exception:
                pass
    from deployment_spark.queries import _ivf_index

    _ivf_index(spark, args.sf)

    out = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        times, job_counts = [], []
        for i in range(args.runs):
            group = f"prof_{name}_{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            built = time.perf_counter() - t0
            df.count()
            t = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)
            jobs = len(tracker.getJobIdsForGroup(group))
            times.append(round(t, 3))
            job_counts.append(jobs)
            if i == 0:
                first_build = round(built, 3)
        rec = {
            "count_best": min(times),
            "count_runs": times,
            "jobs": job_counts[-1],
            "build_s": first_build,
        }
        if args.noop:
            df = fn(spark, args.sf)
            nt = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                nt.append(round(time.perf_counter() - t0, 3))
            rec["noop_best"] = min(nt)
            rec["noop_runs"] = nt
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            # execute THIS DataFrame's own queryExecution (collect does;
            # count()/noop build a new one) so AQE finalizes the plan —
            # exchange reuse and coalescing only show in the final plan
            df.collect()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            rec["exchanges"] = len(re.findall(r"\bExchange\b", plan))
            rec["python_evals"] = len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow", plan)
            )
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    total = round(sum(r["count_best"] for r in out.values()), 3)
    print(json.dumps({"total_count_best": total, "load_1m": round(os.getloadavg()[0], 2)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
