#!/usr/bin/env python
"""PRUNE_ISIN_MAX crossover probe (r11, VERDICT r10 #7).

The batch routes prune unprobed clusters with a literal ``isin`` up to
PRUNE_ISIN_MAX probed ids (static partition filter, applied at file
listing) and a broadcast left-semi join above it (plan-size bound). The
16,384 constant was asserted from plan-size reasoning; this probe TIMES
both forms at a sweep of probed-set sizes so the constant rests on a
measurement.

Method: one cluster-partitioned parquet table (nlist real partitions,
one row group each), then per probed-set size N: build the pruned frame
with (a) the literal isin and (b) the broadcast semi-join over the SAME
collected id list, run ``count()`` best-of-R each. The probed ids cycle
through real partition ids, so both forms prune to the same physical
file set and the measured delta is exactly the two filter forms' cost
(plan build + literal evaluation vs broadcast exchange + DPP). A
plan-CONSTRUCTION timing rides along: the isin form's cost is
driver-side plan bloat, so it shows up in df construction + analysis,
which wall-clock includes.

Usage: python tools/prune_probe.py [--nlist 2048] [--sizes 1024,8192,16384,32768]
Writes one JSON line per size; wait for external load < 1.5 first (the
bench noise protocol).
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
    ap.add_argument("--nlist", type=int, default=2048)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--sizes", default="1024,4096,8192,16384,32768")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--wait-load", type=float, default=1.5)
    args = ap.parse_args()

    waited = 0.0
    while os.getloadavg()[0] > args.wait_load and waited < 900:
        print(f"load {os.getloadavg()[0]:.1f} > {args.wait_load}; waiting", file=sys.stderr)
        time.sleep(20)
        waited += 20

    import tempfile

    from pyspark.sql import functions as F

    from deployment_spark import get_spark

    spark = get_spark(app_name="prune-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.gettempdir(), f"prune_probe_{args.nlist}")
    if not os.path.isdir(root):
        (
            spark.range(args.rows)
            .select(
                F.col("id").alias("vec_id"),
                F.pmod("id", F.lit(args.nlist)).cast("int").alias("cluster_id"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(root)
        )
    table = spark.read.parquet(root)
    table.count()  # warm listing caches once

    results = []
    for n in [int(s) for s in args.sizes.split(",")]:
        # probed ids cycle through REAL partitions so both forms prune
        # to the same files; the list length is the measured variable
        probed = sorted({i % args.nlist for i in range(n)}) if n <= args.nlist else list(range(n))
        # when n > nlist the extra ids are nonexistent partitions —
        # plan-size cost still scales with n, pruning result unchanged
        forms = {}
        for form in ("isin", "semi"):
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                if form == "isin":
                    pruned = table.filter(F.col("cluster_id").isin(probed))
                else:
                    pr = spark.createDataFrame(
                        [(int(c),) for c in probed], "cluster_id int"
                    )
                    pruned = table.join(F.broadcast(pr), "cluster_id", "left_semi")
                pruned.count()
                times.append(round(time.perf_counter() - t0, 3))
            forms[form] = {"runs": times, "best": min(times)}
        row = {
            "probed": n,
            "nlist": args.nlist,
            "isin_best": forms["isin"]["best"],
            "semi_best": forms["semi"]["best"],
            "isin_runs": forms["isin"]["runs"],
            "semi_runs": forms["semi"]["runs"],
            "load_1m": round(os.getloadavg()[0], 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
