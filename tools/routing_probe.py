#!/usr/bin/env python
"""Measure the driver-vs-distributed IVF routing crossover (VERDICT r6
next #5): the `routing="auto"` threshold in operators/ivf.py was
asserted at 1,024 lists, not measured. This probe times BOTH routings
producing the same (query_id, cluster_id) artifact over synthetic
centroid tables at nlist ∈ {100, 1k, 4k, 16k, 64k} (dim 64, nq 20,
nprobe 10) and records where each cost component grows.

What "driver" pays: parse centroids.json (linear in nlist), one numpy
argsort per query, createDataFrame of nq×nprobe pairs. What
"distributed" pays: a Spark job over the centroid parquet (per-partition
numpy top-nprobe + a survivor-sized window) — roughly constant in nlist
until the centroid table itself needs many partitions.

Usage: python tools/routing_probe.py [--out BASELINE_note]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from deployment_spark import get_spark
    from deployment_spark.operators.ivf import IVFIndex

    spark = get_spark(app_name="routing-probe", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(11)
    DIM, NQ, NPROBE, RUNS = 64, 20, 10, 3

    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=DIM)]) for i in range(NQ)],
        "query_id long, query_vec array<double>",
    ).cache()
    queries.count()
    qrows = queries.collect()

    results = []
    root_base = tempfile.mkdtemp(prefix="routing_probe_")
    try:
        for nlist in (100, 1_000, 4_000, 16_000, 64_000):
            root = os.path.join(root_base, f"n{nlist}")
            cents = rng.normal(size=(nlist, DIM))
            idx = IVFIndex(spark, root)
            os.makedirs(root, exist_ok=True)
            with open(os.path.join(root, "centroids.json"), "w") as f:
                json.dump(
                    {"nlist": nlist, "dim": DIM, "centroids": [c.tolist() for c in cents]},
                    f,
                )
            idx._write_centroids_parquet([c.tolist() for c in cents])

            # warm both paths once (codegen, file cache)
            idx.route(qrows, NPROBE)
            idx.route_distributed(queries, NPROBE).count()

            drv, dist, parse = [], [], []
            for _ in range(RUNS):
                # informational: the JSON-parse component of the driver
                # path, timed SEPARATELY. route() parses internally, so
                # the driver total below already includes exactly one
                # parse — adding this on top double-counted it and
                # biased the first published crossover low (r7 review
                # finding; the corrected table supersedes it).
                t0 = time.perf_counter()
                cents_loaded = idx.centroids()
                parse.append(time.perf_counter() - t0)
                del cents_loaded
                t0 = time.perf_counter()
                pairs, _probed = idx.route(qrows, NPROBE)
                spark.createDataFrame(pairs, ["query_id", "cluster_id"]).count()
                drv.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                idx.route_distributed(queries, NPROBE).count()
                dist.append(time.perf_counter() - t0)
            row = {
                "nlist": nlist,
                "driver_s": round(min(drv), 3),
                "driver_json_parse_s": round(min(parse), 3),
                "distributed_s": round(min(dist), 3),
                "driver_bytes": nlist * DIM * 8,
            }
            results.append(row)
            print(json.dumps(row))
    finally:
        shutil.rmtree(root_base, ignore_errors=True)

    # crossover estimate: driver cost is parse-dominated and linear in
    # nlist; distributed is ~flat. Solve driver(nlist) = distributed.
    a = np.polyfit([r["nlist"] for r in results], [r["driver_s"] for r in results], 1)
    flat = float(np.median([r["distributed_s"] for r in results]))
    crossover = int((flat - a[1]) / a[0]) if a[0] > 0 else -1
    print(
        json.dumps(
            {
                "driver_slope_s_per_list": round(float(a[0]), 9),
                "distributed_flat_s": round(flat, 3),
                "estimated_crossover_nlist": crossover,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
