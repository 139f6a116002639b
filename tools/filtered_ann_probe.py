"""Measure the filtered-ANN route crossover (r11): exact prefilter scan
vs index-probe + postfilter + rescue, as a function of predicate
selectivity — the measurement behind ``ivf.PREFILTER_FRAC``.

Fixture: content-distinct ×REP replicas of sf0.1 embeddings (ids
offset, vectors jittered deterministically via a per-replica constant
rotation of coordinates — cluster geometry preserved, rows distinct),
IVF index at nlist ≈ √n. Predicates vec_id % m = 0 for a selectivity
sweep. Both routes run at full probe (the exactness regime the gated
entry uses); per-(m, route) best-of-N wall seconds.

Usage: python tools/filtered_ann_probe.py [--sf DIR] [--rep 16] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rep", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--mods", default="64,32,16,8,4,2")
    ap.add_argument(
        "--nprobes",
        default="10,full",
        help="postfilter probe depths: 'full' = exact regime (the gated "
        "entry's setting, where postfilter degenerates to a corpus "
        "scan), numbers = the pruned serving regime the auto-route "
        "crossover actually lives in",
    )
    args = ap.parse_args()

    from deployment_spark import get_spark
    from deployment_spark.operators.ivf import IVFIndex, reference_nlist

    spark = get_spark(app_name="filtered-ann-probe")
    base = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    dim = len(base.select("embedding").first()[0])
    parts = [base]
    for i in range(1, args.rep):
        # coordinate rotation: distinct rows, same norm/cluster geometry
        rot = [F.col("embedding")[(j + i) % dim] for j in range(dim)]
        parts.append(
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.array(*rot).alias("embedding"),
                "label",
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.localCheckpoint()
    n = corpus.count()
    root = os.path.join(tempfile.gettempdir(), f"fann_probe_{args.rep}x")
    idx = IVFIndex(spark, root).build(corpus, nlist=reference_nlist(n))
    queries = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def best(fn):
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return min(ts), ts

    nprobes = [
        10**9 if x.strip() == "full" else int(x) for x in args.nprobes.split(",")
    ]
    for m in (int(x) for x in args.mods.split(",")):
        pred = F.col("vec_id") % m == 0
        n_match = corpus.filter(pred).count()
        t_pre, raw_pre = best(
            lambda: idx.filtered_search(
                queries, pred, k=5, route="prefilter"
            ).collect()
        )
        for np_ in nprobes:
            t_post, raw_post = best(
                lambda: idx.filtered_search(
                    queries, pred, k=5, nprobe=np_, route="postfilter"
                ).collect()
            )
            print(
                json.dumps(
                    {
                        "mod": m,
                        "nprobe": "full" if np_ >= idx.nlist() else np_,
                        "n": n,
                        "n_match": n_match,
                        "frac": round(n_match / n, 4),
                        "prefilter_s": round(t_pre, 3),
                        "postfilter_s": round(t_post, 3),
                        "winner": "prefilter" if t_pre <= t_post else "postfilter",
                        "prefilter_raw": [round(t, 3) for t in raw_pre],
                        "postfilter_raw": [round(t, 3) for t in raw_post],
                        "load_1m": round(os.getloadavg()[0], 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
