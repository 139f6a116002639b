#!/usr/bin/env python
"""Measure the broadcast-vs-blocked exact top-k crossover (VERDICT r7
next #4): `topk_similarity_join` collects + broadcasts the query set —
the right shape for FAISS-contract batches (nq ≈ 10-10³), impossible
for a 10⁶-query offline scoring workload where no task can hold the
nq×d query matrix. `topk_similarity_join_blocked` never collects or
broadcasts either side. This probe times BOTH paths over a fixed
corpus at nq ∈ {1k, 4k, 16k, 65k, 131k} and records the cost curves
plus each path's per-task query-side footprint (the quantity that
actually kills the broadcast path at scale — nq·d·8 bytes per task,
vs a constant block for the blocked path).

What "broadcast" pays, growing with nq: the driver collect, the
broadcast (nq·d·8 bytes resident in every task), nq python-loop
iterations per corpus partition, and nq·k·P survivor rows into the
final window. What "blocked" pays: corpus bytes ×QB replication +
|q|·CB — linear in nq with a flat per-task footprint.

Usage: python tools/blocked_topk_probe.py
Emits one JSON line per (path, nq) plus a fitted summary, for the
BASELINE.md "blocked top-k crossover" note.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from deployment_spark import get_spark
    from deployment_spark.operators.similarity import (
        topk_similarity_join,
        topk_similarity_join_blocked,
    )

    spark = get_spark(app_name="blocked-topk-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    DIM, K, RUNS = 64, 5, 3
    N_CORPUS = 20_000
    corpus = (
        spark.range(N_CORPUS)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.sin(F.col("id") * i * 0.7213),
            ).cast("array<double>").alias("embedding"),
        )
        .cache()
    )
    corpus.count()

    results = []
    for nq in (1_000, 4_000, 16_000, 65_000, 131_000):
        queries = (
            spark.range(nq)
            .select(
                F.col("id").alias("query_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(DIM)),
                    lambda i: F.cos(F.col("id") * i * 0.3141),
                ).cast("array<double>").alias("query_vec"),
            )
            .cache()
        )
        queries.count()
        for path, fn in (
            (
                "broadcast",
                lambda: topk_similarity_join(corpus, queries, k=K),
            ),
            (
                "blocked",
                lambda: topk_similarity_join_blocked(
                    corpus,
                    queries,
                    k=K,
                    query_block_rows=8192,
                    corpus_block_rows=8192,
                ),
            ),
        ):
            fn().count()  # warm
            ts = []
            for _ in range(RUNS):
                t0 = time.time()
                n = fn().count()
                ts.append(time.time() - t0)
            rec = {
                "path": path,
                "nq": nq,
                "rows": n,
                "best_sec": round(min(ts), 3),
                "runs_sec": [round(t, 3) for t in ts],
                # the scale-limiting quantity: query-side bytes EVERY
                # scoring task must hold
                "per_task_query_mb": round(
                    (nq if path == "broadcast" else 8192) * DIM * 8 / 1e6, 1
                ),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        queries.unpersist()

    by = {(r["path"], r["nq"]): r["best_sec"] for r in results}
    nqs = sorted({r["nq"] for r in results})
    summary = {
        "summary": True,
        "corpus": N_CORPUS,
        "dim": DIM,
        "k": K,
        "slope_broadcast": round(by[("broadcast", nqs[-1])] / by[("broadcast", nqs[0])], 2),
        "slope_blocked": round(by[("blocked", nqs[-1])] / by[("blocked", nqs[0])], 2),
        "nq_ratio": nqs[-1] // nqs[0],
        "broadcast_per_task_mb_at_max": round(nqs[-1] * DIM * 8 / 1e6, 1),
        "blocked_per_task_mb": round(8192 * DIM * 8 / 1e6, 1),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
