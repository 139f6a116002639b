"""Measure standing-query maintenance cost vs corpus growth (r11): the
claim is O(batch·nq) work per batch — flat as the store grows — vs the
poll-search alternative that rescans the whole corpus per poll.

Streams B equal batches into a store with ``standing_topk_maintain``
on, timing each ``foreachBatch`` turn (maintenance included), and times
the poll-search equivalent (exact top-k over the full corpus) at the
same corpus checkpoints. Per-batch maintenance should stay flat while
poll-search grows with the corpus.

Usage: python tools/standing_probe.py [--batches 8] [--rows 4000] [--nq 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--rows", type=int, default=4000)
    ap.add_argument("--nq", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from deployment_spark import get_spark
    from deployment_spark.operators.crud import SnapshotStore
    from deployment_spark.operators.similarity import topk_similarity_join_expr
    from deployment_spark.streaming.ingest import (
        _maintain_standing_topk,
        read_standing_topk,
    )

    spark = get_spark(app_name="standing-probe")
    rng = np.random.default_rng(3)
    q = rng.normal(size=(args.nq, args.dim))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    queries = spark.createDataFrame(
        [(i, q[i].tolist()) for i in range(args.nq)],
        "query_id long, query_vec array<double>",
    )
    root = tempfile.mkdtemp(prefix="standing_probe_")
    store = SnapshotStore(spark, os.path.join(root, "store"), key="vec_id")
    cfg = {"root": os.path.join(root, "state"), "queries": queries, "k": args.k}

    for b in range(args.batches):
        x = rng.normal(size=(args.rows, args.dim))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        batch = spark.createDataFrame(
            [(b * args.rows + i, x[i].tolist()) for i in range(args.rows)],
            "vec_id long, embedding array<double>",
        ).localCheckpoint()  # exclude createDataFrame cost from the timing
        t0 = time.monotonic()
        prev_v = store.current_version() if store.exists() else 0
        store.insert(batch)
        t_insert = time.monotonic() - t0
        t0 = time.monotonic()
        _maintain_standing_topk(store, batch, prev_v, cfg)
        t_maint = time.monotonic() - t0
        t0 = time.monotonic()
        poll = topk_similarity_join_expr(store.read(), queries, k=args.k)
        poll.collect()
        t_poll = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "batch": b,
                    "corpus": (b + 1) * args.rows,
                    "insert_s": round(t_insert, 3),
                    "maintain_s": round(t_maint, 3),
                    "poll_search_s": round(t_poll, 3),
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
    # sanity: maintained state ≡ final poll-search
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in read_standing_topk(spark, cfg["root"]).collect()
    }
    want = {
        (r.query_id, r.rank): r.vec_id
        for r in topk_similarity_join_expr(store.read(), queries, k=args.k).collect()
    }
    print(json.dumps({"state_equals_poll": got == want}))


if __name__ == "__main__":
    main()
