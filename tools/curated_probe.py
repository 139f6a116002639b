"""Curated-ingest batch-count probe: per-batch admission cost over a
LONG batch sequence.

The incremental design's claim is that admitting batch N costs O(batch
+ matched kept), not O(kept): the kept corpus is probed through the
maintained LSH signature index, the replay watermark is a pointer read,
and inserts take the assume_new O(batch) path. scale_probe's --store
mode evidences the store layer; THIS probe evidences the whole curated
loop — land K files, drain them one checkpointed micro-batch at a time,
and time each drain as the kept corpus grows. Flat per-batch time (modulo
the fixed ~1-2 s AvailableNow machinery) is the pass signal; growth
proportional to batch INDEX would mean an O(kept) term crept back in.

Each batch carries fresh docs plus near-copies of batch-0 docs so every
batch exercises the kept-side index, not just intra-batch dedup.

Usage: python tools/curated_probe.py [--batches 10] [--src .../sf0.1]
Prints one JSON line per batch and a slope summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from deployment_spark import get_spark
    from deployment_spark.operators.crud import SnapshotStore
    from deployment_spark.streaming.ingest import curated_ingest_to_store

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="curated_probe_")
    landing = os.path.join(root, "landing")
    M = 10_000_000
    docs = spark.read.parquet(os.path.join(args.src, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_batches = args.batches
    per_batch: list[float] = []
    try:
        store = SnapshotStore(spark, os.path.join(root, "corpus"), key="doc_id")
        for b in range(n_batches):
            nat = docs.filter(F.col("doc_id") % n_batches == b).select(
                (F.lit(b * M) + F.col("doc_id")).alias("doc_id"), "text"
            )
            batch = nat
            if b > 0:
                # near-copies of batch-0 docs: forces kept-side index probes
                batch = nat.unionByName(
                    docs.filter(
                        (F.col("doc_id") % n_batches == 0) & (F.col("doc_id") < 200)
                    ).select(
                        (F.lit(b * M + 5_000_000) + F.col("doc_id")).alias("doc_id"),
                        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
                    )
                )
            batch.coalesce(1).write.parquet(os.path.join(landing, f"b={b:03d}"))
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("recursiveFileLookup", "true")
                .parquet(landing)
            )
            t0 = time.perf_counter()
            q = curated_ingest_to_store(
                stream,
                store,
                os.path.join(root, "ckpt"),
                index_dir=os.path.join(root, "idx"),
            )
            q.awaitTermination(600)
            dt = time.perf_counter() - t0
            per_batch.append(dt)
            print(
                json.dumps(
                    {
                        "probe": "curated",
                        "batch": b,
                        "sec": round(dt, 3),
                        "kept_rows": store.count(),
                    }
                ),
                flush=True,
            )
        head = sum(per_batch[1:4]) / 3
        tail = sum(per_batch[-3:]) / 3
        print(
            json.dumps(
                {
                    "metric": "curated_batch_slope",
                    "batches": n_batches,
                    "first3_avg_s": round(head, 3),
                    "last3_avg_s": round(tail, 3),
                    "tail_over_head": round(tail / head, 2) if head else None,
                }
            ),
            flush=True,
        )
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
