"""Measure the BM25 serving-cadence claim (r11): a persisted inverted
index answers a literal-term query at O(query-term postings) cost while
the from-scratch path pays O(corpus) per query.

Arms, on content-distinct 1x/4x/8x replicas of sf0.1 documents
(the scale_probe replication recipe — ids offset, text salted so token
statistics stay comparable without being byte-identical):

  direct   — bm25_topk(corpus, terms): re-tokenizes the corpus per query
  indexed  — BM25Index.topk(terms): bucket-pruned postings scan
  build    — one-time index build cost at each scale (the amortized term)

Prints one JSON line per (scale, arm) with best-of-N wall seconds, plus
the postings files read vs total for the indexed arm (partition-pruning
evidence). Usage:  python tools/bm25_probe.py [--sf DIR] [--runs N]
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--scales", default="1,4,8")
    ap.add_argument("--buckets", default="16",
                    help="comma list — the r12 granularity sweep runs "
                         "16,64,256 at the top scale (VERDICT r11 #5)")
    ap.add_argument("--rebucket-from", type=int, default=None,
                    help="also time rebucket(first bucket value) from an "
                         "index built at THIS count (the migration path)")
    ap.add_argument("--delete-frac", type=float, default=None,
                    help="also probe DELETE PRESSURE (r13, VERDICT r12 "
                         "Wrong #4): tombstone this fraction of docs, "
                         "record query cost tombstoned vs compacted — "
                         "the O(deleted) anti-join the fraction trigger "
                         "exists to fold away")
    args = ap.parse_args()

    from deployment_spark import get_spark
    from deployment_spark.operators.retrieval import BM25Index, bm25_topk
    from deployment_spark.queries import BM25_TERMS

    spark = get_spark(app_name="bm25-probe")
    base = spark.read.parquet(f"{args.sf}/documents.parquet").select("doc_id", "text")
    n_base = base.count()

    def replicate(k: int):
        if k == 1:
            return base
        parts = [base]
        for i in range(1, k):
            parts.append(
                base.select(
                    (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" rep{i}tail")).alias("text"),
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    def best(fn):
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return min(ts), ts

    bucket_list = [int(b) for b in str(args.buckets).split(",")]
    for k in (int(s) for s in args.scales.split(",")):
      corpus = replicate(k).localCheckpoint()
      n = n_base * k
      for nb in bucket_list:
        root = os.path.join(tempfile.gettempdir(), f"bm25_probe_{k}x_{nb}b")
        idx = BM25Index(spark, root, n_buckets=nb)
        t0 = time.monotonic()
        idx.build(corpus)
        t_build = time.monotonic() - t0
        t_rebucket = None
        if args.rebucket_from is not None:
            # the migration path: an index stuck at a build-time count
            # re-partitions in one O(postings) pass, never re-tokenizes
            r2 = os.path.join(tempfile.gettempdir(), f"bm25_reb_{k}x_{nb}b")
            src = BM25Index(spark, r2, n_buckets=args.rebucket_from).build(corpus)
            t0 = time.monotonic()
            src.rebucket(nb)
            t_rebucket = round(time.monotonic() - t0, 3)
        b_direct, raw_d = best(lambda: bm25_topk(corpus, BM25_TERMS, k=20).collect())
        b_indexed, raw_i = best(lambda: idx.topk(BM25_TERMS, k=20).collect())
        total_files = len(spark.read.parquet(idx.postings_dir).inputFiles())
        from deployment_spark.operators.retrieval import bm25_bucket

        buckets = {bm25_bucket(t.lower(), idx.n_buckets) for t in BM25_TERMS}
        # deterministic scan-volume evidence (load-independent): bytes
        # the indexed query's pruned postings scan can touch vs the
        # corpus bytes the direct path must re-tokenize per query
        from urllib.parse import urlparse

        def fsize(files):
            return sum(os.path.getsize(urlparse(f).path) for f in files)

        all_posting_files = spark.read.parquet(idx.postings_dir).inputFiles()
        pruned_bytes = fsize(
            f
            for f in all_posting_files
            if any(f"tok_bucket={b}/" in f for b in buckets)
        )
        postings_bytes = fsize(all_posting_files)
        # the direct path re-tokenizes every replica of the base table;
        # its parquet footprint ×k is the per-query scan volume proxy
        corpus_bytes = fsize(base.inputFiles()) * k
        print(
            json.dumps(
                {
                    "scale": k,
                    "docs": n,
                    "build_s": round(t_build, 3),
                    "direct_s": round(b_direct, 3),
                    "indexed_s": round(b_indexed, 3),
                    "speedup": round(b_direct / b_indexed, 2),
                    "direct_raw": [round(t, 3) for t in raw_d],
                    "indexed_raw": [round(t, 3) for t in raw_i],
                    "postings_buckets_read": len(buckets),
                    "postings_buckets_total": idx.n_buckets,
                    "rebucket_s": t_rebucket,
                    "postings_files_total": total_files,
                    "pruned_scan_bytes": pruned_bytes,
                    "postings_bytes": postings_bytes,
                    "corpus_parquet_bytes": corpus_bytes,
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
        if args.delete_frac:
            # delete pressure: a delete-heavy history pays the
            # O(deleted) broadcast anti-join per query until compaction
            # materializes the kills — record both sides of that trade
            droot = os.path.join(tempfile.gettempdir(), f"bm25_delp_{k}x_{nb}b")
            didx = BM25Index(spark, droot, n_buckets=nb)
            didx.build(corpus)
            mod = max(2, round(1.0 / args.delete_frac))
            n_killed = didx.delete(
                corpus.filter(F.col("doc_id") % mod == 0).select("doc_id")
            )
            b_tomb, raw_t = best(lambda: didx.topk(BM25_TERMS, k=20).collect())
            t0 = time.monotonic()
            didx.compact()
            t_compact = time.monotonic() - t0
            b_comp, raw_c = best(lambda: didx.topk(BM25_TERMS, k=20).collect())
            dead, live = didx.tombstone_pressure()
            print(
                json.dumps(
                    {
                        "probe": "delete_pressure",
                        "scale": k,
                        "n_buckets": nb,
                        "docs_killed": n_killed,
                        "query_tombstoned_s": round(b_tomb, 3),
                        "query_compacted_s": round(b_comp, 3),
                        "tombstoned_raw": [round(t, 3) for t in raw_t],
                        "compacted_raw": [round(t, 3) for t in raw_c],
                        "compact_s": round(t_compact, 3),
                        "tombstones_after_compact": dead,
                        "load_1m": round(os.getloadavg()[0], 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
