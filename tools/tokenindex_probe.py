"""Measure the maintained token index's serving claims (r13): the
two-stage maxsim first stage answers from cell-pruned token partitions
at O(probed cells) cost — not O(corpus tokens) — and stays exact under
delete pressure at an O(deleted) anti-join cost that compact() folds
away.

Arms, on content-distinct 1x/4x replicas of sf0.1 embeddings (ids
offset, vectors shifted by a per-replica constant so cell assignment
stays spread without being byte-identical; 3 tokens per doc via the
engine's deterministic 211-mapping):

  build      — one-time TokenIVFIndex.build at each scale
  append     — O(batch) incremental append of a 1%-slice batch
  first_nP   — first-stage search_tokens at nprobe=P, best-of-N
  first_full — the same at nprobe=nlist (the no-pruning control)

Plus deterministic scan-volume evidence per arm: bytes in the probed
cell partitions vs the whole tokens layout (the partition-pruning
claim, load-independent). --delete-frac adds the delete-pressure arm:
query cost tombstoned vs compacted, and the compact() cost itself.

Usage:  python tools/tokenindex_probe.py [--sf DIR] [--runs N]
        [--scales 1,4] [--nprobe 2,8] [--delete-frac 0.33]
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
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--scales", default="1,4")
    ap.add_argument("--nprobe", default="2,8")
    ap.add_argument("--delete-frac", type=float, default=None)
    args = ap.parse_args()

    from deployment_spark import get_spark
    from deployment_spark.operators.knn import probed_cluster_ids
    from deployment_spark.operators.tokenindex import TokenIVFIndex
    from deployment_spark.queries import _maxsim_token_bags

    spark = get_spark(app_name="tokenindex-probe")
    base = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_base = base.count()

    def replicate(k: int):
        if k == 1:
            return base
        parts = [base]
        for i in range(1, k):
            parts.append(
                base.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                    F.transform(
                        "embedding", lambda x: x + F.lit(float(i)) * 0.0013
                    ).alias("embedding"),
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

    def fsize(files):
        from urllib.parse import urlparse

        return sum(os.path.getsize(urlparse(f).path) for f in files)

    nprobes = [int(p) for p in str(args.nprobe).split(",")]
    for k in (int(s) for s in args.scales.split(",")):
        corpus = replicate(k).localCheckpoint()
        doc_tokens, q_tokens, _ = _maxsim_token_bags(
            spark, corpus, F.col("vec_id") < 5, with_tok_id=True, checkpoint=True
        )
        tokens = doc_tokens.select(
            F.col("vec_id").alias("doc_id"), "tok_id", "embedding"
        )
        qdf = q_tokens.select(
            (F.col("query_id") * 10 + F.col("q_pos")).alias("query_id"),
            F.col("query_vec").alias("query_vec"),
        ).localCheckpoint()
        root = os.path.join(tempfile.gettempdir(), f"tokidx_probe_{k}x")
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        tidx = TokenIVFIndex(spark, root)
        t0 = time.monotonic()
        tidx.build(tokens)
        t_build = time.monotonic() - t0
        nlist = len(tidx.quantizer().centroids())
        # O(batch) append claim: a 1%-slice batch (fresh ids above the
        # watermark) assigns against the frozen centroids and appends
        hi = tidx.max_indexed_id()
        batch = tokens.filter(F.col("doc_id") % 97 == 0).select(
            (F.col("doc_id") + hi + 1).alias("doc_id"),
            (F.col("tok_id") + 3 * (hi + 1)).alias("tok_id"),
            "embedding",
        )
        n_batch = batch.count()
        t0 = time.monotonic()
        tidx.append(batch)
        t_append = time.monotonic() - t0

        all_files = spark.read.parquet(tidx.tokens_dir).inputFiles()
        total_bytes = fsize(all_files)
        row = {
            "scale": k,
            "docs": n_base * k,
            "tokens": int(tidx.n_tokens()),
            "nlist": nlist,
            "build_s": round(t_build, 3),
            "append_token_rows": n_batch,
            "append_s": round(t_append, 3),
            "tokens_bytes": total_bytes,
            "load_1m": round(os.getloadavg()[0], 2),
        }
        for np_ in nprobes + [nlist]:
            tag = "full" if np_ == nlist else str(np_)
            b, raw = best(
                lambda np_=np_: tidx.search_tokens(qdf, k=64, nprobe=np_).collect()
            )
            cells = set(
                probed_cluster_ids(
                    qdf, tidx.quantizer(), vec_col="query_vec", nprobe=np_
                )
            )
            pruned = fsize(
                f
                for f in all_files
                if any(f"cluster_id={c}/" in f for c in cells)
            )
            row[f"first_{tag}_s"] = round(b, 3)
            row[f"first_{tag}_raw"] = [round(t, 3) for t in raw]
            row[f"first_{tag}_cells"] = len(cells)
            row[f"first_{tag}_scan_bytes"] = pruned
        print(json.dumps(row), flush=True)

        if args.delete_frac:
            droot = os.path.join(tempfile.gettempdir(), f"tokidx_delp_{k}x")
            shutil.rmtree(droot, ignore_errors=True)
            didx = TokenIVFIndex(spark, droot)
            didx.build(tokens)
            mod = max(2, round(1.0 / args.delete_frac))
            n_killed = didx.delete(
                tokens.filter(F.col("doc_id") % mod == 0)
                .select("doc_id")
                .distinct()
            )
            npq = nprobes[-1]
            b_tomb, raw_t = best(
                lambda: didx.search_tokens(qdf, k=64, nprobe=npq).collect()
            )
            t0 = time.monotonic()
            didx.compact()
            t_compact = time.monotonic() - t0
            b_comp, raw_c = best(
                lambda: didx.search_tokens(qdf, k=64, nprobe=npq).collect()
            )
            print(
                json.dumps(
                    {
                        "probe": "delete_pressure",
                        "scale": k,
                        "docs_killed": n_killed,
                        "nprobe": npq,
                        "query_tombstoned_s": round(b_tomb, 3),
                        "query_compacted_s": round(b_comp, 3),
                        "tombstoned_raw": [round(t, 3) for t in raw_t],
                        "compacted_raw": [round(t, 3) for t in raw_c],
                        "compact_s": round(t_compact, 3),
                        "load_1m": round(os.getloadavg()[0], 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
