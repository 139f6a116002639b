#!/usr/bin/env python
"""kNN-graph maintenance cost probe (r11, VERDICT r10 #1 evidence).

Measures, per ingested batch, the incremental maintenance path
(``knn.knn_graph_update`` + mor edge-store upsert) against the naive
alternative (full ``knn_graph`` rebuild + replace) on the same growing
corpus: wall time AND physical edge rows written. The claim under test
is the write-volume shape — O(new + touched) per batch vs O(corpus·k) —
and that the incremental path's wall does not degrade as the corpus
outgrows the batch.

Usage: python tools/graph_maint_probe.py [--base 2000] [--batch 250]
       [--batches 4] [--k 10]
One JSON line per batch per form; run behind a quiet host (load < 1.5).
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
    ap.add_argument("--base", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=250)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--localized", action="store_true",
                    help="draw each batch near one anchor (the typical "
                         "serving pattern — new data is topically "
                         "clustered) instead of uniformly diverse; the "
                         "cluster restriction's pair-work ratio is "
                         "locality-bounded, so BOTH regimes go on record")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--wait-load", type=float, default=1.5)
    args = ap.parse_args()

    waited = 0.0
    while os.getloadavg()[0] > args.wait_load and waited < 900:
        print(f"load {os.getloadavg()[0]:.1f}; waiting", file=sys.stderr)
        time.sleep(20)
        waited += 20

    import tempfile

    from pyspark.sql import functions as F

    from deployment_spark import get_spark
    from deployment_spark.operators.crud import SnapshotStore
    from deployment_spark.operators.knn import knn_graph, knn_graph_update

    spark = get_spark(app_name="graph-maint-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def vecs(lo, hi, anchor=None):
        if anchor is None:
            return spark.range(lo, hi).select(
                F.col("id").alias("vec_id"),
                F.array(
                    *[F.sin(F.col("id") * F.lit(0.37 * (i + 1))) for i in range(args.dim)]
                ).alias("embedding"),
            )
        # localized batch: anchor vector + small per-row perturbation —
        # the whole batch probes the anchor's few clusters
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    F.lit(float(__import__("math").sin(anchor * 0.37 * (i + 1))))
                    + F.lit(0.05) * F.sin(F.col("id") * F.lit(0.91 * (i + 1)))
                    for i in range(args.dim)
                ]
            ).alias("embedding"),
        )

    from deployment_spark.operators.ivf import IVFIndex
    from deployment_spark.operators.knn import probed_cluster_ids

    tp = tempfile.mkdtemp(prefix="graph_maint_")
    k = args.k
    # incremental form: edge store maintained by knn_graph_update;
    # r12 adds the ANN-ASSISTED form (VERDICT r11 #2): the same update
    # restricted to the IVF clusters the batch probes — pair work drops
    # from O(corpus·batch) to O(corpus·probed/nlist·batch); the probe
    # records the restricted-corpus size (the pair-work slope evidence)
    # and the maintained graph's edge agreement vs the exact graph per
    # batch (the recall-floor evidence across >= `batches` batches).
    inc = SnapshotStore(spark, os.path.join(tp, "inc"), key="edge_id", mode="mor")
    ivf_store = SnapshotStore(
        spark, os.path.join(tp, "ivfg"), key="edge_id", mode="mor"
    )
    base = vecs(0, args.base).localCheckpoint()
    idx = IVFIndex(spark, os.path.join(tp, "ivfq")).build(base, id_col="vec_id")
    t0 = time.perf_counter()
    g0 = knn_graph(base, k=k)
    inc.replace(
        g0.withColumn("edge_id", F.col("src_id") * k + F.col("rank") - 1)
    )
    ivf_store.replace(
        g0.withColumn("edge_id", F.col("src_id") * k + F.col("rank") - 1)
    )
    print(json.dumps({"form": "initial_build", "corpus": args.base,
                      "sec": round(time.perf_counter() - t0, 3)}), flush=True)
    corpus = base
    for b in range(args.batches):
        lo = args.base + b * args.batch
        batch = vecs(
            lo, lo + args.batch, anchor=(7 + 13 * b) if args.localized else None
        ).localCheckpoint()
        # incremental (exact)
        t0 = time.perf_counter()
        repl = knn_graph_update(
            inc.read().select("src_id", "dst_id", "rank", "cosine"),
            corpus, batch, k=k,
        ).localCheckpoint()
        wrote = repl.count()
        inc.upsert(
            repl.withColumn("edge_id", F.col("src_id") * k + F.col("rank") - 1)
        )
        t_inc = round(time.perf_counter() - t0, 3)
        # ANN-assisted: both passes restricted to the batch's probed
        # clusters (the _maintain_knn_graph(reverse='ivf') shape)
        t0 = time.perf_counter()
        probed = probed_cluster_ids(batch, idx, nprobe=args.nprobe)
        restricted = idx.assign(corpus, vec_col="embedding").filter(
            F.col("cluster_id").isin(probed)
        ).drop("cluster_id").localCheckpoint()
        n_restricted = restricted.count()
        repl_ivf = knn_graph_update(
            ivf_store.read().select("src_id", "dst_id", "rank", "cosine"),
            restricted, batch, k=k,
        ).localCheckpoint()
        ivf_store.upsert(
            repl_ivf.withColumn("edge_id", F.col("src_id") * k + F.col("rank") - 1)
        )
        t_ivf = round(time.perf_counter() - t0, 3)
        corpus = corpus.unionByName(batch).localCheckpoint()
        n = args.base + (b + 1) * args.batch
        # naive rebuild on the same corpus (fresh store each time so the
        # replace cost is comparable)
        reb = SnapshotStore(
            spark, os.path.join(tp, f"reb{b}"), key="edge_id", mode="mor"
        )
        t0 = time.perf_counter()
        g = knn_graph(corpus, k=k)
        reb.replace(
            g.withColumn("edge_id", F.col("src_id") * k + F.col("rank") - 1)
        )
        t_reb = round(time.perf_counter() - t0, 3)
        # edge agreement of the ANN-maintained graph vs the exact graph
        # (set overlap over (src, dst) pairs — the recall floor evidence)
        exact_pairs = g.select("src_id", "dst_id")
        kept = (
            ivf_store.read()
            .select("src_id", "dst_id")
            .join(exact_pairs, ["src_id", "dst_id"], "left_semi")
            .count()
        )
        total = n * k if n > k else n * (n - 1)
        print(json.dumps({
            "batch": b + 1, "corpus": n, "batch_rows": args.batch, "k": k,
            "incremental_sec": t_inc, "rebuild_sec": t_reb,
            "ivf_assisted_sec": t_ivf,
            "incremental_edge_rows_written": int(wrote),
            "rebuild_edge_rows_written": n * k,
            "write_ratio": round(wrote / (n * k), 4),
            "exact_pair_work": n * args.batch,
            "ivf_pair_work": n_restricted * args.batch,
            "pair_work_ratio": round(n_restricted / max(n, 1), 4),
            "ivf_edge_agreement": round(kept / total, 4),
            "batch_shape": "localized" if args.localized else "diverse",
            "load_1m": round(os.getloadavg()[0], 2),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
