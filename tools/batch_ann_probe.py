#!/usr/bin/env python
"""Measure search() (driver-routed, query-collecting) vs search_batch()
(fully distributed) on one IVF index as the query count grows — the
ANN sibling of tools/blocked_topk_probe.py. The interactive path
collects the query batch and the nq×nprobe probed-id set on the
driver; the batch path's driver footprint is zero in nq. This probe
records both wall-time curves plus the driver-resident quantity so
BASELINE.md's batch-ANN note is measured, not asserted.

Usage: python tools/batch_ann_probe.py
Emits one JSON line per (path, nq) plus a summary line.

``--salting`` runs the hot-cluster probe instead: a deterministic
2-centroid index (build_from_centroids) where one cluster holds ~90%
of the corpus — the IVF skew case ``max_cluster_rows_per_task`` exists
for — timed unsalted (the hot cluster's whole matmul serializes in ONE
applyInPandas task) vs salted (bounded sub-blocks spread across
cores), so the salting knob's benefit is measured, not asserted.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from deployment_spark import get_spark
    from deployment_spark.operators.ivf import IVFIndex
    from pyspark.sql import functions as F

    spark = get_spark(app_name="batch-ann-probe")
    spark.sparkContext.setLogLevel("ERROR")

    DIM, K, NPROBE, NLIST, RUNS = 64, 5, 10, 64, 2
    N_CORPUS = 50_000
    corpus = (
        spark.range(N_CORPUS)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.sin(F.col("id") * i * 0.7213),
            ).cast("array<double>").alias("embedding"),
        )
    )
    root = tempfile.mkdtemp(prefix="batch_ann_probe_")
    idx = IVFIndex(spark, os.path.join(root, "ivf")).build(corpus, nlist=NLIST)

    # the driver path is MEASURED only through 8k queries: at 32k its
    # broadcast-join plan scores ~250M rows through the per-row Catalyst
    # cosine aggregate (nq·nprobe·cluster_size) and a single timing run
    # exceeds this probe's whole budget — which is the result: the
    # interactive path does not have a batch operating point. The batch
    # path runs every tier.
    DRIVER_MAX_NQ = 8_000
    results = []
    for nq in (20, 1_000, 8_000, 32_000):
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
        paths = [
            ("batch", lambda: idx.search_batch(queries, k=K, nprobe=NPROBE)),
        ]
        if nq <= DRIVER_MAX_NQ:
            paths.insert(0, (
                "driver",
                lambda: idx.search(queries, k=K, nprobe=NPROBE, routing="driver"),
            ))
        for path, fn in paths:
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
                # driver-resident rows for this path at this nq: the
                # collected query batch + the probed-pair set vs zero
                "driver_rows": (nq + nq * NPROBE) if path == "driver" else 0,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        queries.unpersist()

    by = {(r["path"], r["nq"]): r["best_sec"] for r in results}
    nqs = sorted({r["nq"] for r in results})
    print(
        json.dumps(
            {
                "summary": True,
                "corpus": N_CORPUS,
                "nlist": NLIST,
                "nprobe": NPROBE,
                "k": K,
                "slope_driver_to_8k": round(
                    by[("driver", 8_000)] / by[("driver", nqs[0])], 2
                ),
                "slope_batch": round(by[("batch", nqs[-1])] / by[("batch", nqs[0])], 2),
                "nq_ratio": nqs[-1] // nqs[0],
                "crossover_hint": [
                    nq
                    for nq in nqs
                    if ("driver", nq) in by and by[("batch", nq)] <= by[("driver", nq)]
                ],
                "driver_not_measured_above": 8_000,
            }
        ),
        flush=True,
    )
    spark.stop()


def corpus_growth_probe() -> None:
    """r9 (VERDICT r8 #7): the 1x->8x CORPUS axis at fixed nq — the
    complement of main()'s nq axis. nlist scales as sqrt(N) (the
    reference's own rule), so per-cluster task size grows sqrt(N) and
    the batch route's wall should track corpus bytes ~linearly while
    the interactive path additionally pays its nq·nprobe·cluster_size
    Catalyst scoring growth."""
    from deployment_spark import get_spark
    from deployment_spark.operators.ivf import IVFIndex
    from pyspark.sql import functions as F

    spark = get_spark(app_name="corpus-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    DIM, K, NPROBE, NQ, RUNS = 64, 5, 10, 2_000, 2
    BASE = 25_000
    queries = (
        spark.range(NQ)
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
    results = []
    root = tempfile.mkdtemp(prefix="corpus_growth_probe_")
    for mult in (1, 2, 4, 8):
        n = BASE * mult
        nlist = int(n ** 0.5 // 16) * 16 or 16  # ~sqrt(N), multiple of 16
        corpus = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.sin(F.col("id") * i * 0.7213),
            ).cast("array<double>").alias("embedding"),
        )
        idx = IVFIndex(spark, os.path.join(root, f"ivf_{mult}x")).build(
            corpus, nlist=nlist, train_fraction=min(1.0, 50_000 / n)
        )
        for path, fn in (
            ("batch", lambda: idx.search_batch(queries, k=K, nprobe=NPROBE)),
            ("driver", lambda: idx.search(queries, k=K, nprobe=NPROBE, routing="driver")),
        ):
            fn().count()  # warm
            ts = []
            for _ in range(RUNS):
                t0 = time.time()
                fn().count()
                ts.append(time.time() - t0)
            rec = {"path": path, "corpus": n, "nlist": nlist,
                   "best_sec": round(min(ts), 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    by = {(r["path"], r["corpus"]): r["best_sec"] for r in results}
    print(
        json.dumps(
            {
                "summary": True,
                "probe": "corpus_growth",
                "nq": NQ,
                "corpus_ratio": 8,
                "slope_batch": round(
                    by[("batch", BASE * 8)] / by[("batch", BASE)], 2
                ),
                "slope_driver": round(
                    by[("driver", BASE * 8)] / by[("driver", BASE)], 2
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


def pruning_probe() -> None:
    """r9 (VERDICT r8 #2): measure what the unprobed-cluster semi-join
    saves when probes cover a FRACTION of nlist. Queries are clones of
    two clusters' centroid directions (nprobe=1 -> ~2 of 16 clusters
    probed, 12.5% coverage). Reports the structural reduction (corpus
    rows entering the grouped exchange) and wall-to-wall timing vs an
    UNPRUNED reference build of the identical union-frame plan (the
    pre-r9 shape, reconstructed locally)."""
    from deployment_spark import get_spark
    from deployment_spark.operators.ivf import IVFIndex
    from deployment_spark.operators.similarity import (
        _cid_sort_kind,
        _grouped_pair_topk,
        topk_similarity_join_blocked,
    )
    from pyspark.sql import functions as F, Window

    spark = get_spark(app_name="pruning-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    DIM, K, NLIST, RUNS, NQ = 64, 5, 16, 2, 2_000
    PER = 8_000  # rows per cluster — below the salt bound, so the
    # measurement isolates PRUNING (salting stays quiet on both arms)
    N = PER * NLIST
    # 16 EQUAL deterministic clusters (build_from_centroids, the
    # salting-probe construction): blob c sits on pole dimension c, so
    # L2 assignment is exact and every cluster holds the same row count
    # — a KMeans fixture here puts 77% of rows in the two probed
    # clusters and confounds the pruning measurement with skew
    cents = np.zeros((NLIST, DIM))
    for c in range(NLIST):
        cents[c, c] = 10.0
    blobs = None
    for c in range(NLIST):
        b = spark.range(PER).select(
            (F.col("id") + c * PER).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.when(i == c + 1, F.lit(10.0)).otherwise(
                    F.sin((F.col("id") + c * PER) * i * 0.7213) * 0.05
                ),
            ).cast("array<double>").alias("embedding"),
        )
        blobs = b if blobs is None else blobs.unionByName(b)
    root = tempfile.mkdtemp(prefix="pruning_probe_")
    idx = IVFIndex(spark, os.path.join(root, "ivf")).build_from_centroids(
        blobs, cents
    )
    # queries = the centroid vectors of clusters 0 and 1 (replicated):
    # cosine routing at nprobe=1 sends each query to exactly its own
    # centroid, so probes cover 2 of 16 clusters (12.5%) BY CONSTRUCTION
    # — member rows would not do (assignment is L2-nearest, routing is
    # cosine-nearest; unnormalized vectors route everywhere)
    cents = idx.centroids()
    two = spark.createDataFrame(
        [(i, [float(x) for x in cents[i % 2]]) for i in range(NQ)],
        "query_id long, query_vec array<double>",
    ).cache()
    two.count()

    def pruned():
        return idx.search_batch(two, k=K, nprobe=1)

    def unpruned():
        # the pre-r9 plan: every cluster's rows enter the union frame
        data = idx.data()
        cid_kind = _cid_sort_kind(data.schema["vec_id"].dataType, "probe")
        probes = topk_similarity_join_blocked(
            idx.centroids_df(), two, k=1,
            corpus_id="cluster_id", corpus_vec="centroid",
            query_id="query_id", query_vec="query_vec",
        ).select("query_id", "cluster_id")
        q = two.join(probes, "query_id").select(
            F.col("query_id").cast("string").alias("_qid"),
            F.lit(None).cast("string").alias("_cid"),
            F.col("query_vec").cast("array<double>").alias("_vec"),
            F.col("cluster_id").alias("_g"),
        )
        c = data.select(
            F.lit(None).cast("string").alias("_qid"),
            F.col("vec_id").cast("string").alias("_cid"),
            F.col("embedding").cast("array<double>").alias("_vec"),
            F.col("cluster_id").alias("_g"),
        )
        cand = _grouped_pair_topk(
            q.unionByName(c.select(*q.columns)), ["_g"], K, "cosine", cid_kind
        )
        w = Window.partitionBy("_qid").orderBy(F.desc("_sim"), F.asc("_cid"))
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
        )

    # structural reduction: rows entering the grouped exchange
    probes = topk_similarity_join_blocked(
        idx.centroids_df(), two, k=1,
        corpus_id="cluster_id", corpus_vec="centroid",
        query_id="query_id", query_vec="query_vec",
    ).select("cluster_id").distinct()
    probed_ids = [r.cluster_id for r in probes.collect()]
    rows_pruned = (
        idx.data().filter(F.col("cluster_id").isin(probed_ids)).count()
    )
    results = {}
    # sanity: identical results both plans
    a = {(r._qid, r.rank): r._cid for r in unpruned().collect()}
    b = {
        (str(r.query_id), r.rank): str(r.vec_id)
        for r in pruned().collect()
    }
    assert a == b, "pruned plan diverged from unpruned reference"
    for mode, fn in (("unpruned_ref", unpruned), ("pruned", pruned)):
        fn().count()
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            fn().count()
            ts.append(time.time() - t0)
        results[mode] = round(min(ts), 3)
        print(json.dumps({"mode": mode, "best_sec": results[mode]}), flush=True)
    print(
        json.dumps(
            {
                "summary": True,
                "probe": "pruning",
                "nlist": NLIST,
                "probed_clusters": len(probed_ids),
                "corpus_rows": N,
                "rows_shuffled_pruned": rows_pruned,
                "shuffle_reduction": round(N / max(rows_pruned, 1), 2),
                "unpruned_sec": results["unpruned_ref"],
                "pruned_sec": results["pruned"],
                "speedup": round(
                    results["unpruned_ref"] / results["pruned"], 2
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


def salting_probe() -> None:
    import numpy as np

    from deployment_spark import get_spark
    from deployment_spark.operators.ivf import IVFIndex
    from pyspark.sql import functions as F

    spark = get_spark(app_name="salting-probe")
    spark.sparkContext.setLogLevel("ERROR")

    DIM, K, NQ, RUNS = 64, 5, 2_000, 2
    N_HOT, N_COLD = 135_000, 15_000
    BOUND = 8_192  # hot cluster splits into ceil(135k/8k) = 17 salts

    # two centroids on opposite poles of dim 0; hot points jitter
    # around +pole, cold around -pole, so assignment is deterministic
    cents = np.zeros((2, DIM))
    cents[0, 0], cents[1, 0] = 1.0, -1.0

    def blob(n, pole, tag):
        return (
            spark.range(n)
            .select(
                (F.col("id") + (0 if pole > 0 else N_HOT)).alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(DIM)),
                    lambda i: F.when(i == 1, F.lit(float(pole))).otherwise(
                        F.sin(F.col("id") * i * 0.7213) * 0.05
                    ),
                ).cast("array<double>").alias("embedding"),
            )
        )

    corpus = blob(N_HOT, 1.0, "hot").unionByName(blob(N_COLD, -1.0, "cold"))
    root = tempfile.mkdtemp(prefix="salting_probe_")
    idx = IVFIndex(spark, os.path.join(root, "ivf")).build_from_centroids(
        corpus, cents
    )
    sizes = {
        r.cluster_id: r.n
        for r in idx.data().groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    queries = (
        spark.range(NQ)
        .select(
            F.col("id").alias("query_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.when(i == 1, F.lit(1.0)).otherwise(
                    F.cos(F.col("id") * i * 0.3141) * 0.05
                ),
            ).cast("array<double>").alias("query_vec"),
        )
        .cache()
    )
    queries.count()
    # "auto" passes NO knob (r9 default-on): _maybe_salt_hot_groups must
    # detect the 135k-row hot cluster and pick the bounded plan itself —
    # verified structurally below, then timed like the explicit arms
    from deployment_spark.operators.similarity import (
        DEFAULT_MAX_CLUSTER_ROWS_PER_TASK,
    )

    auto_plan = idx.search_batch(
        queries, k=K, nprobe=1
    )._jdf.queryExecution().executedPlan().toString()
    auto_salted = "_salt" in auto_plan
    print(
        json.dumps(
            {
                "auto_default_bound": DEFAULT_MAX_CLUSTER_ROWS_PER_TASK,
                "auto_plan_salted": auto_salted,
            }
        ),
        flush=True,
    )
    results = {}
    for mode, bound in (
        ("unsalted", None),
        ("salted", BOUND),
        ("auto", "default"),
    ):
        if bound == "default":
            fn = lambda: idx.search_batch(queries, k=K, nprobe=1)  # noqa: E731
        else:
            fn = lambda: idx.search_batch(  # noqa: E731
                queries, k=K, nprobe=1, max_cluster_rows_per_task=bound
            )
        fn().count()  # warm
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            n = fn().count()
            ts.append(time.time() - t0)
        results[mode] = round(min(ts), 3)
        print(json.dumps({"mode": mode, "rows": n, "best_sec": results[mode]}), flush=True)
    print(
        json.dumps(
            {
                "summary": True,
                "probe": "salting",
                "cluster_sizes": {str(k_): v for k_, v in sorted(sizes.items())},
                "nq": NQ,
                "bound": BOUND,
                "unsalted_sec": results["unsalted"],
                "salted_sec": results["salted"],
                "auto_sec": results["auto"],
                "auto_plan_salted": auto_salted,
                "speedup": round(results["unsalted"] / results["salted"], 2),
            }
        ),
        flush=True,
    )
    spark.stop()


def coverage_probe() -> None:
    """r10 (VERDICT r9 #1/#2): measure what the coverage gate + metadata
    stats save at FULL probe coverage — the regime where the r9 prune
    machinery (probed-distinct broadcast + semi-join) and the per-call
    salting count job were pure fixed overhead. Same 16-equal-blob
    fixture as the pruning probe; queries replicate ALL 16 centroid
    directions so every cluster is probed by construction. Arms:

    - ``r10``: ``search_batch`` as shipped — coverage gate skips the
      prune with no job (nprobe ≥ 0.8·nlist), salting decision reads
      persisted cluster stats. Construction-time Spark jobs are counted
      via a job group (the 'zero count jobs' claim, measured).
    - ``r9_ref``: the pre-r10 plan reconstructed locally — semi-join
      against the distinct probed set + a per-call count collect for
      the salting decision — on identical data.
    """
    from deployment_spark import get_spark
    from deployment_spark.operators.ivf import IVFIndex
    from deployment_spark.operators.similarity import (
        _cid_sort_kind,
        _grouped_pair_topk,
        _maybe_salt_hot_groups,
        topk_similarity_join_blocked,
    )
    from pyspark.sql import functions as F, Window

    spark = get_spark(app_name="coverage-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    DIM, K, NLIST, RUNS, NQ = 64, 5, 16, 3, 2_000
    PER = 8_000
    cents = np.zeros((NLIST, DIM))
    for c in range(NLIST):
        cents[c, c] = 10.0
    blobs = None
    for c in range(NLIST):
        b = spark.range(PER).select(
            (F.col("id") + c * PER).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: F.when(i == c + 1, F.lit(10.0)).otherwise(
                    F.sin((F.col("id") + c * PER) * i * 0.7213) * 0.05
                ),
            ).cast("array<double>").alias("embedding"),
        )
        blobs = b if blobs is None else blobs.unionByName(b)
    root = tempfile.mkdtemp(prefix="coverage_probe_")
    idx = IVFIndex(spark, os.path.join(root, "ivf")).build_from_centroids(
        blobs, cents
    )
    cmat = idx.centroids()
    allq = spark.createDataFrame(
        [(i, [float(x) for x in cmat[i % NLIST]]) for i in range(NQ)],
        "query_id long, query_vec array<double>",
    ).cache()
    allq.count()

    def r10():
        return idx.search_batch(allq, k=K, nprobe=NLIST)

    def r9_ref():
        # the pre-r10 plan at full coverage: semi-join prune that
        # filters nothing + per-call count job for the salting decision
        data = idx.data()
        cid_kind = _cid_sort_kind(data.schema["vec_id"].dataType, "probe")
        probes = topk_similarity_join_blocked(
            idx.centroids_df(), allq, k=NLIST,
            corpus_id="cluster_id", corpus_vec="centroid",
            query_id="query_id", query_vec="query_vec",
        ).select("query_id", "cluster_id").localCheckpoint(eager=False)
        q = allq.join(probes, "query_id").select(
            F.col("query_id").cast("string").alias("_qid"),
            F.lit(None).cast("string").alias("_cid"),
            F.col("query_vec").cast("array<double>").alias("_vec"),
            F.col("cluster_id").alias("_g"),
        )
        data = data.join(
            F.broadcast(probes.select("cluster_id").distinct()),
            "cluster_id", "left_semi",
        )
        c = data.filter(F.col("embedding").isNotNull()).select(
            F.lit(None).cast("string").alias("_qid"),
            F.col("vec_id").cast("string").alias("_cid"),
            F.col("embedding").cast("array<double>").alias("_vec"),
            F.col("cluster_id").alias("_g"),
        )
        q, c, group_cols = _maybe_salt_hot_groups(
            q, c, data.select("cluster_id"), 8192  # counts=None: r9 count job
        )
        cand = _grouped_pair_topk(
            q.unionByName(c.select(*q.columns)), group_cols, K, "cosine",
            cid_kind,
        )
        w = Window.partitionBy("_qid").orderBy(F.desc("_sim"), F.asc("_cid"))
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
        )

    # parity first
    a = {(str(r.query_id), r.rank): str(r.vec_id) for r in r10().collect()}
    b = {(r._qid, r.rank): r._cid for r in r9_ref().collect()}
    assert a == b, "coverage-gated plan diverged from the r9 reference"

    # construction-time jobs of the shipped plan (the zero-count-job claim)
    sc = spark.sparkContext
    sc.setJobGroup("cov-construct", "r10 plan construction")
    _ = idx.search_batch(allq, k=K, nprobe=NLIST)
    construct_jobs = len(sc.statusTracker().getJobIdsForGroup("cov-construct"))
    sc.setJobGroup("cov-rest", "timings")

    results = {}
    for mode, fn in (("r9_ref", r9_ref), ("r10", r10)):
        fn().count()
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            fn().count()
            ts.append(time.time() - t0)
        results[mode] = round(min(ts), 3)
        print(json.dumps({"mode": mode, "best_sec": results[mode]}), flush=True)
    print(
        json.dumps(
            {
                "summary": True,
                "probe": "coverage_gate",
                "nlist": NLIST,
                "nq": NQ,
                "corpus_rows": PER * NLIST,
                "construction_jobs_r10": construct_jobs,
                "r9_ref_sec": results["r9_ref"],
                "r10_sec": results["r10"],
                "overhead_removed_sec": round(
                    results["r9_ref"] - results["r10"], 3
                ),
                "speedup": round(results["r9_ref"] / results["r10"], 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    if "--salting" in sys.argv:
        salting_probe()
    elif "--corpus-growth" in sys.argv:
        corpus_growth_probe()
    elif "--pruning" in sys.argv:
        pruning_probe()
    elif "--coverage" in sys.argv:
        coverage_probe()
    else:
        main()
