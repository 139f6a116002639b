#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set covers every execution shape the engine has: parquet scan +
hash agg, broadcast join chain, window top-k, numpy-mapInPandas top-k
similarity join, explode/shuffle-heavy MinHash LSH, and regex text
analysis. Each query is fully materialized via count() (no driver-side
row transfer beyond the count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deployment_spark import get_spark
from deployment_spark.queries import REGISTRY

# Every bench row names a driver-registry entry 1:1 (VERDICT r4 #4 —
# the standalone events_hourly row drifted from the catalog after the
# r4 fold; its work is timed inside streaming_hourly_counts now).
LOOKUP = REGISTRY

HEADLINE = [
    "topk_cosine",
    "lsh_bucket_ann",
    "embedding_neardup",
    "pricing_summary",
    "revenue_by_nation",
    # r5: replaces the bench-only events_hourly row — same batch tumbling
    # agg, plus the AvailableNow stream drain it is hash-joined against
    "streaming_hourly_counts",
    "rank_per_group",
    # r6: dedup_keepfirst folded into doc_exact_dedup's tagged union
    "doc_exact_dedup",
    "doc_minhash_lsh",
    "doc_ngram_jaccard",
    "doc_quality",
    "doc_lang_scripts",
    # r2 additions (VERDICT item 8): time the index path too
    "ivf_topk",
    "packet_topk",
    # r2 new execution shapes: regex-projection cleaning, session
    # window+agg, two-phase skew top-N, grouping-sets rollup
    "doc_pii_scrub",
    "user_sessions",
    "skewed_topn",
    "revenue_rollup",
    # r2 custom join shapes
    "events_asof_purchase",
    "value_band_counts",
    # r4 additions: per-key interval join (attribution), the
    # broadcast-shingle decontamination join, and the token-keyed
    # corpus-stats join (unigram LM scoring)
    "attribution_join",
    "doc_decontaminate",
    "doc_lm_score",
    # r5 additions: lexical BM25 ranking (single-aggregate, no token
    # join) and the BM25 ⊕ cosine RRF hybrid — the store family's
    # composed query mode
    "doc_bm25_topk",
    "hybrid_search",
    # r5 additions: block-pair kNN graph, LSH+components semantic dedup,
    # hash-permutation shard export, temperature-scaled domain mixing
    "knn_graph",
    "semantic_dedup",
    "shuffled_export",
    "domain_mixture",
    # r5 late additions: Lee-et-al duplicated-span removal (shingle-
    # keyed join + doc-keyed coverage window) and DSIR hashed-ngram
    # importance selection (closed 512-bucket feature space, broadcast
    # ratio table)
    "doc_span_dedup",
    "dsir_select",
]

_missing = [n for n in HEADLINE if n not in REGISTRY]
assert not _missing, f"bench rows without a registry entry: {_missing}"


def run_grid() -> None:
    """--grid: the reference's own benchmark protocol (SURVEY §2.13 B4,
    FAISS/PlainDemo/pipeline.py:306-346) — op sizes × {insertion,
    deletion, update, query} over a snapshot store, 10k initial rows,
    hash-embedder. Prints one JSON line with per-op mean seconds and
    writes the reference's long-format metrics CSV next to the store."""
    import tempfile

    from deployment_spark.benchmark import REFERENCE_GRID, run_reference_grid

    mode = "mor" if "--mor" in sys.argv else "cow"
    spark = get_spark(app_name="deployment-spark-grid")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench_grid_")
    t0 = time.perf_counter()
    metrics = run_reference_grid(
        spark,
        os.path.join(root, "store"),
        store_mode=mode,
        # r5: size-triggered auto-compaction replaces the fixed
        # every-3-sizes cadence — read amplification is bounded at <= 8
        # merged files regardless of the mutation mix
        compact_when=8 if mode == "mor" else None,
    )
    rows = metrics.collect()
    total = round(time.perf_counter() - t0, 3)
    metrics.toPandas().to_csv(os.path.join(root, "metrics.csv"), index=False)
    # S10 plot sink: the reference saves a 3-panel figure beside the
    # metrics (pipeline.py:183-230); ours is dependency-free SVG
    from deployment_spark.sources.plot import write_metrics_svg

    svg_path = write_metrics_svg(
        rows, os.path.join(root, "metrics.svg"), model_name=f"hash-embedder ({mode})"
    )
    per_op: dict[str, list[float]] = {}
    for r in rows:
        per_op.setdefault(r.operation_type, []).append(float(r.execution_time))
    print(
        json.dumps(
            {
                "metric": "reference_grid_total",
                "value": total,
                "unit": "sec",
                "queries": {op: round(sum(v) / len(v), 3) for op, v in sorted(per_op.items())},
                "sf": REFERENCE_GRID[-1],
                "metrics_csv": os.path.join(root, "metrics.csv"),
                "metrics_svg": svg_path,
            }
        )
    )
    spark.stop()


def run_model_grid_bench() -> None:
    """--model-grid: the reference's outer per-model loop
    (FAISS/PlainDemo/pipeline.py:290-307) over the 2-model hash-embedder
    axis (32 vs 64 dims) — one JSON line keyed model|operation, plus the
    combined long-format metrics CSV (pipeline.py:397-401)."""
    import tempfile

    from deployment_spark.benchmark import run_model_grid

    spark = get_spark(app_name="deployment-spark-model-grid")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench_model_grid_")
    t0 = time.perf_counter()
    metrics = run_model_grid(spark, os.path.join(root, "stores"), sizes=[2500, 5000])
    rows = metrics.collect()
    total = round(time.perf_counter() - t0, 3)
    metrics.toPandas().to_csv(os.path.join(root, "combined_metrics.csv"), index=False)
    # the reference saves ONE figure PER MODEL (pipeline.py:227, save
    # path keyed by model_name) — mirror that with the SVG sink
    from deployment_spark.sources.plot import write_metrics_svg

    svgs = {}
    for model in sorted({r.model_name for r in rows}):
        svgs[model] = write_metrics_svg(
            [r for r in rows if r.model_name == model],
            os.path.join(root, f"metrics_{model}.svg"),
            model_name=model,
        )
    per: dict[str, list[float]] = {}
    for r in rows:
        per.setdefault(f"{r.model_name}|{r.operation_type}", []).append(
            float(r.execution_time)
        )
    print(
        json.dumps(
            {
                "metric": "model_grid_total",
                "value": total,
                "unit": "sec",
                "queries": {kk: round(sum(v) / len(v), 3) for kk, v in sorted(per.items())},
                "sf": 5000,
                "metrics_csv": os.path.join(root, "combined_metrics.csv"),
                "metrics_svg": svgs,
            }
        )
    )
    spark.stop()


def main() -> None:
    if "--model-grid" in sys.argv:
        run_model_grid_bench()
        return
    if "--grid" in sys.argv:
        run_grid()
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # Load gate (r7 VERDICT wrong #3 / next #5): BENCH_r07 was captured
    # at external load 7.9 and every row read ~1.24× its quiet value —
    # the artifact of record must be steady state. Measured HERE, before
    # the Spark session exists, so the reading is external load, not our
    # own warm-up (the in-payload load_avg_1m is taken post-warm-up and
    # necessarily includes us). If the host stays busy past the wait
    # budget, run anyway but stamp the payload loaded_host=true so the
    # round record carries the annotation instead of silent noise.
    # r10 (VERDICT r9 #5/#7): the r9 round artifact was captured at load
    # 3.3 while the quiet close runs read ~17% faster — the committed
    # JSON and the close record must be the same capture. Budget raised
    # 300 → 900 s (a quiet window on this host reliably appears within
    # that), and a run that STILL starts loaded announces itself with an
    # unmissable banner in addition to the loaded_host payload stamp, so
    # a loaded capture can never be committed silently.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "3.0"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT_SEC", "900"))
    external_load = os.getloadavg()[0]
    waited = 0.0
    while external_load > max_load and waited < wait_budget:
        print(
            f"bench: external load {external_load:.1f} > {max_load}; "
            f"waiting for quiet ({waited:.0f}/{wait_budget:.0f}s)",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(20)
        waited += 20
        external_load = os.getloadavg()[0]
    loaded_host = external_load > max_load
    if loaded_host:
        print(
            "=" * 72
            + f"\nbench: RUNNING LOADED (external load {external_load:.1f} > "
            f"{max_load} after {wait_budget:.0f}s wait) — this capture is "
            "NOT a valid round-record artifact; rerun on a quiet host "
            "before committing it\n" + "=" * 72,
            file=sys.stderr,
            flush=True,
        )
    spark = get_spark(app_name="deployment-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM: run every headline query once at the smallest SF so
    # codegen compilation and JIT happen outside the timed region (plans
    # share generated code across SFs), then time steady-state execution.
    spark.range(1000).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                LOOKUP[name][0](spark, warm_dir).count()
            except Exception:
                pass
    # Pre-build the IVF index for the timed SF: the build (KMeans train +
    # partitioned write) is one-time setup, like FAISS index construction;
    # the steady-state number we track is SEARCH latency on a built index.
    from deployment_spark.queries import _ivf_index

    _ivf_index(spark, sf_dir)

    # Best-of-N per query: the min is the least-noise estimate of the
    # PLAN's cost — this host shows multi-second scheduling/VM hiccups
    # under sustained load that single-shot timing conflates with plan
    # quality (r2 measurement: the same query, same session, ranged
    # 1.9 s - 15 s across back-to-back runs while isolated steady-state
    # was stable). Methodology stated in BASELINE.md.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # external host load at start/end rides in the payload: an r7 run
    # on a loaded host read EVERY row uniformly ~2× (including entries
    # untouched for five rounds) — load attribution belongs in the
    # artifact, not in after-the-fact archaeology. load_avg_1m is the
    # 1-minute average EXCLUDING this process's own about-to-start work.
    load_start = os.getloadavg()[0]
    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn, _sql = LOOKUP[name]
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        raw_runs[name] = times
        timings[name] = min(times)

    # Automated outlier protocol (r11, VERDICT r10 #2): the r10 round
    # artifact carried streaming_hourly_counts at 2.70× baseline purely
    # from mid-panel host load — the start-of-run gate can't catch load
    # that RISES during the panel. Any row reading > 1.5× its canonical
    # baseline (BASELINE_rows.json — the machine-readable registry the
    # prose re-baselines in BASELINE.md consolidate into) is re-timed
    # IN ISOLATION after a quiet-wait, and the payload records both
    # readings: the artifact can no longer carry a load-artifact row
    # without its own in-payload isolated confirmation or refutation.
    base_path = os.environ.get("SPARK_GRAFT_BENCH_BASELINES") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_rows.json"
    )
    baselines: dict[str, float] = {}
    try:
        with open(base_path) as f:
            baselines = {
                k: float(v)
                for k, v in json.load(f).get(f"{sf:g}", {}).items()
                if not k.startswith("_")
            }
    except (OSError, ValueError):
        pass
    retime_factor = float(os.environ.get("SPARK_GRAFT_BENCH_RETIME_FACTOR", "1.5"))
    retimed: dict[str, dict] = {}
    for name, t in sorted(timings.items()):
        b = baselines.get(name)
        if not b or t <= retime_factor * b:
            continue
        waited = 0.0
        while os.getloadavg()[0] > max_load and waited < 300:
            time.sleep(10)
            waited += 10
        fn, _sql = LOOKUP[name]
        iso = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            iso.append(round(time.perf_counter() - t0, 3))
        retimed[name] = {
            "panel": t,
            "isolated": min(iso),
            "isolated_runs": iso,
            "baseline": b,
            "isolated_vs_baseline": round(min(iso) / b, 2),
            "isolated_load_1m": round(os.getloadavg()[0], 2),
        }
        print(
            f"bench: outlier {name} panel {t:.2f}s = "
            f"{t / b:.2f}x baseline {b}; isolated re-time "
            f"{min(iso):.2f}s = {min(iso) / b:.2f}x",
            file=sys.stderr,
            flush=True,
        )

    total = round(sum(timings.values()), 3)
    headline = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": runs,
        "load_avg_1m": [round(load_start, 2), round(os.getloadavg()[0], 2)],
        "load_avg_1m_external_start": round(external_load, 2),
        "loaded_host": loaded_host,
        "retimed_outliers": retimed,
    }
    # Full payload (per-run raws, for separating plan regressions from
    # host scheduling noise) goes to a SIDE FILE; stdout carries only the
    # compact headline as the LAST line. r5's stdout payload included
    # raw_runs and overflowed the driver's tail capture, leaving
    # BENCH_r05.json with parsed: null (VERDICT r5 wrong #1).
    raw_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_raw_latest.json"
    )
    with open(raw_path, "w") as f:
        json.dump({**headline, "raw_runs": raw_runs}, f, indent=1)
    spark.stop()
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
