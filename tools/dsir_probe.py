#!/usr/bin/env python
"""Stage breakdown for dsir_select's 10x slope (VERDICT r8 #4).

The entry is three stages sharing one materialized weight table:

  weights : tokenize + explode (uni+bigram) -> (doc, bucket) partial
            aggregate -> 512-bucket distribution exchange -> broadcast
            ratio join -> per-doc sum. The only corpus-scale work;
            cost is linear in TOTAL TOKENS (the explode), with the
            exchange already pre-reduced to docs x distinct-buckets.
  top     : rank the per-doc weight table (one window over ~|docs| rows).
  gumbel  : same, with the portable-hash Gumbel key.

This probe times each stage at sf0.1 and the derived sf1 (10x) so the
panel slope can be attributed: if `weights` carries the growth and the
rankings stay flat, the slope is the token volume (inherent data cost),
not a plan defect. Results land in BASELINE.md.

Usage: python tools/dsir_probe.py [--runs 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from deployment_spark import get_spark  # noqa: E402
from deployment_spark.operators.selection import (  # noqa: E402
    dsir_resample,
    dsir_select,
    dsir_weights,
)


def best_of(runs, fn):
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return round(min(ts), 3)


def main() -> None:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark()
    out = {}
    for tag, sf in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(REPO, "scratch", "sf1")),
    ):
        d = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        n_docs = d.count()
        n_tokens = d.select(
            F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        ).first()[0]

        # stage 1: the weight table, materialized exactly as the entry
        # does (localCheckpoint) so downstream timings don't recompute it
        w_holder = {}

        def build_weights():
            w_holder["w"] = dsir_weights(
                d, F.col("lang") == "en"
            ).localCheckpoint()

        weights_sec = best_of(runs, build_weights)
        w = w_holder["w"]

        top_sec = best_of(
            runs,
            lambda: dsir_select(
                d, F.col("lang") == "en", k=100, weights=w
            ).count(),
        )
        gum_sec = best_of(
            runs,
            lambda: dsir_resample(
                d, F.col("lang") == "en", k=100, round_to=4, weights=w
            ).count(),
        )
        out[tag] = {
            "docs": n_docs,
            "tokens": int(n_tokens),
            "weights_sec": weights_sec,
            "top_sec": top_sec,
            "gumbel_sec": gum_sec,
            "total_sec": round(weights_sec + top_sec + gum_sec, 3),
        }
        print(json.dumps({"sf": tag, **out[tag]}), flush=True)
    s0, s1 = out["sf0.1"], out["sf1"]
    print(
        json.dumps(
            {
                "summary": True,
                "probe": "dsir_stages",
                "token_growth": round(s1["tokens"] / s0["tokens"], 2),
                "weights_slope": round(s1["weights_sec"] / s0["weights_sec"], 2),
                "top_slope": round(s1["top_sec"] / max(s0["top_sec"], 1e-9), 2),
                "gumbel_slope": round(
                    s1["gumbel_sec"] / max(s0["gumbel_sec"], 1e-9), 2
                ),
                "weights_share_sf1": round(
                    s1["weights_sec"] / s1["total_sec"], 2
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
