"""Measure multi-vector maxsim cost: exact corpus token scan vs the
ColBERT two-stage shape (pooled single-vector candidates → maxsim
re-rank of candidate bags only), plus the two-stage agreement with the
exact ranking, at growing corpus sizes (r11).

Token bags are synthetic (tokens-per-doc td, dimension d); queries stay
fixed, so the exact arm's work grows with corpus tokens while the
rerank arm's maxsim work is O(candidates) by construction — the wall
gap at the top scale is the scale claim.

Usage: python tools/maxsim_probe.py [--scales 5000,20000,80000]
       [--auto]   (r12: derive k_per_token from corpus tokens via
                   reference_k_per_token instead of the fixed width —
                   the sweep that shows the derived operating point
                   holds the recall floor where the fixed one decays)
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
    ap.add_argument("--scales", default="5000,20000,80000")
    ap.add_argument("--td", type=int, default=4, help="tokens per doc")
    ap.add_argument("--tq", type=int, default=3, help="tokens per query")
    ap.add_argument("--nq", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--cand", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--auto", action="store_true",
                    help="scale-derived k_per_token (reference_k_per_token)")
    args = ap.parse_args()

    from deployment_spark import get_spark
    from deployment_spark.operators.ivf import IVFIndex, reference_nlist
    from deployment_spark.operators.multivec import (
        maxsim_rerank,
        maxsim_topk,
        pool_vectors,
    )

    spark = get_spark(app_name="maxsim-probe")
    rng = np.random.default_rng(5)
    k = 10

    def unit(a):
        return a / np.linalg.norm(a, axis=-1, keepdims=True)

    qv = unit(rng.normal(size=(args.nq, args.tq, args.dim)))
    q_df = spark.createDataFrame(
        [
            (i, j, qv[i, j].tolist())
            for i in range(args.nq)
            for j in range(args.tq)
        ],
        "query_id long, q_pos long, query_vec array<double>",
    ).localCheckpoint()

    def best(fn):
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        return min(ts), ts

    for n in (int(s) for s in args.scales.split(",")):
        # each doc's tokens draw from DIFFERENT query-token centers (a
        # doc covers several topics, like real multi-vector bags): the
        # pooled doc vector then reflects its topic mix, the pooled
        # query reflects the query's — structure both stages can see.
        # Pure-noise bags would make recall meaningless; single-center
        # docs would make the pooled stages disagree by construction.
        centers = qv.reshape(-1, args.dim)
        asgn = rng.integers(0, len(centers), size=(n, args.td))
        base = centers[asgn] + 0.3 * rng.normal(size=(n, args.td, args.dim))
        dv = unit(base)
        doc_df = spark.createDataFrame(
            [
                (i, dv[i, j].tolist())
                for i in range(n)
                for j in range(args.td)
            ],
            "vec_id long, embedding array<double>",
        ).localCheckpoint()
        t_exact, raw_e = best(
            lambda: maxsim_topk(doc_df, q_df, k=k, query_pos="q_pos").collect()
        )
        exact = {
            (r.query_id, r.rank): r.vec_id
            for r in maxsim_topk(doc_df, q_df, k=k, query_pos="q_pos").collect()
        }
        pooled = pool_vectors(doc_df).localCheckpoint()
        idx = IVFIndex(
            spark, os.path.join(tempfile.gettempdir(), f"maxsim_probe_{n}")
        ).build(pooled, nlist=reference_nlist(n))
        pooled_q = pool_vectors(
            q_df.select(
                F.col("query_id").alias("vec_id"),
                F.col("query_vec").alias("embedding"),
            )
        ).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        ).localCheckpoint()

        def two_stage():
            cand = idx.search(pooled_q, k=args.cand, nprobe=10)
            return maxsim_rerank(
                doc_df, q_df, cand, k=k, query_pos="q_pos"
            ).collect()

        # token-level first stage (the ColBERT/PLAID shape): IVF over
        # the TOKEN table, one search per query token, union of owning
        # docs as candidates
        from pyspark.sql import Window as W

        from deployment_spark.operators.multivec import token_candidates

        tok_tbl = doc_df.withColumn(
            "tok_id",
            F.row_number().over(
                W.orderBy("vec_id", F.md5(F.col("embedding").cast("string")))
            ).cast("long"),
        ).localCheckpoint()
        tok_idx = IVFIndex(
            spark, os.path.join(tempfile.gettempdir(), f"maxsim_tok_{n}")
        ).build(
            tok_tbl.select(F.col("tok_id").alias("vec_id"), "embedding"),
            nlist=reference_nlist(n * args.td),
        )

        from deployment_spark.operators.multivec import reference_k_per_token

        kpt = (
            reference_k_per_token(n * args.td) if args.auto else 2 * args.cand
        )

        def tok_two_stage():
            cand = token_candidates(
                lambda qd, kk2: tok_idx.search(qd, k=kk2, nprobe=32).select(
                    "query_id", F.col("vec_id").alias("tok_id")
                ),
                q_df,
                tok_tbl.select("tok_id", "vec_id"),
                k_per_token=kpt,
                query_pos="q_pos",
            )
            return maxsim_rerank(
                doc_df, q_df, cand, k=k, query_pos="q_pos"
            ).collect()

        t_two, raw_t = best(two_stage)
        t_tok, raw_tok = best(tok_two_stage)

        def recall_of(rows):
            got_sets = {}
            for r in rows:
                got_sets.setdefault(r.query_id, set()).add(r.vec_id)
            return sum(
                len(ex_sets[q] & got_sets.get(q, set())) / k for q in ex_sets
            ) / len(ex_sets)

        ex_sets = {}
        for (q, _), v in exact.items():
            ex_sets.setdefault(q, set()).add(v)
        agree = recall_of(two_stage())
        agree_tok = recall_of(tok_two_stage())
        print(
            json.dumps(
                {
                    "docs": n,
                    "doc_tokens": n * args.td,
                    "k_per_token": kpt,
                    "operating_point": "auto" if args.auto else "fixed",
                    "exact_s": round(t_exact, 3),
                    "pooled_stage_s": round(t_two, 3),
                    "pooled_stage_recall": round(agree, 4),
                    "token_stage_s": round(t_tok, 3),
                    "token_stage_recall": round(agree_tok, 4),
                    "speedup_token_vs_exact": round(t_exact / t_tok, 2),
                    "exact_raw": [round(t, 3) for t in raw_e],
                    "pooled_raw": [round(t, 3) for t in raw_t],
                    "token_raw": [round(t, 3) for t in raw_tok],
                    "load_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
