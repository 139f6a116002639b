"""Scale probe: measure how flagship entries scale with corpus size.

The correctness gate runs at sf0.01 and the bench at sf0.1; this tool
produces the MISSING evidence axis — the time-vs-data slope. It builds
content-distinct replicas of the sf0.1 tables at 1x/2x/4x/8x in /tmp
and times registry entries at each factor, printing one JSON line per
(entry, factor) and a slope summary.

Replication preserves workload character instead of distorting it:

- documents: every word in every replica is suffixed with a replica tag
  (``w`` -> ``w@r3``), so all shingles/tokens are distinct ACROSS
  replicas while the intra-replica near-dup/vocab structure is exactly
  the original. Naive row duplication would instead turn every doc into
  an exact dup (pair counts scale quadratically, not linearly) —
  measuring that would measure the wrong workload.
- embeddings: every replica-r>0 vector gets deterministic PER-VECTOR
  pseudo-random jitter of FIXED magnitude (sin of a (dim, vec_id, r)
  phase mix, amplitude sized so the jitter norm is ~0.28 for unit
  vectors → clone cosine ~0.96, below near-dup thresholds). Three
  wrong schemes this replaces, each measured-degenerate: uniform
  scaling is cosine-invariant (exact duplicates); a shared per-replica
  offset preserves within-replica structure but makes all vectors
  collapse toward the offset direction once r grows (r=6 vs r=7
  replicas read cosine 0.998 — duplicates again); amplitude growing
  with r has the same collapse. Fixed-magnitude independent jitter
  keeps clone cosine ~constant ~0.96 for EVERY replica pair and
  perturbs within-replica neighbor structure only statistically
  (±noise), which is the honest claim. Ids are remapped to stay
  unique.
- all other tables are copied as-is (the probed entries read only
  documents/embeddings; the copies keep load_table happy).

Near-linear slope (time(8x)/time(1x) ~ 8 or below) is the pass signal:
every probed operator shuffles on content keys — hash, shingle, band,
token, cluster — never on pairs, so doubling rows should double work.
A super-linear slope flags a hidden all-pairs or skew collapse.

Usage:
  python tools/scale_probe.py                       # default entries
  python tools/scale_probe.py --factors 1,4 --entries doc_lm_score
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = [
    "doc_exact_dedup",
    "doc_minhash_lsh",
    "doc_ngram_jaccard",
    "doc_lm_score",
    "doc_bm25_topk",
    "topk_cosine",
    "ivf_topk",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_scaled_dir(spark, src: str, factor: int, root: str) -> str:
    """Materialize {root}/{factor}x with scaled documents/embeddings and
    copied remaining tables. Idempotent per process run (rebuilds)."""
    from pyspark.sql import functions as F

    out = os.path.join(root, f"{factor}x")
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for t in TABLES:
        src_file = os.path.join(src, f"{t}.parquet")
        if t not in ("documents", "embeddings"):
            shutil.copy(src_file, os.path.join(out, f"{t}.parquet"))
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])
    # jitter amplitude: RMS of sin over mixed phases is 1/sqrt(2), so
    # per-vector jitter norm ~ amp * sqrt(dim/2); target norm 0.28
    amp = 0.28 / ((dim / 2.0) ** 0.5)
    doc_parts = []
    emb_parts = []
    for r in range(factor):
        tag = F.lit(f"@r{r}")
        retagged = F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"), lambda w: F.concat(w, tag)
            ),
            " ",
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n_doc)).alias("doc_id"),
                (retagged if r else F.col("text")).alias("text"),
                "lang", "source", "n_chars",
            )
        )
        jit_amp = 0.0 if r == 0 else amp
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * n_vec)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + F.lit(jit_amp)
                        * F.sin(
                            i.cast("double") * F.lit(12.9898)
                            + F.col("vec_id").cast("double") * F.lit(78.233)
                            + F.lit(r * 37.719)
                        )
                    ).cast("float"),
                ).alias("embedding"),
                "label",
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    # one file per ~core keeps scan parallelism comparable across factors
    d.repartition(8 * factor).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    e.repartition(8 * factor).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return out


def run_store_probe(spark, src: str, factors: list[int], root: str, runs: int) -> None:
    """--store mode (VERDICT r5 next #5/#6): per-MUTATION cost of the
    snapshot store as the CORPUS grows, cow vs mor, at a FIXED batch
    size. The claim under test: cow mutations rewrite the snapshot —
    O(corpus) per mutation — while mor appends a segment/tombstone —
    O(batch) per mutation, paid back at read/compaction time. The probe
    seeds a store with factor × the sf0.1 events table, then times
    insert / delete / upsert (2,000-row batches) and a zone-map range
    read at each corpus size. Slopes over corpus size are the evidence:
    cow mutation cost must GROW with the corpus, mor's must stay ~flat.
    """
    from pyspark.sql import functions as F

    from deployment_spark.operators.crud import SnapshotStore

    ev = spark.read.parquet(os.path.join(src, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    n = ev.agg(F.max("event_id")).first()[0] + 1
    batch = 2_000
    results: dict[tuple[str, str], dict[int, float]] = {}
    for factor in factors:
        parts = [
            ev.select(
                (F.col("event_id") + F.lit(r * n)).alias("event_id"),
                "event_type", "value",
            )
            for r in range(factor)
        ]
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        corpus = corpus.localCheckpoint()  # seed data off the critical path
        hi = factor * n
        for mode in ("cow", "mor"):
            store_root = os.path.join(root, f"store_{mode}_{factor}x")
            shutil.rmtree(store_root, ignore_errors=True)
            store = SnapshotStore(spark, store_root, key="event_id", mode=mode)
            store.insert(corpus)  # untimed seed
            ops: dict[str, float] = {}
            for i in range(runs):
                # each rep mutates DISJOINT fresh ids so reps are
                # comparable (no rep sees another's leftovers)
                new_lo = hi + i * 3 * batch
                ins = corpus.limit(batch).select(
                    (F.col("event_id") % batch + new_lo).alias("event_id"),
                    "event_type", "value",
                )
                t0 = time.perf_counter()
                store.insert(ins)
                ops["insert"] = min(ops.get("insert", 9e9), time.perf_counter() - t0)
                ins2 = corpus.limit(batch).select(
                    (F.col("event_id") % batch + new_lo + 2 * batch).alias(
                        "event_id"
                    ),
                    "event_type", "value",
                )
                t0 = time.perf_counter()
                store.insert(ins2, assume_new=True)
                ops["insert_nocheck"] = min(
                    ops.get("insert_nocheck", 9e9), time.perf_counter() - t0
                )
                dele = list(range(new_lo, new_lo + batch // 2))
                t0 = time.perf_counter()
                store.delete_ids(dele)
                ops["delete"] = min(ops.get("delete", 9e9), time.perf_counter() - t0)
                ups = corpus.limit(batch).select(
                    (F.col("event_id") % batch + new_lo + batch).alias("event_id"),
                    "event_type",
                    (F.col("value") + 1.0).alias("value"),
                )
                t0 = time.perf_counter()
                store.upsert(ups)
                ops["upsert"] = min(ops.get("upsert", 9e9), time.perf_counter() - t0)
                t0 = time.perf_counter()
                store.read_where_key_between(1000, 3000).count()
                ops["range_read"] = min(
                    ops.get("range_read", 9e9), time.perf_counter() - t0
                )
            for op, sec in ops.items():
                results[(mode, op)] = {**results.get((mode, op), {}), factor: sec}
                print(
                    json.dumps(
                        {
                            "probe": "store", "mode": mode, "op": op,
                            "factor": factor, "corpus_rows": factor * n,
                            "sec": round(sec, 3),
                        }
                    ),
                    flush=True,
                )
            shutil.rmtree(store_root, ignore_errors=True)
    base, top = factors[0], factors[-1]
    print(
        json.dumps(
            {
                "metric": "store_scale_slope",
                "span": f"{base}x->{top}x",
                "batch_rows": batch,
                "slopes": {
                    f"{mode}.{op}": round(times[top] / times[base], 2)
                    for (mode, op), times in sorted(results.items())
                    if base in times and top in times and times[base] > 0
                },
            }
        ),
        flush=True,
    )


def run_bloom_probe(spark, src: str, factors: list[int], root: str, runs: int) -> None:
    """--bloom mode (r7): point-read cost on a HASH-keyed mor store as
    SEGMENTS accumulate, bloom sidecars vs none. With md5 keys every
    segment's zone map spans the whole keyspace, so without blooms a
    point read merges ALL segments — cost grows with segment count —
    while with blooms it scans only the files the probe keys can be in
    (~flat). The probe seeds ``8 × factor`` segments of a FIXED
    12.5k-row batch (the streaming-ingest accretion shape), times
    ``read_where_key_in`` of 4 keys from one mid-history segment, and
    also times the seeding inserts — the bloom WRITE tax (one O(batch)
    read-back per segment) is part of the honest claim."""
    from pyspark.sql import functions as F

    from deployment_spark.operators.crud import SnapshotStore

    ev = spark.read.parquet(os.path.join(src, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    n = ev.agg(F.max("event_id")).first()[0] + 1
    batch_rows = 12_500
    base = ev.filter(F.col("event_id") < batch_rows).localCheckpoint()
    results: dict[tuple[str, str], dict[int, float]] = {}
    for factor in factors:
        segs = 8 * factor
        for variant, bits in (("bloom", 1 << 17), ("nobloom", None)):
            store_root = os.path.join(root, f"bloomstore_{variant}_{factor}x")
            shutil.rmtree(store_root, ignore_errors=True)
            store = SnapshotStore(
                spark, store_root, key="ek", mode="mor", bloom_bits=bits
            )
            t0 = time.perf_counter()
            for s in range(segs):
                seg = base.select(
                    F.md5((F.col("event_id") + F.lit(s * n)).cast("string")).alias("ek"),
                    "event_type", "value",
                )
                store.insert(seg, assume_new=True)
            insert_avg = (time.perf_counter() - t0) / segs
            # 4 keys from one mid-history segment
            mid = segs // 2
            probe = [
                r.ek
                for r in base.limit(4)
                .select(
                    F.md5((F.col("event_id") + F.lit(mid * n)).cast("string")).alias("ek")
                )
                .collect()
            ]
            read_best = None
            got = 0
            for _ in range(runs):
                t0 = time.perf_counter()
                got = store.read_where_key_in(probe).count()
                dt = time.perf_counter() - t0
                read_best = dt if read_best is None else min(read_best, dt)
            assert got == 4, f"point read returned {got} rows"
            for op, sec in (("point_read", read_best), ("insert_avg", insert_avg)):
                results[(variant, op)] = {**results.get((variant, op), {}), factor: sec}
                print(
                    json.dumps(
                        {
                            "probe": "bloom", "variant": variant, "op": op,
                            "factor": factor, "segments": segs,
                            "corpus_rows": segs * batch_rows, "sec": round(sec, 3),
                        }
                    ),
                    flush=True,
                )
            shutil.rmtree(store_root, ignore_errors=True)
    lo, hi = factors[0], factors[-1]
    print(
        json.dumps(
            {
                "metric": "bloom_scale_slope",
                "span": f"{8 * lo}->{8 * hi} segments",
                "batch_rows": batch_rows,
                "slopes": {
                    f"{variant}.{op}": round(times[hi] / times[lo], 2)
                    for (variant, op), times in sorted(results.items())
                    if lo in times and hi in times and times[lo] > 0
                },
            }
        ),
        flush=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", default="1,2,4,8")
    ap.add_argument("--entries", default=",".join(DEFAULT_ENTRIES))
    ap.add_argument("--runs", type=int, default=2, help="best-of-N per cell")
    ap.add_argument("--root", default="/tmp/spark_graft_scale")
    ap.add_argument(
        "--store", action="store_true",
        help="probe SnapshotStore mutation cost vs corpus size (cow vs mor)",
    )
    ap.add_argument(
        "--bloom", action="store_true",
        help="probe hash-key point-read cost vs segment count (bloom vs none)",
    )
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    entries = args.entries.split(",")

    from deployment_spark import get_spark
    from deployment_spark.queries import REGISTRY

    if args.store or args.bloom:
        spark = get_spark()
        try:
            if args.store:
                run_store_probe(spark, args.src, factors, args.root, args.runs)
            if args.bloom:
                run_bloom_probe(spark, args.src, factors, args.root, args.runs)
        finally:
            spark.stop()
            shutil.rmtree(args.root, ignore_errors=True)
        return 0

    unknown = [e for e in entries if e not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")

    spark = get_spark()
    results: dict[str, dict[int, float]] = {e: {} for e in entries}
    try:
        for fi, factor in enumerate(factors):
            sf_dir = build_scaled_dir(spark, args.src, factor, args.root)
            if fi == 0:
                # untimed warmup at the smallest factor: JIT/codegen and
                # catalog caches otherwise inflate the 1x cell and
                # understate every slope
                for name in entries:
                    REGISTRY[name][0](spark, sf_dir).count()
            for name in entries:
                fn = REGISTRY[name][0]
                best = None
                rows = 0
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    rows = fn(spark, sf_dir).count()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                results[name][factor] = best
                print(
                    json.dumps(
                        {"entry": name, "factor": factor, "sec": round(best, 3), "rows": rows}
                    ),
                    flush=True,
                )
        base = factors[0]
        top = factors[-1]
        summary = {
            name: round(times[top] / times[base], 2)
            for name, times in results.items()
            if base in times and top in times and times[base] > 0
        }
        print(
            json.dumps(
                {
                    "metric": "scale_slope",
                    "span": f"{base}x->{top}x",
                    "ideal": float(top) / base,
                    "slopes": summary,
                }
            ),
            flush=True,
        )
    finally:
        spark.stop()
        shutil.rmtree(args.root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
