#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same parquet tables, then compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns {scols} != {dcols}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        if neq.any().any():
            bad_cols = [c for c in a.columns if neq[c].any()]
            idx = neq.any(axis=1)
            problems.append(
                f"value mismatch in cols {bad_cols}; first diffs:\n"
                f"spark:\n{a[idx].head(3)}\nduck:\n{b[idx].head(3)}"
            )
    # dtype report (informational — driver may compare schemas strictly)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype {c}: spark={a[c].dtype} duck={b[c].dtype}")
    return problems


# ---------------------------------------------------------------------------
# Independent local verifiers for the rows-only entries (VERDICT r4 #1).
#
# The driver cannot oracle recall or zlib in SQL, so these entries are
# self-judging inside the engine. The checks below break that loop:
# the EXACT reference set is computed here with pyarrow + numpy straight
# off the parquet files (no Spark, no engine code), the approximate set
# comes from the engine (it is the object under test), and the recall
# arithmetic runs in plain Python. A drifted engine claim — wrong hits,
# wrong mean, a stale meets_floor bit — fails the check even though the
# entry's own columns would happily agree with themselves.
# ---------------------------------------------------------------------------


def _exact_topk_numpy(sf_dir: str, k: int = 10, n_queries: int = 20) -> dict[int, set[int]]:
    """Exact cosine top-k per query, independent of the engine: float64
    numpy over the raw parquet, ranked by (similarity desc, vec_id asc) —
    the same documented deterministic tie-break the engine uses."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = vecs / norms
    qmask = ids < n_queries
    qids, qm = ids[qmask], unit[qmask]
    sims = unit @ qm.T
    out: dict[int, set[int]] = {}
    for j, qid in enumerate(qids):
        order = np.lexsort((ids, -sims[:, j]))[:k]
        out[int(qid)] = {int(i) for i in ids[order]}
    return out


def _pairs_to_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    return out


def check_ann_recall(spark, spark_sf: str, data_sf: str, sdf: pd.DataFrame) -> list[str]:
    """Verify the unified recall panel: every (codec, variant) group's
    per-query hits, recall, mean and floor bit are re-derived
    independently — approximate sets from the engine under test, the
    exact set from pyarrow+numpy, all arithmetic in plain Python."""
    import tempfile

    from pyspark.sql import functions as F

    from deployment_spark.functions.vector import l2_normalize
    from deployment_spark.operators.ivfpq import IVFPQIndex
    from deployment_spark.operators.pq import PQCodec
    from deployment_spark.operators.sq import SQCodec
    from deployment_spark.queries import (
        IVF_BATCH_FLOOR,
        IVF_DISTRIBUTED_FLOOR,
        IVF_GRAPH_FLOOR,
        IVF_GRAPH_SEED_FLOOR,
        IVF_RECALL_FLOOR,
        IVFPQ_BATCH_FLOOR,
        IVFPQ_RERANK_FLOOR,
        IVFSQ_BATCH_FLOOR,
        PQ_ADC_FLOOR,
        PQ_BATCH_FLOOR,
        PQ_RERANK_FLOOR,
        SQ_ADC_FLOOR,
        SQ_BATCH_FLOOR,
        SQ_RERANK_FLOOR,
        _ivf_big_index,
        _ivf_index,
        _t,
    )

    k = 10
    exact = _exact_topk_numpy(data_sf)
    emb = _t(spark, spark_sf, "embeddings")
    norm = emb.select("vec_id", l2_normalize("embedding").alias("embedding"))
    queries = norm.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    raw_queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    specs: dict[tuple[str, str], tuple[dict[int, set[int]], float]] = {}

    ivf_index, _ = _ivf_index(spark, spark_sf)
    specs[("ivf", "pruned")] = (
        _pairs_to_sets(
            ivf_index.search(raw_queries, k=k, nprobe=10)
            .select("query_id", "vec_id").collect()
        ),
        IVF_RECALL_FLOOR,
    )

    # distributed routing on the hand-seeded nlist > 1,024 index: the
    # approximate set comes from the engine's route_distributed path
    # (the object under test — NO driver centroid collect inside), the
    # exact set and arithmetic stay independent; the one-doc-per-cluster
    # construction makes 1.0 the only correct mean (floor is equality)
    big_index, big_emb = _ivf_big_index(spark, spark_sf)
    assert big_index.nlist() > 1024, big_index.nlist()
    copies = -(-big_index.nlist() // big_emb.count())
    specs[("ivf", "distributed")] = (
        _pairs_to_sets(
            big_index.search(
                raw_queries, k=k, nprobe=copies * k, routing="distributed"
            )
            .select("query_id", "vec_id").collect()
        ),
        IVF_DISTRIBUTED_FLOOR,
    )

    # r8: the batch path (blocked centroid routing + cluster-grouped
    # scoring, nothing query-scale on the driver) on the same
    # exact-by-construction fixture — floor is equality at 1.0
    specs[("ivf", "batch")] = (
        _pairs_to_sets(
            big_index.search_batch(raw_queries, k=k, nprobe=copies * k)
            .select("query_id", "vec_id").collect()
        ),
        IVF_BATCH_FLOOR,
    )

    # r10 (V8 closure): the starved seed and its graph-assisted lift —
    # approximate sets from the engine's graph_assisted_topk (the object
    # under test), exact set + arithmetic independent as everywhere
    from deployment_spark.operators.knn import graph_assisted_topk, knn_graph

    seed_df = ivf_index.search(raw_queries, k=k, nprobe=2).select(
        "query_id", "vec_id"
    )
    specs[("ivf", "seed")] = (_pairs_to_sets(seed_df.collect()), IVF_GRAPH_SEED_FLOOR)
    specs[("ivf", "graph")] = (
        _pairs_to_sets(
            graph_assisted_topk(
                emb, raw_queries, seed_df, knn_graph(emb, k=10), k=k, hops=1
            )
            .select("query_id", "vec_id").collect()
        ),
        IVF_GRAPH_FLOOR,
    )
    # r11: the streaming-maintained graph's expansion — the graph comes
    # from the engine's per-insert maintenance path (the object under
    # test); exact set + recall arithmetic stay independent as always
    from deployment_spark.queries import _streamed_graph

    specs[("ivf", "graph_stream")] = (
        _pairs_to_sets(
            graph_assisted_topk(
                emb, raw_queries, seed_df, _streamed_graph(spark, spark_sf),
                k=k, hops=1,
            )
            .select("query_id", "vec_id").collect()
        ),
        IVF_GRAPH_FLOOR,
    )
    # r12: the ANN-ASSISTED maintenance variant (per-batch pair passes
    # restricted to the batch's probed clusters) — same expansion, its
    # own floor; the maintained graph comes from the engine under test
    from deployment_spark.queries import IVF_GRAPH_IVF_FLOOR

    specs[("ivf", "graph_stream_ivf")] = (
        _pairs_to_sets(
            graph_assisted_topk(
                emb, raw_queries, seed_df,
                _streamed_graph(spark, spark_sf, "ivf"),
                k=k, hops=1,
            )
            .select("query_id", "vec_id").collect()
        ),
        IVF_GRAPH_IVF_FLOOR,
    )

    pq_codec = PQCodec.train(norm, m=16, ksub=256, seed=42)
    pq_codes = pq_codec.encode(norm)
    specs[("pq", "adc")] = (
        _pairs_to_sets(
            pq_codec.search(pq_codes, queries, k=k).select("query_id", "vec_id").collect()
        ),
        PQ_ADC_FLOOR,
    )
    specs[("pq", "rerank")] = (
        _pairs_to_sets(
            pq_codec.search_rerank(pq_codes, queries, norm, k=k, shortlist=50)
            .select("query_id", "vec_id").collect()
        ),
        PQ_RERANK_FLOOR,
    )
    # r8: the corpus-scale batch route, same block grid as the entry
    specs[("pq", "batch")] = (
        _pairs_to_sets(
            pq_codec.search_batch(
                pq_codes, queries, k=k, num_query_blocks=3, num_code_blocks=4
            ).select("query_id", "vec_id").collect()
        ),
        PQ_BATCH_FLOOR,
    )
    # r11: OPQ — deterministic seeded training, so this independent
    # re-run re-derives the entry's exact approximate sets
    from deployment_spark.operators.opq import rotate_vectors, train_opq
    from deployment_spark.queries import OPQ_RERANK_FLOOR

    r_mat, opq_codec = train_opq(norm, m=16, ksub=256, seed=42, opq_iters=6)
    opq_rot = rotate_vectors(norm, r_mat)
    opq_q = rotate_vectors(queries, r_mat, vec_col="query_vec")
    specs[("pq", "opq")] = (
        _pairs_to_sets(
            opq_codec.search_rerank(
                opq_codec.encode(opq_rot), opq_q, opq_rot, k=k, shortlist=50
            ).select("query_id", "vec_id").collect()
        ),
        OPQ_RERANK_FLOOR,
    )

    with tempfile.TemporaryDirectory(prefix="oracle_ivfpq_") as root:
        ivfpq = IVFPQIndex(spark, root).build(norm, nlist=8, m=16, ksub=256)
        specs[("ivfpq", "rerank")] = (
            _pairs_to_sets(
                ivfpq.search(queries, k=k, nprobe=5, shortlist=50)
                .select("query_id", "vec_id").collect()
            ),
            IVFPQ_RERANK_FLOOR,
        )
        specs[("ivfpq", "batch")] = (
            _pairs_to_sets(
                ivfpq.search_batch(
                    queries, k=k, nprobe=5, shortlist=50, num_query_blocks=3
                ).select("query_id", "vec_id").collect()
            ),
            IVFPQ_BATCH_FLOOR,
        )

    with tempfile.TemporaryDirectory(prefix="oracle_ivfsq_") as root:
        from deployment_spark.operators.ivfsq import IVFSQIndex
        from deployment_spark.queries import IVFSQ_FLOOR

        ivfsq = IVFSQIndex(spark, root).build(norm, nlist=8)
        specs[("ivfsq", "adc")] = (
            _pairs_to_sets(
                ivfsq.search(queries, k=k, nprobe=5, shortlist=None)
                .select("query_id", "vec_id").collect()
            ),
            IVFSQ_FLOOR,
        )
        specs[("ivfsq", "rerank")] = (
            _pairs_to_sets(
                ivfsq.search(queries, k=k, nprobe=5, shortlist=50)
                .select("query_id", "vec_id").collect()
            ),
            IVFSQ_FLOOR,
        )
        specs[("ivfsq", "batch")] = (
            _pairs_to_sets(
                ivfsq.search_batch(
                    queries, k=k, nprobe=5, shortlist=50, num_query_blocks=3
                ).select("query_id", "vec_id").collect()
            ),
            IVFSQ_BATCH_FLOOR,
        )

    sq_codec = SQCodec.train(norm)
    sq_codes = sq_codec.encode(norm)
    specs[("sq8", "adc")] = (
        _pairs_to_sets(
            sq_codec.search(sq_codes, queries, k=k).select("query_id", "vec_id").collect()
        ),
        SQ_ADC_FLOOR,
    )
    specs[("sq8", "rerank")] = (
        _pairs_to_sets(
            sq_codec.search_rerank(sq_codes, queries, norm, k=k, shortlist=50)
            .select("query_id", "vec_id").collect()
        ),
        SQ_RERANK_FLOOR,
    )
    specs[("sq8", "batch")] = (
        _pairs_to_sets(
            sq_codec.search_batch(
                sq_codes, queries, k=k, num_query_blocks=3, num_code_blocks=4
            ).select("query_id", "vec_id").collect()
        ),
        SQ_BATCH_FLOOR,
    )

    # r12: maxsim/two_stage — the approximate sets come from the
    # engine's token_candidates -> maxsim_rerank pipeline at the
    # scale-derived operating point (re-run via the entry's own group
    # builder); the EXACT maxsim ranking is re-derived here in numpy
    # from the raw parquet (different exact than the shared cosine set,
    # hence the override below).
    from deployment_spark.queries import (
        MAXSIM_TWO_STAGE_FLOOR,
        q_maxsim_recall,
    )

    import numpy as np

    mv_sink: dict = {}
    q_maxsim_recall(spark, spark_sf, pairs_sink=mv_sink).collect()
    specs[("maxsim", "two_stage")] = (
        _pairs_to_sets(mv_sink[("maxsim", "two_stage")].collect()),
        MAXSIM_TWO_STAGE_FLOOR,
    )
    import pyarrow.parquet as _pq

    _t2 = _pq.read_table(
        f"{data_sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    _ids = np.asarray(_t2.column("vec_id").to_pylist())
    _mat = np.asarray(_t2.column("embedding").to_pylist(), dtype=np.float64)
    _order = np.argsort(_ids)
    _ids, _mat = _ids[_order], _mat[_order]
    _n = len(_ids)
    _tok_idx = (np.arange(_n)[:, None] + 211 * np.arange(3)[None, :]) % _n
    mv_exact: dict[int, set[int]] = {}
    for _q in range(5):
        _qb = _mat[[(int(_q) + 97 * j) % _n for j in range(2)]]  # (2, d)
        _dots = _qb @ _mat.T  # (2, n) — query token x corpus token (row=vec)
        _per_doc = _dots[:, _tok_idx]  # (2, n_docs, 3)
        _score = np.round(_per_doc.max(axis=2).sum(axis=0), 4)
        _top = np.lexsort((_ids, -_score))[:k]
        mv_exact[int(_q)] = {int(_ids[i]) for i in _top}
    # r13: maxsim/two_stage_stream — served from the STREAMING-
    # MAINTAINED token index after a mid-stream delete + exact repair;
    # the exact reference is the same Σ-max ranking RESTRICTED to the
    # survivors (the fixture's predicate is deterministic), re-derived
    # here in numpy with no engine code
    from deployment_spark.queries import (
        MAXSIM_STREAM_FLOOR,
        q_maxsim_stream_recall,
    )

    mvs_sink: dict = {}
    q_maxsim_stream_recall(spark, spark_sf, pairs_sink=mvs_sink).collect()
    specs[("maxsim", "two_stage_stream")] = (
        _pairs_to_sets(mvs_sink[("maxsim", "two_stage_stream")].collect()),
        MAXSIM_STREAM_FLOOR,
    )
    _half = int(_ids.max()) // 2
    _surv = (_ids % 4 == 2) & ~((_ids % 17 == 3) & (_ids <= _half))
    mvs_exact: dict[int, set[int]] = {}
    for _q in range(5):
        _qb = _mat[[(int(_q) + 97 * j) % _n for j in range(2)]]
        _dots = _qb @ _mat.T
        _per_doc = _dots[:, _tok_idx]
        _score = np.round(_per_doc.max(axis=2).sum(axis=0), 4)
        _sids, _sscore = _ids[_surv], _score[_surv]
        _top = np.lexsort((_sids, -_sscore))[:k]
        mvs_exact[int(_q)] = {int(_sids[i]) for i in _top}
    exact_overrides: dict[tuple[str, str], dict[int, set[int]]] = {
        ("maxsim", "two_stage"): mv_exact,
        ("maxsim", "two_stage_stream"): mvs_exact,
    }

    problems: list[str] = []
    claimed_groups = {(r.codec, r.variant) for r in sdf.itertuples()}
    if claimed_groups != set(specs):
        problems.append(f"group set mismatch: {sorted(claimed_groups)} vs {sorted(specs)}")
        return problems
    for (codec_name, variant), (approx, floor) in specs.items():
        rows = sdf[(sdf["codec"] == codec_name) & (sdf["variant"] == variant)]
        tag = f"{codec_name}/{variant}"
        ex_ref = exact_overrides.get((codec_name, variant), exact)
        if set(int(q) for q in rows["query_id"]) != set(ex_ref):
            problems.append(f"{tag}: query set mismatch")
            continue
        per_q = {qid: len(ex & approx.get(qid, set())) for qid, ex in ex_ref.items()}
        mean = round(sum(round(h / k, 4) for h in per_q.values()) / len(per_q), 4)
        for row in rows.itertuples():
            qid = int(row.query_id)
            want = per_q[qid]
            if int(row.hits) != want:
                problems.append(f"{tag}[q={qid}]: hits claimed {row.hits}, independent {want}")
            if abs(float(row.recall) - round(want / k, 4)) > 1e-9:
                problems.append(
                    f"{tag}[q={qid}]: recall claimed {row.recall}, independent {round(want / k, 4)}"
                )
        # group-level columns are constant per group — check once, not
        # once per row (a drifted mean would otherwise print 20 times)
        if not rows["mean_recall"].sub(mean).abs().le(1e-9).all():
            problems.append(
                f"{tag}: mean claimed {sorted(set(rows['mean_recall']))}, independent {mean}"
            )
        if not rows["meets_floor"].eq(mean >= floor).all():
            problems.append(
                f"{tag}: meets_floor claimed {sorted(set(rows['meets_floor']))}, "
                f"independent {mean >= floor}"
            )
    return problems



def check_doc_compressibility(spark, spark_sf: str, data_sf: str, sdf: pd.DataFrame) -> list[str]:
    """Exact zlib oracle: recompute every ratio with stdlib zlib off the
    raw parquet + the entry's two planted docs."""
    import hashlib
    import zlib

    import pyarrow.parquet as pq

    t = pq.read_table(f"{data_sf}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        int(i): s
        for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        if int(i) < 50
    }
    docs[900001] = "spam " * 200
    docs[900002] = hashlib.sha512(b"noise").hexdigest()
    problems: list[str] = []
    if set(int(d) for d in sdf["doc_id"]) != set(docs):
        problems.append("doc_id set mismatch vs independent recompute")
        return problems
    for row in sdf.itertuples():
        text = docs[int(row.doc_id)]
        raw = text.encode("utf-8") if text is not None else b""
        want = len(zlib.compress(raw, 6)) / len(raw) if raw else None
        got = None if pd.isna(row.compress_ratio) else float(row.compress_ratio)
        if want is None:
            if got is not None:
                problems.append(f"doc {row.doc_id}: claimed {got}, expected NULL")
        elif got is None or abs(got - want) > 5e-5 + 1e-9:
            problems.append(
                f"doc {row.doc_id}: claimed {got}, independent zlib {want:.6f}"
            )
    return problems


# entry name -> verifier(spark, spark_sf, data_sf, sdf) -> problem list
LOCAL_CHECKS = {
    "ann_recall": check_ann_recall,
    "doc_compressibility": check_doc_compressibility,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--format",
        choices=["parquet", "orc"],
        default="parquet",
        help="Spark-side scan format. 'orc' converts every table to ORC in "
        "a temp dir and routes load_table through it (the DuckDB oracle "
        "keeps reading the original parquet), proving the hash-matched "
        "answers are independent of the scan format.",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from deployment_spark import get_spark

    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duck_connection(args.sf)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)

    spark_sf = args.sf
    prior_fmt = os.environ.get("SPARK_GRAFT_TABLE_FORMAT")
    if args.format == "orc":
        import shutil
        import tempfile

        from deployment_spark.schemas import TESTDATA_TABLES, load_table

        import atexit

        orc_dir = tempfile.mkdtemp(prefix="oracle_orc_")
        atexit.register(shutil.rmtree, orc_dir, ignore_errors=True)
        for t in TESTDATA_TABLES:
            load_table(spark, args.sf, t, fmt="parquet").write.mode(
                "overwrite"
            ).orc(f"{orc_dir}/{t}.orc")
        # the streaming entry is a parquet FILE-SOURCE by design — give it
        # the original file; every load_table scan goes through ORC
        shutil.copy(f"{args.sf}/events.parquet", f"{orc_dir}/events.parquet")
        os.environ["SPARK_GRAFT_TABLE_FORMAT"] = "orc"
        spark_sf = orc_dir
        print(f"[orc] tables converted to {orc_dir}; spark scans ORC, duckdb scans parquet", flush=True)

    failed, passed, rows_only = [], [], []
    try:
        _run(spark, con, qs, oracles, names, spark_sf, args, failed, passed, rows_only)
    finally:
        # --format orc flips a process-global toggle; restore it so any
        # in-process reuse after main() doesn't keep routing scans to the
        # (atexit-deleted) ORC dir
        if prior_fmt is None:
            os.environ.pop("SPARK_GRAFT_TABLE_FORMAT", None)
        else:
            os.environ["SPARK_GRAFT_TABLE_FORMAT"] = prior_fmt

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only", flush=True)
    return 1 if failed else 0


def _run(spark, con, qs, oracles, names, spark_sf, args, failed, passed, rows_only):
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, spark_sf).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}", flush=True)
            continue
        if name not in oracles:
            chk = LOCAL_CHECKS.get(name)
            if chk is None:
                rows_only.append(name)
                print(f"~ {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)", flush=True)
                continue
            try:
                problems = chk(spark, spark_sf, args.sf, sdf)
            except Exception as e:
                failed.append(name)
                print(f"✗ {name}: LOCAL CHECK ERROR {type(e).__name__}: {e}", flush=True)
                continue
            if problems:
                failed.append(name)
                print(f"✗ {name} (local check, {time.time()-t0:.1f}s)", flush=True)
                for p in problems:
                    print(f"    {p}", flush=True)
            else:
                passed.append(name)
                print(f"✓ {name} (local independent check, {len(sdf)} rows, {time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}", flush=True)
            continue
        problems = compare(name, sdf, ddf)
        hard = [p for p in problems if not p.startswith("dtype")]
        # r11: entries whose oracle replays a Spark-written facet
        # (ann_recall, doc_compressibility) keep their INDEPENDENT local
        # checker as defense-in-depth — the oracle verifies the
        # downstream arithmetic off the facet, the checker re-derives
        # the non-SQL core (numpy exact top-k / zlib) from the raw
        # parquet with no engine code. Both must be green.
        chk = LOCAL_CHECKS.get(name)
        if chk is not None and not hard:
            try:
                hard = hard + (chk(spark, spark_sf, args.sf, sdf) or [])
                problems = problems + hard
            except Exception as e:
                hard = hard + [f"LOCAL CHECK ERROR {type(e).__name__}: {e}"]
                problems = problems + hard
        if hard:
            failed.append(name)
            print(f"✗ {name} ({len(sdf)} vs {len(ddf)} rows, {time.time()-t0:.1f}s)", flush=True)
            for p in problems:
                print(f"    {p}", flush=True)
        else:
            passed.append(name)
            soft = "; ".join(p for p in problems if p.startswith("dtype"))
            extra = " + local check" if chk is not None else ""
            print(f"✓ {name} ({len(sdf)} rows{extra}, {time.time()-t0:.1f}s)" + (f" [{soft}]" if soft else ""), flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
