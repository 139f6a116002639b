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
    independently — approximate sets from the ENGINE-PUBLISHED pairs
    facet (the object under test: the same lazily-checkpointed frames
    the entry's own recall arithmetic consumed, written by the
    q_ann_recall call that produced ``sdf`` moments earlier in this
    run), the exact sets from pyarrow+numpy straight off the raw
    parquet, all arithmetic in plain Python.

    r14 (VERDICT r13 next #2): the checker previously re-derived the
    approximate sets by RE-RUNNING every engine search — two quantizer
    trainings, five index builds, two full maxsim pipeline re-runs, 21
    collects — roughly half the gate wall of the most expensive entry,
    for zero added independence: the approximate sets are the engine's
    output either way (they are the measured object, exactly as the
    DuckDB facet replay treats them). What must stay independent of the
    engine is the EXACT reference set and the recall arithmetic, and
    both still are. Search determinism stays pinned in the test suite
    (seeded trains, tie-aware rankings), and a facet that drifted from
    the entry's claimed rows fails the hits/mean comparison below."""
    import numpy as np
    import pyarrow.parquet as _pq

    from deployment_spark.queries import (
        ANN_RECALL_FACET,
        IVF_BATCH_FLOOR,
        IVF_DISTRIBUTED_FLOOR,
        IVF_GRAPH_FLOOR,
        IVF_GRAPH_IVF_FLOOR,
        IVF_GRAPH_SEED_FLOOR,
        IVF_RECALL_FLOOR,
        IVFPQ_BATCH_FLOOR,
        IVFPQ_RERANK_FLOOR,
        IVFSQ_BATCH_FLOOR,
        IVFSQ_FLOOR,
        MAXSIM_STREAM_FLOOR,
        MAXSIM_TWO_STAGE_FLOOR,
        OPQ_RERANK_FLOOR,
        PQ_ADC_FLOOR,
        PQ_BATCH_FLOOR,
        PQ_RERANK_FLOOR,
        SQ_ADC_FLOOR,
        SQ_BATCH_FLOOR,
        SQ_RERANK_FLOOR,
    )

    k = 10
    # the independent floor registry — import of engine CONSTANTS only
    # (as before); the facet's own floor column is deliberately ignored
    floors: dict[tuple[str, str], float] = {
        ("ivf", "pruned"): IVF_RECALL_FLOOR,
        ("ivf", "distributed"): IVF_DISTRIBUTED_FLOOR,
        ("ivf", "batch"): IVF_BATCH_FLOOR,
        ("ivf", "seed"): IVF_GRAPH_SEED_FLOOR,
        ("ivf", "graph"): IVF_GRAPH_FLOOR,
        ("ivf", "graph_stream"): IVF_GRAPH_FLOOR,
        ("ivf", "graph_stream_ivf"): IVF_GRAPH_IVF_FLOOR,
        ("pq", "adc"): PQ_ADC_FLOOR,
        ("pq", "rerank"): PQ_RERANK_FLOOR,
        ("pq", "batch"): PQ_BATCH_FLOOR,
        ("pq", "opq"): OPQ_RERANK_FLOOR,
        ("ivfpq", "rerank"): IVFPQ_RERANK_FLOOR,
        ("ivfpq", "batch"): IVFPQ_BATCH_FLOOR,
        ("sq8", "adc"): SQ_ADC_FLOOR,
        ("sq8", "rerank"): SQ_RERANK_FLOOR,
        ("sq8", "batch"): SQ_BATCH_FLOOR,
        ("ivfsq", "adc"): IVFSQ_FLOOR,
        ("ivfsq", "rerank"): IVFSQ_FLOOR,
        ("ivfsq", "batch"): IVFSQ_BATCH_FLOOR,
        ("maxsim", "two_stage"): MAXSIM_TWO_STAGE_FLOOR,
        ("maxsim", "two_stage_stream"): MAXSIM_STREAM_FLOOR,
    }

    # approximate sets: the engine-published hit pairs
    ft = _pq.read_table(ANN_RECALL_FACET, columns=["codec", "variant", "query_id", "vec_id"])
    approx_sets: dict[tuple[str, str], dict[int, set[int]]] = {}
    for codec_v, variant_v, qid_v, vid_v in zip(
        ft.column("codec").to_pylist(),
        ft.column("variant").to_pylist(),
        ft.column("query_id").to_pylist(),
        ft.column("vec_id").to_pylist(),
    ):
        approx_sets.setdefault((codec_v, variant_v), {}).setdefault(
            int(qid_v), set()
        ).add(int(vid_v))

    problems: list[str] = []
    if set(approx_sets) != set(floors):
        problems.append(
            f"facet group set mismatch: {sorted(approx_sets)} vs {sorted(floors)}"
        )
        return problems

    # exact reference sets, independent of the engine (numpy off the
    # raw parquet). The cosine set serves every codec family; the two
    # maxsim groups rank Σ-max over the deterministic token bags, so
    # their exact references are re-derived here the same way.
    exact = _exact_topk_numpy(data_sf)
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
    # maxsim/two_stage_stream: the same Σ-max ranking RESTRICTED to the
    # survivors of the deterministic mid-stream delete
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

    claimed_groups = {(r.codec, r.variant) for r in sdf.itertuples()}
    if claimed_groups != set(floors):
        problems.append(f"group set mismatch: {sorted(claimed_groups)} vs {sorted(floors)}")
        return problems
    for (codec_name, variant), floor in floors.items():
        approx = approx_sets[(codec_name, variant)]
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
