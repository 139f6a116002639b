"""Sparse-vector search (operators/sparse.py): sparsification contract,
inverted-index top-k vs a numpy reference, zero-overlap semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.sparse import sparse_topk, sparsify_topm


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _dense(emb):
    rows = emb.select("vec_id", "embedding").collect()
    return {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}


def _sparse_ref(dense, m=8):
    out = {}
    for vid, v in dense.items():
        order = sorted(range(len(v)), key=lambda d: (-abs(v[d]), d))[:m]
        out[vid] = {d: float(v[d]) for d in order}
    return out


def test_sparsify_keeps_topm_by_abs(emb):
    dense = _dense(emb)
    want = _sparse_ref(dense, m=8)
    got: dict[int, dict[int, float]] = {}
    for r in sparsify_topm(emb, m=8).collect():
        got.setdefault(r.vec_id, {})[r.dim] = r.val
    assert set(got) == set(want)
    for vid in want:
        assert got[vid].keys() == want[vid].keys(), vid
        for d in want[vid]:
            assert got[vid][d] == pytest.approx(want[vid][d], abs=1e-9)


def test_sparse_topk_matches_numpy_reference(emb):
    dense = _dense(emb)
    sp = _sparse_ref(dense, m=8)
    postings = sparsify_topm(emb, m=8)
    qids = [0, 1, 2]
    q_postings = postings.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "dim", "val"
    )
    got = {
        (r.query_id, r.rank): (r.vec_id, r.score)
        for r in sparse_topk(postings, q_postings, k=5).collect()
    }
    for qid in qids:
        scores = {}
        for cid, cdims in sp.items():
            s = sum(v * sp[qid].get(d, 0.0) for d, v in cdims.items())
            if any(d in sp[qid] for d in cdims):
                scores[cid] = s
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for rank, (cid, s) in enumerate(want, 1):
            gcid, gs = got[(qid, rank)]
            assert gcid == cid, (qid, rank, want)
            assert gs == pytest.approx(s, abs=1e-9)


def test_zero_overlap_candidates_absent(spark):
    """A posting list sharing no dimension with the query never appears
    — inverted-index semantics, not a zero-score row."""
    postings = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 2.0), (2, 5, 3.0)], "vec_id long, dim int, val double"
    )
    q = spark.createDataFrame([(0, 0, 1.0)], "query_id long, dim int, val double")
    rows = sparse_topk(postings, q, k=10).collect()
    assert {r.vec_id for r in rows} == {1}


def test_no_cartesian_in_plan(emb):
    postings = sparsify_topm(emb, m=4)
    q = postings.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "dim", "val"
    )
    plan = sparse_topk(postings, q, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_shuffle_routing_parity_and_no_broadcast(spark, emb):
    """query_routing='shuffle' (the corpus-scale batch route) must give
    identical results, and with the hint gone and auto-broadcast
    disabled the dim join must actually run as a shuffle join — the
    plan a corpus-sized query set requires."""
    from deployment_spark.operators.sparse import sparse_topk, sparsify_topm

    postings = sparsify_topm(emb, m=8)
    q = postings.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "dim", "val"
    )
    a = sorted(map(tuple, sparse_topk(postings, q, k=5).collect()))
    b_df = sparse_topk(postings, q, k=5, query_routing="shuffle")
    assert a == sorted(map(tuple, b_df.collect()))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = sparse_topk(
            postings, q, k=5, query_routing="shuffle"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        hinted = sparse_topk(
            postings, q, k=5
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hinted, hinted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    with pytest.raises(ValueError, match="query_routing"):
        sparse_topk(postings, q, k=5, query_routing="nope")
