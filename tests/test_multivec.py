"""Multi-vector late-interaction retrieval (operators/multivec.py —
ColBERT maxsim): numpy reference equivalence, two-stage rerank
exactness, pooled first-stage correctness, and the partial-aggregate
plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.multivec import (
    maxsim_rerank,
    maxsim_scores,
    maxsim_topk,
    pool_vectors,
)


@pytest.fixture(scope="module")
def bags(spark):
    """20 entities × 3 token vectors, 4 queries × 2 token vectors,
    d=8 — small enough for an exact numpy reference."""
    rng = np.random.default_rng(11)
    docs = {i: rng.normal(size=(3, 8)) for i in range(20)}
    qs = {i: rng.normal(size=(2, 8)) for i in range(4)}
    doc_df = spark.createDataFrame(
        [(i, v.tolist()) for i, toks in docs.items() for v in toks],
        "vec_id long, embedding array<double>",
    )
    q_df = spark.createDataFrame(
        [(i, j, v.tolist()) for i, toks in qs.items() for j, v in enumerate(toks)],
        "query_id long, q_pos long, query_vec array<double>",
    )
    want = {
        (qi, di): sum(max(float(t @ u) for u in dt) for t in qt)
        for qi, qt in qs.items()
        for di, dt in docs.items()
    }
    return doc_df, q_df, want


def test_maxsim_matches_numpy_reference(spark, bags):
    doc_df, q_df, want = bags
    got = {
        (r.query_id, r.vec_id): r.maxsim
        for r in maxsim_scores(doc_df, q_df, query_pos="q_pos").collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) < 1e-9, key


def test_maxsim_topk_ranks_and_caps(spark, bags):
    doc_df, q_df, want = bags
    rows = maxsim_topk(doc_df, q_df, k=5, query_pos="q_pos").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qi, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        best = max(want[(qi, d)] for d in range(20))
        top = [r for r in rs if r.rank == 1][0]
        assert abs(top.maxsim - best) < 1e-9


def test_maxsim_rerank_exact_when_candidates_cover(spark, bags):
    """Candidates ⊇ true top-k ⇒ rerank ≡ exact (here: ALL pairs as
    candidates). With a candidate set MISSING the true best doc, the
    rerank must return the best among candidates — never invent."""
    doc_df, q_df, want = bags
    all_cand = spark.createDataFrame(
        [(q, d) for q in range(4) for d in range(20)], "query_id long, vec_id long"
    )
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in maxsim_topk(doc_df, q_df, k=3, query_pos="q_pos").collect()
    }
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in maxsim_rerank(doc_df, q_df, all_cand, k=3, query_pos="q_pos").collect()
    }
    assert got == exact
    best0 = exact[(0, 1)]
    holed = all_cand.filter(
        ~((F.col("query_id") == 0) & (F.col("vec_id") == best0))
    )
    got2 = {
        (r.query_id, r.rank): r.vec_id
        for r in maxsim_rerank(doc_df, q_df, holed, k=3, query_pos="q_pos").collect()
    }
    assert got2[(0, 1)] == exact[(0, 2)]  # runner-up promoted
    assert best0 not in {v for (q, _), v in got2.items() if q == 0}


def test_pool_vectors_is_tokenwise_mean(spark, bags):
    doc_df, _, _ = bags
    pooled = {r.vec_id: np.array(r.embedding) for r in pool_vectors(doc_df).collect()}
    raw = {}
    for r in doc_df.collect():
        raw.setdefault(r.vec_id, []).append(np.array(r.embedding))
    for i, toks in raw.items():
        assert np.allclose(pooled[i], np.mean(toks, axis=0))


def test_maxsim_aggregates_are_partial(spark, bags):
    """The scale contract: both the MAX and SUM aggregates must show
    partial_merge / partial aggregation (map-side combine), so the
    exchange carries per-(query, entity[, q_pos]) rows — never raw
    token pairs."""
    doc_df, q_df, _ = bags
    plan = (
        maxsim_scores(doc_df, q_df, query_pos="q_pos")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 4  # 2 aggs × (partial + final)
    assert "partial_max" in plan
    assert "partial_sum" in plan
