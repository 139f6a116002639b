"""Top-k similarity join (J1) — numpy brute force is the golden oracle
(SURVEY §5.2(2))."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.similarity import (
    cosine_neardup_pairs,
    enrich_topk,
    topk_similarity_join,
    topk_similarity_join_expr,
)


@pytest.fixture(scope="module")
def corpus_np(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def numpy_topk(ids, mat, qids, qmat, k):
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sims = matn @ qn.T
    golden = {}
    for j, qid in enumerate(qids):
        # sort by (-sim, id) to mirror the engine's deterministic tie-break
        order = np.lexsort((ids, -sims[:, j]))[:k]
        golden[qid] = [(int(ids[i]), float(sims[i, j])) for i in order]
    return golden


@pytest.fixture(scope="module")
def queries_df(embeddings):
    return embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@pytest.mark.parametrize("impl", [topk_similarity_join, topk_similarity_join_expr])
def test_topk_matches_numpy(embeddings, queries_df, corpus_np, impl):
    k = 5
    ids, mat = corpus_np
    qrows = queries_df.collect()
    qids = [r.query_id for r in qrows]
    qmat = np.array([r.query_vec for r in qrows], dtype=np.float64)
    golden = numpy_topk(ids, mat, qids, qmat, k)

    got = impl(embeddings, queries_df, k=k).collect()
    assert len(got) == len(qids) * k
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.similarity))
    for qid in qids:
        rows = sorted(by_q[qid])
        assert [v for _, v, _ in rows] == [v for v, _ in golden[qid]]
        for (_, _, sim), (_, gsim) in zip(rows, golden[qid]):
            assert abs(sim - gsim) < 1e-9


def test_query_from_corpus_is_own_nearest(embeddings, queries_df):
    """Queries drawn from the corpus must hit themselves at rank 1
    (reference behavior: queries are the first rows of the data,
    Milvus/stream1.py:26,398)."""
    got = topk_similarity_join(embeddings, queries_df, k=1).collect()
    for r in got:
        assert r.vec_id == r.query_id
        assert abs(r.similarity - 1.0) < 1e-9


def test_k_capping(embeddings, queries_df):
    """V7 — k > corpus size never over-returns (pipeline+ui.py:230)."""
    small = embeddings.filter(F.col("vec_id") < 4)
    got = topk_similarity_join(small, queries_df, k=100).collect()
    per_q = {}
    for r in got:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert all(v == 4 for v in per_q.values())


def test_enrich_topk(embeddings, queries_df):
    res = topk_similarity_join(embeddings, queries_df, k=3)
    enriched = enrich_topk(res, embeddings, payload_cols=["label"])
    rows = enriched.collect()
    assert len(rows) == 9
    assert "label" in enriched.columns


def test_topk_tie_break_deterministic_across_partitions(spark):
    """Exact-similarity ties straddling the local k-boundary (common in
    dedup-style corpora with duplicate vectors) must resolve by the
    documented (sim desc, id asc) order — the local pre-reduce has to be
    tie-aware, or a lower-id tied candidate gets dropped before the
    global window sees it (round-1 advice)."""
    # 40 identical vectors spread over 8 partitions, ids shuffled so low
    # ids land in different partitions; all sims tie at 1.0.
    import random

    rng = random.Random(7)
    ids = list(range(40))
    rng.shuffle(ids)
    corpus = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0]) for i in ids], ["vec_id", "embedding"]
    ).repartition(8)
    queries = spark.createDataFrame([(0, [1.0, 0.0, 0.0])], ["query_id", "query_vec"])
    for _ in range(3):  # repeated runs: determinism, not luck
        got = topk_similarity_join(corpus, queries, k=5).orderBy("rank").collect()
        assert [r.vec_id for r in got] == [0, 1, 2, 3, 4]
        assert all(abs(r.similarity - 1.0) < 1e-12 for r in got)


def test_cosine_neardup_pairs(embeddings):
    sub = embeddings.filter(F.col("vec_id") < 50)
    pairs = cosine_neardup_pairs(sub, threshold=-1.0).collect()
    assert len(pairs) == 50 * 49 // 2
    for r in pairs:
        assert r.a_id < r.b_id
