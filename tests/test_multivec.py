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


def test_token_candidates_beat_pooled_on_multitopic_bags(spark):
    """The first-stage representation gap that motivates
    ``token_candidates``: docs whose tokens cover SEVERAL topics defeat
    a mean-pooled single-vector stage (the mean points between topics)
    while the token-level stage keeps maxsim's signal. Both stages use
    EXACT single-vector search here, so the pinned gap is purely the
    representation, not index approximation."""
    from deployment_spark.operators.multivec import token_candidates
    from deployment_spark.operators.similarity import topk_similarity_join_expr

    rng = np.random.default_rng(5)
    nq, tq, td, n, d, k = 8, 3, 4, 1500, 32, 10
    qv = rng.normal(size=(nq, tq, d))
    qv /= np.linalg.norm(qv, axis=-1, keepdims=True)
    centers = qv.reshape(-1, d)
    asgn = rng.integers(0, len(centers), size=(n, td))
    dv = centers[asgn] + 0.3 * rng.normal(size=(n, td, d))
    dv /= np.linalg.norm(dv, axis=-1, keepdims=True)
    doc_df = spark.createDataFrame(
        [(i, dv[i, j].tolist()) for i in range(n) for j in range(td)],
        "vec_id long, embedding array<double>",
    )
    q_df = spark.createDataFrame(
        [(i, j, qv[i, j].tolist()) for i in range(nq) for j in range(tq)],
        "query_id long, q_pos long, query_vec array<double>",
    )
    exact = {}
    for r in maxsim_topk(doc_df, q_df, k=k, query_pos="q_pos").collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(cand):
        got = {}
        rows = maxsim_rerank(doc_df, q_df, cand, k=k, query_pos="q_pos").collect()
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(len(exact[q] & got.get(q, set())) / k for q in exact) / nq

    # pooled stage: exact cosine over mean-pooled docs/queries
    pooled_docs = pool_vectors(doc_df)
    pooled_q = pool_vectors(
        q_df.select(F.col("query_id").alias("vec_id"), F.col("query_vec").alias("embedding"))
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    pooled_cand = topk_similarity_join_expr(pooled_docs, pooled_q, k=50).select(
        "query_id", "vec_id"
    )
    # token stage: exact cosine over token vectors, docs of hit tokens
    from pyspark.sql import Window as W

    tok_tbl = doc_df.withColumn(
        "tok_id",
        F.row_number().over(
            W.orderBy("vec_id", F.md5(F.col("embedding").cast("string")))
        ).cast("long"),
    )
    tok_corpus = tok_tbl.select(F.col("tok_id").alias("vec_id"), "embedding")
    tok_cand = token_candidates(
        lambda qd, kk: topk_similarity_join_expr(tok_corpus, qd, k=kk).select(
            "query_id", F.col("vec_id").alias("tok_id")
        ),
        q_df,
        tok_tbl.select("tok_id", "vec_id"),
        k_per_token=100,
        query_pos="q_pos",
    )
    r_pooled, r_token = recall(pooled_cand), recall(tok_cand)
    assert r_token >= r_pooled + 0.2, (r_pooled, r_token)
    assert r_token >= 0.85, r_token


def test_maxsim_fuses_with_bm25_via_rrf(spark, bags):
    """API interop across the r11 retrieval surfaces: a maxsim ranking
    and a BM25 ranking fuse through the existing rrf_fuse unchanged
    (both emit the (id, rank) contract), and a doc ranked by both
    modalities outranks single-modality docs at comparable ranks."""
    from deployment_spark.operators.retrieval import bm25_topk, rrf_fuse

    doc_df, q_df, _ = bags
    mv = maxsim_topk(doc_df, q_df.filter("query_id = 0"), k=5, query_pos="q_pos")
    mv_ranked = mv.select(F.col("vec_id").alias("doc_id"), "rank")
    top_mv = mv_ranked.orderBy("rank").first().doc_id
    texts = spark.createDataFrame(
        [
            (i, "shared common " + ("hit term " if i == top_mv else "miss "))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    bm_ranked = bm25_topk(texts, ["hit", "term"], k=5).select("doc_id", "rank")
    fused = {r.doc_id: (r.n_lists, r.rrf_score) for r in rrf_fuse([mv_ranked, bm_ranked]).collect()}
    assert fused[top_mv][0] == 2  # present in both lists
    best = max(fused.values(), key=lambda t: t[1])
    assert fused[top_mv] == best  # both-modality doc wins the fusion


def test_reference_k_per_token_shape():
    """√-scaling with a floor: the derived candidate width tracks the
    token-index cell population (nlist ≈ √n_tokens ⇒ cell ≈ √n_tokens),
    which is what keeps candidate recall flat where a fixed width
    decays (maxsim_probe --auto vs the r11 fixed point)."""
    from deployment_spark.operators.multivec import reference_k_per_token

    assert reference_k_per_token(0) == 32
    assert reference_k_per_token(100) == 32  # floor
    assert reference_k_per_token(10_000) == 200  # 2·√1e4
    assert reference_k_per_token(1_000_000) == 2000
    prev = 0
    for n in (10, 10**3, 10**5, 10**7):
        v = reference_k_per_token(n)
        assert v >= prev
        prev = v


def test_token_candidates_positions_survive_partitioning(spark):
    """r11 ADVICE: the synthesized token slots must stay distinct per
    query REGARDLESS of physical partitioning (the mono-id % 1e6
    synthesis collided across partition boundaries, silently merging
    two tokens' searches). With per-query row_number slots, an
    exhaustive search_fn over a many-partition query bag returns every
    doc any token matches."""
    import pyspark.sql.functions as F

    from deployment_spark.operators.multivec import token_candidates

    # 6 queries × 4 tokens, deliberately scattered over many partitions
    qv = spark.createDataFrame(
        [(q, [float(q * 4 + j), 1.0]) for q in range(6) for j in range(4)],
        "query_id long, query_vec array<double>",
    ).repartition(16)
    # token universe: tok_id t owns doc t; search_fn returns the single
    # exact-matching token per query token (nearest by first component)
    tok_doc = spark.createDataFrame(
        [(t, t) for t in range(24)], "tok_id long, vec_id long"
    )

    def search_fn(qd, k):
        # nearest token = round(first component) — one hit per token row
        return qd.select(
            "query_id",
            F.round(F.element_at("query_vec", 1)).cast("long").alias("tok_id"),
        )

    got = {
        (r.query_id, r.vec_id)
        for r in token_candidates(
            search_fn, qv, tok_doc, k_per_token=1
        ).collect()
    }
    want = {(q, q * 4 + j) for q in range(6) for j in range(4)}
    assert got == want  # every token's candidate survives — no slot merge


def test_token_candidates_rejects_non_integral_query_ids(spark):
    import pytest

    from deployment_spark.operators.multivec import token_candidates

    qv = spark.createDataFrame(
        [(0.5, [1.0])], "query_id double, query_vec array<double>"
    )
    tok_doc = spark.createDataFrame([(0, 0)], "tok_id long, vec_id long")
    with pytest.raises(TypeError, match="integral"):
        token_candidates(lambda qd, k: qd.select("query_id"), qv, tok_doc, 1)

def test_token_candidates_recovery_is_exact_for_huge_query_ids(spark):
    """r12 ADVICE: the composite-id recovery must be EXACT long
    arithmetic — floor(col / 1e6) routes through double, whose 2^53
    integer precision silently shifts recovered ids once |query_id|
    exceeds ~9.0e9 (composite ≈ 9.0e15). Query ids near the long-range
    ceiling (composite ~4.6e18) must round-trip bit-exactly."""
    from deployment_spark.operators.multivec import token_candidates

    qids = [4_600_000_000_000, 4_600_000_000_001, -4_600_000_000_000]
    qv = spark.createDataFrame(
        [(q, [float(j), 1.0]) for q in qids for j in range(2)],
        "query_id long, query_vec array<double>",
    )
    tok_doc = spark.createDataFrame(
        [(t, 100 + t) for t in range(2)], "tok_id long, vec_id long"
    )

    def search_fn(qd, k):
        # one hit per token row: tok_id = round(first vec component)
        return qd.select(
            "query_id",
            F.round(F.element_at("query_vec", 1)).cast("long").alias("tok_id"),
        )

    got = {
        (r.query_id, r.vec_id)
        for r in token_candidates(search_fn, qv, tok_doc, k_per_token=1).collect()
    }
    want = {(q, 100 + j) for q in qids for j in range(2)}
    assert got == want
