"""BM25 retrieval + RRF fusion (operators/retrieval.py): formula
cross-check against plain Python, idf ordering, rank determinism, plan
shape, and fusion arithmetic."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.retrieval import bm25_scores, bm25_topk, rrf_fuse, weighted_fuse


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "apple banana apple cherry"),
        (1, "banana banana banana banana"),
        (2, "apple cherry durian durian durian"),
        (3, "elderberry"),
        (4, "apple apple apple apple apple apple"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_py(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    out = {}
    for i, ts in toks.items():
        s = 0.0
        matched = 0
        for t in terms:
            tf = ts.count(t)
            if tf == 0:
                continue
            matched += 1
            df = sum(1 for ts2 in toks.values() if t in ts2)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[i] / avgdl))
        if matched:
            out[i] = (s, matched)
    return out


def test_bm25_matches_reference_formula(spark, tiny_docs):
    rows = [(r.doc_id, r.text) for r in tiny_docs.collect()]
    terms = ["apple", "durian"]
    want = _bm25_py(rows, terms)
    got = {
        r.doc_id: (r.bm25, r.matched_terms)
        for r in bm25_scores(tiny_docs, terms).collect()
    }
    assert set(got) == set(want)
    for i, (s, m) in want.items():
        assert got[i][1] == m
        assert abs(got[i][0] - s) < 1e-9, (i, got[i][0], s)


def test_rare_term_outscores_common(spark, tiny_docs):
    """One occurrence of a corpus-rare term must outrank one occurrence
    of a corpus-common term at comparable dl — the idf property."""
    scored = {r.doc_id: r.bm25 for r in bm25_scores(tiny_docs, ["elderberry", "banana"]).collect()}
    assert scored[3] > scored[1]  # rare single hit > common quadruple hit
    assert scored[3] > scored[0]


def test_topk_rank_and_determinism(spark, tiny_docs):
    a = bm25_topk(tiny_docs, ["apple", "banana"], k=3).collect()
    b = bm25_topk(tiny_docs, ["apple", "banana"], k=3).collect()
    assert [(r.doc_id, r.rank) for r in a] == [(r.doc_id, r.rank) for r in b]
    assert [r.rank for r in a] == [1, 2, 3]
    sims = [r.bm25 for r in a]
    assert sims == sorted(sims, reverse=True)


def test_topk_uses_take_ordered(spark, tiny_docs):
    """orderBy+limit must compile to TakeOrderedAndProject — per-partition
    heaps, not a global sort — the scale contract in the docstring."""
    plan = (
        bm25_topk(tiny_docs, ["apple"], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_empty_terms_raise(spark, tiny_docs):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(tiny_docs, [])
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


def test_rrf_hand_computed(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2), (4, 3)], "doc_id long, rank int")
    got = {r.doc_id: (r.n_lists, r.rrf_score) for r in rrf_fuse([a, b]).collect()}
    assert got[2] == (2, 1 / 62 + 1 / 61)
    assert got[1] == (1, 1 / 61)
    assert got[4] == (1, 1 / 63)
    # present-in-both at middling ranks beats single-list rank 1
    assert got[2][1] > got[1][1]


def test_weighted_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 1, 10.0), (2, 2, 5.0), (3, 3, 0.0)], "doc_id long, rank int, score double"
    )
    b = spark.createDataFrame(
        [(2, 1, 0.9), (4, 2, 0.9)], "doc_id long, rank int, score double"
    )
    got = {
        r.doc_id: (r.n_lists, r.fused_score)
        for r in weighted_fuse([(a, 0.7), (b, 0.3)]).collect()
    }
    # a-list min-max: 10->1.0, 5->0.5, 0->0.0; b-list degenerate -> 1.0 each
    assert got[1] == (1, pytest.approx(0.7))
    assert got[2] == (2, pytest.approx(0.7 * 0.5 + 0.3))
    assert got[3] == (1, pytest.approx(0.0))
    assert got[4] == (1, pytest.approx(0.3))


def test_entry_functions_run(spark, sf_dir):
    from deployment_spark.queries import q_doc_bm25_topk, q_hybrid_search

    sf = sf_dir
    bm = q_doc_bm25_topk(spark, sf).collect()
    assert len(bm) == 20 and [r.rank for r in bm] == list(range(1, 21))
    hy = q_hybrid_search(spark, sf).collect()
    assert len(hy) == 40
    by_probe = {}
    for r in hy:
        by_probe.setdefault(r.probe, []).append(r)
    assert set(by_probe) == {"rrf", "weighted"}
    for probe, rows in by_probe.items():
        assert sorted(r.rank for r in rows) == list(range(1, 21)), probe
        assert all(r.n_lists in (1, 2) for r in rows)
        # fused list must actually draw from both modalities
        assert any(r.n_lists == 2 for r in rows), probe
