"""Property-based cross-checks (Hypothesis) of the custom distributed
operators against trivially-correct pure-Python references. These hunt
the bug classes example tests miss: partition-boundary effects, tie
handling, degenerate graphs, block-count edge cases.

Examples are kept small (Spark job latency dominates) but randomized —
Hypothesis shrinks any failure to a minimal counterexample.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deployment_spark.operators import dedup
from deployment_spark.operators.similarity import (
    cosine_neardup_pairs_exact,
    topk_similarity_join,
)

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def ref_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> min id of its component, only for
    nodes that appear in some edge (the operator's contract)."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], ["a_id", "b_id"]
    )
    got = {r.node: r.label for r in dedup.connected_components(pairs).collect()}
    assert got == ref_components(25, edges)


@PROP
@given(
    n=st.integers(2, 40),
    dim=st.integers(2, 6),
    thr=st.floats(-0.5, 0.95),
    blocks=st.integers(1, 7),
    seed=st.integers(0, 2**16),
)
def test_exact_blockpair_matches_numpy(spark, n, dim, thr, blocks, seed):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)], ["vec_id", "embedding"]
    )
    got = {
        (r.a_id, r.b_id): r.cosine
        for r in cosine_neardup_pairs_exact(df, thr, num_blocks=blocks).collect()
    }
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (mat / norms) @ (mat / norms).T
    want = {
        (i, j): sims[i, j] for i in range(n) for j in range(i + 1, n) if sims[i, j] >= thr
    }
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-9 for k in got)


@PROP
@given(
    n=st.integers(1, 30),
    nq=st.integers(1, 4),
    k=st.integers(1, 8),
    dim=st.integers(2, 5),
    parts=st.integers(1, 6),
    seed=st.integers(0, 2**16),
)
def test_topk_matches_numpy_reference(spark, n, nq, k, dim, parts, seed):
    """Distributed pre-reduce top-k == numpy argsort with the documented
    (sim desc, id asc) tie-break, across random partitionings and
    k > corpus (k-capping)."""
    rng = np.random.default_rng(seed)
    cmat = rng.standard_normal((n, dim))
    qmat = rng.standard_normal((nq, dim))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in cmat[i]]) for i in range(n)], ["vec_id", "embedding"]
    ).repartition(parts)
    queries = spark.createDataFrame(
        [(i, [float(x) for x in qmat[i]]) for i in range(nq)],
        ["query_id", "query_vec"],
    )
    got = [
        (r.query_id, r.rank, r.vec_id)
        for r in topk_similarity_join(corpus, queries, k=k)
        .orderBy("query_id", "rank")
        .collect()
    ]
    cn = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-300)
    sims = cn @ qn.T
    want = []
    for q in range(nq):
        order = sorted(range(n), key=lambda i: (-round(sims[i, q], 12), i))[:k]
        want.extend((q, r + 1, i) for r, i in enumerate(order))
    assert got == want
