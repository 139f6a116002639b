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


@PROP
@given(
    n_left=st.integers(1, 25),
    n_right=st.integers(0, 25),
    n_keys=st.integers(1, 4),
    direction=st.sampled_from(["backward", "forward"]),
    seed=st.integers(0, 2**16),
)
def test_asof_join_matches_merge_asof_random(
    spark, n_left, n_right, n_keys, direction, seed
):
    """asof_join == pandas merge_asof on random data with duplicate LEFT
    timestamps, empty right sides, and keys missing from either side.
    Right timestamps are kept unique per key (the documented contract)."""
    import datetime as dt

    import pandas as pd

    from deployment_spark.operators.asof import asof_join

    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)

    def t(m):
        return base + dt.timedelta(minutes=int(m))

    lrows = [
        (i, int(rng.integers(n_keys)), t(rng.integers(0, 50)))
        for i in range(n_left)
    ]
    seen = set()
    rrows = []
    for _ in range(n_right):
        k, m = int(rng.integers(n_keys)), int(rng.integers(0, 50))
        if (k, m) in seen:
            continue
        seen.add((k, m))
        rrows.append((k, t(m), float(rng.integers(100))))
    trades = spark.createDataFrame(lrows, "event_id LONG, user_id LONG, ts TIMESTAMP")
    quotes = spark.createDataFrame(
        rrows or [(0, t(999), 0.0)], "user_id LONG, ts TIMESTAMP, value DOUBLE"
    )
    if not rrows:
        quotes = quotes.filter("user_id < 0")  # truly empty, typed

    got = {
        r.event_id: r.value
        for r in asof_join(
            trades, quotes, by=["user_id"], right_cols=["value"],
            direction=direction,
        ).collect()
    }
    lt = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rt = pd.DataFrame(rrows, columns=["user_id", "ts", "value"]).sort_values("ts")
    if rt.empty:
        want = {e: None for e in lt.event_id}
    else:
        m = pd.merge_asof(
            lt, rt, on="ts", by="user_id", direction=direction,
            suffixes=("", "_right"),
        )
        want = {
            r.event_id: (None if pd.isna(r.value) else r.value)
            for r in m.itertuples()
        }
    assert got == want


def test_asof_join_null_payload_not_backfilled(spark):
    """A genuinely-NULL payload field in the nearest right row must stay
    NULL — not be backfilled from an OLDER right row (per-column carries
    would mix columns of different right rows; merge_asof/DuckDB ASOF
    take the whole nearest row, NULLs included)."""
    import datetime as dt

    from deployment_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)

    def t(m):
        return base + dt.timedelta(minutes=m)

    # older right row has both fields; nearest has bid NULL
    quotes = spark.createDataFrame(
        [(1, t(0), 10.0, 11.0), (1, t(5), None, 22.0)],
        "user_id LONG, ts TIMESTAMP, bid DOUBLE, ask DOUBLE",
    )
    trades = spark.createDataFrame(
        [(100, 1, t(6))], "event_id LONG, user_id LONG, ts TIMESTAMP"
    )
    row = asof_join(
        trades, quotes, by=["user_id"], right_cols=["bid", "ask"]
    ).collect()[0]
    assert row.ask == 22.0
    assert row.bid is None, "NULL bid was backfilled from an older right row"
    # tolerance excludes the nearest row: time AND payload null together
    row = asof_join(
        trades, quotes, by=["user_id"], right_cols=["bid", "ask"],
        tolerance_us=120_000_000,  # 2 min >= the 1-min gap: row kept
    ).collect()[0]
    assert row.ts_right is not None and row.ask == 22.0
    row = asof_join(
        trades.withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 MINUTES")),
        quotes, by=["user_id"], right_cols=["bid", "ask"],
        tolerance_us=60_000_000,
    ).collect()[0]
    assert row.ts_right is None and row.ask is None and row.bid is None


@PROP
@given(
    n_tokens=st.integers(0, 40),
    window=st.integers(1, 12),
    stride_delta=st.integers(0, 8),
    seed=st.integers(0, 2**16),
)
def test_chunk_text_matches_python_reference(spark, n_tokens, window, stride_delta, seed):
    """chunk_text == a python sliding-window reference for random doc
    lengths / window / stride combinations (stride <= window), including
    empty docs, single-chunk docs, and exact-boundary endings."""
    from deployment_spark.operators.textstats import chunk_text

    stride = max(1, window - stride_delta)
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    got = {
        (r.chunk_id, r.chunk)
        for r in chunk_text(df, window_tokens=window, stride=stride).collect()
    }
    want = set()
    if toks:
        pos, cid = 0, 0
        while pos < len(toks):
            chunk = toks[pos : pos + window]
            # drop trailing windows fully covered by the previous one
            if pos == 0 or len(chunk) > window - stride:
                want.add((cid, " ".join(chunk)))
            pos += stride
            cid += 1
    assert got == want


@PROP
@given(
    budget=st.integers(5, 50),
    sizes=st.lists(st.integers(1, 80), min_size=1, max_size=30),
)
def test_pack_greedy_oversized_and_random(spark, budget, sizes):
    """Random token sizes INCLUDING docs larger than the budget: greedy
    reference equivalence, and every pack except oversized singletons
    respects the budget."""
    from deployment_spark.operators.packing import pack_greedy

    rows = [(i, 0, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tokens"])
    got = {
        r.doc_id: r.pack_id for r in pack_greedy(df, budget=budget).collect()
    }
    pid, fill, want = 0, 0, {}
    for i, s in enumerate(sizes):
        if fill > 0 and fill + s > budget:
            pid, fill = pid + 1, 0
        fill += s
        want[i] = pid
    assert got == want


@PROP
@given(
    n_pts=st.integers(1, 40),
    n_iv=st.integers(0, 15),
    width=st.floats(0.5, 30.0),
    seed=st.integers(0, 2**16),
)
def test_range_join_matches_naive_random(spark, n_pts, n_iv, width, seed):
    """Binned range join == nested-loop BETWEEN join for random points,
    intervals (including empty / zero-length / overlapping), and bucket
    widths."""
    from deployment_spark.operators.rangejoin import range_join

    rng = np.random.default_rng(seed)
    pts = [(i, float(rng.uniform(0, 100))) for i in range(n_pts)]
    ivs = []
    for b in range(n_iv):
        lo = float(rng.uniform(0, 100))
        ivs.append((b, lo, lo + float(rng.uniform(0, 20))))
    pdf = spark.createDataFrame(pts, "pid LONG, v DOUBLE")
    idf = spark.createDataFrame(ivs or [(0, 1.0, 0.0)], "band_id LONG, lo DOUBLE, hi DOUBLE")
    if not ivs:
        idf = idf.filter("band_id < 0")
    got = {
        (r.pid, r.band_id)
        for r in range_join(pdf, idf, "v", "lo", "hi", width).collect()
    }
    want = {
        (p, b) for p, v in pts for b, lo, hi in ivs if lo <= v <= hi
    }
    assert got == want
