"""kNN-graph + semantic-dedup tests (operators/knn.py).

Exactness: the block-pair build must equal a plain brute-force
window plan for ANY block count (the pre-reduction can never drop a row
the global window would keep). Approximation: the clustered build's
recall vs the exact graph is floor-gated. Dedup: planted transitive
chains must collapse to one survivor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from deployment_spark.functions.vector import cosine_similarity
from deployment_spark.operators.knn import (
    knn_graph,
    knn_graph_clustered,
    semantic_dedup,
)


def brute_knn(df, k):
    a = df.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("_av"))
    b = df.select(F.col("vec_id").alias("dst_id"), F.col("embedding").alias("_bv"))
    w = Window.partitionBy("src_id").orderBy(F.desc("cosine"), F.asc("dst_id"))
    return (
        a.join(b, F.col("src_id") != F.col("dst_id"))
        .withColumn("cosine", cosine_similarity("_av", "_bv"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", "dst_id", "rank")
    )


def as_set(df):
    return {(r.src_id, r.dst_id, r.rank) for r in df.collect()}


@pytest.fixture(scope="module")
def emb50(embeddings):
    return embeddings.filter(F.col("vec_id") < 50).select("vec_id", "embedding").cache()


def test_knn_graph_matches_bruteforce(emb50):
    got = as_set(knn_graph(emb50, k=4, num_blocks=3))
    want = as_set(brute_knn(emb50, 4))
    assert got == want


def test_knn_graph_block_count_invariant(emb50):
    one = as_set(knn_graph(emb50, k=3, num_blocks=1))
    many = as_set(knn_graph(emb50, k=3, num_blocks=7))
    assert one == many


def test_knn_graph_excludes_self_and_caps_rank(emb50):
    g = knn_graph(emb50, k=5, num_blocks=2)
    assert g.filter(F.col("src_id") == F.col("dst_id")).count() == 0
    per_src = g.groupBy("src_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    bad = per_src.filter((F.col("n") != 5) | (F.col("mx") != 5)).count()
    assert bad == 0  # 50 vectors, k=5 < n-1 ⇒ every src has exactly k edges
    assert g.count() == 50 * 5


def test_knn_graph_clustered_recall_floor(embeddings):
    emb = embeddings.select("vec_id", "embedding")
    exact = as_set(knn_graph(emb, k=5, num_blocks=2))
    approx = {
        (r.src_id, r.dst_id)
        for r in knn_graph_clustered(emb, k=5, nlist=8, nprobe=4, seed=7).collect()
    }
    exact_pairs = {(s, d) for s, d, _ in exact}
    recall = len(exact_pairs & approx) / len(exact_pairs)
    # nprobe half of nlist on 50-100 vectors: well above the floor;
    # pinned so a routing regression (wrong centroid order, member/query
    # tagging swap) fails loudly rather than degrading silently
    assert recall >= 0.75, recall


def test_knn_graph_clustered_full_probe_is_exact(emb50):
    exact = as_set(knn_graph(emb50, k=3, num_blocks=2))
    full = as_set(knn_graph_clustered(emb50, k=3, nlist=5, nprobe=5, seed=7))
    assert full == exact  # nprobe = nlist ⇒ every cluster searched


def test_semantic_dedup_transitive_chain(spark):
    # chain: 0-1 and 1-2 above threshold, 0-2 below; plus 10 a singleton
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9962, 0.0872, 0.0]),  # ~5° from 0
        (2, [0.9848, 0.1736, 0.0]),  # ~10° from 0, ~5° from 1
        (10, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # threshold between cos(5°)=0.9962 and cos(10°)=0.9848 — exact path
    # (below the 0.87 LSH banding floor the auto method would need)
    res = {
        (r.vec_id, r.component, r.kept)
        for r in semantic_dedup(df, threshold=0.99, method="exact").collect()
    }
    assert res == {(0, 0, True), (1, 0, False), (2, 0, False), (10, 10, True)}


def test_semantic_dedup_no_pairs_keeps_all(emb50):
    res = semantic_dedup(emb50, threshold=0.999, method="exact")
    assert res.filter(~F.col("kept")).count() == 0
    assert res.count() == 50


def test_knn_graph_auto_routes_by_corpus_size(spark, monkeypatch):
    """method='auto' must pick the exact block-pair graph only below
    exact_max_rows and the O(N^1.5) clustered build above it — the
    O(N²) path cannot be invoked on a large corpus by accident."""
    from deployment_spark.operators import knn as knn_mod

    df = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(4)]).alias("embedding"),
    )
    calls = []
    monkeypatch.setattr(
        knn_mod, "knn_graph", lambda *a, **kw: calls.append("exact")
    )
    monkeypatch.setattr(
        knn_mod, "knn_graph_clustered", lambda *a, **kw: calls.append("clustered")
    )
    knn_mod.knn_graph_auto(df, k=3)  # 100 rows <= default threshold
    knn_mod.knn_graph_auto(df, k=3, exact_max_rows=10)  # forced over
    knn_mod.knn_graph_auto(df, k=3, method="exact", exact_max_rows=10)
    knn_mod.knn_graph_auto(df, k=3, method="clustered")
    assert calls == ["exact", "clustered", "exact", "clustered"]
    try:
        knn_mod.knn_graph_auto(df, method="bogus")
        raise AssertionError("accepted bogus method")
    except ValueError:
        pass


def test_knn_graph_auto_clustered_result_shape(spark, sf_dir):
    """Above the threshold the auto path returns the clustered graph —
    same schema and per-src rank contract as the exact one."""
    from deployment_spark.operators.knn import knn_graph_auto

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    g = knn_graph_auto(emb, k=3, exact_max_rows=50, nprobe=16)
    rows = g.collect()
    assert set(g.columns) == {"src_id", "dst_id", "rank", "cosine"}
    per_src = {}
    for r in rows:
        per_src.setdefault(r.src_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_src.values())


def test_graph_assisted_topk_lifts_starved_seed(spark, embeddings):
    """r10 (VERDICT r9 #8 — V8 closure): graph-assisted re-ranking.
    Structural guarantees pinned here: (1) recall vs exact is
    MONOTONICALLY ≥ the seeds' (the scored candidate set is a superset
    of the seeds and scoring is exact); (2) on this fixture the lift is
    real (strictly higher recall from a deliberately starved nprobe-2
    seed); (3) output keeps the (sim desc, id asc) rank contract; (4) a
    second hop can only grow recall further."""
    from deployment_spark.operators.knn import graph_assisted_topk
    from deployment_spark.operators.similarity import topk_similarity_join_expr
    from deployment_spark.queries import _ivf_index

    k = 10
    idx, emb = _ivf_index(spark, "/root/testdata/sf0.001")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {}
    for r in topk_similarity_join_expr(emb, q, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(df):
        got = {}
        for r in df.select("query_id", "vec_id").collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(
            len(exact[qid] & got.get(qid, set())) / k for qid in exact
        ) / len(exact)

    seeds = idx.search(q, k=k, nprobe=2).select("query_id", "vec_id")
    graph = knn_graph(emb, k=10)
    hop1 = graph_assisted_topk(emb, q, seeds, graph, k=k, hops=1)
    hop2 = graph_assisted_topk(emb, q, seeds, graph, k=k, hops=2)
    r_seed, r1, r2 = recall(seeds), recall(hop1), recall(hop2)
    assert r1 > r_seed, (r_seed, r1)   # the lift is real on this fixture
    assert r2 >= r1, (r1, r2)          # more hops never lose candidates
    assert r1 >= 0.9                   # the published panel floor
    rows = hop1.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.similarity))
    for qid, rs in per_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        sims = [x[2] for x in rs]
        assert sims == sorted(sims, reverse=True)


def test_expand_frontier_dedups_per_hop(spark):
    """VERDICT r10 #2: the hop loop must dedup the frontier INSIDE the
    loop — on a dense graph duplicate (query, candidate) rows otherwise
    multiply by graph_k every hop (exponential amplification at
    hops≥2). Pins (1) a distinct() per hop plus the final one, via a
    call spy; (2) every hop's join input bounded at nq × |reachable
    set| on a complete-graph fixture where the unbounded form would
    read nq·seed_k·(N-1)^hop rows; (3) the candidate set is exactly the
    reachable set."""
    from unittest import mock

    from deployment_spark.operators import knn as knn_mod

    N, nq, hops = 8, 2, 3
    # complete graph on N nodes (graph_k = N-1): densest possible case
    edges = spark.createDataFrame(
        [(i, j) for i in range(N) for j in range(N) if i != j],
        "src_id long, dst_id long",
    ).select(F.col("src_id").alias("_eid"), F.col("dst_id").alias("_dst"))
    # seeds with duplicates (the search_batch union shape): 4 rows per
    # query over only 2 distinct candidates
    cand = spark.createDataFrame(
        [(q, c) for q in range(nq) for c in (0, 1, 0, 1)],
        "_qid long, _cid long",
    )
    # patch the CONCRETE frame class (pyspark 4 routes pyspark.sql.
    # DataFrame through a dispatcher; type(cand) is the classic impl)
    calls = []
    orig = type(cand).distinct

    def spy(self):
        calls.append(self)
        return orig(self)

    with mock.patch.object(type(cand), "distinct", spy):
        out = knn_mod._expand_frontier(cand, edges, hops)
        # per-hop distinct + the final union dedup
        assert len(calls) == hops + 1
        # every deduped hop frontier (the NEXT join's input) is bounded
        # by nq × |reachable set| — the unbounded loop would feed
        # nq·4·7, nq·4·7², nq·4·7³ rows instead
        for hop_frontier in calls[:hops]:
            assert orig(hop_frontier).count() <= nq * N
    rows = out.collect()
    assert len(rows) == nq * N  # seeds ∪ everything reachable, deduped
    got = {}
    for r in rows:
        got.setdefault(r._qid, set()).add(r._cid)
    assert all(v == set(range(N)) for v in got.values())


def test_graph_assisted_batch_join_parity(spark, embeddings):
    """broadcast_queries=False (the corpus-scale-seed contract: shuffle
    join, no task holds the query matrix) must return the identical
    ranking — the knob picks a join strategy, never an answer."""
    from deployment_spark.operators.knn import graph_assisted_topk
    from deployment_spark.queries import _ivf_index

    idx, emb = _ivf_index(spark, "/root/testdata/sf0.001")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    seeds = idx.search_batch(q, k=5, nprobe=2).select("query_id", "vec_id")
    graph = knn_graph(emb, k=8)
    a = {
        (r.query_id, r.rank): r.vec_id
        for r in graph_assisted_topk(emb, q, seeds, graph, k=5).collect()
    }
    b = {
        (r.query_id, r.rank): r.vec_id
        for r in graph_assisted_topk(
            emb, q, seeds, graph, k=5, broadcast_queries=False
        ).collect()
    }
    assert a == b


def test_knn_graph_update_is_exact_over_batches(spark, embeddings):
    """r11 (VERDICT r10 #1): the incremental update's exactness
    contract — applying knn_graph_update per batch and overlaying the
    replacement sets must reproduce knn_graph(full corpus) EXACTLY
    after every batch (per-src dst sets AND ranks), and each update's
    replacement rows must stay bounded: new-row edges plus only the
    existing sources that actually keep a batch edge, never an
    O(corpus) rewrite when the batch touches few neighborhoods."""
    from deployment_spark.operators.knn import knn_graph_update

    k = 5
    base = embeddings.filter(F.col("vec_id") < 60)
    batches = [
        embeddings.filter(F.col("vec_id").between(60, 79)),
        embeddings.filter(F.col("vec_id").between(80, 99)),
        embeddings.filter(F.col("vec_id").between(100, 119)),
    ]

    def as_map(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.src_id, {})[r.rank] = r.dst_id
        return out

    edges = knn_graph(base, k=k)
    corpus = base
    for b in batches:
        repl = knn_graph_update(edges, corpus, b, k=k).localCheckpoint()
        repl_map = as_map(repl)
        # overlay: replaced sources take their new sets wholesale
        old_map = as_map(edges)
        old_map.update(repl_map)
        corpus = corpus.unionByName(b)
        want = as_map(knn_graph(corpus, k=k))
        assert old_map == want
        # rebuild the edges frame from the overlay for the next round
        rows = [
            (src, dst, rank, 0.0)
            for src, ranks in old_map.items()
            for rank, dst in ranks.items()
        ]
        # carry REAL cosines forward (the merge re-ranks on them):
        # keep unreplaced rows from the old frame, add replacements
        edges = edges.join(
            repl.select("src_id").distinct(), "src_id", "left_anti"
        ).unionByName(repl)
        assert as_map(edges) == want
    # boundedness on the last batch: every replaced existing source
    # keeps at least one batch edge (the touched-set definition)
    batch_ids = {r.vec_id for r in batches[-1].select("vec_id").collect()}
    for src, ranks in repl_map.items():
        if src in batch_ids:
            continue
        assert any(dst in batch_ids for dst in ranks.values()), src
