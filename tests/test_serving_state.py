"""r12 — derived serving state under the full CRUD surface (VERDICT r11
#1/#4 + ADVICE): the SnapshotStore mutation clock, BM25Index exact
deletes/upserts (tombstones with embedded stats corrections), the
maintainers' staleness detection (error / rebuild / exact deletes-only
repair), the standing-state k/query-fingerprint contract pin, and the
scale-derived BM25 bucketing + rebucket path."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.crud import SnapshotStore, StaleServingStateError
from deployment_spark.operators.retrieval import (
    BM25Index,
    bm25_scores,
    reference_n_buckets,
)


# ---------------------------------------------------------------------------
# SnapshotStore mutation clock
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_mutation_clock_counts_destructive_ops(spark, tmp_path, mode):
    rows = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, payload string"
    )
    st = SnapshotStore(spark, str(tmp_path / f"clk_{mode}"), key="id", mode=mode)
    st.create(rows)
    assert st.mutation_clock() == {
        "seq": 0, "deletes": 0, "updates": 0, "upserts": 0, "replaces": 0,
    }
    # inserts never bump — maintained structures absorb them normally
    st.insert(
        spark.createDataFrame([(10, "v10")], "id long, payload string")
    )
    assert st.mutation_clock()["seq"] == 0
    st.delete_ids([3, 4])
    c = st.mutation_clock()
    assert (c["seq"], c["deletes"]) == (1, 1)
    st.upsert(spark.createDataFrame([(5, "CHANGED")], "id long, payload string"))
    c = st.mutation_clock()
    assert (c["seq"], c["upserts"]) == (2, 1)
    st.update(
        [6],
        spark.createDataFrame([(6, "NEW")], "id long, payload string"),
    )
    c = st.mutation_clock()
    assert (c["seq"], c["updates"]) == (3, 1)
    st.replace(st.read())
    c = st.mutation_clock()
    assert (c["seq"], c["replaces"]) == (4, 1)
    # content-preserving relayouts certify "no serving-visible change"
    st.upsert(st.read().limit(1), content_preserving=True)
    st.replace(st.read(), content_preserving=True)
    assert st.mutation_clock()["seq"] == 4
    # the clock survives compaction / carry-forward commits
    if mode == "mor":
        st.compact()
        assert st.mutation_clock()["seq"] == 4


# ---------------------------------------------------------------------------
# BM25Index: exact deletes, upserts, compaction, crash contracts
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus_docs(spark):
    rows = [
        (
            i,
            f"common filler tok{i % 11} mid{i % 5} "
            + ("rareterm " if i % 37 == 0 else "")
            + f"tail{i % 3}",
        )
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


TERMS = ["rareterm", "common", "mid2", "tok7"]


def _smap(df):
    return {r.doc_id: (r.dl, r.matched_terms, r.bm25) for r in df.collect()}


def test_bm25_delete_is_exact_on_survivors(spark, corpus_docs, tmp_path):
    """After delete(ids), search_scores is BIT-identical to
    bm25_scores(surviving corpus): df from the live matched frame,
    N/avgdl corrected by the tombstone-embedded partials."""
    idx = BM25Index(spark, str(tmp_path / "del"), n_buckets=8).build(corpus_docs)
    dead = [i for i in range(120) if i % 7 == 3]
    assert idx.delete(dead) == len(dead)
    surviving = corpus_docs.filter(~F.col("doc_id").isin(dead))
    assert _smap(idx.search_scores(TERMS)) == _smap(bm25_scores(surviving, TERMS))
    # double-delete and unknown ids are no-ops (no double corrections)
    assert idx.delete(dead + [10_000, 10_001]) == 0
    assert _smap(idx.search_scores(TERMS)) == _smap(bm25_scores(surviving, TERMS))


def test_bm25_delete_dataframe_ids_and_live_doc_ids(spark, corpus_docs, tmp_path):
    idx = BM25Index(spark, str(tmp_path / "deldf"), n_buckets=8).build(corpus_docs)
    ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    assert idx.delete(ids) == 2
    live = {r.doc_id for r in idx.live_doc_ids().collect()}
    assert 1 not in live and 2 not in live and 0 in live
    assert len(live) == 118


def test_bm25_reindex_upsert_is_exact(spark, corpus_docs, tmp_path):
    """reindex(modified docs) = kill old instances + land new postings a
    generation higher: search equals a from-scratch build over the
    post-upsert corpus, and the reconcile watermark is unmoved."""
    idx = BM25Index(spark, str(tmp_path / "ups"), n_buckets=8).build(corpus_docs)
    hi_before = idx.max_indexed_id()
    changed = corpus_docs.filter(F.col("doc_id") % 11 == 5).select(
        "doc_id", F.concat(F.lit("upserted freshterm "), F.col("text")).alias("text")
    )
    idx.reindex(changed)
    post = corpus_docs.filter(F.col("doc_id") % 11 != 5).unionByName(changed)
    terms = TERMS + ["freshterm"]
    assert _smap(idx.search_scores(terms)) == _smap(bm25_scores(post, terms))
    assert idx.max_indexed_id() == hi_before  # watermark unmoved
    # delete after reindex kills the NEW instance too (gen ordering)
    idx.delete([5])
    post2 = post.filter(F.col("doc_id") != 5)
    assert _smap(idx.search_scores(terms)) == _smap(bm25_scores(post2, terms))


def test_bm25_compact_materializes_deletes(spark, corpus_docs, tmp_path):
    idx = BM25Index(spark, str(tmp_path / "cmpdel"), n_buckets=4).build(corpus_docs)
    dead = list(range(0, 30))
    idx.delete(dead)
    want = _smap(idx.search_scores(TERMS))
    idx.compact()
    # tombstones gone, stats one corrected row, scores unchanged
    assert idx._tombstones() is None
    stat = spark.read.parquet(idx.stats_dir).collect()
    assert len(stat) == 1 and stat[0].n_docs == 90
    assert _smap(idx.search_scores(TERMS)) == want
    got_live = {r.doc_id for r in idx.live_doc_ids().collect()}
    assert got_live == set(range(30, 120))


def test_bm25_partial_loss_reads_absent(spark, corpus_docs, tmp_path):
    """The r11 ADVICE medium: postings vanished (crash inside the swap)
    while stats survived — exists() must read False so the maintainer
    rebuilds instead of silently serving a one-batch corpus."""
    root = tmp_path / "torn"
    idx = BM25Index(spark, str(root), n_buckets=4).build(corpus_docs)
    assert idx.exists()
    shutil.rmtree(root / "postings")
    assert not idx.exists()
    with pytest.raises(FileNotFoundError, match="no BM25 index"):
        idx.search_scores(["common"])


def test_bm25_maintenance_marker_reads_absent(spark, corpus_docs, tmp_path):
    """A crash inside compact()/rebucket() leaves the maintenance marker
    — the index reads absent until a rebuild clears the state."""
    root = tmp_path / "marked"
    idx = BM25Index(spark, str(root), n_buckets=4).build(corpus_docs)
    idx._set_marker(True)
    assert not idx.exists()
    with pytest.raises(FileNotFoundError, match="no BM25 index"):
        idx.search_scores(["common"])
    # build() overwrites the torn state and clears nothing it shouldn't
    idx._set_marker(False)
    assert idx.exists()


def test_bm25_bucket_count_pin_contract(spark, corpus_docs, tmp_path):
    root = str(tmp_path / "pin")
    BM25Index(spark, root, n_buckets=8).build(corpus_docs)
    # reopening without n_buckets adopts the pinned value
    assert BM25Index(spark, root).n_buckets == 8
    # contradicting the pinned layout raises instead of mis-pruning
    with pytest.raises(ValueError, match="n_buckets"):
        BM25Index(spark, root, n_buckets=16).search_scores(["common"])


def test_reference_n_buckets_shape():
    assert reference_n_buckets(0) == 16
    assert reference_n_buckets(100) == 16  # clamp floor
    assert reference_n_buckets(120) == 16
    assert reference_n_buckets(1_000_000) == 1024  # √1e6 = 1000 → 1024
    assert reference_n_buckets(10**10) == 4096  # clamp ceiling
    # powers of two throughout, monotone non-decreasing
    prev = 0
    for n in [10, 10**3, 10**4, 10**5, 10**6, 10**8, 10**10]:
        b = reference_n_buckets(n)
        assert b & (b - 1) == 0
        assert b >= prev
        prev = b


def test_bm25_derived_buckets_and_rebucket(spark, corpus_docs, tmp_path):
    root = str(tmp_path / "reb")
    idx = BM25Index(spark, root).build(corpus_docs)  # derived default
    assert idx.n_buckets == reference_n_buckets(120) == 16
    want = _smap(idx.search_scores(TERMS))
    idx.rebucket(64)
    assert idx.n_buckets == 64
    assert BM25Index(spark, root).n_buckets == 64  # re-pinned durable
    assert _smap(idx.search_scores(TERMS)) == want
    # rebucket also survives deletes-in-flight (tombstones still apply)
    idx.delete([0, 37])
    want2 = _smap(idx.search_scores(TERMS))
    idx.rebucket(8)
    assert _smap(idx.search_scores(TERMS)) == want2


def test_bm25_src_clock_pin_roundtrip(spark, corpus_docs, tmp_path):
    idx = BM25Index(spark, str(tmp_path / "clk"), n_buckets=4).build(
        corpus_docs, src_clock={"seq": 3, "deletes": 2, "upserts": 1}
    )
    assert idx.pinned_src_clock() == {"seq": 3, "deletes": 2, "upserts": 1}
    idx.pin_src_clock({"seq": 5, "deletes": 4, "upserts": 1})
    assert idx.pinned_src_clock()["seq"] == 5
    idx.compact()  # the pin survives the stats fold (max_by src_seq)
    assert idx.pinned_src_clock() == {"seq": 5, "deletes": 4, "upserts": 1}


# ---------------------------------------------------------------------------
# Maintainer staleness contracts (direct micro-batch calls — the
# streaming wrappers route through these exact functions)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vec_batches(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return [
        emb.filter(F.col("vec_id").between(lo, hi)).localCheckpoint()
        for lo, hi in [(0, 79), (80, 159), (160, 239)]
    ]


def _feed(store, maintainer, batch, cfg):
    prev_v = store.current_version() if store.exists() else 0
    store.insert(batch)
    maintainer(store, batch, prev_v, cfg)


def test_standing_topk_detects_and_repairs_deletes(spark, tmp_path, vec_batches):
    from deployment_spark.operators.similarity import topk_similarity_join_expr
    from deployment_spark.streaming.ingest import (
        _maintain_standing_topk,
        read_standing_topk,
    )

    queries = vec_batches[0].filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    store = SnapshotStore(spark, str(tmp_path / "st_store"), key="vec_id")
    root = str(tmp_path / "st_state")
    cfg = {"root": root, "queries": queries, "k": 5}
    _feed(store, _maintain_standing_topk, vec_batches[0], cfg)
    _feed(store, _maintain_standing_topk, vec_batches[1], cfg)

    # out-of-band delete: default policy raises on the next batch
    top_now = {r.vec_id for r in read_standing_topk(spark, root).collect()}
    victims = sorted(top_now)[:2] + [70, 71]  # hit served rows AND bystanders
    store.delete_ids(victims)
    with pytest.raises(StaleServingStateError, match="standing top-k"):
        _feed(store, _maintain_standing_topk, vec_batches[2], cfg)

    # repair: exact deletes-only heal + the batch still lands.
    # (the raising call above already INSERTED batch 2 into the store —
    # re-feeding it is a replay: new_rows empty, merge is a no-op)
    cfg_r = {**cfg, "on_mutation": "repair"}
    prev_v = store.current_version()
    _maintain_standing_topk(store, vec_batches[2], prev_v, cfg_r)
    want = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in topk_similarity_join_expr(store.read(), queries, k=5).collect()
    }
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in read_standing_topk(spark, root).collect()
    }
    assert got == want


def test_standing_topk_repairs_upsert_exactly(spark, tmp_path, vec_batches, monkeypatch):
    """r13 (VERDICT r12 Next #3): an upsert that CHANGES a served vector
    is healed by the EXACT mutation repair (store key log + restricted
    re-top), not a rebuild — and the repaired state equals the
    from-scratch top-k over the mutated corpus."""
    from deployment_spark.operators.similarity import topk_similarity_join_expr
    from deployment_spark.streaming import ingest as ing
    from deployment_spark.streaming.ingest import (
        _maintain_standing_topk,
        read_standing_topk,
    )

    queries = vec_batches[0].filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    store = SnapshotStore(spark, str(tmp_path / "su_store"), key="vec_id")
    root = str(tmp_path / "su_state")
    cfg = {"root": root, "queries": queries, "k": 5, "on_mutation": "repair"}
    _feed(store, _maintain_standing_topk, vec_batches[0], cfg)
    top_now = {r.vec_id for r in read_standing_topk(spark, root).collect()}
    victim = sorted(v for v in top_now if v > 2)[0]
    store.upsert(
        store.read()
        .filter(F.col("vec_id") == victim)
        .select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    )
    calls = {"repair": 0}
    orig = ing._repair_standing_mutations

    def spy(*a, **kw):
        calls["repair"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(ing, "_repair_standing_mutations", spy)
    _feed(store, _maintain_standing_topk, vec_batches[1], cfg)
    assert calls["repair"] == 1  # the exact path ran, not the rebuild
    want = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in topk_similarity_join_expr(store.read(), queries, k=5).collect()
    }
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in read_standing_topk(spark, root).collect()
    }
    assert got == want


def test_standing_topk_rebuilds_on_replace_or_missing_log(
    spark, tmp_path, vec_batches, monkeypatch
):
    """The exact mutation repair is gated on the key log COVERING the
    pin range: a replace (logs nothing by design) and a legacy store
    (log dir absent) both route to rebuild — still exact, never
    silently stale."""
    import shutil

    from deployment_spark.operators.similarity import topk_similarity_join_expr
    from deployment_spark.streaming import ingest as ing
    from deployment_spark.streaming.ingest import (
        _maintain_standing_topk,
        read_standing_topk,
    )

    queries = vec_batches[0].filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    store = SnapshotStore(spark, str(tmp_path / "sr_store"), key="vec_id")
    root = str(tmp_path / "sr_state")
    cfg = {"root": root, "queries": queries, "k": 5, "on_mutation": "repair"}
    _feed(store, _maintain_standing_topk, vec_batches[0], cfg)
    # replace: whole-corpus content rewrite (drop one row so it differs)
    store.replace(store.read().filter(F.col("vec_id") != 7))
    calls = {"repair": 0}
    monkeypatch.setattr(
        ing, "_repair_standing_mutations",
        lambda *a, **kw: calls.__setitem__("repair", calls["repair"] + 1),
    )
    _feed(store, _maintain_standing_topk, vec_batches[1], cfg)
    assert calls["repair"] == 0  # replace → rebuild path
    want = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in topk_similarity_join_expr(store.read(), queries, k=5).collect()
    }
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in read_standing_topk(spark, root).collect()
    }
    assert got == want
    # legacy store: upsert history but the log vanished → rebuild too
    store.upsert(
        store.read()
        .filter(F.col("vec_id") == 8)
        .select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    )
    shutil.rmtree(str(tmp_path / "sr_store" / "_mutations"), ignore_errors=True)
    _feed(store, _maintain_standing_topk, vec_batches[2], cfg)
    assert calls["repair"] == 0
    want2 = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in topk_similarity_join_expr(store.read(), queries, k=5).collect()
    }
    got2 = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in read_standing_topk(spark, root).collect()
    }
    assert got2 == want2


def test_standing_topk_contract_pins_k_and_queryset(spark, tmp_path, vec_batches):
    from deployment_spark.streaming.ingest import _maintain_standing_topk

    queries = vec_batches[0].filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    store = SnapshotStore(spark, str(tmp_path / "pin_store"), key="vec_id")
    root = str(tmp_path / "pin_state")
    _feed(store, _maintain_standing_topk, vec_batches[0],
          {"root": root, "queries": queries, "k": 5})
    # different k → contract error naming the pinned layout
    with pytest.raises(ValueError, match="pinned to\\s+k=5"):
        _feed(store, _maintain_standing_topk, vec_batches[1],
              {"root": root, "queries": queries, "k": 3})
    # different query set → contract error
    q2 = vec_batches[0].filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    prev_v = store.current_version()
    with pytest.raises(ValueError, match="query_fp"):
        _maintain_standing_topk(store, vec_batches[1], prev_v,
                                {"root": root, "queries": q2, "k": 5})


def test_standing_topk_rejects_non_integral_query_ids(spark, tmp_path, vec_batches):
    from deployment_spark.streaming.ingest import _maintain_standing_topk

    bad = vec_batches[0].limit(3).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    store = SnapshotStore(spark, str(tmp_path / "badq_store"), key="vec_id")
    with pytest.raises(TypeError, match="integral query_id"):
        _feed(store, _maintain_standing_topk, vec_batches[0],
              {"root": str(tmp_path / "badq_state"), "queries": bad, "k": 5})


def test_knn_graph_detects_and_repairs_deletes(spark, tmp_path, vec_batches):
    from deployment_spark.operators.knn import knn_graph, read_knn_graph
    from deployment_spark.streaming.ingest import _maintain_knn_graph

    store = SnapshotStore(spark, str(tmp_path / "kg_store"), key="vec_id")
    root = str(tmp_path / "kg_state")
    cfg = {"root": root, "k": 5}
    _feed(store, _maintain_knn_graph, vec_batches[0], cfg)
    _feed(store, _maintain_knn_graph, vec_batches[1], cfg)

    # delete sources AND destinations: sources must vanish, sources that
    # pointed at victims must be re-topped over the surviving corpus
    store.delete_ids([0, 1, 50, 130])
    with pytest.raises(StaleServingStateError, match="kNN-graph"):
        _feed(store, _maintain_knn_graph, vec_batches[2], cfg)

    cfg_r = {**cfg, "on_mutation": "repair"}
    prev_v = store.current_version()
    _maintain_knn_graph(store, vec_batches[2], prev_v, cfg_r)

    def edge_map(df):
        return {
            (r.src_id, r.rank): (r.dst_id, round(r.cosine, 9))
            for r in df.collect()
        }

    got = edge_map(read_knn_graph(spark, root))
    want = edge_map(knn_graph(store.read(), k=5, id_col="vec_id"))
    assert got == want


def test_knn_graph_repairs_upsert_exactly(spark, tmp_path, vec_batches, monkeypatch):
    """r13 (VERDICT r12 Next #3): an upsert history heals through the
    EXACT mutation repair (delete-then-reinsert decomposition over the
    store key log) — the repaired graph equals knn_graph(mutated
    corpus) and the rebuild path never runs. A mixed history (delete +
    upsert since the pin) exercises both halves of the decomposition."""
    from deployment_spark.operators.knn import knn_graph, read_knn_graph
    from deployment_spark.streaming import ingest as ing
    from deployment_spark.streaming.ingest import _maintain_knn_graph

    store = SnapshotStore(spark, str(tmp_path / "ku_store"), key="vec_id")
    root = str(tmp_path / "ku_state")
    cfg = {"root": root, "k": 5, "on_mutation": "repair"}
    _feed(store, _maintain_knn_graph, vec_batches[0], cfg)
    store.upsert(
        store.read()
        .filter(F.col("vec_id") == 7)
        .select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    )
    store.delete_ids([11, 12])
    calls = {"repair": 0}
    orig = ing._repair_knn_graph_mutations

    def spy(*a, **kw):
        calls["repair"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(ing, "_repair_knn_graph_mutations", spy)
    _feed(store, _maintain_knn_graph, vec_batches[1], cfg)
    assert calls["repair"] == 1

    def edge_map(df):
        return {
            (r.src_id, r.rank): (r.dst_id, round(r.cosine, 9))
            for r in df.collect()
        }

    assert edge_map(read_knn_graph(spark, root)) == edge_map(
        knn_graph(store.read(), k=5, id_col="vec_id")
    )


def test_knn_graph_rebuilds_on_replace(spark, tmp_path, vec_batches, monkeypatch):
    from deployment_spark.operators.knn import knn_graph, read_knn_graph
    from deployment_spark.streaming import ingest as ing
    from deployment_spark.streaming.ingest import _maintain_knn_graph

    store = SnapshotStore(spark, str(tmp_path / "kr_store"), key="vec_id")
    root = str(tmp_path / "kr_state")
    cfg = {"root": root, "k": 5, "on_mutation": "repair"}
    _feed(store, _maintain_knn_graph, vec_batches[0], cfg)
    store.replace(store.read().filter(F.col("vec_id") != 7))
    calls = {"repair": 0}
    monkeypatch.setattr(
        ing, "_repair_knn_graph_mutations",
        lambda *a, **kw: calls.__setitem__("repair", calls["repair"] + 1),
    )
    _feed(store, _maintain_knn_graph, vec_batches[1], cfg)
    assert calls["repair"] == 0  # replace → rebuild (exact by definition)

    def edge_map(df):
        return {
            (r.src_id, r.rank): (r.dst_id, round(r.cosine, 9))
            for r in df.collect()
        }

    assert edge_map(read_knn_graph(spark, root)) == edge_map(
        knn_graph(store.read(), k=5, id_col="vec_id")
    )


def test_bm25_maintainer_detects_and_repairs(spark, tmp_path):
    from deployment_spark.streaming.ingest import _maintain_bm25

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    batches = [
        docs.filter(F.col("doc_id").between(lo, hi)).localCheckpoint()
        for lo, hi in [(0, 79), (80, 159), (160, 239)]
    ]
    store = SnapshotStore(spark, str(tmp_path / "bd_store"), key="doc_id")
    root = str(tmp_path / "bd_idx")
    cfg = {"root": root}
    _feed(store, _maintain_bm25, batches[0], cfg)
    _feed(store, _maintain_bm25, batches[1], cfg)
    idx = BM25Index(spark, root)
    terms = ["dup", "vector", "batch"]

    store.delete_ids(list(range(20, 40)))
    with pytest.raises(StaleServingStateError, match="BM25 index"):
        _feed(store, _maintain_bm25, batches[2], cfg)

    # repair = exact tombstone kill of the vanished ids; the batch the
    # raising call already inserted replays as a no-op and batch 2's
    # postings land incrementally (no rebuild: postings files of the
    # first two appends must survive byte-identical)
    prev_files = set(spark.read.parquet(idx.postings_dir).inputFiles())
    prev_v = store.current_version()
    _maintain_bm25(store, batches[2], prev_v, {**cfg, "on_mutation": "repair"})
    assert prev_files <= set(spark.read.parquet(idx.postings_dir).inputFiles())
    assert _smap(idx.search_scores(terms)) == _smap(
        bm25_scores(store.read(), terms)
    )

    # upsert → content changed → repair falls back to rebuild
    store.upsert(
        store.read()
        .filter(F.col("doc_id") == 100)
        .select("doc_id", F.lit("entirely new payload text").alias("text"))
    )
    extra = docs.filter(F.col("doc_id").between(240, 259)).localCheckpoint()
    _feed(store, _maintain_bm25, extra, {**cfg, "on_mutation": "repair"})
    assert _smap(idx.search_scores(terms + ["payload"])) == _smap(
        bm25_scores(store.read(), terms + ["payload"])
    )


def test_read_standing_topk_live_keys_filters_deleted(spark, tmp_path, vec_batches):
    """r12 'better' half of the delete story: a reader can exclude
    vanished rows at query time (O(nq·k) semi-join, no state rewrite)
    BETWEEN maintenance runs — ranks keep holes, nothing vanished is
    served."""
    from deployment_spark.streaming.ingest import (
        _maintain_standing_topk,
        read_standing_topk,
    )

    queries = vec_batches[0].filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    store = SnapshotStore(spark, str(tmp_path / "lk_store"), key="vec_id")
    root = str(tmp_path / "lk_state")
    _feed(store, _maintain_standing_topk, vec_batches[0],
          {"root": root, "queries": queries, "k": 5})
    served = {r.vec_id for r in read_standing_topk(spark, root).collect()}
    victim = sorted(served)[0]
    store.delete_ids([victim])
    live = store.read().select("vec_id")
    filtered = read_standing_topk(spark, root, live_keys=live).collect()
    assert victim not in {r.vec_id for r in filtered}
    # exactly the victim's slots vanish (it may serve several queries);
    # unaffected rows keep their original ranks — holes mark the gaps
    unfiltered = read_standing_topk(spark, root).collect()
    n_victim_slots = sum(1 for r in unfiltered if r.vec_id == victim)
    assert n_victim_slots >= 1
    assert len(filtered) == len(unfiltered) - n_victim_slots
    assert {(r.query_id, r.rank, r.vec_id) for r in filtered} <= {
        (r.query_id, r.rank, r.vec_id) for r in unfiltered
    }


def test_read_knn_graph_live_keys_filters_deleted(spark, tmp_path, vec_batches):
    from deployment_spark.operators.knn import read_knn_graph
    from deployment_spark.streaming.ingest import _maintain_knn_graph

    store = SnapshotStore(spark, str(tmp_path / "lg_store"), key="vec_id")
    root = str(tmp_path / "lg_state")
    _feed(store, _maintain_knn_graph, vec_batches[0], {"root": root, "k": 5})
    store.delete_ids([0, 11])
    live = store.read().select("vec_id")
    edges = read_knn_graph(spark, root, live_keys=live).collect()
    assert all(r.src_id not in (0, 11) and r.dst_id not in (0, 11) for r in edges)
    # only edges touching the victims were dropped
    full = read_knn_graph(spark, root).collect()
    dropped = {(r.src_id, r.dst_id) for r in full} - {
        (r.src_id, r.dst_id) for r in edges
    }
    assert dropped and all(0 in p or 11 in p for p in dropped)

def test_bm25_maintainer_tombstone_fraction_triggers_compaction(spark, tmp_path):
    """r13 (VERDICT r12 Wrong #4): a delete-heavy history tombstones
    many docs WITHOUT adding postings files, so the file-count trigger
    never fires and every query pays the O(deleted) anti-join forever.
    The tombstone-fraction trigger (default 0.2) must fold the index
    once tombstone rows exceed that fraction of live docs — and stay
    off when disabled."""
    from deployment_spark.streaming.ingest import _maintain_bm25

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    batches = [
        docs.filter(F.col("doc_id").between(lo, hi)).localCheckpoint()
        for lo, hi in [(0, 79), (80, 159), (160, 239)]
    ]
    terms = ["dup", "vector", "batch"]

    # fraction trigger fires: 60 tombstones vs ~180 live (> 0.2), while
    # the file-count trigger is parked out of reach
    store = SnapshotStore(spark, str(tmp_path / "tf_store"), key="doc_id")
    cfg = {
        "root": str(tmp_path / "tf_idx"),
        "on_mutation": "repair",
        "compact_files": 10_000,
    }
    _feed(store, _maintain_bm25, batches[0], cfg)
    _feed(store, _maintain_bm25, batches[1], cfg)
    store.delete_ids(list(range(0, 60)))
    _feed(store, _maintain_bm25, batches[2], cfg)
    idx = BM25Index(spark, cfg["root"])
    assert idx._tombstones() is None  # folded away
    assert spark.read.parquet(idx.stats_dir).count() == 1  # merged stats
    assert _smap(idx.search_scores(terms)) == _smap(
        bm25_scores(store.read(), terms)
    )

    # control: trigger disabled — the same history keeps its tombstones
    store2 = SnapshotStore(spark, str(tmp_path / "tf2_store"), key="doc_id")
    cfg2 = {
        "root": str(tmp_path / "tf2_idx"),
        "on_mutation": "repair",
        "compact_files": None,
        "compact_tombstone_frac": None,
    }
    _feed(store2, _maintain_bm25, batches[0], cfg2)
    _feed(store2, _maintain_bm25, batches[1], cfg2)
    store2.delete_ids(list(range(0, 60)))
    _feed(store2, _maintain_bm25, batches[2], cfg2)
    idx2 = BM25Index(spark, cfg2["root"])
    assert idx2._tombstones() is not None  # still paying the anti-join
    assert _smap(idx2.search_scores(terms)) == _smap(
        bm25_scores(store2.read(), terms)
    )


def test_ingest_vacuum_bounds_mutation_log(spark, tmp_path, vec_batches):
    """r13: ``ingest_to_store(vacuum_mutation_log=True)`` bounds the
    store's destructive-mutation key log at serving cadence WITHOUT
    breaking the exact mutation repair: after each successful batch,
    entries below the clock seq observed at batch start are dropped —
    the maintainer pinned at or past that seq, so every entry a future
    repair's (pin, cur] range can need survives. Staged twice: a
    delete+upsert history is healed by the exact mutation repair from
    the log, the incorporated entry is vacuumed, and a SECOND
    out-of-band delete still repairs exactly from the fresh entry."""
    import os

    from deployment_spark.operators.similarity import topk_similarity_join_expr
    from deployment_spark.streaming.ingest import (
        ingest_to_store,
        read_standing_topk,
    )

    queries = vec_batches[0].filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    store = SnapshotStore(spark, str(tmp_path / "vml_store"), key="vec_id")
    root = str(tmp_path / "vml_state")
    landing = str(tmp_path / "vml_landing")
    cfg = {"root": root, "queries": queries, "k": 5, "on_mutation": "repair"}

    def run():
        q = ingest_to_store(
            spark.readStream.schema(vec_batches[0].schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(landing),
            store,
            str(tmp_path / "vml_ckpt"),
            standing_topk_maintain=cfg,
            vacuum_mutation_log=True,
        )
        q.awaitTermination(300)

    def log_seqs():
        d = store._mutations_dir
        if not os.path.isdir(d):
            return []
        return sorted(
            int(n[4:]) for n in os.listdir(d) if n.startswith("seq=")
        )

    vec_batches[0].coalesce(1).write.parquet(os.path.join(landing, "b=000"))
    run()

    # out-of-band delete (a served row) + upsert (negated vector):
    # two log entries at seq 1 and 2
    top_now = {r.vec_id for r in read_standing_topk(spark, root).collect()}
    victims = sorted(v for v in top_now if v > 2)[:2]
    store.delete_ids([victims[0]])
    store.upsert(
        store.read()
        .filter(F.col("vec_id") == victims[1])
        .select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    )
    assert log_seqs() == [1, 2]

    # run 2: the maintainer repairs exactly from the log (pin 0 → cur 2
    # needs seqs {1, 2}), then the vacuum floor (seq 2, read at batch
    # start) drops seq 1 and keeps seq 2
    vec_batches[1].coalesce(1).write.parquet(os.path.join(landing, "b=001"))
    run()
    assert log_seqs() == [2]
    want = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in topk_similarity_join_expr(store.read(), queries, k=5).collect()
    }
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in read_standing_topk(spark, root).collect()
    }
    assert got == want

    # a SECOND out-of-band delete after the vacuum still repairs
    # exactly: its entry (seq 3) is above every dropped seq by the
    # floor argument
    top_now = {r.vec_id for r in read_standing_topk(spark, root).collect()}
    store.delete_ids([sorted(v for v in top_now if v > 2)[0]])
    assert log_seqs() == [2, 3]
    vec_batches[2].coalesce(1).write.parquet(os.path.join(landing, "b=002"))
    run()
    assert log_seqs() == [3]
    want = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in topk_similarity_join_expr(store.read(), queries, k=5).collect()
    }
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in read_standing_topk(spark, root).collect()
    }
    assert got == want
