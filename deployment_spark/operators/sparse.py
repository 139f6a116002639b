"""Sparse-vector search — the Milvus sparse-float-vector query mode
(SPARSE_INVERTED_INDEX; the learned-sparse / SPLADE-and-BM25-embedding
family the reference's store ships next to dense vectors).

A sparse vector is (indices, values) with a handful of non-zeros in a
huge dimension space; similarity is the dot product over shared
dimensions. The Spark-first layout IS the inverted index: one row per
(id, dim, value) posting, partitioned by dim at scale. Search is then

    postings ⋈ broadcast(query postings) ON dim   -- touch only the
                                                  -- query's dimensions
    → product, groupBy (query, id) partial-sum    -- candidate scores
    → tie-aware top-k window

Exchange volume is bounded by the postings that SHARE a query dimension
(inverted-index semantics — corpus rows with no overlapping dimension
are never read past the scan filter), and the partial aggregation
collapses each task to one row per (query, candidate) before the
shuffle. No all-pairs stage exists at any scale.

``sparsify_topm`` produces a deterministic sparse view of a dense
corpus (top-m dimensions by |value|, ties to the lower dim) — the
bridge used by tests and the oracle-gated probe so sparse search is
value-checkable against the dense tables; real sparse corpora (SPLADE
term weights) land directly in posting form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sparsify_topm(
    df: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Dense → sparse postings: keep each vector's top-``m`` dimensions
    by absolute value (ties to the lower dimension index).

    Output: (id_col, dim INT, val DOUBLE) — one posting row per kept
    dimension. Deterministic, so an engine-independent oracle can
    replay it."""
    exploded = df.select(
        id_col, F.posexplode(vec_col).alias("dim", "val")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc(F.abs("val")), F.asc("dim"))
    return (
        exploded.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= m)
        .select(id_col, "dim", F.col("val").cast("double").alias("val"))
    )


def sparse_topk(
    postings: DataFrame,
    query_postings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    query_routing: str = "broadcast",
) -> DataFrame:
    """Inverted-index top-k: score = Σ over shared dims of
    corpus_val · query_val; rank desc with the engine's deterministic
    (score desc, id asc) tie-break.

    ``postings``: (id_col, dim, val); ``query_postings``:
    (query_id, dim, val). Candidates with zero shared dimensions do
    not appear (standard sparse-retrieval semantics).

    ``query_routing`` (r8 — the corpus-scale batch route, an explicit
    caller choice like ``IVFIndex.search(routing="batch")``):
    'broadcast' hints the query postings into a broadcast-hash join —
    the interactive contract, nq·m rows per task. 'shuffle' drops the
    hint so corpus-sized query sets co-partition WITH the postings on
    ``dim`` — the inverted index's own key, so at scale a
    dim-partitioned postings store shuffles only the query side; the
    scoring plan is otherwise identical (the dim join, the partial-
    aggregated (query, candidate) sum, the top-k window) and NOTHING
    is ever driver- or task-resident at query-set scale. Hot
    dimensions (the stopword skew of learned-sparse corpora) are the
    classic skew key of this join; AQE's skew-join split handles them
    at runtime — same answer either routing.

    Output: (query_id, id_col, rank, score)."""
    if query_routing not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown query_routing {query_routing!r}")
    q = query_postings.select(
        F.col(query_id).alias("_qid"), "dim", F.col("val").alias("_qval")
    )
    if query_routing == "broadcast":
        q = F.broadcast(q)
    scored = (
        postings.join(q, "dim")
        .groupBy("_qid", id_col)
        .agg(F.sum(F.col("val") * F.col("_qval")).alias("_score"))
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("_score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            id_col,
            "rank",
            F.col("_score").alias("score"),
        )
    )
