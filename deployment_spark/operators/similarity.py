"""Top-k similarity search (SURVEY §2.5 J1/J2, §2.6 T1/T3, §2.9 V6/V7).

The reference's one real query: for each query vector, the k nearest
corpus vectors — FAISS ``index.search(q, k)`` (``FAISS/PlainDemo/
pipeline.py:254-263``) / Milvus COSINE search (``Milvus/stream1.py:161-162``).

Scale design (SURVEY §4 "genuinely custom" item 1): a naive
``crossJoin + Window(partitionBy=query_id)`` shuffles nq·N scored rows —
at 100 TB corpus that shuffle IS the job. Instead:

1. Broadcast the (small) query set — queries are k·nq-scale, like the
   reference's 3-query sample (``Milvus/stream1.py:26``).
2. Per corpus partition, score with one numpy matmul (Arrow-batched
   ``mapInPandas``) and pre-reduce to the local top-k per query — each
   partition emits ≤ nq·k rows regardless of its size.
3. Global top-k over the nq·k·P survivors with one tiny window.

Shuffle volume drops from nq·N rows to nq·k·P rows (P = #partitions) —
the classic tree-aggregate shape. Scoring is numpy double-precision
matmul, not per-row Python.

``topk_similarity_join_expr`` is the same semantics in pure Catalyst
expressions (no Python at all) — used as a cross-check and for small
corpora where a broadcast-nest-loop join wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from deployment_spark.functions.vector import cosine_similarity, dot_product


def _rank_window(query_id: str):
    # Deterministic tie-break by corpus id so results are reproducible and
    # oracle-hashable (SURVEY §5.2(2)).
    return Window.partitionBy(query_id).orderBy(F.desc("_sim"), F.asc("_cid"))


def topk_similarity_join_expr(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    metric: str = "cosine",
    assume_normalized: bool = False,
) -> DataFrame:
    """Exact top-k with pure Catalyst expressions.

    Broadcast-nest-loop join of corpus × queries, score via higher-order
    functions, rank with one window per query. k never over-returns
    (V7 k-capping, ``FAISS/UI-Demo/pipeline+ui.py:230``, falls out of
    ``row_number``).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
        )
    )
    c = corpus.select(F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cvec"))
    score = (
        dot_product("_cvec", "_qvec")
        if (metric in ("dot", "ip") or (metric == "cosine" and assume_normalized))
        else cosine_similarity("_cvec", "_qvec")
    )
    scored = c.crossJoin(q).withColumn("_sim", score)
    return (
        scored.withColumn("rank", F.row_number().over(_rank_window("_qid")))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            F.col("rank"),
            F.col("_sim").alias("similarity"),
        )
    )


def topk_similarity_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k at scale: broadcast queries, numpy-matmul scoring with
    per-partition top-k pre-reduction, then a global top-k window.

    Output: (query_id, corpus_id, rank, similarity) — rank 1..k per query.
    """
    spark = corpus.sparkSession
    qid_type = queries.schema[query_id].dataType
    cid_type = corpus.schema[corpus_id].dataType
    qrows = queries.select(query_id, query_vec).collect()  # nq-scale: small by contract
    if not qrows:
        schema = StructType(
            [
                StructField(query_id, qid_type),
                StructField(corpus_id, cid_type),
                StructField("rank", LongType()),
                StructField("similarity", DoubleType()),
            ]
        )
        return spark.createDataFrame([], schema)

    import numpy as np

    qids = [r[query_id] for r in qrows]
    qmat = np.array([r[query_vec] for r in qrows], dtype=np.float64)
    if metric == "cosine":
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        qmat = qmat / qn
    bq = spark.sparkContext.broadcast((qids, qmat))
    kk = int(k)
    use_cosine = metric == "cosine"

    out_schema = StructType(
        [
            StructField("_qid", qid_type),
            StructField("_cid", cid_type),
            StructField("_sim", DoubleType()),
        ]
    )

    c = corpus.select(F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_cvec"))

    def local_topk(batches):
        import pandas as pd

        ids, qm = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.array(pdf["_cvec"].tolist(), dtype=np.float64)
            if use_cosine:
                cn = np.linalg.norm(cmat, axis=1, keepdims=True)
                cn[cn == 0] = 1.0
                cmat = cmat / cn
            sims = cmat @ qm.T  # (n_local, nq)
            n_local = sims.shape[0]
            take = min(kk, n_local)
            cid_arr = pdf["_cid"].to_numpy()
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(ids):
                # Tie-aware local select: order by the SAME composite key
                # the global window uses (sim desc, cid asc), so a tied
                # candidate at the local k-boundary is never dropped in
                # favor of one the global tie-break would discard.
                # argpartition alone breaks exact-similarity ties
                # arbitrarily — nondeterministic under duplicate vectors.
                order = np.lexsort((cid_arr, -sims[:, j]))[:take]
                out_q.extend([qid] * len(order))
                out_c.extend(cid_arr[order].tolist())
                out_s.extend(sims[order, j].tolist())
            yield pd.DataFrame({"_qid": out_q, "_cid": out_c, "_sim": out_s})

    candidates = c.mapInPandas(local_topk, schema=out_schema)
    return (
        candidates.withColumn("rank", F.row_number().over(_rank_window("_qid")))
        .filter(F.col("rank") <= kk)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            F.col("rank"),
            F.col("_sim").alias("similarity"),
        )
    )


def enrich_topk(results: DataFrame, corpus: DataFrame, corpus_id: str = "vec_id", payload_cols: list[str] | None = None) -> DataFrame:
    """J2 — map result ids back to corpus payloads
    (``FAISS/UI-Demo/pipeline+ui.py:594-600``). The result side is k·nq
    rows, so Spark broadcasts it; unlike the reference's parallel-list
    indexing this cannot drift from the corpus (SURVEY §3.3)."""
    cols = payload_cols or [c for c in corpus.columns if c != corpus_id]
    return F.broadcast(results).join(
        corpus.select(corpus_id, *cols), on=corpus_id, how="inner"
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (SURVEY §7.1 M8): all (a, b)
    with a < b and cosine ≥ threshold.

    Execution: the normalized corpus matrix is broadcast once; each
    partition scores its own rows against it with one numpy matmul and
    emits only the above-threshold pairs — work is O(N²·d) flops but the
    shuffle is only the surviving pairs. This exact all-pairs form is for
    corpora whose matrix fits in executor memory (N·d·8 bytes); at 100 TB
    scale, LSH-bucket first (``dedup.minhash_lsh_candidates`` or the
    sign-bit buckets in ``queries.q_lsh_bucket_ann``) and run this within
    buckets."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    b = spark.sparkContext.broadcast((ids, mat))
    thr = float(threshold)

    out_schema = StructType(
        [
            StructField("a_id", LongType()),
            StructField("b_id", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score(batches):
        all_ids, m = b.value
        for pdf in batches:
            if pdf.empty:
                continue
            local = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            ln = np.linalg.norm(local, axis=1, keepdims=True)
            ln[ln == 0] = 1.0
            local = local / ln
            sims = local @ m.T  # (n_local, N)
            lids = pdf[id_col].to_numpy(dtype=np.int64)
            ii, jj = np.nonzero(sims >= thr)
            if len(ii) == 0:
                continue
            a_ids, b_ids, s = lids[ii], all_ids[jj], sims[ii, jj]
            keep = a_ids < b_ids  # each unordered pair once, from its low-id side
            yield pd.DataFrame(
                {"a_id": a_ids[keep], "b_id": b_ids[keep], "cosine": s[keep]}
            )

    return df.select(id_col, vec_col).mapInPandas(score, schema=out_schema)


def cosine_neardup_pairs_expr(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure-Catalyst all-pairs variant (no Python): self-join + HOF cosine.
    Cross-check twin of ``cosine_neardup_pairs``; fine for small candidate
    sets, slower on wide corpora (per-pair interpreted lambdas)."""
    a = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", cosine_similarity("a_vec", "b_vec"))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )
