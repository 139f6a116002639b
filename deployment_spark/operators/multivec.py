"""Multi-vector late-interaction retrieval (ColBERT-style maxsim) —
each document and each query is a BAG of token vectors; relevance is

    maxsim(q, d) = Σ_{t ∈ q} max_{u ∈ d} (t · u)

(Khattab & Zaharia, SIGIR 2020). Milvus 2.5 ships this as the
multi-vector / late-interaction query mode; the engine's other
searchers all assume one vector per entity.

Spark-first layout: token vectors live LONG-FORMAT — one row per
(entity, position, vector) — not nested array<array<double>>. Long
format is what scales: the scan prunes by entity/position predicates,
the per-token work is a plain join + two-stage aggregate with map-side
partial max, and skew stays bounded by tokens-per-doc (never by corpus
size).

Exact plan (``maxsim_topk``): broadcast the query bag (nq·tq rows —
query-scale by contract) onto ONE corpus token scan; dot products in
whole-stage codegen; groupBy (query, entity, q_pos) MAX then
(query, entity) SUM — both aggregates partial (map-side combine), so
the exchange carries one row per (query, entity, q_pos) that matched,
never per token pair. This is the exact reference at any scale where a
full token scan is acceptable (the gated path).

Scale path (``maxsim_rerank``): ColBERT deployments never maxsim-scan
the corpus — a first-stage single-vector search (pooled/mean vector
through ANY of the engine's indexes: IVF, PQ, …) proposes candidates,
and maxsim re-scores ONLY the candidate bags (O(nq·cand·tq·td) work,
corpus-independent). The composition is exact whenever the candidate
set contains the true top-k (recall governed by the first stage, the
standard two-stage contract — same shape as PQ's shortlist re-rank).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deployment_spark.functions.vector import dot_product


def reference_k_per_token(n_tokens: int, floor: int = 32, scale: float = 2.0) -> int:
    """Scale-derived candidate width for the PLAID-style token stage
    (r12, VERDICT r11 #3): hits per query token ≈ 2·√(corpus tokens),
    floored at 32. Rationale: a FIXED k_per_token decays — the density
    of corpus tokens inside any cosine radius of a query token grows
    linearly with the corpus, so a fixed-width hit list covers a
    shrinking radius and candidate recall collapses (measured 0.91 →
    0.42 over a 16× corpus at the r11 fixed point, maxsim_probe). What
    PLAID actually harvests is "everything in the probed IVF cells":
    with the token index at ``reference_nlist ≈ √n_tokens``, one
    cell's population is ≈ √n_tokens — so √-scaling the hit width
    tracks the cell population, holding the covered radius roughly
    fixed while first-stage cost grows only as √corpus (the same
    argument that sizes nlist itself). The derived point is floor-
    gated end-to-end in the ann_recall maxsim/two_stage group and
    re-swept by tools/maxsim_probe.py --auto."""
    return max(int(floor), int(math.ceil(scale * math.sqrt(max(int(n_tokens), 1)))))


def maxsim_scores(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_pos: str | None = None,
) -> DataFrame:
    """Per-(query, entity) maxsim score over long-format token bags.

    ``doc_vecs``: (id_col, vec_col) one row per document token.
    ``query_vecs``: (query_id, query_vec) one row per query token,
    optionally with an explicit ``query_pos`` token-position column
    (without one, positions are synthesized — maxsim is
    permutation-invariant over query tokens, each row just needs a
    distinct slot). Output: (query_id, id_col, maxsim). Entities
    appear iff they have at least one token row."""
    pos = (
        F.col(query_pos)
        if query_pos is not None
        else F.monotonically_increasing_id()
    )
    q = F.broadcast(
        query_vecs.select(
            F.col(query_id).alias("_qid"),
            pos.alias("_qpos"),
            F.col(query_vec).cast("array<double>").alias("_qvec"),
        )
    )
    scored = (
        doc_vecs.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).cast("array<double>").alias("_cvec"),
        )
        .crossJoin(q)
        .withColumn("_dot", dot_product("_cvec", "_qvec"))
    )
    per_qtok = scored.groupBy("_qid", "_cid", "_qpos").agg(
        F.max("_dot").alias("_m")
    )
    return per_qtok.groupBy("_qid", "_cid").agg(
        F.sum("_m").alias("maxsim")
    ).select(
        F.col("_qid").alias(query_id), F.col("_cid").alias(id_col), "maxsim"
    )


def maxsim_topk(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_pos: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Exact maxsim top-k: (query_id, id_col, rank, maxsim), ties by id
    ascending (the engine's total order). ``round_to`` ranks on the
    rounded score for cross-engine-stable ordering (the oracle-gated
    entries' convention)."""
    scored = maxsim_scores(
        doc_vecs, query_vecs, id_col, vec_col, query_id, query_vec, query_pos
    )
    if round_to is not None:
        scored = scored.withColumn("maxsim", F.round("maxsim", round_to))
    w = Window.partitionBy(query_id).orderBy(F.desc("maxsim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "rank", "maxsim")
    )


def pool_vectors(
    doc_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean-pool each entity's token bag into ONE vector — the
    first-stage representation (feed it to any single-vector index:
    exact, IVF, PQ, …). Pure Catalyst: posexplode + per-dimension mean
    + re-assemble; one shuffle keyed by (entity, dim), one by entity."""
    exploded = doc_vecs.select(
        F.col(id_col).alias("_cid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_d", "_x"),
    )
    per_dim = exploded.groupBy("_cid", "_d").agg(F.avg("_x").alias("_m"))
    return (
        per_dim.groupBy("_cid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_d"), F.col("_m")))
            ).alias("_pairs")
        )
        .select(
            F.col("_cid").alias(id_col),
            F.transform(F.col("_pairs"), lambda p: p._m).alias(vec_col),
        )
    )


def maxsim_rerank(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_pos: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Two-stage maxsim: re-score ONLY the candidate (query, entity)
    pairs a first-stage searcher proposed (any (query_id, id_col)
    frame, e.g. IVF over ``pool_vectors`` output). The token scan is
    semi-joined down to candidate entities BEFORE any scoring, so the
    maxsim work is O(candidate bags), corpus-independent."""
    cand = candidates.select(query_id, id_col).dropDuplicates()
    cand_docs = doc_vecs.join(
        F.broadcast(cand.select(id_col).distinct()), id_col, "left_semi"
    )
    scored = maxsim_scores(
        cand_docs, query_vecs, id_col, vec_col, query_id, query_vec, query_pos
    ).join(F.broadcast(cand), [query_id, id_col], "left_semi")
    if round_to is not None:
        scored = scored.withColumn("maxsim", F.round("maxsim", round_to))
    w = Window.partitionBy(query_id).orderBy(F.desc("maxsim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "rank", "maxsim")
    )


def token_candidates(
    search_fn,
    query_vecs: DataFrame,
    token_doc: DataFrame | None,
    k_per_token: int | None = None,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    query_pos: str | None = None,
    token_id: str = "tok_id",
    doc_id: str = "vec_id",
) -> DataFrame:
    """First-stage candidate generation the ColBERT/PLAID way: ANN over
    the TOKEN vectors, one search per query token; a document is a
    candidate iff at least one of its tokens hits. This preserves
    maxsim's signal — a doc ranks high because SOME token matches SOME
    query token — where a mean-pooled single-vector stage washes
    multi-topic bags out (measured: pooled-stage recall ≤ 0.36 on a
    multi-topic fixture where the token stage holds ≥ 0.9 —
    tools/maxsim_probe.py and the pinned test).

    ``search_fn(queries_df, k) -> (query_id, token_id, ...)`` is any of
    the engine's searchers closed over its token index (IVF/PQ/exact);
    ``token_doc`` maps (token_id, doc_id). Query tokens ride a
    composite id (query·10⁶ + position — positions bounded < 10⁶ by
    contract, i.e. < 10⁶ tokens per query) so one search call covers
    every token; floor-division recovers the query id, correctly for
    negative ids too. The query-id column must be INTEGRAL (checked —
    a fractional id breaks the composite arithmetic silently).
    Synthesized positions (no ``query_pos``) are a per-query
    ``row_number`` — maxsim is permutation-invariant over query
    tokens, each row just needs a DISTINCT in-range slot; the r11
    ``monotonically_increasing_id() % 10⁶`` synthesis could collide
    across partitions (mono ids jump by 2³³ ≡ 934592 mod 10⁶ at
    partition boundaries), silently merging two tokens' searches
    under one slot and dropping one token's candidates (r11 ADVICE).
    ``k_per_token=None`` (the r12 default) derives the width from the
    corpus token count via ``reference_k_per_token`` — a fixed width
    decays as the corpus grows (see its docstring); the count is one
    O(1) aggregate over ``token_doc``.

    ``token_doc=None`` (r13): the searcher resolves docs itself —
    ``search_fn``'s output must already carry ``doc_id`` (e.g.
    ``TokenIVFIndex.search_tokens(with_doc=True)``, which reads the
    mapping from the probed cells only instead of a full-layout map —
    the bounded shape at corpus scale). ``k_per_token`` must then be
    explicit (there is no map to count; the maintained index's
    ``reference_k_per_token(idx.n_tokens())`` is the O(1) source).
    Output: (query_id, doc_id) distinct candidate pairs."""
    if k_per_token is None:
        if token_doc is None:
            raise ValueError(
                "token_candidates(token_doc=None) needs an explicit "
                "k_per_token — there is no map to derive it from; pass "
                "reference_k_per_token(<live token count>)"
            )
        k_per_token = reference_k_per_token(token_doc.count())
    qid_type = dict(
        (f.name, f.dataType.simpleString()) for f in query_vecs.schema.fields
    ).get(query_id)
    if qid_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"token_candidates requires an integral {query_id} column "
            f"(composite id = query·10⁶ + position); got {qid_type!r}"
        )
    if query_pos is not None:
        pos = F.col(query_pos)
    else:
        pos = (
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(
                    F.monotonically_increasing_id()
                )
            )
            - 1
        )
    q = query_vecs.select(
        (F.col(query_id).cast("long") * 1_000_000 + pos).alias(query_id),
        F.col(query_vec).alias(query_vec),
    )
    raw = search_fn(q, k_per_token)
    # recover the query id with EXACT long arithmetic (r12 ADVICE):
    # floor(col / 1e6) routes through double, whose 2^53 integer
    # precision silently corrupts recovered ids once |query_id| exceeds
    # ~9.0e9. Subtracting pmod (non-negative by definition) yields the
    # exact floor multiple, and integral DIV of an exact multiple is the
    # exact quotient — correct for negative ids too.
    recover = F.expr(
        f"CAST(({query_id} - pmod({query_id}, 1000000)) DIV 1000000 AS BIGINT)"
    )
    if token_doc is None:
        return (
            raw.select(query_id, doc_id)
            .withColumn(query_id, recover)
            .distinct()
        )
    return (
        raw.select(query_id, token_id)
        .withColumn(query_id, recover)
        .join(token_doc, token_id)
        .select(query_id, doc_id)
        .distinct()
    )
