"""Text retrieval (BM25) and hybrid rank fusion (RRF).

The reference's store family ships hybrid search — lexical scoring
fused with vector similarity — as a first-class query mode (Milvus
hybrid search; the reference drives Milvus at ``Milvus/stream1.py``).
The engine's vector side is covered by exact/IVF/PQ/SQ/LSH; this module
adds the lexical ranking and the fusion step, Spark-first.

BM25 (Okapi, Lucene-style +1 idf so scores stay positive):

    idf(t)    = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d)  = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Scale shape — the deliberate departure from the textbook inverted-index
join: a search query is a SMALL LITERAL term list, so per-term
frequencies come from conditional sums inside the SAME single groupBy
that computes document length. One explode, one partially-aggregated
shuffle (each task emits one row per doc), one 1-row corpus-stats
broadcast — no token-keyed join, no second corpus scan, no hot-token
skew (the per-doc aggregate never keys by token). An inverted-index
join would shuffle every "the" in the corpus to one reducer; this
shape's exchange volume is O(docs) regardless of term popularity.

Top-k uses orderBy+limit, which Spark compiles to
TakeOrderedAndProject — per-partition heaps, no global sort.

RRF (reciprocal rank fusion, Cormack et al.):

    rrf(d) = sum_lists 1 / (k0 + rank_list(d))

fuses any number of rankings without score calibration — the standard
way to combine BM25 and cosine ranks whose scales are incomparable.
Union of the (id, rank) lists + one groupBy; list lengths are k-scale,
so the whole fusion is driver-light and shuffle-trivial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BM25 score for a literal term list.

    Output: (id_col, dl, matched_terms, bm25) for documents matching at
    least one term. Deterministic; whitespace tokenization on
    lowercased text (matching the engine's other text operators and the
    DuckDB oracle's regexp_split replay).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(t.lower() for t in query_terms))  # dedupe, keep order
    from deployment_spark.operators.dedup import spread_for_cpu

    toks = (
        spread_for_cpu(df)
        .select(
            id_col,
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    # one shuffle: dl and every per-term tf from the same per-doc aggregate
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("tok") == t).cast("int")).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # 1-row corpus stats (N, avgdl, df per term), broadcast-attached —
    # same 1-row crossJoin pattern as the summary attachments elsewhere
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("int")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    def term_weight(i: int) -> Column:
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (F.col("_n") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
        )
        return F.when(tf > 0, idf * tf * F.lit(k1 + 1.0) / norm).otherwise(F.lit(0.0))

    score = term_weight(0)
    for i in range(1, len(terms)):
        score = score + term_weight(i)
    matched = F.aggregate(
        F.array(*[(F.col(f"_tf{i}") > 0).cast("int") for i in range(len(terms))]),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .withColumn("bm25", score)
        .withColumn("matched_terms", matched)
        .filter(F.col("matched_terms") > 0)
        .select(id_col, "dl", "matched_terms", "bm25")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int | None = None,
) -> DataFrame:
    """Top-k BM25 ranking: (id_col, dl, matched_terms, bm25, rank).

    orderBy+limit compiles to TakeOrderedAndProject (per-partition
    heaps); the rank window then runs on the k-row result only. With
    ``round_to``, ranking (and the returned score) uses the rounded
    value — the cross-engine-stable ordering the oracle-gated entries
    need (ties broken by id either way)."""
    scored = bm25_scores(df, query_terms, k1=k1, b=b, text_col=text_col, id_col=id_col)
    if round_to is not None:
        scored = scored.withColumn("bm25", F.round("bm25", round_to))
    top = scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "dl", "matched_terms", "bm25", "rank"
    )


def weighted_fuse(
    ranked: list[tuple[DataFrame, float]],
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Weighted score fusion — the Milvus ``WeightedRanker`` sibling of
    RRF: each list's scores are min-max normalized over that list (BM25
    and cosine live on incomparable scales), then summed with the given
    weights. A doc absent from a list contributes nothing for it.

    Output: (id_col, n_lists, fused_score). Like rrf_fuse, inputs are
    k-scale: the per-list min/max is a 1-row broadcast and the union +
    groupBy shuffles only k·lists rows. Degenerate lists (all scores
    equal) normalize to 1.0 so a constant list still ranks by presence.
    """
    if not ranked:
        raise ValueError("ranked must be non-empty")
    parts = []
    for df, weight in ranked:
        ext = df.agg(
            F.min(score_col).alias("_lo"), F.max(score_col).alias("_hi")
        )
        norm = F.when(
            F.col("_hi") > F.col("_lo"),
            (F.col(score_col) - F.col("_lo")) / (F.col("_hi") - F.col("_lo")),
        ).otherwise(F.lit(1.0))
        parts.append(
            df.crossJoin(F.broadcast(ext)).select(
                F.col(id_col), (F.lit(float(weight)) * norm).alias("_c")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lists"), F.sum("_c").alias("fused_score")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
) -> DataFrame:
    """Reciprocal rank fusion over any number of (id, rank) lists.

    Output: (id_col, n_lists, rrf_score). A doc absent from a list
    simply contributes nothing for it (standard RRF). Inputs are
    k-scale, so this is one tiny union + groupBy."""
    if not ranked:
        raise ValueError("ranked must be non-empty")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                "_c"
            ),
        )
        for r in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lists"), F.sum("_c").alias("rrf_score")
    )
