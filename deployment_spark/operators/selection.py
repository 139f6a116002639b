"""Data selection via importance resampling (DSIR) for training-data
pipelines (SURVEY §7.1 M8 extension).

Implements the hashed n-gram importance-weighting protocol of Xie et
al., NeurIPS 2023 ("Data Selection for Language Models via Importance
Resampling"): fit two bag-of-hashed-ngram distributions — one on a
small TARGET corpus (the data you want more of) and one on the RAW
corpus being filtered — and score every raw document by its log
importance ratio sum(log p_target(b) / p_raw(b)) over its features.
High-weight documents look like the target; selecting the top fraction
(or Gumbel-resampling with these weights) yields a target-shaped
subset of the raw corpus.

The reference pipelines have no data-selection stage at all (their
corpus is the packet capture as-is); this operator is part of the
LLM-training-data extension surface, same family as
``operators.dedup.contamination_pairs``.

Scale shape (the whole point of hashed DSIR — the feature space is
CLOSED at ``n_buckets`` regardless of corpus size):

1. one explode pass builds (doc, bucket) feature rows — unigrams and
   bigrams hashed into ``n_buckets`` via the engine's PORTABLE md5
   bucket hash (same construction as ``operators.export``), so any
   engine reproduces the weights bit-for-bit;
2. ONE groupBy(bucket) with conditional sums builds BOTH distributions
   in a single partially-aggregated exchange whose cardinality is
   ``n_buckets``, not tokens;
3. the bucket table (n_buckets rows, e.g. 512) is BROADCAST back onto
   the feature stream — the 100 TB raw side never shuffles for the
   probability lookup;
4. per-doc weight = one groupBy(doc) sum — the only corpus-keyed
   exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deployment_spark.functions.text import tokens


def _portable_bucket(col, n_buckets: int, salt: str):
    """First 8 hex chars of md5('<salt>|'||feature) mod n_buckets — the
    repo's standard engine-portable hash (cf. operators/export.py).
    coalesce keeps the bucket provably non-nullable: otherwise the
    ratio join infers isnotnull(bucket) and pushes it into ONE side's
    subtree, which de-canonicalizes the two ``bf`` consumers and breaks
    the ReuseExchange single-scan property (the unigram_lm_score salt
    lesson, asserted in tests/test_plans.py)."""
    h = F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(salt), col)), 1, 8), 16, 10)
    return F.coalesce((h.cast("long") % n_buckets).cast("long"), F.lit(0))


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    salt: str = "dsir",
) -> DataFrame:
    """Explode each document into hashed unigram + bigram feature rows
    (id, bucket). Pure Catalyst: ``zip_with`` over two array slices
    builds the bigram array in the same projection (per-row array
    walks — a per-element ``toks[i]`` lambda would re-evaluate the
    regex split per element, O(tokens²) per doc), one explode total."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n1 = F.greatest(n - 1, F.lit(1))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n1),
            F.slice(toks, 2, n1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return df.select(
        id_col, F.explode(feats).alias("feature")
    ).select(
        id_col, _portable_bucket(F.col("feature"), n_buckets, salt).alias("bucket")
    )


def dsir_weights(
    raw: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR log importance weight over ``raw``.

    ``target_pred`` is a Column predicate over ``raw``'s columns marking
    the target subset (e.g. ``F.col("lang") == "en"``); fitting target
    and raw from one table keeps this a SINGLE aggregation — real
    deployments pass a separate curated target corpus, in which case
    union the two frames with a tag column and use the tag as the
    predicate.

    Laplace-smoothed bucket probabilities (add-1 over ``n_buckets``)
    keep unseen buckets finite, exactly as in the paper's estimator.

    The corpus is scanned and feature-exploded ONCE: both the bucket
    distributions and the per-doc scoring consume the same per-(doc,
    bucket) frequency aggregate ``bf``, whose exchange Catalyst dedupes
    via ReuseExchange (the unigram_lm_score pattern, asserted in
    tests/test_plans.py; same fresh-file-scan caveat — a cached input
    disables the reuse). The distribution totals come from an
    unpartitioned window over the ``n_buckets``-row table rather than a
    crossJoin branch, so the bucket table is derived exactly once too.
    Bigrams come from ``zip_with`` over two array slices — per-row
    array walks, NOT per-element ``toks[i]`` lambda accesses, which
    re-evaluate the regex split per element (O(tokens²) per doc; the
    first cut of this operator did exactly that and measured 10× slow).

    Output: (id, n_features, log_weight DOUBLE).
    """
    tagged = raw.withColumn("_is_target", target_pred.cast("int"))
    # the target tag rides along THROUGH the explode (not re-joined on
    # the doc key afterwards) — the corpus never shuffles for it.
    # r13: tokenize ONCE in a projection below the explode — the
    # generator expression references the token array ~6 times and
    # Generate evaluates interpreted with no CSE, so a text-column
    # input re-ran the regex split 6× per row (measured −0.9 s on the
    # sf0.1 feature pass; same fix as word_shingles(from_tokens=True))
    tokd = tagged.select(id_col, "_is_target", tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    n1 = F.greatest(n - 1, F.lit(1))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n1),
            F.slice(toks, 2, n1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = tokd.select(
        id_col, "_is_target", F.explode(F.concat(toks, bigrams)).alias("feature")
    ).select(
        id_col,
        "_is_target",
        _portable_bucket(F.col("feature"), n_buckets, salt).alias("bucket"),
    )
    # the SHARED aggregate: per-doc bucket frequencies — one partially
    # aggregated (doc, bucket) exchange both consumers reuse
    bf = feats.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("tf"),
        F.max("_is_target").alias("is_t"),
    )
    buckets = bf.groupBy("bucket").agg(
        F.sum("tf").alias("raw_c"),
        F.sum(F.col("tf") * F.col("is_t")).alias("tgt_c"),
    )
    wtot = Window.partitionBy()
    ratio = buckets.select(
        "bucket",
        (
            F.log((F.col("tgt_c") + 1) / (F.sum("tgt_c").over(wtot) + n_buckets))
            - F.log((F.col("raw_c") + 1) / (F.sum("raw_c").over(wtot) + n_buckets))
        ).alias("log_ratio"),
    )
    scored = bf.join(F.broadcast(ratio), "bucket")
    # is_target in the output is useful (callers usually exclude docs
    # already in the target set) AND load-bearing: it keeps the two bf
    # consumers' column sets identical, so the pruner cannot strip
    # max(is_t) from this branch's copy and de-canonicalize the reuse
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_features"),
        F.sum(F.col("tf") * F.col("log_ratio")).alias("log_weight"),
        F.max("is_t").cast("int").alias("is_target"),
    )


def dsir_select(
    raw: DataFrame,
    target_pred,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    salt: str = "dsir",
    round_to: int = 4,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` raw documents by DSIR importance weight — the
    deterministic "select the most target-like" variant (the paper's
    Gumbel resampling adds noise for diversity; rank-on-weight is the
    reproducible engine primitive both build on). Ranking uses the
    ``round_to``-dp-rounded weight with id tie-break, so the rank
    column is stable across engines (the doc_bm25_topk convention).

    Pass ``weights`` (a :func:`dsir_weights` result) to share one
    weight computation across several selections — running 'top' and
    'gumbel' side by side would otherwise scan the corpus once each.

    Output: (id, n_features, log_weight rounded, rank 1..k).
    """
    w = (
        weights
        if weights is not None
        else dsir_weights(
            raw, target_pred, text_col=text_col, id_col=id_col,
            n_buckets=n_buckets, salt=salt,
        )
    ).withColumn("log_weight", F.round("log_weight", round_to))
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # heaps, nq·k-bounded); the rank window runs on the k-row result
    # only — the bm25_topk convention
    from pyspark.sql import Window

    top = w.orderBy(F.desc("log_weight"), F.asc(id_col)).limit(k)
    rank_w = Window.orderBy(F.desc("log_weight"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(rank_w).cast("long"))


def dsir_resample(
    raw: DataFrame,
    target_pred,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    salt: str = "dsir",
    seed: str = "gumbel",
    round_to: int | None = None,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLING — the paper's actual selection
    step (top-k-by-weight keeps only the most target-like tail; DSIR
    samples WITHOUT replacement with probability ∝ exp(log_weight),
    trading a little typicality for diversity). The Gumbel-max trick
    makes that a deterministic rank: key_i = log_weight_i + G_i with
    G_i = −ln(−ln(u_i)) standard Gumbel noise; the top-k keys ARE a
    weight-proportional sample without replacement.

    u_i comes from the engine-portable md5 hash of (seed, id) — not an
    RNG — so the "sample" is reproducible across runs, partitionings,
    and engines (the stratified_sample/shuffled_shards precedent), and
    a DuckDB oracle can replay it bit-for-bit. Row-local on top of
    :func:`dsir_weights`: zero exchanges beyond the weight computation.

    ``round_to`` rounds the log weight BEFORE adding the noise (and in
    the output): when an external oracle replays the selection, both
    engines must build keys from the same rounded weight, or a 5e-5
    rounding gap between raw and rounded weights can flip ranks where
    two keys nearly tie.

    ``weights`` shares a precomputed :func:`dsir_weights` result, as in
    :func:`dsir_select`.

    Output: (id, n_features, log_weight DOUBLE, gumbel_key DOUBLE,
    rank 1..k).
    """
    w = (
        weights
        if weights is not None
        else dsir_weights(
            raw, target_pred, text_col=text_col, id_col=id_col,
            n_buckets=n_buckets, salt=salt,
        )
    )
    if round_to is not None:
        w = w.withColumn("log_weight", F.round("log_weight", round_to))
    # u in (0, 1): (h + 0.5) / 2^32 over the 32-bit portable hash —
    # never exactly 0 or 1, so the double ln chain stays finite
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(2**32))
    keyed = w.withColumn(
        "gumbel_key", F.col("log_weight") - F.log(-F.log(u))
    )
    from pyspark.sql import Window

    top = keyed.orderBy(F.desc("gumbel_key"), F.asc(id_col)).limit(k)
    rank_w = Window.orderBy(F.desc("gumbel_key"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(rank_w).cast("long"))


def leakage_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: dict | None = None,
    salt: str = "split",
    resolution: int = 10000,
) -> DataFrame:
    """Group-aware train/valid/test assignment — the eval-LEAKAGE
    control a corpus pipeline needs after near-dedup: a document's
    split is a pure function of its near-dup COMPONENT label (the min
    doc id of its connected component over ``pairs``; singletons label
    themselves), so two near-duplicate documents can NEVER straddle
    splits — a per-doc hash split would leak eval content into
    training through surviving near-copies. Assignment is the same
    portable md5-prefix bucket as ``stratified_sample``
    (hash(label|salt) % resolution against cumulative weight
    boundaries), reproducible across runs, engines, and partitionings.

    Shuffle shape: connected components over the pair graph (bounded
    by component diameter), one left join of the corpus against the
    (pair-nodes-only) label table, then row-local hashing — the corpus
    never shuffles on anything but the label join key.

    Output: (id_col, label, split) for every input row."""
    from deployment_spark.operators.dedup import connected_components

    w = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    total = float(sum(w.values()))
    labels = connected_components(pairs).withColumnRenamed("node", id_col)
    lab = (
        df.select(id_col)
        .join(labels, id_col, "left")
        .withColumn("label", F.coalesce("label", F.col(id_col)))
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("label").cast("string"), F.lit("|" + salt))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % resolution
    )
    cum = 0.0
    expr = None
    names = list(w)
    for name in names[:-1]:
        cum += w[name] / total
        cond = h < F.lit(int(round(cum * resolution)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))
    return lab.select(id_col, "label", split.alias("split"))
