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

import math
import os
import re
import zlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# Persisted BM25 inverted index (r11)
# ---------------------------------------------------------------------------

def bm25_bucket(tok: str, n_buckets: int) -> int:
    """The index's token→bucket mapping, driver-side. MUST stay equal to
    the Spark-side partition expression (`F.crc32(encode(tok,'utf-8'))
    % n_buckets`) — both are standard CRC-32 over UTF-8 bytes, pinned by
    a property test — because the read path PRUNES partitions with the
    Python-computed bucket set; a divergence would silently drop a
    term's entire postings list."""
    return zlib.crc32(tok.encode("utf-8")) % n_buckets


class BM25Index:
    """Persisted BM25 inverted index — the serving-cadence path.

    ``bm25_scores`` computes per-term tfs and corpus stats from scratch,
    which is the right ONE-SHOT shape (one corpus scan, no token-keyed
    shuffle) but pays O(corpus) per query — at serving cadence over a
    100 TB corpus every query would re-tokenize every document. The
    reference's store family answers lexical queries from a maintained
    index (Milvus BM25 hybrid search is backed by a persisted inverted
    index; the reference drives that store at ``Milvus/stream1.py``).
    This is that index, Spark-first:

    - ``postings/`` — parquet partitioned by ``tok_bucket =
      crc32(tok) % n_buckets``: one row per (doc, token) with the term
      frequency AND the document length denormalized in (``tok,
      doc_id, tf, dl``). A query reads ONLY its terms' buckets
      (partition pruning on a literal bucket list computed driver-side)
      and never joins back to a corpus-sized doc-length table — query
      cost is O(postings of the query's terms), independent of corpus
      size. Hot tokens make big buckets but the scoring aggregate keys
      by DOC, never by token, so no reducer ever sees one token's whole
      postings list.
    - ``stats/`` — O(appends) tiny partial rows (``n_docs, sum_dl,
      max_doc_id``); corpus N and avgdl are their sums, so query-time
      stats cost is a few-row scan, and appends never rewrite history.
      ``max_doc_id`` is the max SEEN id of each appended batch (advanced
      even by zero-token docs), giving the same append-only-id
      reconcile contract as the curated signature index: ids above the
      stats max are exactly the unindexed rows.

    df(t) needs no table of its own: postings hold one row per (doc,
    tok), so df is a conditional count over the docs that matched —
    identical to the from-scratch aggregate's df, because every doc
    containing t is in the matched frame by construction.

    Search returns bit-identical scores to ``bm25_scores`` on the same
    corpus (same conditional-sum pivot, same term order in the score
    sum, avgdl = sum/count in both — pinned by an equality test), so
    the oracle-gated entry can replay ONE SQL ranking for both paths.

    Maintenance: ``curated_ingest_to_store(bm25_maintain=...)`` appends
    each admitted batch's postings + stats partial (O(batch) work) and
    heals crash-lost appends through the id watermark; ``compact()``
    folds the per-batch small files (write-new → Hadoop-FS swap, same
    absence-is-safe recovery argument as the signature index).
    """

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", root):
            root = "file://" + os.path.abspath(root)
        self.spark = spark
        self.root = root.rstrip("/")
        self.postings_dir = self.root + "/postings"
        self.stats_dir = self.root + "/stats"
        self.n_buckets = int(n_buckets)

    # -- build / maintain ---------------------------------------------------

    def _postings(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """(tok, doc_id, tf, dl, tok_bucket) for one batch of docs — one
        explode + one doc-keyed shuffle (the window shares the groupBy's
        partitioning, so dl costs no second exchange)."""
        from deployment_spark.operators.dedup import spread_for_cpu

        toks = (
            spread_for_cpu(df)
            .select(
                F.col(id_col).alias("doc_id"),
                F.explode(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
                ).alias("tok"),
            )
            .filter(F.col("tok") != "")
        )
        per = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
        w = Window.partitionBy("doc_id")
        return per.withColumn("dl", F.sum("tf").over(w)).withColumn(
            "tok_bucket",
            (F.crc32(F.encode(F.col("tok"), "utf-8")) % self.n_buckets).cast("int"),
        )

    def _append_stats(self, df: DataFrame, postings: DataFrame, id_col: str) -> None:
        # max SEEN id comes from the INPUT batch (zero-token docs must
        # advance the reconcile watermark); n/sum_dl from the postings'
        # per-doc lengths (zero-token docs are not documents to BM25,
        # matching bm25_scores' stats row exactly)
        row = (
            postings.select("doc_id", "dl")
            .dropDuplicates(["doc_id"])
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
            )
            .crossJoin(df.agg(F.max(F.col(id_col)).cast("long").alias("max_doc_id")))
        )
        row.coalesce(1).write.mode("append").parquet(self.stats_dir)

    def build(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> "BM25Index":
        """One-shot index build (overwrite). O(corpus) once — every
        search afterwards is O(query-term postings)."""
        postings = self._postings(df, text_col, id_col)
        (
            postings.repartition("tok_bucket")
            .write.mode("overwrite")
            .partitionBy("tok_bucket")
            .parquet(self.postings_dir)
        )
        jvm = self.spark.sparkContext._jvm
        hp = jvm.org.apache.hadoop.fs.Path
        fs = hp(self.stats_dir).getFileSystem(
            self.spark.sparkContext._jsc.hadoopConfiguration()
        )
        fs.delete(hp(self.stats_dir), True)
        self._append_stats(df, postings, id_col)
        return self

    def append(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> None:
        """O(batch) incremental append under the append-only id contract
        (new ids strictly above every indexed id — the curated-ingest
        invariant). Postings land first, the stats partial (carrying the
        reconcile watermark) last, so a crash between the two re-appends
        the batch on reconcile rather than losing it: postings for a
        doc id above the stats max are ignored by scoring only until
        the reconcile re-lands them — and the RE-APPENDED rows would
        double-count, so reconcile deletes orphans first (see
        ``reconcile``)."""
        postings = self._postings(df, text_col, id_col).localCheckpoint()
        (
            postings.repartition("tok_bucket")
            .write.mode("append")
            .partitionBy("tok_bucket")
            .parquet(self.postings_dir)
        )
        self._append_stats(df, postings, id_col)

    def exists(self) -> bool:
        try:
            self.spark.read.parquet(self.stats_dir).limit(1).collect()
            return True
        except Exception:
            return False

    def max_indexed_id(self) -> int | None:
        if not self.exists():
            return None
        return (
            self.spark.read.parquet(self.stats_dir)
            .agg(F.max("max_doc_id"))
            .collect()[0][0]
        )

    def reconcile(
        self, kept: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> int:
        """Heal crash-lost appends: index every kept row whose id is
        above the stats watermark (append-only ids ⇒ exactly the
        unindexed tail). Postings that landed without their stats row
        (crash between the two writes) are dropped first so the re-run
        cannot double-count a doc. Returns rows re-indexed."""
        hi = self.max_indexed_id()
        missing = kept if hi is None else kept.filter(F.col(id_col) > hi)
        if missing.isEmpty():
            return 0
        if self._has_postings():
            orphans = (
                self.spark.read.parquet(self.postings_dir)
                .filter(F.col("doc_id") > (hi if hi is not None else -(1 << 62)))
            )
            if not orphans.isEmpty():
                keep = self.spark.read.parquet(self.postings_dir).filter(
                    F.col("doc_id") <= (hi if hi is not None else -(1 << 62))
                )
                self._swap_postings(keep)
        n = missing.count()
        self.append(missing, text_col=text_col, id_col=id_col)
        return n

    def _has_postings(self) -> bool:
        try:
            self.spark.read.parquet(self.postings_dir).limit(1).collect()
            return True
        except Exception:
            return False

    def _swap_postings(self, df: DataFrame) -> None:
        jvm = self.spark.sparkContext._jvm
        hp = jvm.org.apache.hadoop.fs.Path
        fs = hp(self.postings_dir).getFileSystem(
            self.spark.sparkContext._jsc.hadoopConfiguration()
        )
        tmp = self.postings_dir + ".compacting"
        old = self.postings_dir + ".old"
        fs.delete(hp(tmp), True)
        (
            df.repartition("tok_bucket")
            .write.mode("overwrite")
            .partitionBy("tok_bucket")
            .parquet(tmp)
        )
        fs.delete(hp(old), True)
        fs.rename(hp(self.postings_dir), hp(old))
        fs.rename(hp(tmp), hp(self.postings_dir))
        fs.delete(hp(old), True)

    def compact(self, target_rows_per_file: int = 1_000_000) -> None:
        """Fold per-batch small files: postings rewritten right-sized per
        bucket (write-new → FS swap; a crash in the window loses the
        index entirely, which reconcile rebuilds — absence is safe),
        stats partials merged to one row."""
        df = self.spark.read.parquet(self.postings_dir)
        n = df.count()
        files = max(1, math.ceil(n / target_rows_per_file))
        self._swap_postings(df.repartition(files, "tok_bucket"))
        stats = (
            self.spark.read.parquet(self.stats_dir)
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("sum_dl").cast("long").alias("sum_dl"),
                F.max("max_doc_id").cast("long").alias("max_doc_id"),
            )
        )
        jvm = self.spark.sparkContext._jvm
        hp = jvm.org.apache.hadoop.fs.Path
        fs = hp(self.stats_dir).getFileSystem(
            self.spark.sparkContext._jsc.hadoopConfiguration()
        )
        tmp = self.stats_dir + ".compacting"
        old = self.stats_dir + ".old"
        fs.delete(hp(tmp), True)
        stats.coalesce(1).write.mode("overwrite").parquet(tmp)
        fs.delete(hp(old), True)
        fs.rename(hp(self.stats_dir), hp(old))
        fs.rename(hp(tmp), hp(self.stats_dir))
        fs.delete(hp(old), True)

    # -- search ---------------------------------------------------------

    def search_scores(
        self, query_terms: list[str], k1: float = 1.2, b: float = 0.75
    ) -> DataFrame:
        """Per-document BM25 for a literal term list, from the index:
        bit-identical output contract to ``bm25_scores`` ((doc_id, dl,
        matched_terms, bm25), matched docs only) at O(query-term
        postings) cost. The scan carries BOTH the partition filter
        (tok_bucket IN literal buckets — driver-computed via the pinned
        crc32 twin) and the pushed tok IN filter; the aggregate pivots
        per-term tfs by doc exactly like the from-scratch path, df comes
        from the same matched frame, N/avgdl from the O(appends) stats
        partials."""
        if not query_terms:
            raise ValueError("query_terms must be non-empty")
        if not self.exists():
            # fail with the library's contract, not a raw path error —
            # callers distinguish "no index here" from a corrupt one
            raise FileNotFoundError(
                f"no BM25 index at {self.root}: build() or append() first "
                "(curated ingest with bm25_maintain creates one on the "
                "first admitted batch)"
            )
        terms = list(dict.fromkeys(t.lower() for t in query_terms))
        buckets = sorted({bm25_bucket(t, self.n_buckets) for t in terms})
        hits = (
            self.spark.read.parquet(self.postings_dir)
            .filter(F.col("tok_bucket").isin(buckets))
            .filter(F.col("tok").isin(terms))
        )
        per_doc = hits.groupBy("doc_id").agg(
            F.max("dl").alias("dl"),
            *[
                F.coalesce(
                    F.sum(F.when(F.col("tok") == t, F.col("tf"))), F.lit(0)
                ).alias(f"_tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        stats = (
            self.spark.read.parquet(self.stats_dir)
            .agg(
                F.sum("n_docs").cast("long").alias("_n"),
                (
                    F.sum("sum_dl").cast("double") / F.sum("n_docs").cast("double")
                ).alias("_avgdl"),
            )
            .crossJoin(
                per_doc.agg(
                    *[
                        F.sum((F.col(f"_tf{i}") > 0).cast("int")).alias(f"_df{i}")
                        for i in range(len(terms))
                    ]
                )
            )
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
            return F.when(tf > 0, idf * tf * F.lit(k1 + 1.0) / norm).otherwise(
                F.lit(0.0)
            )

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
            .select("doc_id", "dl", "matched_terms", "bm25")
        )

    def topk(
        self,
        query_terms: list[str],
        k: int = 20,
        k1: float = 1.2,
        b: float = 0.75,
        round_to: int | None = None,
    ) -> DataFrame:
        """Index-backed twin of ``bm25_topk`` — same output contract."""
        scored = self.search_scores(query_terms, k1=k1, b=b)
        if round_to is not None:
            scored = scored.withColumn("bm25", F.round("bm25", round_to))
        top = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
        return top.withColumn("rank", F.row_number().over(w)).select(
            "doc_id", "dl", "matched_terms", "bm25", "rank"
        )
