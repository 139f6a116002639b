"""Deduplication operators for training-data pipelines (SURVEY §7.1 M8).

Five families, each a DataFrame-in/DataFrame-out operator:

- exact:      content-hash groupBy, keep lowest-key row
- minhash:    MinHash signatures + LSH banding → candidate pairs
- simhash:    64-bit SimHash + hamming-ball candidate pairs
- jaccard:    word-n-gram Jaccard over explode-join (exact verify step)
- embedding:  cosine near-dup (see operators.similarity)

Scale shape: everything shuffles on content keys (hash, band signature,
shingle, simhash block) — never on the O(N²) pair space. The standard
pipeline is minhash/simhash → candidate pairs → exact jaccard verify →
connected components → keep one doc per component.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deployment_spark.functions.text import tokens, word_shingles


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism when the input arrives
    in fewer partitions than cores. Small single-row-group parquet files
    scan as ONE task, which would serialize the CPU-heavy map work
    (hashing, shingling) that follows; the ~MB-scale exchange this adds is
    noise next to 32× parallelism. At 100 TB inputs already arrive in
    thousands of splits and this is a no-op.

    ``df.rdd`` here converts the plan but launches no job — measured
    ~25 ms on a warm session (r2); acceptable for a per-query setup
    cost."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5 content hash, keep the lowest-id row per hash.
    One hash-shuffle; at 100 TB this is the cheapest first pass."""
    w = Window.partitionBy("content_hash").orderBy(F.asc(id_col))
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _minhash_wide(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, shingle_words: int
) -> DataFrame:
    """Wide MinHash table (id, mh0..mh{H-1}) in ONE pass and ONE shuffle:
    explode shingles, hash each shingle against all H seeds in a single
    projection (each md5 computed exactly once), then per-doc column-wise
    min. Shingle rows stay partition-local until the groupBy, where
    map-side partial aggregation collapses them to one row per doc — so
    exchange volume is O(docs), independent of document length.

    (A shuffle-free array-expression formulation exists but Catalyst
    re-evaluates non-trivial subexpressions per reference inside
    higher-order lambdas, exploding runtime; the wide-agg shape is the
    fast one in practice.)"""
    # tokenize ONCE in a projection below the explode: the generator
    # expression references the token array shingle_words+1 times and
    # Generate evaluates interpreted with no CSE — a text-column input
    # would re-run the regex split that many times per row (r13,
    # word_shingles docstring)
    sh = (
        spread_for_cpu(df)
        .select(id_col, tokens(text_col).alias("_toks"))
        .select(
            id_col,
            F.explode(
                word_shingles(F.col("_toks"), shingle_words, from_tokens=True)
            ).alias("sh"),
        )
    )
    hs = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.md5(F.concat_ws("|", s.cast("string"), F.col("sh"))),
    )
    hashed = sh.select(id_col, hs.alias("hs"))
    return hashed.groupBy(id_col).agg(
        *[F.min(F.col("hs")[s]).alias(f"mh{s}") for s in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """MinHash signatures: hash h_s(doc) = min over shingles of
    md5(s || '|' || shingle). Lexicographic min of a salted cryptographic
    hash is a valid uniform MinHash (each seed induces an independent
    pseudo-random permutation of shingle space).

    Output: (id_col, seed, mh). Portable across engines (md5 only) so the
    DuckDB oracle can replay it exactly (queries.q_doc_minhash_lsh)."""
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_words)
    return wide.select(
        id_col,
        F.posexplode(F.array(*[F.col(f"mh{s}") for s in range(num_hashes)])).alias("seed", "mh"),
    )


def _band_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_words: int,
) -> DataFrame:
    """(id, band_id, sig) LSH band signatures — md5 over each band's
    rows of the wide MinHash table. Shared by the batch candidate join
    and the incremental kept×new join (same params ⇒ same buckets)."""
    rows_per_band = num_hashes // bands
    wide = _minhash_wide(df, text_col, id_col, num_hashes, shingle_words)
    return wide.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "sig"),
    ).withColumn("band_id", F.col("band_id").cast("long"))


def minhash_band_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
) -> DataFrame:
    """Public band-signature builder — (id, band_id, sig) — for
    maintaining a kept-corpus LSH signature INDEX alongside the kept
    set: compute once per admitted batch, append, and feed back into
    :func:`incremental_dedup` via ``kept_bands`` so the kept corpus's
    MinHash is never recomputed. For 100 TB kept sets persist it
    bucketed (``sources.io.write_bucketed``) so per-batch reads stay
    co-located. Same params ⇒ the same buckets the batch candidate
    join uses."""
    return _band_signatures(df, text_col, id_col, num_hashes, bands, shingle_words)


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Banded SimHash near-duplicate pairs (Manku et al., WWW 2007 —
    the web-scale simhash dedup construction): all (a, b), a < b, with
    Hamming distance ≤ ``max_hamming`` between 64-bit SimHashes. EXACT,
    not probabilistic: with B bands, any pair differing in ≤ B−1 bits
    leaves at least one band untouched (pigeonhole), so the band
    equi-join loses nothing when ``max_hamming ≤ bands − 1`` — enforced
    eagerly. This complements MinHash LSH: one 16-hex fingerprint per
    doc instead of a shingle explosion, candidate generation is a plain
    equi-join on (band_id, band_value), and verification is 16 nibble
    popcounts in whole-stage codegen — no shingle sets, no Jaccard.

    Shuffle shape: B rows per doc keyed by band value — content-keyed,
    never the pair space; bucket sizes bound the blowup exactly like
    ``minhash_lsh_candidates``. Uses the PORTABLE md5 simhash so the
    whole operator (fingerprint → bands → popcount) replays in ANSI SQL
    (driver-gated in the doc_hashes entry). Pass ``fingerprints``
    ((id, simhash)) to reuse a precomputed table.

    Output: (a_id, b_id, hamming LONG), a_id < b_id."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding guarantee broken: max_hamming {max_hamming} needs "
            f"at least {max_hamming + 1} bands (got {bands}) — pairs "
            "could differ in one bit per band and never collide"
        )
    if 16 % bands:
        raise ValueError(f"bands must divide the 16 hex nibbles, got {bands}")
    fp = (
        fingerprints
        if fingerprints is not None
        else simhash_portable(df, text_col, id_col)
    ).select(id_col, "simhash")
    width = 16 // bands
    bdf = fp.select(
        F.col(id_col).alias("_id"),
        F.col("simhash").alias("_sh"),
        F.posexplode(
            F.array(
                *[F.substring("simhash", b * width + 1, width) for b in range(bands)]
            )
        ).alias("band_id", "band_val"),
    )
    a, b = bdf.alias("a"), bdf.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("a_id"),
            F.col("a._sh").alias("_sa"),
            F.col("b._id").alias("b_id"),
            F.col("b._sh").alias("_sb"),
        )
        .distinct()
    )
    hamming = F.expr(
        " + ".join(
            f"bit_count(CAST(conv(substring(_sa, {i}, 1), 16, 10) AS INT)"
            f" ^ CAST(conv(substring(_sb, {i}, 1), 16, 10) AS INT))"
            for i in range(1, 17)
        )
    ).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def compact_signature_index(
    spark, index_dir: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Rewrite the kept-corpus signature index into few right-sized
    files. A long-running curated ingest appends one small parquet file
    set per batch; after thousands of batches the per-batch index READ
    pays file-open overhead proportional to batch COUNT, not index size
    — the classic small-files decay. Compaction is write-new → swap:
    the rewritten index lands beside the old one, then replaces it, so
    a concurrent reader sees either the old or the new file set. A
    crash in the swap window can only lose the index ENTIRELY, which is
    safe by design: curated ingest treats an unreadable index as absent
    and the reconcile pass rebuilds it from the kept corpus (the same
    path that heals lost appends). The swap runs through the Hadoop
    FileSystem API resolved FROM the index path — curated ingest
    auto-invokes this on whatever filesystem ``index_dir`` lives on, and
    a driver-local ``os.rename`` would raise on the HDFS/S3 stores the
    index reads were explicitly hardened for (r6 ADVICE), failing the
    micro-batch. On object stores without native rename the FS shim
    copies — still correct under the absence-is-safe recovery argument.

    Scheme-less paths are pinned to the LOCAL filesystem (qualified as
    ``file://``) before FS resolution: on a cluster whose defaultFS is
    HDFS, a bare ``/tmp/idx`` would otherwise resolve against HDFS and
    the swap would operate on the wrong store — or fail — for paths
    that worked under the pre-r7 ``os.rename`` (r7 ADVICE). Remote
    indexes must be fully-qualified URIs (``hdfs://…``, ``s3a://…``),
    which is how curated ingest's own store paths arrive anyway.
    Returns the new file count."""
    import math
    import re

    if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", index_dir):
        index_dir = "file://" + os.path.abspath(index_dir)
    df = spark.read.parquet(index_dir)
    n = df.count()
    files = max(1, math.ceil(n / target_rows_per_file))
    jvm = spark.sparkContext._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    fs = hadoop_path(index_dir).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    tmp = index_dir.rstrip("/") + ".compacting"
    fs.delete(hadoop_path(tmp), True)
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    old = index_dir.rstrip("/") + ".old"
    fs.delete(hadoop_path(old), True)
    if not fs.rename(hadoop_path(index_dir), hadoop_path(old)):
        raise IOError(f"compact swap: rename {index_dir} -> {old} failed")
    if not fs.rename(hadoop_path(tmp), hadoop_path(index_dir)):
        raise IOError(f"compact swap: rename {tmp} -> {index_dir} failed")
    fs.delete(hadoop_path(old), True)
    return files


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
) -> DataFrame:
    """MinHash + LSH banding → candidate near-dup pairs (a_id < b_id).

    Docs sharing any band signature become candidates; with r rows per
    band, P(candidate) = 1 - (1 - J^r)^bands. One shuffle computes the
    signatures (see _minhash_wide); the only other exchange is the join
    on (band_id, signature) — group sizes bound the pair blowup, never
    N²."""
    band_sigs = _band_signatures(
        df, text_col, id_col, num_hashes, bands, shingle_words
    )
    a, b = band_sigs.alias("a"), band_sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit j of the fingerprint is
    the sign of Σ_tokens (±1 depending on bit j of xxhash64(token)).

    Pure Catalyst: explode tokens → per-token 64-bit hash → per-bit ±1
    vote via aggregate over bit positions → sign-pack. xxhash64 is
    Spark-side only, so correctness is covered by property tests
    (similar texts ⇒ small hamming distance), not the SQL oracle.

    Degenerate docs (empty / whitespace-only) emit NO fingerprint row —
    the same contract as :func:`simhash_portable`, so the two variants
    agree on every input.

    Output: (id_col, simhash LONG)."""
    toks = (
        spread_for_cpu(df)
        .select(id_col, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    hashed = toks.withColumn("th", F.xxhash64("tok"))
    # votes[j] = sum of +1/-1 for bit j across tokens
    votes = hashed.groupBy(id_col).agg(
        F.array(
            *[
                F.sum(
                    F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                ).alias(f"b{j}")
                for j in range(64)
            ]
        ).alias("votes")
    )
    # pack sign bits into one long: bit j set iff votes[j] > 0
    # (bit 63 is the sign bit: 1<<63 as two's-complement long is -2^63)
    packed = F.lit(0).cast("long")
    for j in range(64):
        bit_val = (1 << j) if j < 63 else -(2**63)
        packed = packed + F.when(
            F.element_at(F.col("votes"), j + 1) > 0, F.lit(bit_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(id_col, packed.alias("simhash"))


def simhash_portable(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash with an md5-derived token hash, emitted as a 16-char
    hex string — semantically identical to :func:`simhash` but every
    primitive (md5, substring, instr, integer div/mod) exists in ANSI SQL,
    so the result is oracle-checkable against DuckDB (the xxhash64 variant
    is Spark-only). Prefer :func:`simhash` in production: one 64-bit hash
    per token beats 64 per-bit expressions over a 32-char digest.

    Bit j of the fingerprint = sign of Σ_tokens ±1, where the vote is bit
    (j%4) of hex digit (j//4) of md5(token); nibble n of the output hex
    string packs bits 4n..4n+3. Docs with no tokens produce no row.
    """
    toks = (
        spread_for_cpu(df)
        .select(id_col, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("h", F.md5("tok"))
    )
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.expr(
                        f"((instr('0123456789abcdef', substring(h, {j // 4 + 1}, 1)) - 1)"
                        f" div {2 ** (j % 4)}) % 2 = 1"
                    ),
                    1,
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    nibbles = [
        F.substring(
            F.lit("0123456789abcdef"),
            sum(
                [
                    F.when(F.col(f"v{4 * n + i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
                    for i in range(4)
                ],
                F.lit(1),
            ),
            1,
        )
        for n in range(16)
    ]
    return votes.select(id_col, F.concat(*nibbles).alias("simhash"))


def hamming_distance(a, b):
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: block the 64-bit fingerprint into
    ``blocks`` segments; by pigeonhole, any pair within hamming distance
    < blocks shares at least one exact block — join on (block_idx, block
    value), then filter by true hamming distance. Shuffle key is the
    16-bit block value, never the pair space."""
    assert max_hamming < blocks, "pigeonhole guarantee needs max_hamming < blocks"
    bits = 64 // blocks
    sh = simhash(df, text_col, id_col)
    mask = (1 << bits) - 1
    blocked = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftright(F.col("simhash"), i * bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("blk"),
    ).select(id_col, "simhash", "blk.block_idx", "blk.block_val")
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            hamming_distance("a.simhash", "b.simhash").alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    threshold: float = 0.6,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity per pair (a_id < b_id,
    J ≥ threshold). With ``candidates`` (e.g. from LSH) only those pairs
    are verified. Without, candidates come from AllPairs/PPJoin-style
    prefix filtering: order each doc's shingles rarest-first (global
    frequency), keep only the first ``n - ceil(t·n) + 1``, and join
    prefix-to-prefix — by the prefix-filtering lemma (overlap ≥ α forces
    prefixes of length n - α + 1 to intersect, and J ≥ t gives overlap
    ≥ t·max(na, nb)), every qualifying pair shares a prefix shingle on
    BOTH sides. A pair size filter prunes further. Exact verification
    then runs on the candidate pairs via array_intersect. Result is
    identical to the naive all-pairs join, but the join touches only
    rare-leaning prefix tokens, not hot-token groups squared."""
    # Plan-shape notes (each measured at sf0.1, see also plans/audit):
    # - the shingle array feeds explode() INLINE and nothing else in that
    #   projection: any sibling expression over the array (e.g. size())
    #   gets hoisted above the Generate and re-evaluated once per exploded
    #   row, turning an O(docs) computation into O(shingles);
    # - per-doc shingle counts therefore come from a window count over the
    #   same doc_id exchange the prefix ranking already needs — free;
    # - freq is broadcast EXPLICITLY: the exploded side's size estimate is
    #   the pre-explode file size, so the planner otherwise broadcasts the
    #   big side.
    # r13: (a) null-drop the id EXPLICITLY — the prefix self-join pushes
    # isnotnull(id) into its branch's scan while the freq branch's scan
    # stays unfiltered, so the two shingle subtrees carry different
    # pushed filters. The explicit filter makes the pushed predicates
    # identical (a precondition for exchange reuse; the branches still
    # differ in projection placement, so the freq scan is not yet
    # deduped — the residual cost is one narrow scan+explode+partial
    # agg). Null ids can never appear in a FINAL pair (the a<b join
    # drops them) so the verified output is unchanged — but the shingle
    # frequency counts now exclude null-id docs, so the INTERMEDIATE
    # prefix candidate set can differ from the pre-r13 shape; candidate-
    # stage row counts are not apples-to-apples across versions (ADVICE
    # r13), only the array_intersect-verified pairs are. (b) tokenize
    # once below the explode — see word_shingles(from_tokens=True).
    base = spread_for_cpu(df).filter(F.col(id_col).isNotNull())
    tokd = base.select(id_col, tokens(text_col).alias("_toks"))
    grams = word_shingles(F.col("_toks"), shingle_words, from_tokens=True)
    docs = tokd.select(id_col, grams.alias("arr"))
    if candidates is not None:
        cand = candidates.select("a_id", "b_id")
    else:
        sh = tokd.select(id_col, F.explode(grams).alias("sh"))
        # count(id) not count(*): under the null-drop above they are
        # identical, and referencing the id keeps the freq branch's
        # column set equal to the prefix branch's, so the pruner cannot
        # strip the id below the spread exchange and de-canonicalize it
        # (the dsir is_target pattern) — with equal column sets AQE
        # reuses ONE corpus scan+union for both shingle subtrees
        freq = sh.groupBy("sh").agg(F.count(F.col(id_col)).alias("cnt"))
        wdoc = Window.partitionBy(id_col)
        w = wdoc.orderBy(F.asc("cnt"), F.asc("sh"))
        prefix = (
            sh.join(F.broadcast(freq), "sh")
            .withColumn("n_sh", F.count(F.lit(1)).over(wdoc))
            .withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1)
        )
        a, b = prefix.alias("a"), prefix.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                # J ≥ t is impossible outside t ≤ na/nb ≤ 1/t — prune early
                & (F.col("b.n_sh") >= F.ceil(F.lit(threshold) * F.col("a.n_sh")))
                & (F.col("a.n_sh") >= F.ceil(F.lit(threshold) * F.col("b.n_sh"))),
            )
            .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
            .distinct()
        )
    sa = docs.select(F.col(id_col).alias("a_id"), F.col("arr").alias("arr_a"))
    sb = docs.select(F.col(id_col).alias("b_id"), F.col("arr").alias("arr_b"))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("shared", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn("na", F.size("arr_a"))
        .withColumn("nb", F.size("arr_b"))
        .withColumn("jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def connected_components(
    pairs: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Connected components over near-dup pairs via large-star/small-star
    style min-label propagation, iterated TO FIXPOINT: each round, every
    node adopts the minimum label in its closed neighborhood; stop when a
    round changes zero labels (checked with one cheap count per round).

    Convergence needs at most O(longest chain) rounds — ``max_iters`` is
    a safety valve against pathological inputs, and hitting it raises
    rather than silently returning a half-merged labeling.

    Output: (node, label) — label = min node id of the component. Only
    nodes that appear in some pair are emitted (singletons are trivially
    their own component and don't need resolving)."""
    edges = (
        pairs.select(F.col("a_id").alias("x"), F.col("b_id").alias("y"))
        .unionByName(pairs.select(F.col("b_id").alias("x"), F.col("a_id").alias("y")))
        .distinct()
    )
    # edges joins into EVERY propagation round — materialize once, or
    # each iteration re-runs the whole upstream pair-generation pipeline
    # (LSH banding / Jaccard verify), multiplying the most expensive
    # stage by the round count. Measured r6: semantic_dedup at sf0.1
    # dropped 5.4 s → ~2 s with this checkpoint.
    edges = edges.localCheckpoint(eager=True)
    labels = edges.groupBy("x").agg(F.min("y").alias("nmin")).select(
        F.col("x").alias("node"),
        F.least(F.col("x"), F.col("nmin")).alias("label"),
    )
    labels = labels.localCheckpoint(eager=True)
    for it in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.y == labels.node, "inner")
            .groupBy("x")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = labels.join(neighbor_min, labels.node == neighbor_min.x, "left").select(
            F.col("node"),
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            # the convergence flag rides IN the propagation pass (r13):
            # the label changed iff the neighborhood min undercut it —
            # carrying one boolean through the checkpoint replaces the
            # old-vs-new labels join the convergence count used to pay
            # (measured −0.13 s per resolve at sf0.1, labels identical)
            (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")).alias("_chg"),
        )
        # localCheckpoint: truncate the iterative lineage so each round's
        # plan stays O(1), not O(round) — and materialize once so the
        # convergence count below reads in-memory blocks.
        new_labels = new_labels.localCheckpoint(eager=True)
        # convergence count every OTHER round: dedup-pair graphs converge
        # in 1-3 rounds, and the count is a full extra job — checking on
        # odd rounds (and round 0 for the common single-round case)
        # halves the job count at worst one spare propagation round.
        if it == 0 or it % 2 == 1 or it == max_iters - 1:
            changed = new_labels.filter(F.col("_chg")).count()
            if changed == 0:
                return new_labels.select("node", "label")
        labels = new_labels.select("node", "label")
    raise RuntimeError(
        f"connected_components did not converge within max_iters={max_iters}; "
        "the pair graph has a chain longer than max_iters — raise it."
    )


def dedup_by_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id", max_iters: int = 50
) -> DataFrame:
    """Resolve near-dup pairs to a kept set: connected components via
    min-label propagation iterated to fixpoint (see
    :func:`connected_components`), then keep the minimum id per
    component. ``max_iters`` bounds the propagation rounds; deep chains
    beyond it raise instead of silently resolving wrong."""
    labels = connected_components(pairs, max_iters=max_iters)
    # survivors: nodes that are their own component min, plus every doc
    # not mentioned in any pair (trivial singleton components).
    losers = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def contamination_pairs(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    shingle_words: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Train/eval DECONTAMINATION — flag corpus documents that share at
    least ``min_shared`` word n-gram shingles with any benchmark/eval
    document (the published n-gram-overlap protocol; 13-grams in the
    original, ``shingle_words`` configurable for shorter documents).

    Spark plan: distinct shingles exploded on both sides → equi-join ON
    THE SHINGLE — shuffle keys are shingles, never doc pairs — → count
    per (corpus, bench) pair → threshold. The bench side is explicitly
    broadcast: eval suites are MBs while the corpus is the 100 TB side,
    so the corpus streams through a shuffle-free broadcast-hash join and
    the only exchange is the final pair-count aggregation, whose
    cardinality is bounded by actual contamination (tiny by
    construction).

    Output: (corpus_id, bench_id, shared_shingles ≥ min_shared).
    """
    # tokenize once below each explode (r13, word_shingles docstring)
    c_sh = (
        spread_for_cpu(corpus)
        .select(corpus_id, tokens(text_col).alias("_toks"))
        .select(
            corpus_id,
            F.explode(
                word_shingles(F.col("_toks"), shingle_words, from_tokens=True)
            ).alias("sh"),
        )
    )
    b_sh = bench.select(bench_id, tokens(text_col).alias("_toks")).select(
        bench_id,
        F.explode(
            word_shingles(F.col("_toks"), shingle_words, from_tokens=True)
        ).alias("sh"),
    )
    j = c_sh.join(F.broadcast(b_sh), "sh")
    return (
        j.groupBy(corpus_id, bench_id)
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= min_shared)
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN removal — the span-level complement of the
    document-level passes above, after the substring-dedup protocol of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): any ``span_words``-token window whose exact text occurs at
    least ``min_count`` times across the whole corpus is boilerplate, and
    every token it covers is dropped from every document that carries it.
    The reference corpus tooling has no counterpart (its dedup is
    row-exact only, ``FAISS/PlainDemo/pipeline.py:247``); this is the
    operator that removes licence headers / navigation chrome that
    MinHash (a whole-document similarity) cannot see.

    Spark plan, 100 TB shape — two content-keyed shuffles, no pair space:

    1. one pass builds (doc, position, token, span-shingle) rows, pure
       Catalyst, no UDF: the shingle array comes from a ``zip_with``
       reduction over ``span_words`` shifted slices of the token array
       (per-row array walks, O(span_words·tokens) per doc) — NOT from a
       per-element ``toks[i]`` lambda, which re-evaluates the regex
       split per element access (O(tokens²) per doc: harmless on
       100-token test docs, catastrophic on real multi-thousand-token
       documents);
    2. ``groupBy(shingle).count`` — partial map-side combine, so the
       exchange carries distinct shingles per task, not token rows;
       filtered to ``count >= min_count`` BEFORE the join so the dup
       table holds only actual boilerplate (tiny relative to corpus);
    3. LEFT join rows←dup-shingles ON the shingle. A join (not a
       count-over-window) on purpose: a mega-hot boilerplate shingle
       would pile a window's whole partition onto one task, while AQE
       splits a skewed join key automatically;
    4. per-doc coverage: a token at position j is removed iff some
       duplicated span starts in [j-span_words+1, j] — one ordered
       window + one groupBy, both on the doc key (Catalyst reuses the
       single doc-hash exchange for both).

    Output: (id, n_tokens, n_removed, clean_hash) where clean_hash is
    md5 of the surviving tokens joined by single spaces (NULL when the
    whole document was boilerplate) — value-checkable byte-for-byte.
    """
    from functools import reduce

    # tokenize ONCE in a projection below the posexplode: the generator
    # references the token array k+2 times and Generate evaluates
    # interpreted with no CSE, so a text-column input re-runs the regex
    # split that many times per row (r13, word_shingles docstring)
    toks = F.col("_toks")
    n = F.size(toks)
    k = span_words
    # m valid span starts; k shifted length-m slices zipped into the
    # shingle array; the final zip_with pads sh with NULL for the k-1
    # tail positions that start no span (zip_with extends the shorter
    # array with nulls)
    m = F.greatest(n - F.lit(k - 1), F.lit(0))
    shifted = [F.slice(toks, i + 1, m) for i in range(k)]
    sh_arr = reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: F.concat_ws(" ", x, y)),
        shifted,
    )
    pairs = F.zip_with(
        toks, sh_arr, lambda t, s: F.struct(t.alias("tok"), s.alias("sh"))
    )
    rows = (
        spread_for_cpu(df)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.posexplode(pairs).alias("pos", "s"),
        )
        .select(id_col, "pos", F.col("s.tok").alias("tok"), F.col("s.sh").alias("sh"))
    )

    dup = (
        rows.filter(F.col("sh").isNotNull())
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("sh", F.lit(1).alias("dup_start"))
    )
    flagged = rows.join(dup, "sh", "left").withColumn(
        "dup_start", F.coalesce(F.col("dup_start"), F.lit(0))
    )
    cov_w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    covered = flagged.withColumn("covered", F.max("dup_start").over(cov_w))
    kept_struct = F.when(F.col("covered") == 0, F.struct("pos", "tok"))
    out = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("covered").alias("n_removed"),
        F.sort_array(F.collect_list(kept_struct)).alias("_kept"),
    )
    clean = F.when(
        F.size("_kept") > 0,
        F.md5(F.array_join(F.transform("_kept", lambda s: s["tok"]), " ")),
    )
    return out.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_removed").cast("long").alias("n_removed"),
        clean.alias("clean_hash"),
    )


def incremental_dedup(
    new: DataFrame,
    kept: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.6,
    max_iters: int = 50,
    kept_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental corpus dedup — admit only the NEW documents that are
    neither exact nor near duplicates of the already-kept corpus or of
    each other. This is the operational mode a continuously-ingesting
    training-data pipeline actually runs: the batch chain
    (``minhash_lsh_candidates → ngram_jaccard_pairs → dedup_by_pairs``)
    re-pairs the whole corpus every time, while here **kept×kept pairs
    are never generated, verified, or propagated** — the per-batch cost
    is O(new + matched kept), which is what makes daily curation viable
    against a 100 TB kept corpus.

    CONTRACT: every kept id is smaller than every new id (append-only
    ingest ids). Under keep-lowest-id semantics incremental admission
    matches running the batch chain on kept ∪ new and keeping the
    difference — pinned by the equivalence test — with ONE documented
    semantic difference inherent to representative-based incremental
    dedup: new docs are compared against the KEPT representatives, not
    against previously-dropped near-dups, so a transitive chain that
    spans batches (new ~ dropped-old ~ kept while new ≁ kept) is
    dropped by the batch chain but admitted here. Every production
    incremental dedup (kept-set MinHash index) makes this trade; the
    divergence case is pinned explicitly in tests. Raises
    ``ValueError`` eagerly when the contract is violated (a silently
    wrong kept set is the one failure mode this operator must not
    have; the two-row id-range check is a bounded aggregate, not a
    corpus collect).

    Stages, all reusing the batch primitives (same params ⇒ same
    buckets/verdicts):

    1. exact: intra-batch keep-first, then md5 anti-join against the
       kept corpus's content hashes;
    2. near candidates: LSH band join kept×new (``_band_signatures``
       both sides — the kept side's signatures are recomputable or can
       be persisted by the caller) plus ``minhash_lsh_candidates`` over
       the new batch alone for new×new;
    3. verify: exact n-gram Jaccard on the candidate pairs only, over
       the TOUCHED docs (semi-join on candidate ids — the 100 TB kept
       corpus contributes only its matched rows to verification);
    4. admit: min-label propagation over the verified pairs; a new doc
       is dropped iff its component contains a kept doc (the incumbent
       always has the smaller id) or a smaller-id surviving new doc.

    Returns the admitted NEW rows with the columns of ``new``.
    """
    bounds = (
        kept.select(F.max(id_col).alias("hi"))
        .crossJoin(new.select(F.min(id_col).alias("lo")))
        .collect()
    )
    if bounds and bounds[0]["hi"] is not None and bounds[0]["lo"] is not None:
        if bounds[0]["hi"] >= bounds[0]["lo"]:
            raise ValueError(
                "incremental_dedup requires max(kept id) < min(new id) "
                f"(got kept max {bounds[0]['hi']} >= new min {bounds[0]['lo']})"
            )
    new_cols = new.columns

    # The asymmetry rule this body lives by: the KEPT side (corpus-
    # scale) may be SCANNED but never shuffled and never recomputed;
    # the NEW side (batch-scale) is localCheckpointed once per derived
    # frame and broadcast into every kept-side join. Each kept scan is
    # a broadcast-probe stage; every exchange in the plan is batch- or
    # candidate-sized. (The first cut anti-joined kept's hash set —
    # an O(kept) distinct SHUFFLE per batch — and re-derived the small
    # frames per consumer; measured SLOWER than the batch chain.)

    # 1. exact: intra-batch keep-first, then drop batch hashes that
    # exist in kept — kept streams through a broadcast semi-join
    # against the batch's hash set, and only the (batch-bounded)
    # matched hashes come back
    batch = exact_dedup(new, text_col, id_col).localCheckpoint()
    batch_hashes = batch.select("content_hash").distinct()
    matched_hashes = (
        kept.select(F.md5(F.col(text_col)).alias("content_hash"))
        .join(F.broadcast(batch_hashes), "content_hash", "left_semi")
        .distinct()
    )
    survivors = (
        batch.join(F.broadcast(matched_hashes), "content_hash", "left_anti")
        .drop("content_hash")
        .localCheckpoint()
    )

    # 2. near candidates: kept×new band join + new×new. The kept
    # signature index is scanned once, probing the broadcast batch
    # signatures; callers maintaining the index pass it via kept_bands
    # (build with minhash_band_signatures, same params) so the kept
    # MinHash computation isn't redone per batch either.
    kb = (
        kept_bands
        if kept_bands is not None
        else _band_signatures(kept, text_col, id_col, num_hashes, bands, shingle_words)
    ).alias("a")
    nb = _band_signatures(
        survivors, text_col, id_col, num_hashes, bands, shingle_words
    ).alias("b")
    cross = (
        kb.join(
            F.broadcast(nb),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )
    intra = minhash_lsh_candidates(
        survivors, text_col, id_col, num_hashes, bands, shingle_words
    )
    cand = cross.unionByName(intra).distinct().localCheckpoint()

    # 3. verify on touched docs only — kept contributes its matched
    # rows via one more broadcast-semi scan
    touched = (
        cand.select(F.col("a_id").alias(id_col))
        .unionByName(cand.select(F.col("b_id").alias(id_col)))
        .distinct()
    )
    corpus = (
        kept.select(id_col, text_col)
        .join(F.broadcast(touched), id_col, "left_semi")
        .unionByName(
            survivors.select(id_col, text_col).join(
                F.broadcast(touched), id_col, "left_semi"
            )
        )
        .localCheckpoint()
    )
    verified = ngram_jaccard_pairs(
        corpus,
        text_col,
        id_col,
        shingle_words=shingle_words,
        threshold=jaccard_threshold,
        candidates=cand,
    )

    # 4. admission
    return dedup_by_pairs(survivors, verified, id_col, max_iters=max_iters).select(
        *new_cols
    )
