"""Text analysis operators for training-data pipelines (SURVEY §7.1 M8):
language-ID heuristic, quality scoring, token counting, fingerprinting,
PII scrubbing, repetition metrics, normalization, chunking, script
detection. Pure Catalyst expressions (regexp/length/split/array) —
JVM-side, no UDFs — with ONE exception: compressibility scoring, which
inherently needs zlib and runs as an Arrow-batched pandas UDF.
"""

from __future__ import annotations

# pandas at module level ONLY because add_compressibility's pandas-UDF
# type hints ('pd.Series', postponed annotations) must resolve in module
# globals at decoration time; everything else here is UDF-free Catalyst.
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deployment_spark.functions.text import tokens

# stopword probe sets per language; hit counts drive the heuristic
LANG_PROBES: dict[str, str] = {
    "en": r"\b(the|and|of|to)\b",
    "es": r"\b(el|la|de|que)\b",
    "de": r"\b(der|die|und|das)\b",
    "fr": r"\b(le|la|et|les)\b",
}


def token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(tokens(c)).cast("long")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token estimate: count word chunks of ≤4 chars plus
    number/punct runs — a cheap, deterministic BPE stand-in for budgeting
    token counts at corpus scale."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]")).cast("long")


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID with fixed priority tie-break
    (en > es > de > fr); 'unknown' when no probe hits."""
    hits = {
        lang: F.regexp_count(F.col(text_col), F.lit(p)).cast("long")
        for lang, p in LANG_PROBES.items()
    }
    best = F.greatest(*hits.values())
    pred = F.when(best == 0, "unknown")
    for lang in LANG_PROBES:
        pred = pred.when(hits[lang] == best, lang)
    out = df
    for lang, h in hits.items():
        out = out.withColumn(f"{lang}_hits", h)
    return out.withColumn("predicted_lang", pred)


def add_quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: token count, mean word length, stopword ratio,
    alpha ratio, composite quality_score ∈ [0, 1]."""
    n_tok = token_count(text_col).cast("double")
    n_chars = F.length(text_col).cast("double")
    stop_hits = F.regexp_count(F.col(text_col), F.lit(r"\b(the|a|of|and|to|in)\b")).cast("double")
    alpha_chars = F.length(F.regexp_replace(text_col, r"[^a-zA-Z]", "")).cast("double")
    # try_divide: empty/degenerate text yields NULL ratios instead of an
    # ANSI divide-by-zero failure killing the whole corpus job
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("mean_word_len", F.round(F.try_divide(alpha_chars, n_tok), 4))
        .withColumn("stopword_ratio", F.round(F.try_divide(stop_hits, n_tok), 4))
        .withColumn("alpha_ratio", F.round(F.try_divide(alpha_chars, n_chars), 4))
        .withColumn(
            "quality_score",
            F.round(
                F.least(n_tok / 100.0, F.lit(1.0)) * 0.5
                + F.try_divide(stop_hits, n_tok) * 0.3
                + F.try_divide(alpha_chars, n_chars) * 0.2,
                4,
            ),
        )
    )


def content_fingerprint(text: Column | str, k: int = 8) -> Column:
    """Document fingerprint: md5 of the k lexicographically smallest word
    4-gram hashes (a min-k sketch — rolling-hash winnowing's
    order-invariant cousin). Stable under small edits away from the
    selected grams; portable (md5 only)."""
    from deployment_spark.functions.text import word_shingles

    c = F.col(text) if isinstance(text, str) else text
    gram_hashes = F.transform(word_shingles(c, 4), lambda s: F.md5(s))
    smallest = F.slice(F.array_sort(gram_hashes), 1, k)
    return F.md5(F.array_join(smallest, "|"))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop: token counts, quality metrics, lang id, fingerprint."""
    out = add_quality_metrics(df, text_col)
    out = add_lang_id(out, text_col)
    return out.withColumn("fingerprint", content_fingerprint(text_col)).withColumn(
        "n_tokens_bpe", bpe_ish_token_count(text_col)
    )


# ---------------------------------------------------------------------------
# PII scrubbing + repetition metrics (training-data cleaning, SURVEY §7.1 M8)
# ---------------------------------------------------------------------------

# Patterns are deliberately lookaround-free so the exact same regex runs
# under Java regex (Spark) and RE2 (DuckDB oracle) with identical matches.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"(\+?[0-9]{1,2}[\s.-]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
}
# Replacement order matters: emails first (their domains contain dots that
# the ip pattern would otherwise chew on), then ips (digit.dot runs), then
# phones (bare digit runs).
_PII_ORDER = ["email", "ip", "phone"]


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Redact emails / IPv4s / phone numbers with <EMAIL>/<IP>/<PHONE>
    placeholders and record per-kind match counts (n_email, n_ip,
    n_phone) for audit. Pure Catalyst regexp — codegen'd, linear scan,
    no UDFs; the shuffle-free shape every 100 TB cleaning pass wants.

    Counts are taken on the PROGRESSIVELY-REDACTED text (email count on
    the original, ip count after emails are gone, phone count after ips
    are gone), so each count equals the number of placeholders of that
    kind actually inserted — a phone-shaped local part consumed by an
    email match is not double-reported as a phone."""
    out_col = out_col or f"{text_col}_clean"
    out = df
    stage = F.col(text_col)
    for kind in _PII_ORDER:
        out = out.withColumn(
            f"n_{kind}",
            F.regexp_count(stage, F.lit(PII_PATTERNS[kind])).cast("long"),
        )
        stage = F.regexp_replace(stage, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out.withColumn(out_col, stage)


# HTML stripping (r7 — VERDICT r6 next #6): the one widely-used
# pretraining-cleanup step the text family lacked. jusText/trafilatura-
# style in spirit, expressed as the same shuffle-free Catalyst regex/
# array projections as scrub_pii. The pattern constants are SHARED with
# the DuckDB oracle builder in queries.py so the two engines can never
# drift: every pattern is RE2-compatible (no backreferences, no
# lookaround) AND Java-regex-compatible, with inline (?is) flags.
HTML_BLOCK_PATTERNS: list[str] = [
    # script/style bodies are payload, not text; comments likewise.
    # Two patterns instead of <(script|style)>...</\1> because RE2 (the
    # DuckDB oracle's engine) has no backreferences.
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
]
# closing block-level tags and <br> become newlines so the line-level
# boilerplate filter sees the document's visual line structure
HTML_BREAK_PATTERN = (
    r"(?i)</(?:p|div|h[1-6]|li|tr|ul|ol|table|blockquote"
    r"|title|head|html|body|header|footer|section|article|nav)>|<br[^>]*>"
)
HTML_TAG_PATTERN = r"<[^>]*>"
# fixed entity set, unescaped AFTER tag stripping (standard order: an
# escaped '&lt;tag&gt;' must surface as literal text, never as a tag).
# '&amp;' goes last so it cannot manufacture new entities.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]
HTML_MIN_LINE_WORDS = 4  # jusText-lite: shorter lines without terminal
HTML_LINE_PUNCT = r"[.!?]$"  # punctuation are nav/footer boilerplate


def strip_html(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Strip tags and drop boilerplate lines from HTML-ish text — the
    standard first pass over crawled pretraining data. Stages (each a
    codegen regexp/array projection; one linear scan, zero Python,
    zero shuffles):

    1. remove ``<script>``/``<style>`` bodies and HTML comments;
    2. turn closing block tags and ``<br>`` into newlines (preserves
       the visual line structure the boilerplate filter needs);
    3. strip every remaining tag;
    4. unescape the fixed entity set (after tag-stripping, so escaped
       markup stays text);
    5. per line: collapse whitespace, trim, drop empty lines, then
       drop lines with fewer than ``HTML_MIN_LINE_WORDS`` words that
       don't end in sentence punctuation — the jusText-lite heuristic
       that removes nav/footer/menu fragments while keeping headlines
       that end a sentence;
    6. re-join kept lines with newlines.

    Adds: ``out_col`` (cleaned text), ``n_tags`` (tags stripped),
    ``n_lines_kept``, ``n_lines_dropped`` (boilerplate lines removed;
    empty lines count as structure, not content, and are excluded from
    both). Mirrored 1:1 by the DuckDB oracle via the shared pattern
    constants (queries.py _strip_html_sql)."""
    out_col = out_col or f"{text_col}_clean"
    stage = F.col(text_col)
    n_tags = F.regexp_count(stage, F.lit(HTML_TAG_PATTERN)).cast("long")
    for pat in HTML_BLOCK_PATTERNS:
        stage = F.regexp_replace(stage, pat, "")
    stage = F.regexp_replace(stage, HTML_BREAK_PATTERN, "\n")
    stage = F.regexp_replace(stage, HTML_TAG_PATTERN, " ")
    for ent, rep in HTML_ENTITIES:
        stage = F.replace(stage, F.lit(ent), F.lit(rep))
    lines = F.transform(
        F.split(stage, "\n"),
        lambda l: F.trim(F.regexp_replace(l, r"\s+", " ")),
    )
    nonempty = F.filter(lines, lambda l: F.length(l) > 0)
    kept = F.filter(
        nonempty,
        lambda l: (F.size(F.split(l, " ")) >= HTML_MIN_LINE_WORDS)
        | l.rlike(HTML_LINE_PUNCT),
    )
    return (
        df.withColumn("n_tags", n_tags)
        .withColumn("_nonempty", nonempty)
        .withColumn("_kept", kept)
        .withColumn("n_lines_kept", F.size("_kept").cast("long"))
        .withColumn(
            "n_lines_dropped",
            (F.size("_nonempty") - F.size("_kept")).cast("long"),
        )
        .withColumn(out_col, F.array_join("_kept", "\n"))
        .drop("_nonempty", "_kept")
    )


def add_compressibility(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Compression-ratio quality signal — the classic boilerplate/spam
    detector (highly compressible text = repetitive templates; near 1.0
    = high-entropy noise). zlib level 6 over utf-8 bytes via an
    Arrow-batched pandas UDF (zlib is stdlib — no external dep); this is
    one of the few per-row ops that genuinely needs Python, and it stays
    batched and partition-parallel.

    Adds ``compress_ratio`` = compressed/raw bytes (NULL for empty)."""
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    return df.withColumn("compress_ratio", F.round(ratio(F.col(text_col)), 4))


SCRIPT_RANGES: dict[str, str] = {
    # codepoint classes, shared verbatim with the DuckDB oracle
    "latin": r"[A-Za-z]",
    "cyrillic": r"[Ѐ-ӿ]",
    "greek": r"[Ͱ-Ͽ]",
    "cjk": r"[一-鿿]",
    "arabic": r"[؀-ۿ]",
}


def add_script_detection(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode-script profile: per-script character counts plus the
    dominant script (most chars; fixed priority order on ties; 'other'
    when nothing matches). The cheap first routing step of multilingual
    pipelines — pure Catalyst regexp_count, shuffle-free."""
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        for name, pat in SCRIPT_RANGES.items()
    }
    best = F.greatest(*counts.values())
    dom = F.when(best == 0, "other")
    for name in SCRIPT_RANGES:
        dom = dom.when(counts[name] == best, name)
    out = df
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c)
    return out.withColumn("dominant_script", dom)


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window token chunking — the context-window splitter every
    RAG / training-sample pipeline runs: overlapping chunks of
    ``window_tokens`` whitespace tokens advancing by ``stride``
    (overlap = window − stride). Pure Catalyst: tokenize once, generate
    chunk start offsets with ``sequence``, slice + rejoin per offset,
    explode. Per-row work, shuffle-free; chunk counts scale with doc
    length, not corpus size.

    Output: (id_col, chunk_id, n_chunk_tokens, chunk). The final chunk is
    the remainder (may be shorter); empty docs produce zero chunks."""
    if stride <= 0 or window_tokens <= 0:
        raise ValueError("window_tokens and stride must be positive")
    # let-bind the token array via a single-element transform wrapper so
    # the tokenizing split runs once per row — a bare per-start lambda
    # doing slice(toks, s, window) would re-evaluate the split per start
    # (lambdas run interpreted, no subexpression elimination)
    bound = F.array(F.struct(tokens(text_col).alias("t")))
    chunks = F.get(
        F.transform(
            bound,
            lambda b: F.filter(
                F.transform(
                    # starts: 1, 1+stride, ... while start <= n (1-based
                    # slice); a doc shorter than one window still yields
                    # exactly one chunk
                    F.sequence(
                        F.lit(1), F.greatest(F.size(b["t"]), F.lit(1)), F.lit(stride)
                    ),
                    lambda s: F.struct(
                        ((s - 1) / stride).cast("long").alias("chunk_id"),
                        F.slice(b["t"], s, window_tokens).alias("_toks"),
                    ),
                ),
                # drop phantom trailing windows fully covered by the
                # previous one
                lambda c: (F.size(c["_toks"]) > 0)
                & (
                    (c["chunk_id"] == 0)
                    | (F.size(c["_toks"]) > window_tokens - stride)
                ),
            ),
        ),
        0,
    )
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(id_col, F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c._toks").cast("long").alias("n_chunk_tokens"),
            F.array_join("c._toks", " ").alias("chunk"),
        )
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    strip_punct: bool = True,
) -> DataFrame:
    """Canonicalization pass that precedes every dedup/fingerprint step:
    lowercase → (optionally) strip punctuation → collapse whitespace
    runs → trim. Deterministic, engine-portable (lower/regexp only — no
    locale/ICU dependence), so exact-dedup after normalization gives the
    same groups on any engine; per-row Catalyst, shuffle-free."""
    out_col = out_col or f"{text_col}_norm"
    c = F.lower(F.col(text_col))
    if strip_punct:
        c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c)


def add_repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition — the classic low-quality-text signal
    (boilerplate, keyword stuffing, degenerate generations):

    - ``dup_word_ratio``   = 1 − distinct words / words
    - ``dup_bigram_ratio`` = 1 − distinct word-bigrams / bigrams

    All array expressions (split / transform / array_distinct) — JVM-side,
    per-row, no shuffle. NULL for degenerate docs (< 1 word / < 2 words)
    via try_divide rather than an ANSI division failure."""
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    nd = F.size(F.array_distinct(toks)).cast("double")
    bigrams = F.zip_with(
        toks, F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # zip_with pads the shorter side with NULL -> drop the trailing pad
    bigrams = F.filter(bigrams, lambda x: x.contains(" "))
    nb = F.size(bigrams).cast("double")
    nbd = F.size(F.array_distinct(bigrams)).cast("double")
    return (
        df.withColumn("n_words", n.cast("long"))
        .withColumn("dup_word_ratio", F.round(F.lit(1.0) - F.try_divide(nd, n), 4))
        .withColumn("dup_bigram_ratio", F.round(F.lit(1.0) - F.try_divide(nbd, nb), 4))
    )


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 2,
    salt_buckets: int = 8,
) -> DataFrame:
    """Corpus-statistics quality scoring — the unigram language-model
    filter (the CCNet/Gopher-style move: score each document by how
    probable its tokens are under the corpus's own distribution; gibberish,
    boilerplate keys, and wrong-language text score low). Unlike the
    row-local signals above, this NEEDS corpus state:

    1. one explode + groupBy(doc, token) builds per-doc term frequencies
       — the (doc, token) key spreads stopword-heavy tokens across docs,
       so this first (and only) full-token-stream shuffle is skew-free
       by construction,
    2. the unigram table derives from the tf aggregate (sum of tf per
       token) and tf re-joins against it BY TOKEN — both exchanges move
       the doc×distinct-token aggregate, far smaller than the raw token
       stream. The join is SALTED (``salt_buckets``): tf keys by
       (token, hash(doc) % S) and each 1-row-per-token vocab row is
       replicated S ways, so a stopword key that would otherwise put
       one tf row per corpus document into a single partition spreads
       across S. AQE's OptimizeSkewedJoin can NOT cover this join — it
       pattern-matches Sort→ShuffleQueryStage on both sides, and the
       vocab side has its final HashAggregate between the two — so the
       salt is the load-bearing skew defense, not a belt-and-braces
       (verified in tests/test_textstats.py's planted-stopword test),
    3. per-doc tf-weighted mean log-probability + rare-token ratio
       (fraction of tokens seen ≤ ``rare_max_count`` times corpus-wide).

    The corpus is scanned and tokenized ONCE: the vocabulary build and
    the scoring join both consume the same ``tf`` aggregate, whose
    exchange Catalyst dedupes via ReuseExchange (asserted in
    tests/test_plans.py) — no cache/persist of an exploded token stream
    needed, which at 100 TB would be a second materialization. Caveat:
    reuse applies to fresh file scans (the production path); if ``df``
    is itself a CACHED DataFrame, AQE's table-cache stages don't
    canonicalize equal and the tf subtree recomputes per consumer —
    pre-aggregate and persist tf yourself in that interactive case.

    Output: (id_col, n_tokens, avg_logprob, rare_ratio). avg_logprob is
    ln-scale, ≤ 0, higher = more typical text.
    """
    from deployment_spark.operators.dedup import spread_for_cpu

    tf = (
        spread_for_cpu(df)
        .select(id_col, F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    s = max(int(salt_buckets), 1)
    # coalesce keeps the salt provably non-nullable: otherwise the join
    # infers isnotnull(_salt) and pushes it into ONE side's scan, which
    # de-duplicates the two tf subtrees and breaks ReuseExchange (the
    # single-scan property asserted in tests/test_plans.py)
    tf_salted = tf.withColumn(
        "_salt",
        F.coalesce(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(s)).cast("int"), F.lit(0)
        ),
    )
    vocab_salted = vocab.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(s - 1)))
    )
    scored = tf_salted.join(vocab_salted, ["tok", "_salt"]).crossJoin(
        F.broadcast(total)
    )
    n_tok = F.sum("tf")
    return scored.groupBy(id_col).agg(
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.col("tf") * F.log(F.col("c") / F.col("n"))) / n_tok, 4
        ).alias("avg_logprob"),
        F.round(
            F.sum(
                F.when(F.col("c") <= rare_max_count, F.col("tf")).otherwise(F.lit(0))
            )
            / n_tok,
            4,
        ).alias("rare_ratio"),
    )
