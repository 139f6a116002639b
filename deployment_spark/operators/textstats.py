"""Text analysis operators for training-data pipelines (SURVEY §7.1 M8):
language-ID heuristic, quality scoring, token counting, fingerprinting.
All pure Catalyst expressions (regexp/length/split) — JVM-side, no UDFs.
"""

from __future__ import annotations

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
