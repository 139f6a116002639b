"""Focused pins for the round-13 optimization changes (OPTIMIZATION_r13.md).

Each test pins the PLAN property an optimization bought, so a future
edit that silently regresses it fails here instead of surfacing as a
quiet bench regression a round later — the test_plans.py convention.
"""

from __future__ import annotations

import re
import shutil

import pytest
from pyspark.sql import functions as F

from deployment_spark.plans import audit


def _final(df) -> str:
    df.collect()  # AQE: inspect the FINAL executed plan
    return audit.physical_plan(df).split("== Initial Plan ==")[0]


def test_word_shingles_from_tokens_value_parity(spark, sf_dir):
    """word_shingles(from_tokens=True) over a pre-tokenized array column
    must produce exactly the text-input shingles — including the
    short-text single-shingle and empty-text conventions."""
    from deployment_spark.functions.text import tokens, word_shingles

    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b"), (3, "one"), (4, "  padded   text  here ")],
        ["id", "text"],
    )
    a = d.select("id", word_shingles("text", 3).alias("sh"))
    b = d.select("id", tokens("text").alias("_toks")).select(
        "id", word_shingles(F.col("_toks"), 3, from_tokens=True).alias("sh")
    )
    assert a.collect() == b.collect()


def test_shingle_generates_do_not_retokenize(spark, sf_dir, tmp_path):
    """The exploding shingle/feature consumers tokenize ONCE in a
    projection below the Generate: the generator expression references
    the token-array attribute, never the regex split — Generate
    evaluates interpreted with no common-subexpression elimination, so
    a split inside the generator re-runs per reference per row (the
    r13 optimization's core finding). Private table copy for the same
    cached-leaf reason as test_lm_score_single_tokenization."""
    from deployment_spark.operators.dedup import (
        minhash_signatures,
        ngram_jaccard_pairs,
        span_dedup,
    )
    from deployment_spark.operators.selection import dsir_weights

    path = str(tmp_path / "docs.parquet")
    shutil.copy(f"{sf_dir}/documents.parquet", path)
    d = spark.read.parquet(path).select("doc_id", "text")
    dl = spark.read.parquet(path).select("doc_id", "text", "lang")
    for df in (
        ngram_jaccard_pairs(d, shingle_words=3, threshold=0.6),
        minhash_signatures(d, num_hashes=4, shingle_words=3),
        span_dedup(d, span_words=5, min_count=2),
        dsir_weights(dl, F.col("lang") == "en"),
    ):
        final = _final(df)
        gens = [ln for ln in final.splitlines() if "Generate" in ln]
        assert gens, final
        assert sum("split(" in ln for ln in gens) == 0, gens


def test_ngram_prefix_and_freq_share_one_corpus_scan(spark, sf_dir, tmp_path):
    """ngram_jaccard_pairs' prefix-filter branch and its shingle-
    frequency branch must consume ONE shared corpus scan via exchange
    reuse (r13: the null-drop makes the pushed predicates identical and
    count(doc_id) keeps the column sets equal so the pruner cannot
    de-canonicalize the spread exchange). Verification side reuses the
    same exchange too — 1 file scan total in the executed plan."""
    from deployment_spark.operators.dedup import ngram_jaccard_pairs

    path = str(tmp_path / "docs.parquet")
    shutil.copy(f"{sf_dir}/documents.parquet", path)
    d = spark.read.parquet(path).select("doc_id", "text")
    out = ngram_jaccard_pairs(d, shingle_words=3, threshold=0.6)
    final = _final(out)
    n_scans = len(re.findall(r"FileScan|Scan parquet|Scan orc", final))
    assert n_scans == 1, final
    assert "ReusedExchange" in final, final


def test_hybrid_rankers_materialized_once(spark, sf_dir):
    """q_hybrid_search's fusions must consume the three MATERIALIZED
    ranked lists (localCheckpoint), not re-execute the rankers per
    fusion: the entry's final plan reads checkpointed RDDs only — zero
    file scans (r13: the one-DAG form re-ran each ranker's rank window
    up to 3x; at 100 TB that is 3x corpus rank passes per query)."""
    from deployment_spark.queries import q_hybrid_search

    out = q_hybrid_search(spark, sf_dir)
    final = _final(out)
    n_scans = len(re.findall(r"FileScan|Scan parquet|Scan orc", final))
    assert n_scans == 0, final
    assert "ExistingRDD" in final, final


def test_streaming_entry_restores_nodata_conf(spark, sf_dir):
    """q_streaming_hourly_counts scopes noDataMicroBatches=false to its
    own drain (r13) and must restore the caller's value — entries are
    order-independent and must not mutate session state (VERDICT r3 #3)."""
    from deployment_spark.queries import q_streaming_hourly_counts

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "true")
        q_streaming_hourly_counts(spark, sf_dir).count()
        assert spark.conf.get(key) == "true"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
