"""DSIR importance selection (operators/selection) and duplicated-span
removal (operators/dedup.span_dedup) — the r5 curation additions."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from deployment_spark.operators.dedup import span_dedup
from deployment_spark.operators.selection import (
    dsir_select,
    dsir_weights,
    hashed_ngram_features,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------- span dedup


def test_span_dedup_removes_planted_boilerplate(spark):
    boiler = "b1 b2 b3 b4 b5 b6 b7"  # 7 tokens → interior 5-gram dups
    rows = [
        (1, "u1 u2 u3 u4 u5 u6 " + boiler),
        (2, boiler + " v1 v2 v3 v4 v5 v6"),
        (3, "w1 w2 w3 w4 w5 w6 w7 w8"),  # untouched
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(df).collect()}
    # docs 1 and 2 lose exactly the 7 boilerplate tokens
    assert out[1]["n_tokens"] == 13 and out[1]["n_removed"] == 7
    assert out[2]["n_tokens"] == 13 and out[2]["n_removed"] == 7
    assert out[1]["clean_hash"] == _md5("u1 u2 u3 u4 u5 u6")
    assert out[2]["clean_hash"] == _md5("v1 v2 v3 v4 v5 v6")
    # unique doc untouched, hash of original text
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_hash"] == _md5("w1 w2 w3 w4 w5 w6 w7 w8")


def test_span_dedup_fully_boilerplate_doc_yields_null_hash(spark):
    boiler = "x1 x2 x3 x4 x5"
    df = spark.createDataFrame(
        [(1, boiler), (2, boiler)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in span_dedup(df).collect()}
    for i in (1, 2):
        assert out[i]["n_removed"] == out[i]["n_tokens"] == 5
        assert out[i]["clean_hash"] is None


def test_span_dedup_coverage_is_span_wide_not_start_only(spark):
    # duplicated span starts once per doc; all K tokens it covers must
    # go, including the K-1 positions after the start
    df = spark.createDataFrame(
        [(1, "a b c d e tail1 tail2"), (2, "a b c d e other stuff")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in span_dedup(df).collect()}
    assert out[1]["n_removed"] == 5
    assert out[1]["clean_hash"] == _md5("tail1 tail2")


def test_span_dedup_respects_min_count(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], ["doc_id", "text"]
    )
    out = span_dedup(df, min_count=3)
    assert all(r["n_removed"] == 0 for r in out.collect())


# ---------------------------------------------------------------------- dsir


def _corpus(spark):
    # target-vocab docs (lang=en), off-vocab docs (lang=xx), and one
    # UNLABELLED doc written in the target vocabulary — DSIR must rank
    # it above every off-vocab doc
    rows = (
        [(i, "alpha beta gamma delta " * 5, "en") for i in range(10)]
        + [(100 + i, "omega sigma tau upsilon " * 5, "xx") for i in range(10)]
        + [(500, "alpha beta gamma delta alpha beta", "xx")]
    )
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_dsir_target_like_doc_outranks_off_vocab(spark):
    d = _corpus(spark)
    w = {r["doc_id"]: r["log_weight"] for r in dsir_weights(
        d, F.col("lang") == "en"
    ).collect()}
    assert w[500] > max(w[100 + i] for i in range(10))


def test_dsir_select_ranks_are_dense_and_ordered(spark):
    d = _corpus(spark)
    top = dsir_select(d, F.col("lang") == "en", k=11).orderBy("rank").collect()
    assert [r["rank"] for r in top] == list(range(1, 12))
    weights = [r["log_weight"] for r in top]
    assert weights == sorted(weights, reverse=True)
    # the 11 selected = 10 target docs + the target-vocab impostor;
    # every off-vocab doc ranks below the cut
    ids = {r["doc_id"] for r in top}
    assert 500 in ids and not any(100 + i in ids for i in range(10))


def test_dsir_feature_count_is_2n_minus_1(spark):
    d = spark.createDataFrame([(1, "a b c d", "en")], ["doc_id", "text", "lang"])
    feats = hashed_ngram_features(d)
    assert feats.count() == 7  # 4 unigrams + 3 bigrams
    w = dsir_weights(d, F.col("lang") == "en").collect()[0]
    assert w["n_features"] == 7


def test_dsir_single_token_doc_has_no_bigrams(spark):
    d = spark.createDataFrame([(1, "solo", "en")], ["doc_id", "text", "lang"])
    assert hashed_ngram_features(d).count() == 1


def test_dsir_weights_portable_bucket_hash(spark):
    """The bucket hash must be the engine-portable md5 construction —
    pin one value so a silent switch to xxhash/crc breaks loudly."""
    feats = hashed_ngram_features(
        spark.createDataFrame([(1, "pinned", "en")], ["doc_id", "text", "lang"])
    ).collect()
    h = int(hashlib.md5(b"dsir|pinned").hexdigest()[:8], 16) % 512
    assert feats[0]["bucket"] == h


def test_span_dedup_universal_boilerplate_hot_shingle(spark):
    """Skew stress: EVERY doc carries the same boilerplate span, so one
    shingle key holds a corpus-wide hot partition. The docstring's
    scale claim is that the dup lookup is a JOIN (AQE-skew-splittable),
    not a window piling the hot key onto one task — here we pin the
    semantics under 100% duplication: every doc loses exactly the
    boilerplate tokens, unique remainders survive byte-exact."""
    import hashlib

    from deployment_spark.operators.dedup import span_dedup

    boiler = "b1 b2 b3 b4 b5 b6"
    n_docs = 500
    rows = [(i, f"u{i}a u{i}b {boiler} u{i}c") for i in range(n_docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = span_dedup(df).collect()
    assert len(out) == n_docs
    for r in out:
        assert r.n_tokens == 9 and r.n_removed == 6, r
        i = r.doc_id
        assert r.clean_hash == hashlib.md5(
            f"u{i}a u{i}b u{i}c".encode()
        ).hexdigest(), i


def test_dsir_resample_is_deterministic_and_weight_biased(spark):
    """Gumbel-top-k resampling: hash-seeded noise makes the 'sample'
    a pure function of (corpus, seed) — two calls agree exactly — and
    selection stays biased toward high-weight docs (mean selected
    weight above mean unselected) while admitting some diversity the
    plain top-k cut excludes."""
    from deployment_spark.operators.selection import dsir_resample, dsir_weights

    d = _corpus(spark)
    a = {(r.doc_id, r.rank) for r in dsir_resample(d, F.col("lang") == "en", k=8).collect()}
    b = {(r.doc_id, r.rank) for r in dsir_resample(d, F.col("lang") == "en", k=8).collect()}
    assert a == b and len(a) == 8
    w = {r.doc_id: r.log_weight for r in dsir_weights(d, F.col("lang") == "en").collect()}
    sel = {doc for doc, _ in a}
    unsel = set(w) - sel
    mean = lambda xs: sum(xs) / len(xs)
    assert mean([w[i] for i in sel]) > mean([w[i] for i in unsel])


def test_dsir_resample_seed_changes_sample(spark):
    """A different seed draws different Gumbel noise — the sample is
    seed-addressable, not an accident of partitioning."""
    from deployment_spark.operators.selection import dsir_resample

    d = _corpus(spark)
    a = {r.doc_id for r in dsir_resample(d, F.col("lang") == "en", k=8, seed="g1").collect()}
    b = {r.doc_id for r in dsir_resample(d, F.col("lang") == "en", k=8, seed="g2").collect()}
    assert a != b


def test_leakage_safe_splits_never_straddle(spark):
    """Near-duplicate pairs must always share a split; fractions track
    the weights; singletons hash on their own id; every doc assigned."""
    from deployment_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from deployment_spark.operators.selection import leakage_safe_splits

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    planted = docs.filter(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    alld = docs.unionByName(planted)
    cand = minhash_lsh_candidates(alld)
    pairs = ngram_jaccard_pairs(alld, candidates=cand).localCheckpoint()
    out = leakage_safe_splits(alld, pairs)
    rows = {r.doc_id: (r.label, r.split) for r in out.collect()}
    assert len(rows) == alld.count()  # every doc assigned
    # the no-leakage property: both ends of every verified pair share
    # label AND split
    for p in pairs.collect():
        assert rows[p.a_id] == rows[p.b_id], (p.a_id, p.b_id)
    # fractions roughly track 80/10/10 (component-level hashing over
    # ~500 labels: generous tolerance)
    from collections import Counter

    frac = Counter(s for _, s in rows.values())
    n = sum(frac.values())
    assert 0.68 < frac["train"] / n < 0.92
    assert frac["valid"] > 0 and frac["test"] > 0
