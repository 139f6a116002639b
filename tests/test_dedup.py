"""Dedup operator family (M8): exact, MinHash+LSH, SimHash, Jaccard,
pair-resolution. Golden facts are constructed: planted dup/near-dup rows
must be found; unrelated rows must not."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators import dedup


@pytest.fixture(scope="module")
def docs_with_dups(documents):
    base = documents.select("doc_id", "text")
    exact = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = base.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    return base.unionByName(exact).unionByName(near).cache()


def test_exact_dedup(docs_with_dups, documents):
    n_base = documents.count()
    kept = dedup.exact_dedup(docs_with_dups)
    assert kept.count() == n_base + 10  # near-dups survive exact dedup
    # every survivor of a planted exact-dup group is the original (lowest id)
    assert kept.filter(F.col("doc_id") >= 100000).filter(F.col("doc_id") < 200000).count() == 0


def test_minhash_lsh_finds_planted_neardups(docs_with_dups):
    pairs = dedup.minhash_lsh_candidates(docs_with_dups).cache()
    found = {(r.a_id, r.b_id) for r in pairs.collect()}
    # all exact dups must be candidates (J=1 ⇒ every band matches)
    for i in range(10):
        assert (i, i + 100000) in found
    # near-dups (one word dropped) should mostly surface
    near_hits = sum(1 for i in range(10, 20) if (i, i + 200000) in found)
    assert near_hits >= 8


def test_jaccard_verify_step(docs_with_dups):
    cands = dedup.minhash_lsh_candidates(docs_with_dups)
    verified = dedup.ngram_jaccard_pairs(
        docs_with_dups, threshold=0.6, candidates=cands
    ).collect()
    pairs = {(r.a_id, r.b_id): r.jaccard for r in verified}
    for i in range(10):
        assert pairs.get((i, i + 100000)) == pytest.approx(1.0)


def test_simhash_similar_texts_close(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),
        (3, "completely different words about spark clusters and shuffle partitions everywhere"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    d12 = bin(sh[1] ^ sh[2]).count("1")
    d13 = bin(sh[1] ^ sh[3]).count("1")
    assert d12 < d13
    assert d12 <= 12


def test_simhash_candidates_block_join(spark):
    # one replaced token out of 30 distinct words flips only the bits whose
    # vote margin was near zero — expect hamming well under random (~32)
    common = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu xi "
        "omicron pi rho sigma tau upsilon phi chi psi omega one two three four five"
    )
    rows = [
        (1, common + " kappz"),
        (2, common + " kappy"),
        (3, "totally different vocabulary about spark shuffle partitions and broadcast joins everywhere today"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.a_id, r.b_id)
        for r in dedup.simhash_candidates(df, max_hamming=12, blocks=16).collect()
    }
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_portable_matches_xxhash_variant_shape(spark):
    # portable (md5) simhash: identical texts → identical fingerprint;
    # near-identical → small hamming; disjoint vocab → large hamming
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank"),
        (4, "completely different words about spark clusters and shuffle partitions everywhere"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = {r.doc_id: r.simhash for r in dedup.simhash_portable(df).collect()}
    assert all(len(v) == 16 for v in sh.values())

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert sh[1] == sh[2]
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[4])


@pytest.mark.parametrize("impl", [dedup.simhash, dedup.simhash_portable])
def test_simhash_variants_drop_empty_docs(spark, impl):
    """Both variants agree on degenerate docs: empty / whitespace-only
    text emits NO fingerprint row (round-1 advice: the xxhash64 variant
    used to hash the empty token and emit one)."""
    df = spark.createDataFrame([(1, "some words here"), (2, "   "), (3, "")], ["doc_id", "text"])
    ids = {r.doc_id for r in impl(df).collect()}
    assert ids == {1}


def test_dedup_by_pairs_resolves_components(spark):
    df = spark.createDataFrame([(i, f"text {i}") for i in range(6)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], ["a_id", "b_id"])
    kept = sorted(r.doc_id for r in dedup.dedup_by_pairs(df, pairs).collect())
    assert kept == [0, 3, 5]


def test_dedup_by_pairs_deep_chain_fixpoint(spark):
    """A 12-deep chain (longer than the old hard-coded 5 passes) must
    still collapse to one component — propagation iterates to fixpoint,
    not a fixed round count."""
    n = 13
    df = spark.createDataFrame([(i, f"text {i}") for i in range(n + 3)], ["doc_id", "text"])
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["a_id", "b_id"])
    kept = sorted(r.doc_id for r in dedup.dedup_by_pairs(df, chain).collect())
    assert kept == [0, n, n + 1, n + 2]


def test_dedup_by_pairs_max_iters_raises_not_silent(spark):
    """Hitting max_iters raises — never a silently half-merged answer."""
    df = spark.createDataFrame([(i, f"text {i}") for i in range(40)], ["doc_id", "text"])
    chain = spark.createDataFrame([(i, i + 1) for i in range(39)], ["a_id", "b_id"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_by_pairs(df, chain, max_iters=2)


def test_connected_components_labels(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 2), (11, 12), (7, 3)], ["a_id", "b_id"]
    )
    labels = {r.node: r.label for r in dedup.connected_components(pairs).collect()}
    assert labels == {5: 2, 9: 2, 2: 2, 11: 11, 12: 11, 7: 3, 3: 3}


def test_contamination_pairs_flags_planted_overlap(spark):
    """Benchmark docs built from spans of corpus docs must flag their
    source (≥ min_shared shared 8-gram shingles); unrelated docs must
    not appear; and the bench side rides a broadcast join (the corpus is
    the 100 TB side — it must never shuffle on pairs)."""
    from deployment_spark.operators.dedup import contamination_pairs

    words = lambda i: " ".join(f"w{i}_{j}" for j in range(30))
    corpus = spark.createDataFrame(
        [(i, words(i)) for i in range(20)], ["doc_id", "text"]
    )
    # bench 0 = words 5..24 of doc 3; bench 1 = fresh text (no overlap)
    span = " ".join(f"w3_{j}" for j in range(4, 24))
    bench = spark.createDataFrame(
        [(100, span), (101, " ".join(f"fresh_{j}" for j in range(30)))],
        ["bench_id", "text"],
    )
    out = contamination_pairs(corpus, bench, shingle_words=8, min_shared=3)
    rows = {(r.doc_id, r.bench_id): r.shared_shingles for r in out.collect()}
    assert set(rows) == {(3, 100)}
    assert rows[(3, 100)] == 13  # 20-word span -> 13 distinct 8-grams
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _batch_chain(df, threshold=0.6):
    from deployment_spark.operators.dedup import (
        dedup_by_pairs,
        exact_dedup,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    e = exact_dedup(df).drop("content_hash")
    cand = minhash_lsh_candidates(e)
    ver = ngram_jaccard_pairs(e, threshold=threshold, candidates=cand)
    return dedup_by_pairs(e, ver)


def test_incremental_dedup_matches_batch_chain(spark, documents):
    """kept(U1) + incremental(U2 vs kept) must equal the batch chain on
    U1 ∪ U2 — exact copies, near copies (first word dropped), and an
    intra-batch dup planted across the batch boundary."""
    from pyspark.sql import functions as F2

    from deployment_spark.operators.dedup import incremental_dedup

    docs = documents.select("doc_id", "text")
    u1 = docs.filter(F2.col("doc_id") < 120)
    fresh = docs.filter((F2.col("doc_id") >= 120) & (F2.col("doc_id") < 180)).select(
        (F2.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    exact_copies = u1.filter(F2.col("doc_id") < 10).select(
        (F2.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    near_copies = u1.filter((F2.col("doc_id") >= 10) & (F2.col("doc_id") < 20)).select(
        (F2.col("doc_id") + 300000).alias("doc_id"),
        F2.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    intra = fresh.filter(F2.col("doc_id") == 100150).select(
        (F2.col("doc_id") + 400000).alias("doc_id"), "text"
    )
    u2 = fresh.unionByName(exact_copies).unionByName(near_copies).unionByName(intra)

    kept1 = _batch_chain(u1)
    kept1_ids = {r.doc_id for r in kept1.collect()}
    admitted = {r.doc_id for r in incremental_dedup(u2, kept1).collect()}
    batch_ids = {r.doc_id for r in _batch_chain(u1.unionByName(u2)).collect()}
    assert kept1_ids | admitted == batch_ids
    # the planted duplicates were all rejected
    assert not any(i >= 200000 for i in admitted)


def test_incremental_dedup_contract_violation_raises(spark):
    from deployment_spark.operators.dedup import incremental_dedup

    kept = spark.createDataFrame([(10, "a b c")], ["doc_id", "text"])
    new = spark.createDataFrame([(5, "d e f")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max.kept id"):
        incremental_dedup(new, kept).collect()


def test_incremental_dedup_transitive_chain_divergence_documented(spark):
    """The documented semantic difference, pinned: a transitive chain
    A(kept) ~ B(dropped in batch 1) ~ C(new), with A !~ C. The batch
    chain over everything drops C (one component with A); incremental
    admits C because B — C's only link — was never kept. Texts are
    fixed so the md5-band LSH deterministically catches A-B and B-C but
    not A-C (J = 0.71 / 0.71 / 0.50, threshold 0.6)."""
    from deployment_spark.operators.dedup import incremental_dedup

    base = [f"w{i}" for i in range(20)]
    A = " ".join(base)
    b = list(base); b[10] = "x0"; B = " ".join(b)
    c = list(b); c[3] = "y0"; C = " ".join(c)
    u1 = spark.createDataFrame([(1, A), (2, B)], ["doc_id", "text"])
    u2 = spark.createDataFrame([(10, C)], ["doc_id", "text"])

    kept1 = _batch_chain(u1)
    assert {r.doc_id for r in kept1.collect()} == {1}  # B dropped as A's near-dup
    admitted = {r.doc_id for r in incremental_dedup(u2, kept1).collect()}
    batch = {r.doc_id for r in _batch_chain(u1.unionByName(u2)).collect()}
    assert admitted == {10}  # incremental admits C (no kept link)
    assert batch == {1}      # batch drops C through the A-B-C chain


def test_incremental_dedup_with_precomputed_signature_index(spark, documents):
    """The operational mode: maintain a kept-corpus band-signature
    index, feed it back via kept_bands — results identical to
    recomputing, and the cross join must broadcast the new side (the
    kept index streams shuffle-free)."""
    from pyspark.sql import functions as F2

    from deployment_spark.operators.dedup import (
        incremental_dedup,
        minhash_band_signatures,
    )
    from deployment_spark.plans import audit

    docs = documents.select("doc_id", "text")
    u1 = docs.filter(F2.col("doc_id") < 100)
    u2 = docs.filter((F2.col("doc_id") >= 100) & (F2.col("doc_id") < 140)).select(
        (F2.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        u1.filter(F2.col("doc_id") < 5).select(
            (F2.col("doc_id") + 200000).alias("doc_id"), "text"
        )
    )
    kept1 = _batch_chain(u1)
    idx = minhash_band_signatures(kept1)
    with_idx = incremental_dedup(u2, kept1, kept_bands=idx)
    without = incremental_dedup(u2, kept1)
    assert {r.doc_id for r in with_idx.collect()} == {
        r.doc_id for r in without.collect()
    }
    assert audit.has_broadcast_join(with_idx)


def test_compact_signature_index_preserves_content(spark, tmp_path):
    """compact_signature_index: many per-batch appends → few files, same
    rows; the swap leaves either old or new layout, never a mix."""
    from deployment_spark.operators.dedup import (
        compact_signature_index,
        minhash_band_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    idx = str(tmp_path / "sig_idx")
    for lo in (0, 40, 80):
        minhash_band_signatures(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 40)
            )
        ).write.mode("append").parquet(idx)
    before = spark.read.parquet(idx)
    n_files_before = len(before.inputFiles())
    rows_before = sorted(
        (r.doc_id, r.band_id, r.sig) for r in before.collect()
    )
    n_new = compact_signature_index(spark, idx)
    after = spark.read.parquet(idx)
    assert len(after.inputFiles()) == n_new < n_files_before
    assert sorted((r.doc_id, r.band_id, r.sig) for r in after.collect()) == rows_before


def test_simhash_neardup_pairs_exact_vs_bruteforce(spark):
    """Banded simhash pairs must equal brute-force all-pairs Hamming at
    the guarantee boundary (hamming ≤ bands−1 is lossless by
    pigeonhole); exact copies land at hamming 0; an unsatisfiable
    (max_hamming, bands) combination is rejected eagerly."""
    import pytest as _pytest

    from deployment_spark.operators.dedup import (
        simhash_neardup_pairs,
        simhash_portable,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 120)
    planted = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    alld = docs.unionByName(planted)

    got = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_neardup_pairs(alld, max_hamming=3).collect()
    }
    # brute force from the same portable fingerprints
    fps = {r.doc_id: int(r.simhash, 16) for r in simhash_portable(alld).collect()}
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    # every planted exact copy pairs with its source at hamming 0
    for i in range(10):
        assert got.get((i, i + 100000)) == 0

    with _pytest.raises(ValueError):
        simhash_neardup_pairs(alld, max_hamming=4, bands=4)
    with _pytest.raises(ValueError):
        simhash_neardup_pairs(alld, bands=5)
