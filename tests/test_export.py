"""Shuffled-shard export + temperature-mixture tests
(operators/export.py).

The export contract is REPRODUCIBILITY: same (seed, id) ⇒ same
placement and same kept set regardless of partitioning or engine — the
property orderBy(rand()) does not have. Mixture rates must match a
plain-Python replay of the temperature formula.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.export import (
    shard_manifest,
    shuffled_shards,
    temperature_mixture,
)


@pytest.fixture(scope="module")
def docs(documents):
    return documents.select("doc_id", "source").cache()


def placements(df):
    return {(r.doc_id, r.shard, r.pos) for r in df.collect()}


@pytest.mark.parametrize("portable", [True, False])
def test_shuffle_is_partitioning_invariant(docs, portable):
    base = placements(shuffled_shards(docs, 8, seed=1, portable=portable))
    re32 = placements(
        shuffled_shards(docs.repartition(32), 8, seed=1, portable=portable)
    )
    assert base == re32
    assert len(base) == docs.count()


def test_shuffle_positions_are_dense_permutations(docs):
    s = shuffled_shards(docs, 8, seed=1)
    per = s.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    )
    for r in per.collect():
        assert (r.lo, r.hi) == (1, r.n)  # pos is 1..n with no gaps
    assert per.count() == 8


def test_shuffle_seed_changes_placement(docs):
    a = placements(shuffled_shards(docs, 8, seed=1))
    b = placements(shuffled_shards(docs, 8, seed=2))
    assert a != b


def test_shards_are_balanced(docs):
    n = docs.count()
    sizes = [
        r.n
        for r in shuffled_shards(docs, 8, seed=1)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    # hash-uniform placement: no shard further than 4σ from n/8
    expect = n / 8
    sigma = math.sqrt(n * (1 / 8) * (7 / 8))
    assert all(abs(s - expect) <= 4 * sigma for s in sizes), sizes


def test_manifest_checksums(docs):
    s = shuffled_shards(docs, 4, seed=3)
    man = {r.shard: r for r in shard_manifest(s).collect()}
    rows = s.collect()
    for shard in range(4):
        mine = [r for r in rows if r.shard == shard]
        assert man[shard].n_rows == len(mine)
        assert man[shard].id_checksum == sum(r.doc_id for r in mine)
        by_pos = sorted(mine, key=lambda r: r.pos)
        assert man[shard].first_id == by_pos[0].doc_id
        assert man[shard].last_id == by_pos[-1].doc_id


def test_mixture_rates_match_python_replay(docs):
    alpha, target = 0.5, 120
    m = temperature_mixture(docs, "source", alpha=alpha, target_rows=target, seed=5)
    got = {
        r.source: r.rate for r in m.select("source", "rate").distinct().collect()
    }
    counts = {r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    wsum = sum(n**alpha for n in counts.values())
    for src, n in counts.items():
        want = min(1.0, target * (n**alpha) / wsum / n)
        assert abs(got[src] - want) < 1e-12, (src, got[src], want)


def test_mixture_alpha_one_is_uniform_rate(docs):
    n = docs.count()
    m = temperature_mixture(docs, "source", alpha=1.0, target_rows=n // 2, seed=5)
    rates = {r.rate for r in m.select("rate").distinct().collect()}
    assert len(rates) == 1  # alpha=1 ⇒ every source keeps the same fraction
    (rate,) = rates
    assert abs(rate - (n // 2) / n) < 1e-12


def test_mixture_kept_fraction_tracks_rate(docs):
    m = temperature_mixture(docs, "source", alpha=0.5, target_rows=250, seed=5).cache()
    stats = (
        m.groupBy("source", "rate")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("kept").cast("int")).alias("k"))
        .collect()
    )
    for r in stats:
        sigma = math.sqrt(r.n * r.rate * (1 - r.rate))
        assert abs(r.k - r.n * r.rate) <= 4 * sigma + 1, (r.source, r.k, r.n, r.rate)


def test_mixture_no_target_keeps_everything(docs):
    m = temperature_mixture(docs, "source", alpha=0.5, target_rows=None, seed=5)
    assert m.filter(~F.col("kept")).count() == 0


@pytest.mark.parametrize("portable", [True, False])
def test_mixture_portable_and_prod_both_deterministic(docs, portable):
    a = {
        (r.doc_id, r.kept)
        for r in temperature_mixture(
            docs, "source", 0.5, 200, seed=9, portable=portable
        ).collect()
    }
    b = {
        (r.doc_id, r.kept)
        for r in temperature_mixture(
            docs.repartition(16), "source", 0.5, 200, seed=9, portable=portable
        ).collect()
    }
    assert a == b


# ------------------------------------------------------------------ unimax


def _py_waterfill(counts: dict, budget: float, cap_epochs: float) -> dict:
    """The paper's sequential waterfill, as the reference."""
    caps = sorted((cap_epochs * n, g) for g, n in counts.items())
    rem, rem_l, alloc = budget, len(caps), {}
    for cap, g in caps:
        a = min(cap, rem / rem_l)
        alloc[g] = a
        rem -= a
        rem_l -= 1
    return {g: alloc[g] / counts[g] for g in counts}


def test_unimax_epochs_match_sequential_waterfill(documents):
    from deployment_spark.operators.export import unimax_mixture

    d = documents.select("doc_id", "lang")
    counts = {r.lang: r.n for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {
        r.lang: r.epochs
        for r in unimax_mixture(d, "lang", budget_rows=700, epochs_cap=2.0)
        .select("lang", "epochs")
        .distinct()
        .collect()
    }
    want = _py_waterfill(counts, 700.0, 2.0)
    assert got.keys() == want.keys()
    assert all(abs(got[g] - want[g]) < 1e-9 for g in got)


def test_unimax_capped_and_uncapped_branches(documents):
    """A deliberately skewed synthetic histogram (10/20/200 docs,
    budget 150, cap 3): the tail groups hit the epoch cap exactly, the
    head absorbs the waterfilled remainder below one epoch — both
    branches of the closed-form waterfill, checked against the
    sequential reference."""
    from deployment_spark.operators.export import unimax_mixture

    spark = documents.sparkSession
    rows = (
        [(i, "tiny") for i in range(10)]
        + [(100 + i, "small") for i in range(20)]
        + [(1000 + i, "huge") for i in range(200)]
    )
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = {
        r.lang: r.epochs
        for r in unimax_mixture(d, "lang", budget_rows=150, epochs_cap=3.0)
        .select("lang", "epochs").distinct().collect()
    }
    want = _py_waterfill({"tiny": 10, "small": 20, "huge": 200}, 150.0, 3.0)
    assert all(abs(got[g] - want[g]) < 1e-9 for g in got)
    assert abs(got["tiny"] - 3.0) < 1e-9      # capped
    assert got["huge"] < 1.0                   # waterfilled remainder


def test_unimax_budget_above_all_caps_caps_everything(documents):
    from deployment_spark.operators.export import unimax_mixture

    d = documents.select("doc_id", "lang")
    got = {
        r.lang: r.epochs
        for r in unimax_mixture(d, "lang", budget_rows=10_000_000, epochs_cap=1.5)
        .select("lang", "epochs").distinct().collect()
    }
    assert all(abs(e - 1.5) < 1e-9 for e in got.values())


def test_unimax_copies_sum_tracks_budget_and_is_reproducible(documents):
    from deployment_spark.operators.export import unimax_mixture

    d = documents.select("doc_id", "lang")
    out = unimax_mixture(d, "lang", budget_rows=700, epochs_cap=2.0)
    rows = out.select("doc_id", "n_copies").collect()
    total = sum(r.n_copies for r in rows)
    assert abs(total - 700) <= 25  # hash-fractional copies, ±noise
    again = {
        (r.doc_id, r.n_copies)
        for r in unimax_mixture(
            d.repartition(16), "lang", budget_rows=700, epochs_cap=2.0
        ).select("doc_id", "n_copies").collect()
    }
    assert {(r.doc_id, r.n_copies) for r in rows} == again
