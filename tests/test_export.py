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
