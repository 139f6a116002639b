"""Binary-vector Hamming search (operators/binary.py): bit packing vs a
numpy reference, popcount distance, deterministic tie handling, pure
codegen plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.binary import (
    binarize_signbits,
    hamming_distance_packed,
    hamming_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _bits_ref(emb):
    out = {}
    for r in emb.select("vec_id", "embedding").collect():
        v = np.array(r.embedding)
        w0 = sum(1 << i for i in range(32) if v[i] > 0)
        w1 = sum(1 << i for i in range(32) if v[i + 32] > 0)
        out[r.vec_id] = (w0, w1)
    return out


def test_signbit_packing_matches_reference(emb):
    want = _bits_ref(emb)
    got = {r.vec_id: tuple(r.bits) for r in binarize_signbits(emb, dim=64).collect()}
    assert got == want


def test_hamming_matches_numpy_popcount(emb):
    want = _bits_ref(emb)
    packed = binarize_signbits(emb, dim=64)
    a = packed.filter(F.col("vec_id") == 0).select(F.col("bits").alias("a")).crossJoin(
        packed.select(F.col("vec_id"), F.col("bits").alias("b"))
    )
    got = {
        r.vec_id: r.d
        for r in a.select("vec_id", hamming_distance_packed("a", "b").alias("d")).collect()
    }
    w0a, w1a = want[0]
    for vid, (w0b, w1b) in want.items():
        ref = bin(w0a ^ w0b).count("1") + bin(w1a ^ w1b).count("1")
        assert got[vid] == ref, vid


def test_topk_self_query_and_tie_determinism(emb):
    packed = binarize_signbits(emb, dim=64)
    q = packed.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("bits").alias("query_bits")
    )
    a = hamming_topk(packed, q, k=6).collect()
    b = hamming_topk(packed, q, k=6).collect()
    assert [(r.query_id, r.rank, r.vec_id) for r in a] == [
        (r.query_id, r.rank, r.vec_id) for r in b
    ]
    # the true invariant is distance 0 at rank 1 (the self pattern is
    # present); asserting vid == qid would couple the test to all sign
    # patterns being unique in the fixture
    r1 = {r.query_id: (r.vec_id, r.hamming) for r in a if r.rank == 1}
    assert all(h == 0 for _, (_, h) in r1.items())
    # within each query, distances ascend and ties order by vec_id
    per_q = {}
    for r in a:
        per_q.setdefault(r.query_id, []).append((r.rank, r.hamming, r.vec_id))
    for rows in per_q.values():
        rows.sort()
        keys = [(h, v) for _, h, v in rows]
        assert keys == sorted(keys)


def test_plan_is_pure_codegen(emb):
    packed = binarize_signbits(emb, dim=64)
    q = packed.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("bits").alias("query_bits")
    )
    plan = hamming_topk(packed, q, k=3)._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        binarize_signbits(empty)


def test_null_vector_never_displaces_matches(spark):
    """A NULL source vector packs to NULL bits and ranks LAST — it must
    never enter the top-k ahead of genuine matches (asc alone would
    sort the NULL distance first)."""
    rows = [(0, [1.0, -1.0]), (1, [1.0, 1.0]), (2, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    packed = binarize_signbits(df, dim=2)
    bits = {r.vec_id: r.bits for r in packed.collect()}
    assert bits[2] is None and bits[0] is not None
    q = packed.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("bits").alias("query_bits")
    )
    out = hamming_topk(packed, q, k=2).collect()
    assert [r.vec_id for r in sorted(out, key=lambda r: r.rank)] == [0, 1]


def test_blocked_parity_on_fixture(spark, emb):
    """The corpus-scale block-pair route must equal the broadcast scan
    exactly — Hamming is integer arithmetic, so parity is bit-exact
    with no ulp caveats. Tiny explicit block counts force a real
    multi-block grid."""
    from deployment_spark.operators.binary import hamming_topk_blocked

    packed = binarize_signbits(emb)
    q = packed.filter(F.col("vec_id") < 9).select(
        F.col("vec_id").alias("query_id"), F.col("bits").alias("query_bits")
    )
    a = sorted(map(tuple, hamming_topk(packed, q, k=6).collect()))
    b = sorted(
        map(
            tuple,
            hamming_topk_blocked(
                packed, q, k=6, num_query_blocks=3, num_corpus_blocks=4
            ).collect(),
        )
    )
    assert a == b


def test_blocked_parity_with_nulls_both_sides(spark):
    """Null-bits corpus rows must fill trailing ranks (never displace a
    real match) and a null-bits QUERY must rank purely by id — in the
    blocked route exactly as in the broadcast one."""
    from deployment_spark.operators.binary import hamming_topk_blocked

    rows = [(0, [1.0, -1.0]), (1, [1.0, 1.0]), (2, None), (3, None), (4, [-1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    packed = binarize_signbits(df, dim=2)
    q = packed.filter(F.col("vec_id").isin(0, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("bits").alias("query_bits")
    )
    a = sorted(
        map(tuple, hamming_topk(packed, q, k=4).collect()),
        key=lambda t: (t[0], t[2]),
    )
    b = sorted(
        map(
            tuple,
            hamming_topk_blocked(
                packed, q, k=4, num_query_blocks=2, num_corpus_blocks=2
            ).collect(),
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert a == b
    # null query (id 2): ranked purely by id, null distances
    nullq = [t for t in b if t[0] == 2]
    assert [t[1] for t in nullq] == [0, 1, 2, 3] and all(t[3] is None for t in nullq)


def test_hamming_auto_routes_by_query_count(spark, emb):
    """Above the cap the auto router must take the blocked path and
    still return identical results."""
    from deployment_spark.operators.binary import hamming_topk_auto

    packed = binarize_signbits(emb)
    q = packed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("bits").alias("query_bits")
    )
    via_broadcast = sorted(map(tuple, hamming_topk_auto(packed, q, k=3).collect()))
    via_blocked = sorted(
        map(
            tuple,
            hamming_topk_auto(packed, q, k=3, broadcast_max_queries=0).collect(),
        )
    )
    assert via_broadcast == via_blocked
