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
