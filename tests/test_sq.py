"""Scalar quantization (operators/sq.py): trained ranges, encode
round-trip error bound, pure-Catalyst plan guarantee, retrieval recall
against exact search, codec persistence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.functions.vector import l2_normalize
from deployment_spark.operators.sq import SQCodec
from deployment_spark.operators.similarity import topk_similarity_join_expr


@pytest.fixture(scope="module")
def norm_emb(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id", l2_normalize("embedding").alias("embedding")
    ).cache()


@pytest.fixture(scope="module")
def codec(norm_emb):
    return SQCodec.train(norm_emb)


def test_train_exact_ranges(norm_emb, codec):
    """Distributed posexplode min/max must equal the numpy per-dimension
    min/max of the same vectors."""
    x = np.array([r.embedding for r in norm_emb.collect()], dtype=np.float64)
    assert codec.dim == x.shape[1]
    np.testing.assert_allclose(codec.lo, x.min(axis=0), rtol=0, atol=1e-6)
    np.testing.assert_allclose(codec.hi, x.max(axis=0), rtol=0, atol=1e-6)


def test_encode_determinism_and_type(norm_emb, codec):
    codes = codec.encode(norm_emb)
    assert dict(codes.dtypes)["codes"] == "array<tinyint>"
    rows = {r.vec_id: tuple(r.codes) for r in codes.collect()}
    again = {r.vec_id: tuple(r.codes) for r in codec.encode(norm_emb).collect()}
    assert rows == again
    assert all(len(c) == codec.dim for c in rows.values())


def test_roundtrip_error_bounded_by_half_step(norm_emb, codec):
    """decode(encode(x)) must be within scale/2 of x in every dimension —
    the defining property of round-to-nearest scalar quantization."""
    sample = norm_emb.limit(64)
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in sample.collect()}
    dec = {
        r.vec_id: np.array(r.d, dtype=np.float64)
        for r in codec.encode(sample)
        .select("vec_id", codec.decode_expr("codes").alias("d"))
        .collect()
    }
    for vid, x in orig.items():
        err = np.abs(dec[vid] - x)
        assert (err <= codec.scale / 2 + 1e-9).all(), (vid, err.max())


def test_zero_range_dim_decodes_exactly(spark):
    """A constant dimension has zero range; the guard (scale=1, code=0)
    must make decode exact, not divide by zero."""
    df = spark.createDataFrame(
        [(i, [float(i) / 10.0, 7.5]) for i in range(8)], "vec_id long, embedding array<double>"
    )
    codec = SQCodec.train(df)
    assert codec.scale[1] == 1.0
    out = codec.encode(df).select("vec_id", codec.decode_expr("codes").alias("d")).collect()
    assert all(abs(r.d[1] - 7.5) < 1e-12 for r in out)


def test_search_plan_is_pure_catalyst(norm_emb, codec):
    """The whole ADC path — decode + dot + window — must contain no
    Python eval node: this is SQ's distinguishing scale property."""
    codes = codec.encode(norm_emb)
    q = norm_emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = codec.search(codes, q, k=5)._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, node


def test_adc_recall_near_exact(norm_emb, codec):
    """8 bits per dimension on normalized vectors: ADC top-10 should be
    essentially exact (>= 0.95 mean recall; measured 1.0)."""
    k = 10
    q = norm_emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = codec.encode(norm_emb)
    exact = {
        (r.query_id, r.vec_id)
        for r in topk_similarity_join_expr(norm_emb, q, k=k).collect()
    }
    adc = {(r.query_id, r.vec_id) for r in codec.search(codes, q, k=k).collect()}
    assert len(exact & adc) / len(exact) >= 0.95


def test_rerank_recovers_exact(norm_emb, codec):
    """With a shortlist comfortably above k, the exact re-rank must
    reproduce the exact top-k id set per query."""
    k = 5
    q = norm_emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = codec.encode(norm_emb)
    exact = {
        (r.query_id, r.vec_id)
        for r in topk_similarity_join_expr(norm_emb, q, k=k).collect()
    }
    rr = {
        (r.query_id, r.vec_id)
        for r in codec.search_rerank(codes, q, norm_emb, k=k, shortlist=50).collect()
    }
    assert rr == exact


def test_json_roundtrip(codec):
    clone = SQCodec.from_json(codec.to_json())
    np.testing.assert_allclose(clone.lo, codec.lo)
    np.testing.assert_allclose(clone.hi, codec.hi)
    np.testing.assert_allclose(clone.scale, codec.scale)


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        SQCodec.train(empty)


def test_search_batch_integer_exact_parity(spark):
    """On an integer-exact fixture (lo=0, hi=255 per dim ⇒ scale=1 ⇒
    codes decode to the EXACT input integers; integer dots are exact in
    float64 in any summation order) the batch route must equal the
    expression search bit-for-bit — scores included. This isolates the
    routing/transport logic from matmul-vs-fold ulp noise."""
    rng = np.random.default_rng(5)
    dim, n = 8, 40
    vals = rng.integers(0, 256, size=(n, dim))
    vals[0, :] = 0    # pin lo = 0
    vals[1, :] = 255  # pin hi = 255
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vals[i]]) for i in range(n)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    codec = SQCodec.train(corpus)
    assert (codec.lo == 0).all() and (codec.hi == 255).all()
    codes = codec.encode(corpus)
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in vals[i]]) for i in range(6)],
        "query_id LONG, query_vec ARRAY<DOUBLE>",
    )
    a = sorted(map(tuple, codec.search(codes, queries, k=5).collect()))
    b = sorted(
        map(
            tuple,
            codec.search_batch(
                codes, queries, k=5, num_query_blocks=2, num_code_blocks=3
            ).collect(),
        )
    )
    assert a == b
    # r8 review: null query vectors / null code rows are excluded
    # codegen-side, never crashing the decode-and-score task
    with_null_q = queries.unionByName(
        spark.createDataFrame(
            [(999, None)], "query_id LONG, query_vec ARRAY<DOUBLE>"
        )
    )
    with_null_code = codes.unionByName(
        codes.limit(1).select(
            F.lit(998).cast("long").alias("vec_id"),
            F.lit(None).cast("array<tinyint>").alias("codes"),
        )
    )
    c = sorted(
        map(
            tuple,
            codec.search_batch(
                with_null_code, with_null_q, k=5,
                num_query_blocks=2, num_code_blocks=3,
            ).collect(),
        )
    )
    assert c == a


def test_search_batch_recall_on_fixture(norm_emb, codec):
    """On the real (float) fixture the batch matmul and the expression
    fold differ in summation-order ulps, so assert set-level agreement
    instead of bit equality: ≥ 0.9 overlap with the expression path's
    top-10 (in practice 1.0 unless two sims collide in the last ulp)."""
    queries = norm_emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = codec.encode(norm_emb)
    a = {
        (r.query_id, r.vec_id)
        for r in codec.search(codes, queries, k=10).collect()
    }
    b = {
        (r.query_id, r.vec_id)
        for r in codec.search_batch(
            codes, queries, k=10, num_query_blocks=3, num_code_blocks=4
        ).collect()
    }
    assert len(a & b) / len(a) >= 0.9


def test_encode_clip_guard_fails_loudly_on_drifted_rows(spark, norm_emb):
    """r10 (r9 ADVICE): components outside the trained ranges CLIP with
    unbounded error, silently voiding margin_expr's exact-range bound —
    clipped_dims_expr detects them and encode(assert_in_range=True)
    raises instead of encoding garbage. In-range corpora are untouched
    (guard is a no-op wrapper on the same codegen expression)."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from deployment_spark.operators.sq import SQCodec

    codec = SQCodec.train(norm_emb)
    # in-range: guard passes, codes identical to the unguarded encode
    a = codec.encode(norm_emb, assert_in_range=True).orderBy("vec_id").collect()
    b = codec.encode(norm_emb).orderBy("vec_id").collect()
    assert [r.codes for r in a] == [r.codes for r in b]
    # counter: a shifted row reports its out-of-range dims
    drifted = norm_emb.limit(1).select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(100.0)).alias("embedding"),
    )
    n_bad = drifted.select(
        codec.clipped_dims_expr("embedding").alias("n")
    ).first()["n"]
    assert n_bad == codec.dim
    assert norm_emb.select(
        F.sum(codec.clipped_dims_expr("embedding")).alias("s")
    ).first()["s"] == 0
    # loud failure: encoding the drifted row raises
    with _pytest.raises(Exception, match="outside trained ranges"):
        codec.encode(drifted, assert_in_range=True).collect()
