"""Product quantization (operators/pq.py): codec contract, ADC error
bounds, and retrieval recall against exact search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.functions.vector import l2_normalize
from deployment_spark.operators.pq import PQCodec
from deployment_spark.operators.similarity import topk_similarity_join_expr


@pytest.fixture(scope="module")
def norm_emb(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id", l2_normalize("embedding").alias("embedding")
    ).cache()


@pytest.fixture(scope="module")
def codec(norm_emb):
    return PQCodec.train(norm_emb, m=16, ksub=64, seed=42)


def test_encode_shape_and_determinism(norm_emb, codec):
    codes = codec.encode(norm_emb)
    rows = {r.vec_id: r.code for r in codes.collect()}
    again = {r.vec_id: r.code for r in codec.encode(norm_emb).collect()}
    assert rows == again
    assert all(len(c) == 16 for c in rows.values())  # m bytes per vector


def test_adc_approximates_true_distance(norm_emb, codec):
    """ADC(q, code(x)) must approximate ||q - x||² with bounded
    quantization error — and be exactly Σ_j ||q_j - c_{code_j}||²."""
    rows = norm_emb.limit(50).collect()
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    codes = {r.vec_id: r.code for r in codec.encode(norm_emb.limit(50)).collect()}
    q = x[0]
    m, dsub = codec.m, codec.dsub
    errs = []
    for i, r in enumerate(rows):
        code = np.frombuffer(codes[r.vec_id], dtype=np.uint8)
        adc = sum(
            ((codec.codebooks[j, code[j]] - q[j * dsub : (j + 1) * dsub]) ** 2).sum()
            for j in range(m)
        )
        true = ((x[i] - q) ** 2).sum()
        errs.append(abs(adc - true))
    # unit vectors: pairwise sq-L2 in [0, 4]; mean quantization error well under
    assert np.mean(errs) < 0.35, np.mean(errs)


def test_pq_recall_floor_and_self_retrieval(spark, norm_emb, codec):
    k = 10
    queries = norm_emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = codec.encode(norm_emb)
    approx = codec.search(codes, queries, k=k)
    exact = topk_similarity_join_expr(norm_emb, queries, k=k)
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # random (clusterless) vectors are PQ's worst case; 16 bytes vs 256
    # still keeps over half the exact top-10
    assert recall >= 0.5, recall
    # self-retrieval: each query is in the corpus; its own code must rank 1
    top1 = {r.query_id: r.vec_id for r in approx.filter("rank = 1").collect()}
    hits = sum(1 for qid, cid in top1.items() if qid == cid)
    assert hits >= 18, top1


def test_rerank_recovers_recall(spark, norm_emb, codec):
    """The production shape: ADC shortlist -> exact re-rank of only the
    shortlist rows. Near-exact results at 16x compression."""
    k = 10
    queries = norm_emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = codec.encode(norm_emb)
    rr = codec.search_rerank(codes, queries, norm_emb, k=k, shortlist=50)
    exact = topk_similarity_join_expr(norm_emb, queries, k=k)
    a = {(r.query_id, r.vec_id) for r in rr.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.9


def test_codec_roundtrip_persistence(tmp_path, codec, norm_emb):
    p = str(tmp_path / "pq" / "codebook.json")
    codec.save(p)
    loaded = PQCodec.load(p)
    assert np.allclose(loaded.codebooks, codec.codebooks)
    a = {r.vec_id: r.code for r in codec.encode(norm_emb.limit(20)).collect()}
    b = {r.vec_id: r.code for r in loaded.encode(norm_emb.limit(20)).collect()}
    assert a == b


def test_pq_search_empty_queries(spark, norm_emb, codec):
    codes = codec.encode(norm_emb)
    empty = spark.createDataFrame([], "query_id LONG, query_vec ARRAY<DOUBLE>")
    assert codec.search(codes, empty, k=5).count() == 0


def test_pq_k_larger_than_corpus(spark, norm_emb, codec):
    small = norm_emb.limit(3)
    codes = codec.encode(small)
    queries = small.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = codec.search(codes, queries, k=50).collect()
    assert len(res) == 9  # 3 queries x 3 corpus rows, capped


def test_pq_string_ids_roundtrip(spark):
    """Non-long ids must flow through encode/search/search_rerank intact
    (id types derive from the input schemas, as in topk_similarity_join)."""
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(f"doc-{i}", [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id STRING, embedding ARRAY<DOUBLE>",
    )
    codec = PQCodec.train(corpus, m=4, ksub=16, seed=7)
    codes = codec.encode(corpus)
    assert dict(codes.dtypes)["vec_id"] == "string"
    queries = spark.createDataFrame(
        [(f"q-{i}", [float(x) for x in vecs[i]]) for i in range(3)],
        "query_id STRING, query_vec ARRAY<DOUBLE>",
    )
    got = codec.search(codes, queries, k=3).collect()
    assert len(got) == 9
    assert {r.query_id for r in got} == {"q-0", "q-1", "q-2"}
    # self-vector should win: q-i used vec i's embedding
    best = {r.query_id: r.vec_id for r in got if r.rank == 1}
    assert best == {"q-0": "doc-0", "q-1": "doc-1", "q-2": "doc-2"}
    rr = codec.search_rerank(codes, queries, corpus, k=2, shortlist=10).collect()
    assert {r.query_id: r.vec_id for r in rr if r.rank == 1} == best


def test_search_batch_bitexact_parity(spark, norm_emb, codec):
    """The corpus-scale batch route must equal the interactive ADC
    search BIT-FOR-BIT — LUT build and gather use identical float64
    expressions per query, so even the distances match exactly, and
    the typed tie-break survives the batch path's string id
    transport. Tiny explicit block counts force a real multi-block
    grid."""
    queries = norm_emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = codec.encode(norm_emb)
    a = sorted(map(tuple, codec.search(codes, queries, k=7).collect()))
    b = sorted(
        map(
            tuple,
            codec.search_batch(
                codes, queries, k=7, num_query_blocks=3, num_code_blocks=5
            ).collect(),
        )
    )
    assert a == b


def test_search_batch_empty_and_string_ids(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((30, 16))
    corpus = spark.createDataFrame(
        [(f"doc-{i}", [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id STRING, embedding ARRAY<DOUBLE>",
    )
    codec = PQCodec.train(corpus, m=4, ksub=16, seed=11)
    codes = codec.encode(corpus)
    empty = spark.createDataFrame([], "query_id STRING, query_vec ARRAY<DOUBLE>")
    assert codec.search_batch(codes, empty, k=5).count() == 0
    queries = spark.createDataFrame(
        [(f"q-{i}", [float(x) for x in vecs[i]]) for i in range(4)],
        "query_id STRING, query_vec ARRAY<DOUBLE>",
    )
    got = codec.search_batch(
        codes, queries, k=3, num_query_blocks=2, num_code_blocks=3
    ).collect()
    assert len(got) == 12
    best = {r.query_id: r.vec_id for r in got if r.rank == 1}
    assert best == {f"q-{i}": f"doc-{i}" for i in range(4)}
    # r8 review: a null query vector or null code row must be excluded
    # codegen-side, not crash the LUT/gather task
    with_null_q = queries.unionByName(
        spark.createDataFrame(
            [("q-null", None)], "query_id STRING, query_vec ARRAY<DOUBLE>"
        )
    )
    from pyspark.sql import functions as F
    with_null_code = codes.unionByName(
        codes.limit(1).select(
            F.lit("doc-null").alias("vec_id"),
            F.lit(None).cast("binary").alias("code"),
        )
    )
    got2 = codec.search_batch(
        with_null_code, with_null_q, k=3, num_query_blocks=2, num_code_blocks=3
    ).collect()
    assert len(got2) == 12
    assert all(r.query_id != "q-null" and r.vec_id != "doc-null" for r in got2)
