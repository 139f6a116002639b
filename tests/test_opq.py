"""OPQ (operators/opq.py — Ge et al. optimized product quantization):
rotation orthogonality and dot-preservation, the anisotropic recall
LIFT at identical bytes, parity with plain PQ at opq_iters=0, and
save/load roundtrip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.opq import (
    load_opq,
    rotate_vectors,
    save_opq,
    train_opq,
)
from deployment_spark.operators.pq import PQCodec


@pytest.fixture(scope="module")
def aniso(spark):
    """Anisotropic synthetic: low-rank mixing + exponential per-dim
    variance ramp — the regime OPQ exists for (plain PQ's independent
    subspaces starve on it). Unit-normalized so cosine ≡ dot."""
    rng = np.random.default_rng(7)
    n, d, r = 3000, 64, 8
    x = rng.normal(size=(n, r)) @ rng.normal(size=(r, d))
    x += 0.05 * rng.normal(size=(n, d))
    x *= np.exp(np.linspace(0, 2.5, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    return df, x


def _recall(res, exact, k=10):
    got = {}
    for row in res.collect():
        got.setdefault(row.query_id, set()).add(row.vec_id)
    return sum(len(exact[q] & got.get(q, set())) / k for q in exact) / len(exact)


def test_rotation_is_orthogonal_and_preserves_dots(spark, aniso):
    df, x = aniso
    r_mat, _ = train_opq(df, m=8, ksub=64, seed=42, opq_iters=4)
    d = x.shape[1]
    assert np.abs(r_mat @ r_mat.T - np.eye(d)).max() < 1e-10
    rot = rotate_vectors(df.filter(F.col("vec_id") < 50), r_mat)
    xr = np.array(
        [r.embedding for r in rot.orderBy("vec_id").collect()], dtype=np.float64
    )
    # (Rx)·(Ry) = x·y for every pair — search semantics unchanged
    assert np.abs(xr @ xr.T - x[:50] @ x[:50].T).max() < 1e-9
    # other columns pass through untouched
    assert rot.columns == df.columns


def test_opq_lifts_anisotropic_recall_at_same_bytes(spark, aniso):
    """The headline property: on variance-ramped low-rank data OPQ's
    ADC recall beats plain PQ by a wide margin at IDENTICAL m·ksub
    (measured 0.535 → 0.775 on this fixture/seed; pinned with slack)."""
    df, x = aniso
    nq, k = 20, 10
    sims = x[:nq] @ x.T
    exact = {
        i: set(np.lexsort((np.arange(len(x)), -sims[i]))[:k].tolist())
        for i in range(nq)
    }
    queries = df.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pq = PQCodec.train(df, m=8, ksub=64, seed=42)
    r_pq = _recall(pq.search(pq.encode(df), queries, k=k), exact, k)
    r_mat, oc = train_opq(df, m=8, ksub=64, seed=42, opq_iters=6)
    rot = rotate_vectors(df, r_mat)
    rq = rotate_vectors(queries, r_mat, vec_col="query_vec")
    r_opq = _recall(oc.search(oc.encode(rot), rq, k=k), exact, k)
    assert r_opq >= r_pq + 0.10, (r_pq, r_opq)
    assert r_opq >= 0.70, r_opq


def test_opq_iters_zero_is_plain_pq(spark, aniso):
    """opq_iters=0 must degenerate EXACTLY: identity rotation, and —
    same seed, same sample — the identical codebooks PQCodec.train
    produces. Pins that the alternation is the only difference."""
    df, _ = aniso
    r_mat, oc = train_opq(df, m=8, ksub=64, seed=42, opq_iters=0, iters=10)
    assert np.allclose(r_mat, np.eye(64))
    pq = PQCodec.train(df, m=8, ksub=64, seed=42, iters=10)
    assert np.allclose(oc.codebooks, pq.codebooks)


def test_opq_save_load_roundtrip(spark, aniso, tmp_path):
    df, _ = aniso
    r_mat, oc = train_opq(df, m=8, ksub=64, seed=42, opq_iters=2)
    p = str(tmp_path / "opq" / "codec.json")
    save_opq(p, r_mat, oc)
    r2, oc2 = load_opq(p)
    assert np.allclose(r_mat, r2)
    assert np.allclose(oc.codebooks, oc2.codebooks)


def test_train_opq_validates_geometry(spark, aniso):
    df, _ = aniso
    with pytest.raises(ValueError, match="not divisible"):
        train_opq(df, m=7, ksub=64)
    with pytest.raises(ValueError, match="uint8"):
        train_opq(df, m=8, ksub=512)


def test_opq_composes_with_ivfpq(spark, aniso, tmp_path):
    """The rotation wrapper composes with the COMPOSED index unchanged:
    IVF×PQ built on rotated frames, searched with rotated queries at
    full probe + exact re-rank, returns each query's own row at rank 1
    (rotation preserves cosine, so self-similarity stays maximal)."""
    from deployment_spark.operators.ivfpq import IVFPQIndex

    df, _ = aniso
    r_mat, _ = train_opq(df, m=8, ksub=64, seed=42, opq_iters=2)
    rot = rotate_vectors(df, r_mat)
    idx = IVFPQIndex(spark, str(tmp_path / "ivfpq_opq")).build(
        rot, nlist=4, m=8, ksub=64
    )
    queries = rotate_vectors(
        df.filter(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        ),
        r_mat,
        vec_col="query_vec",
    )
    res = idx.search(queries, k=3, nprobe=10**9, shortlist=30).collect()
    tops = {r.query_id: r.vec_id for r in res if r.rank == 1}
    assert tops == {i: i for i in range(6)}
