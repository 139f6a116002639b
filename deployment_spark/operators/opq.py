"""OPQ — Optimized Product Quantization (Ge et al., CVPR 2013): learn an
orthogonal rotation R that redistributes variance and decorrelates the
subspaces BEFORE product quantization, so the same m bytes/code buy
strictly less quantization error on anisotropic data.

Why a rotation helps: PQ quantizes each dsub-dim subspace
independently, so it wastes codebook entropy when energy is
concentrated in a few dims (one subspace's k-means starves while
another's saturates) or when dims are correlated across subspace
boundaries. An orthogonal R preserves every dot product and every L2
distance ((Rq)·(Rx) = q·x), so search SEMANTICS are unchanged — only
the quantization grid moves. On isotropic data R converges to an
arbitrary orthogonal matrix and OPQ ≡ PQ (pinned in tests — the engine
fixture is near-isotropic, so the gated floor there is parity, not a
lift; the lift is pinned on an anisotropic synthetic).

Spark-first split, same as PQ itself:

- **train** (driver-side, on the same bounded sample contract as
  ``PQCodec.train``): alternating optimization — fix R, train the PQ
  codebooks on the rotated sample; fix the codebooks, solve the
  orthogonal Procrustes problem min_R ‖X·Rᵀ − X̂‖_F = SVD(XᵀX̂) for
  the rotation that best aligns the data with its own reconstruction.
  Both steps monotonically reduce quantization error (Ge et al. §4,
  the "non-parametric" OPQ_NP variant). Seeded, plain numpy.
- **apply** (distributed): ``rotate_vectors`` is ONE Arrow-batched
  matmul pass (n·d² flops — trivial next to encode's argmin matmuls);
  it feeds the UNCHANGED PQ machinery. Nothing inside
  pq.py/ivfpq.py needs to know rotation exists: corpus and queries are
  rotated at the boundary, exact re-rank can use rotated or original
  vectors interchangeably (rotation invariance), and at 100 TB the
  rotated corpus is a lazy transform streaming into ``encode`` — never
  a second materialized copy.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deployment_spark.operators.pq import PQCodec, _kmeans_1sub


def _train_books(
    x: np.ndarray, m: int, ksub: int, iters: int, rng: np.random.Generator
) -> np.ndarray:
    dsub = x.shape[1] // m
    return np.stack(
        [
            _kmeans_1sub(x[:, j * dsub : (j + 1) * dsub], ksub, iters, rng)
            for j in range(m)
        ]
    )


def _reconstruct(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, ksub, dsub = books.shape
    out = np.empty_like(x)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        d = (books[j] ** 2).sum(1) - 2 * xs @ books[j].T
        out[:, j * dsub : (j + 1) * dsub] = books[j][d.argmin(axis=1)]
    return out


def train_opq(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 256,
    sample_rows: int = 10000,
    iters: int = 10,
    opq_iters: int = 6,
    inner_iters: int = 4,
    seed: int = 42,
) -> tuple[np.ndarray, PQCodec]:
    """Returns (R, codec): an orthogonal d×d rotation and a PQCodec
    trained on the ROTATED sample. Encode/search must see vectors
    through ``rotate_vectors(df, R)`` — the codec itself is a plain
    PQCodec and every existing search path works untouched.

    ``opq_iters`` alternations with ``inner_iters``-step k-means keep
    training bounded (the final codebooks get the full ``iters``);
    ``opq_iters=0`` degenerates to R=I + plain PQ training, which is
    the parity pin in tests."""
    if ksub > 256:
        raise ValueError(f"ksub={ksub} > 256: codes are uint8")
    sample = df.select(vec_col).limit(sample_rows).collect()
    x = np.array([r[vec_col] for r in sample], dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible into m={m} subspaces")
    rng = np.random.default_rng(seed)
    r_mat = np.eye(d)
    for _ in range(int(opq_iters)):
        xr = x @ r_mat.T
        books = _train_books(xr, m, ksub, int(inner_iters), rng)
        xhat = _reconstruct(xr, books)
        # orthogonal Procrustes: min_Ω ‖xΩ − x̂‖_F, Ω = R.T orthogonal
        # → Ω = U·Vᵀ with xᵀx̂ = U·S·Vᵀ, i.e. R = V·Uᵀ
        u, _, vt = np.linalg.svd(x.T @ xhat)
        r_mat = vt.T @ u.T
    books = _train_books(x @ r_mat.T, m, ksub, int(iters), rng)
    return r_mat, PQCodec(books)


def rotate_vectors(df: DataFrame, r_mat: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Apply the OPQ rotation to a vector column: one Arrow-batched
    matmul per batch, all other columns pass through unchanged. Lazy —
    at scale this streams into ``PQCodec.encode`` without materializing
    a rotated corpus copy."""
    import pandas as pd

    rt = r_mat.T.copy()
    cast = df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))

    def rot(batches):
        for pdf in batches:
            if not pdf.empty:
                x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                pdf[vec_col] = list(x @ rt)
            yield pdf

    return cast.mapInPandas(rot, schema=cast.schema)


def save_opq(path: str, r_mat: np.ndarray, codec: PQCodec) -> None:
    """Persist rotation + codebooks side by side (the rotation IS index
    metadata: d² floats, a few KB at d ≤ 1024)."""
    import json
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "rotation": r_mat.tolist(),
                "m": codec.m,
                "ksub": codec.ksub,
                "dsub": codec.dsub,
                "codebooks": codec.codebooks.tolist(),
            },
            f,
        )


def load_opq(path: str) -> tuple[np.ndarray, PQCodec]:
    import json

    with open(path) as f:
        d = json.load(f)
    return (
        np.array(d["rotation"], dtype=np.float64),
        PQCodec(np.array(d["codebooks"], dtype=np.float64)),
    )
