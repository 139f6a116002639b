"""Vector math over ``array<float|double>`` columns (SURVEY §2.9).

All expressed with Catalyst higher-order functions (``aggregate``,
``zip_with``, ``transform``) — JVM-side, codegen'd, no Python in the hot
path. Computation is promoted to double precision regardless of the
stored element type (embeddings are float32 on disk, matching the
reference's numpy float32 matrices, ``FAISS/PlainDemo/pipeline.py:313``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _v(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Inner product. On L2-normalized vectors this IS cosine similarity —
    the rewrite the reference relies on (``FAISS/PlainDemo/pipeline.py:61-63,237``)."""
    return F.aggregate(
        F.zip_with(_v(a), _v(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_v(a), F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(a: Column | str) -> Column:
    """V2 — ``emb / np.linalg.norm(emb, axis=1, keepdims=True)``
    (``FAISS/PlainDemo/pipeline.py:314``). Zero vectors map to zero (the
    reference would emit NaN; divergence documented in SURVEY §7.3).

    The input array and its norm are LET-BOUND via single-element
    ``transform`` wrappers before the per-element division, so each is
    evaluated exactly once per row. The naive
    ``transform(v, x -> x / l2_norm(v))`` re-evaluates the norm — and
    the whole input expression under it — per element (lambdas run
    interpreted, no subexpression elimination): with a computed input
    like ``hash_embed``'s d-hash array that is O(d²) hash evaluations
    per row. Arithmetic is unchanged, so results are bit-identical.
    """
    bound = F.array(F.struct(_v(a).alias("v")))
    with_norm = F.transform(
        bound,
        lambda s: F.struct(
            s["v"].alias("v"),
            F.sqrt(
                F.aggregate(s["v"], F.lit(0.0), lambda acc, x: acc + x * x)
            ).alias("n"),
        ),
    )
    return F.get(
        F.transform(
            with_norm,
            lambda s: F.when(s["n"] == 0.0, s["v"]).otherwise(
                F.transform(s["v"], lambda x: x / s["n"])
            ),
        ),
        0,
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Exact cosine: dot / (|a|·|b|); 0 when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)


def squared_l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_v(a), _v(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def similarity_from_l2(dist: Column | str) -> Column:
    """F6 — the reference UI's legacy ``1 - d`` score transform
    (``FAISS/UI-Demo/pipeline+ui.py:597``). Kept for display parity; the
    exact relation on unit vectors is ``cos = 1 - d²/2`` (SURVEY §2.3 F6)."""
    d = F.col(dist) if isinstance(dist, str) else dist
    return F.lit(1.0) - d
