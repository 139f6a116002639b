"""Embedding stage (V1/V2, SURVEY §2.9).

Two embedders behind one interface:

1. ``hash_embed`` — deterministic, dependency-free pseudo-embedder built
   entirely from Catalyst built-ins (``xxhash64`` per dimension →
   uniform [-1, 1] → L2 normalize). Same text ⇒ same vector on every
   executor, which is what the correctness suite hashes against
   (SURVEY §5.2(2), §7.3(4)). No Python, no model download.

2. ``sentence_transformer_embed`` — the real model path, an Arrow-batched
   iterator pandas UDF mirroring the reference's batched
   ``model.encode(texts, convert_to_numpy=True)`` + L2-normalize
   (``FAISS/PlainDemo/pipeline.py:313-314``, ``Milvus/stream1.py:91-93``).
   The model loads once per executor process (iterator form), not once
   per batch. Gated behind import — sentence-transformers is not in the
   test container.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def hash_embed(text: Column | str, dim: int = 64, normalize: bool = True) -> Column:
    """Deterministic pseudo-embedding: component i = xxhash64(text, i)
    scaled to [-1, 1], then L2-normalized. Pure JVM expression."""
    c = F.col(text) if isinstance(text, str) else text
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.xxhash64(c, i) / F.lit(float(2**63))).cast("double"),
    )
    if normalize:
        from deployment_spark.functions.vector import l2_normalize

        comps = l2_normalize(comps)
    return comps.cast("array<float>")


def md5_embed(text: Column | str, dim: int = 16, normalize: bool = True) -> Column:
    """Portable deterministic pseudo-embedding: component j is the first
    32 bits of md5(text || '|' || j) mapped to [-1, 1), then L2-normalized.

    Slower than :func:`hash_embed` (one md5 per dimension vs one
    xxhash64), but every primitive is ANSI SQL, so a DuckDB oracle can
    replay the ENTIRE reference pipeline — serialize → embed → top-k
    cosine — bit-for-bit (queries.q_packet_topk). Use hash_embed in
    production, md5_embed where cross-engine verification matters."""
    c = F.col(text) if isinstance(text, str) else text
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.conv(F.substring(F.md5(F.concat_ws("|", c, j.cast("string"))), 1, 8), 16, 10)
            .cast("double")
            / F.lit(float(2**31))
            - 1.0
        ),
    )
    if normalize:
        from deployment_spark.functions.vector import l2_normalize

        comps = l2_normalize(comps)
    return comps


def _default_model_loader(model_name: str):  # pragma: no cover - lib absent in CI
    from sentence_transformers import SentenceTransformer

    return SentenceTransformer(model_name, device="cpu")


def sentence_transformer_embed(model_name: str, batch_size: int = 32, model_loader=None):
    """Real-model embedding UDF factory. Returns an iterator pandas UDF
    producing L2-normalized ``array<float>`` vectors.

    Reference parity: batch size 32 (``Milvus/stream1.py:19``), float32,
    L2 norm at every encode site (``FAISS/PlainDemo/pipeline.py:63,313-314``).

    ``model_loader(model_name) -> model`` defaults to loading a
    ``SentenceTransformer``; tests inject a fake with the same
    ``.encode(texts, convert_to_numpy=True, batch_size=n)`` interface so
    the UDF body — iterator form (load once per task, not per Arrow
    batch), float32 cast, zero-norm guard — runs for real without the
    model stack (round-1 verdict item 4). The loader runs on executors,
    inside the UDF, never on the driver."""
    if model_loader is None:
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "sentence-transformers is not installed in this environment; "
                "use hash_embed for deterministic tests or pass model_loader"
            ) from e
        model_loader = _default_model_loader

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        model = model_loader(model_name)  # once per task, amortized over batches
        for texts in batches:
            if len(texts) == 0:
                yield pd.Series([], dtype="object")
                continue
            emb = np.asarray(
                model.encode(
                    texts.tolist(), convert_to_numpy=True, batch_size=batch_size
                ),
                dtype="float32",
            )
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            yield pd.Series(list(emb / norms))

    return _embed
