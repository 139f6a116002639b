"""V1 real-model embedding path (functions/embed.py) — driven with a
fake model so the iterator-pandas-UDF body actually executes in CI
(round-1 verdict: a signature typo there would have shipped green; and
indeed the original body yielded a plain list where the iterator UDF
contract requires a pandas Series).

The fake implements the same ``.encode(texts, convert_to_numpy=True,
batch_size=n)`` interface as a SentenceTransformer
(FAISS/PlainDemo/pipeline.py:313-314) and records loads/calls through
files in a shared tmp dir (the UDF runs in executor worker processes, so
in-memory counters would not survive the round trip). The fake class is
defined INSIDE the loader closure: cloudpickle then ships it by value —
a module-level class would be referenced by name and fail to import on
workers.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.functions.embed import sentence_transformer_embed


def make_loader(log_dir: str):
    """Loader with the SentenceTransformer construction contract; the
    returned model's encode() = [len, vowels+1, 3] per text, float64
    (the UDF must cast to float32 and L2-normalize)."""

    def loader(model_name):
        import os

        import numpy as np

        class _FakeModel:
            def encode(self, texts, convert_to_numpy=True, batch_size=32):
                assert convert_to_numpy is True
                assert isinstance(texts, list)
                with open(
                    os.path.join(log_dir, f"encode.{os.getpid()}.{id(self)}.log"), "a"
                ) as f:
                    f.write(f"{len(texts)}\n")
                return np.array(
                    [
                        [float(len(t)), sum(t.count(v) for v in "aeiou") + 1.0, 3.0]
                        for t in texts
                    ],
                    dtype="float64",
                )

        with open(os.path.join(log_dir, f"load.{os.getpid()}.log"), "a") as f:
            f.write(model_name + "\n")
        return _FakeModel()

    return loader


def expected_vec(t: str) -> np.ndarray:
    v = np.array(
        [float(len(t)), sum(t.count(c) for c in "aeiou") + 1.0, 3.0], dtype="float32"
    )
    return v / np.linalg.norm(v)


def _log_total(log_dir: str, prefix: str) -> int:
    return sum(
        len(open(os.path.join(log_dir, f)).readlines())
        for f in os.listdir(log_dir)
        if f.startswith(prefix)
    )


@pytest.fixture()
def embed_df(spark):
    rows = [(i, f"document number {i} with some text body") for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)


def test_fake_model_udf_contract(spark, embed_df, tmp_path):
    """The UDF body runs end-to-end: float32 output, L2-normalized,
    values exactly the fake's formula."""
    udf = sentence_transformer_embed(
        "fake-model", batch_size=32, model_loader=make_loader(str(tmp_path))
    )
    out = embed_df.withColumn("emb", udf(F.col("text"))).select("doc_id", "text", "emb")
    rows = out.collect()
    assert len(rows) == 200
    for r in rows:
        got = np.array(r.emb, dtype="float32")
        want = expected_vec(r.text)
        assert got.shape == (3,)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-5  # L2-normalize contract
        assert np.allclose(got, want, atol=1e-6)
    assert _log_total(str(tmp_path), "load.") >= 1


def test_fake_model_loads_once_per_task_not_per_batch(spark, embed_df, tmp_path):
    """Iterator UDF form: with Arrow batches far smaller than partitions,
    encode runs many times but the model loads at most once per task."""
    log_dir = str(tmp_path)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        udf = sentence_transformer_embed("fake", model_loader=make_loader(log_dir))
        n = (
            embed_df.withColumn("emb", udf(F.col("text")))
            .filter(F.size("emb") == 3)
            .count()
        )
        assert n == 200
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    # 200 rows / 10-row Arrow batches: ~20 encode batches, but the model
    # loads once per TASK (Catalyst may evaluate the UDF below the
    # repartition, so the task count is the source partitioning — bounded
    # by session parallelism), never once per batch.
    encode_calls = _log_total(log_dir, "encode.")
    loads = _log_total(log_dir, "load.")
    max_tasks = int(spark.sparkContext.defaultParallelism)
    assert encode_calls >= 10, encode_calls
    assert 1 <= loads <= max_tasks, (loads, max_tasks)
    assert loads * 2 <= encode_calls, (loads, encode_calls)


def test_missing_lib_without_loader_raises_not_implemented(spark):
    with pytest.raises(NotImplementedError):
        sentence_transformer_embed("all-MiniLM-L6-v2")
