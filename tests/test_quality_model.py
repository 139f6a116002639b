"""Trainable quality classifier (operators/quality_model): MLlib fit on
a sample, pure-Catalyst sigmoid inference on the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.quality_model import (
    FEATURES,
    quality_logit,
    reference_sigmoid,
    score_quality,
    train_quality_classifier,
)
from deployment_spark.plans import audit


def _labeled(spark, documents):
    docs = documents.select("doc_id", "text")
    noise = spark.range(120).select(
        (F.col("id") + 500000).alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.lit("spam spam spam spam spam spam spam spam spam spam"),
        )
        .otherwise(F.lit("x9 qq7 zz zz zz 11 11 !!@@ ## qq7 zz x9 x9"))
        .alias("text"),
    )
    return docs.withColumn("label", F.lit(1.0)).unionByName(
        noise.withColumn("label", F.lit(0.0))
    )


@pytest.fixture(scope="module")
def model(spark, documents):
    return train_quality_classifier(_labeled(spark, documents))


def test_classifier_separates_planted_noise(spark, documents, model):
    scored = score_quality(_labeled(spark, documents), model)
    rows = scored.select("label", "quality_prob").collect()
    good = [r.quality_prob for r in rows if r.label == 1.0]
    bad = [r.quality_prob for r in rows if r.label == 0.0]
    assert min(good) > max(bad)  # full margin on the separable task
    acc = sum((r.quality_prob >= 0.5) == (r.label == 1.0) for r in rows) / len(rows)
    assert acc == 1.0


def test_scoring_matches_python_sigmoid_exactly(spark, documents, model):
    """The exported dict IS the model: Catalyst inference must equal the
    plain-python sigmoid twin on the same feature values bit-for-bit
    (same doubles, same operation order)."""
    scored = score_quality(documents.select("doc_id", "text"), model)
    for r in scored.select("quality_prob", *FEATURES).limit(25).collect():
        ref = reference_sigmoid(model, [getattr(r, f) for f in FEATURES])
        assert abs(ref - r.quality_prob) < 1e-12


def test_corpus_scoring_is_codegen_with_zero_exchanges(spark, documents, model):
    """The 100 TB path: inference is row-local whole-stage-codegen
    arithmetic — no MLlib vector UDFs, no shuffle."""
    s = score_quality(documents.select("doc_id", "text"), model)
    assert audit.count_exchanges(s) == 0
    assert audit.codegen_stage_count(s) >= 1
    plan = audit.physical_plan(s)
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_feature_contract_mismatch_raises(model):
    stale = dict(model, features=["something_else"])
    with pytest.raises(ValueError, match="contract"):
        quality_logit(stale)


def test_degenerate_docs_score_without_nulls(spark, model):
    """Empty / whitespace / symbol-only docs must produce a finite
    probability (NULL features imputed to 0), never NULL or NaN."""
    import math

    weird = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "!!! ### $$$"), (4, "a")],
        ["doc_id", "text"],
    )
    rows = score_quality(weird, model).select("quality_prob").collect()
    assert all(
        r.quality_prob is not None and math.isfinite(r.quality_prob) for r in rows
    )
