"""Trainable document-quality classifier (SURVEY §7.1 M8 extension).

The curation stacks behind the big public corpora pair the heuristic
signals (textstats) with a TRAINED quality classifier — a fastText /
logistic model fit on a small labeled sample ("looks like a reference
corpus" vs "looks like crawl noise") and then applied to every
document. The reference pipelines have no classifier at all; this
module supplies the Spark-first architecture for one:

- **train on a sample** — ``pyspark.ml`` logistic regression over a
  fixed, interpretable feature vector derived from the engine's own
  quality heuristics. Training data is sample-scale by definition; the
  fitted model is (coefficients, intercept) — a dozen doubles.
- **score the corpus in codegen** — inference does NOT go back through
  MLlib: :func:`score_quality` rebuilds sigmoid(w·x + b) as a plain
  Catalyst expression from the exported weights, so the 100 TB scoring
  pass is whole-stage-codegen'd per-row arithmetic with zero Python,
  zero MLlib vector UDFs, zero shuffles — exactly like every other
  row-local textstat.

Features (order is the contract, ``FEATURES``): n_tokens (log1p),
mean_word_len, stopword_ratio, alpha_ratio, dup_word_ratio,
dup_bigram_ratio. All derived by the existing operators; NULLs from
degenerate docs are imputed to 0 in BOTH train and score paths so the
two can never disagree on the feature vector.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURES = [
    "f_log_tokens",
    "mean_word_len",
    "stopword_ratio",
    "alpha_ratio",
    "dup_word_ratio",
    "dup_bigram_ratio",
]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the classifier's feature columns (see ``FEATURES``) —
    row-local textstat arithmetic, no exchanges."""
    from deployment_spark.operators.textstats import (
        add_quality_metrics,
        add_repetition_metrics,
    )

    out = add_repetition_metrics(add_quality_metrics(df, text_col), text_col)
    out = out.withColumn(
        "f_log_tokens", F.log1p(F.col("n_tokens").cast("double"))
    )
    for c in FEATURES:
        out = out.withColumn(c, F.coalesce(F.col(c).cast("double"), F.lit(0.0)))
    return out


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 100,
    reg_param: float = 0.0,
) -> dict:
    """Fit logistic regression on a LABELED SAMPLE (1 = keep-quality,
    0 = noise) and export the model as a plain dict
    ``{"coefficients": [...], "intercept": b, "features": FEATURES}``.

    The sample-scale ``pyspark.ml`` fit is the only MLlib touchpoint;
    the returned dict is what ships to the scoring pass (and to any
    other engine — it is just numbers)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(labeled, text_col)
    assembled = VectorAssembler(
        inputCols=FEATURES, outputCol="_features"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    model = lr.fit(assembled)
    return {
        "coefficients": [float(c) for c in model.coefficients],
        "intercept": float(model.intercept),
        "features": list(FEATURES),
    }


def quality_logit(model: dict) -> Column:
    """w·x + b over the ``FEATURES`` columns as one Catalyst
    expression."""
    if list(model["features"]) != list(FEATURES):
        raise ValueError(
            f"model features {model['features']} != engine contract {FEATURES}"
        )
    z: Column = F.lit(float(model["intercept"]))
    for w, c in zip(model["coefficients"], FEATURES):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def score_quality(
    df: DataFrame, model: dict, text_col: str = "text", out_col: str = "quality_prob"
) -> DataFrame:
    """Corpus-scale inference: P(keep) = sigmoid(w·x + b) as pure
    codegen arithmetic — no MLlib, no UDF, no shuffle. Apply a
    threshold downstream (``F.col(out_col) >= t``) to filter."""
    feats = quality_features(df, text_col)
    z = quality_logit(model)
    return feats.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def reference_sigmoid(model: dict, x: list[float]) -> float:
    """Plain-python twin of :func:`score_quality` for tests/oracles."""
    z = model["intercept"] + sum(
        w * v for w, v in zip(model["coefficients"], x)
    )
    return 1.0 / (1.0 + math.exp(-z))
