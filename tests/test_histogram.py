"""Mergeable histogram (operators/histogram.py): build/merge algebra,
quantile accuracy bounds, and the streaming refresh with replay guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.histogram import (
    StreamingHistogram,
    hist_build,
    hist_merge,
    hist_quantiles,
)

LO, HI, BINS = 0.0, 100.0, 200


@pytest.fixture(scope="module")
def values(spark):
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 100, 5000)
    return spark.createDataFrame([(float(v),) for v in vals], ["x"]), vals


def test_merge_equals_whole(spark, values):
    df, _ = values
    a = df.filter(F.col("x") < 50)
    b = df.filter(F.col("x") >= 50)
    merged = {
        r.bin: r.cnt
        for r in hist_merge(
            hist_build(a, "x", LO, HI, BINS), hist_build(b, "x", LO, HI, BINS)
        ).collect()
    }
    whole = {r.bin: r.cnt for r in hist_build(df, "x", LO, HI, BINS).collect()}
    assert merged == whole
    assert sum(whole.values()) == 5000


def test_quantiles_within_bin_width(spark, values):
    df, vals = values
    h = hist_build(df, "x", LO, HI, BINS)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = {r.q: r.value for r in hist_quantiles(h, qs, LO, HI, BINS).collect()}
    width = (HI - LO) / BINS
    for q in qs:
        true = float(np.quantile(vals, q))
        assert abs(got[q] - true) <= 2 * width, (q, got[q], true)


def test_out_of_range_clamps_to_edge_bins(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (99.0,), (250.0,), (None,)], ["x"])
    h = {r.bin: r.cnt for r in hist_build(df, "x", LO, HI, BINS).collect()}
    assert h[0] == 2  # -5 clamps down, 0.0 lands there
    assert h[BINS - 1] == 1  # 250 clamps up
    assert sum(h.values()) == 4  # null excluded


def test_streaming_histogram_replay_and_merge(spark, tmp_path):
    from deployment_spark.operators.crud import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "hist"), key="hist_key")
    sh = StreamingHistogram(store, "x", LO, HI, BINS)
    d1 = spark.createDataFrame([(float(v),) for v in range(0, 50)], ["x"])
    d2 = spark.createDataFrame([(float(v),) for v in range(50, 100)], ["x"])
    sh.refresh(d1, batch_id=0, run_id="ck")
    sh.refresh(d2, batch_id=1, run_id="ck")
    # replay of (ck, 1) is a no-op; same batch id under a new run merges
    before = store.current_version()
    sh.refresh(d2, batch_id=1, run_id="ck")
    assert store.current_version() == before
    assert sum(r.cnt for r in sh.histogram().collect()) == 100
    med = {r.q: r.value for r in sh.quantiles([0.5]).collect()}[0.5]
    assert abs(med - 50.0) <= 2 * (HI - LO) / BINS
