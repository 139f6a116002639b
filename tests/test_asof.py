"""As-of join (operators/asof.py) vs pandas merge_asof ground truth."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deployment_spark.operators.asof import asof_join


def mk(spark):
    base = dt.datetime(2024, 1, 1)

    def t(m):
        return base + dt.timedelta(minutes=m)

    trades = spark.createDataFrame(
        [
            (1, 100, t(1)), (1, 101, t(5)), (1, 102, t(9)),
            (2, 200, t(2)), (2, 201, t(3)),
            (3, 300, t(4)),            # user with no quotes at all
        ],
        "user_id LONG, event_id LONG, ts TIMESTAMP",
    )
    quotes = spark.createDataFrame(
        [
            (1, t(0), 10.0), (1, t(5), 11.0), (1, t(7), 12.0),
            (2, t(3), 20.0),
        ],
        "user_id LONG, ts TIMESTAMP, value DOUBLE",
    )
    return trades, quotes


def pandas_truth(trades, quotes, direction, tolerance=None):
    lt = trades.toPandas().sort_values("ts").reset_index(drop=True)
    rt = quotes.toPandas().sort_values("ts").reset_index(drop=True)
    kwargs = {}
    if tolerance is not None:
        kwargs["tolerance"] = pd.Timedelta(microseconds=tolerance)
    m = pd.merge_asof(
        lt, rt, on="ts", by="user_id", direction=direction,
        suffixes=("", "_right"), **kwargs,
    )
    return {
        (r.user_id, r.event_id): (None if pd.isna(r.value) else r.value)
        for r in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_merge_asof(spark, direction):
    trades, quotes = mk(spark)
    got = {
        (r.user_id, r.event_id): r.value
        for r in asof_join(
            trades, quotes, by=["user_id"], right_cols=["value"],
            direction=direction,
        ).collect()
    }
    assert got == pandas_truth(trades, quotes, direction)


def test_asof_tolerance(spark):
    trades, quotes = mk(spark)
    tol = 2 * 60 * 1_000_000  # 2 minutes in us
    got = {
        (r.user_id, r.event_id): r.value
        for r in asof_join(
            trades, quotes, by=["user_id"], right_cols=["value"],
            tolerance_us=tol,
        ).collect()
    }
    assert got == pandas_truth(trades, quotes, "backward", tolerance=tol)


def test_asof_equal_timestamp_is_visible(spark):
    """A right row AT the left timestamp matches (>= semantics, like
    DuckDB ASOF and merge_asof backward)."""
    trades, quotes = mk(spark)
    got = {
        r.event_id: r.value
        for r in asof_join(
            trades, quotes, by=["user_id"], right_cols=["value"]
        ).collect()
    }
    assert got[101] == 11.0  # trade at t5 sees the t5 quote
    assert got[201] == 20.0  # trade at t3 sees the t3 quote
    assert got[300] is None  # no quotes for user 3


def test_asof_single_shuffle(spark):
    from deployment_spark.plans import audit

    trades, quotes = mk(spark)
    df = asof_join(trades, quotes, by=["user_id"], right_cols=["value"])
    assert audit.count_exchanges(df) == 1, audit.physical_plan(df)
    plan = audit.physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ---------------------------------------------------------------------------
# range join (operators/rangejoin.py)
# ---------------------------------------------------------------------------


def test_range_join_matches_naive(spark):
    """Binned range join == Spark's own nested-loop BETWEEN join, across
    bucket widths (including widths that split intervals mid-span)."""
    from deployment_spark.operators.rangejoin import range_join

    pts = spark.range(200).select(
        F.col("id").alias("pid"), (F.col("id") * 1.7 % 97).alias("v")
    )
    iv = spark.range(30).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 3.1).alias("lo"),
        (F.col("id") * 3.1 + F.col("id") % 11 + 0.5).alias("hi"),
    )
    naive = {
        (r.pid, r.band_id)
        for r in pts.join(
            iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    for width in (1.0, 5.0, 40.0):
        got = {
            (r.pid, r.band_id)
            for r in range_join(pts, iv, "v", "lo", "hi", width).collect()
        }
        assert got == naive, width


def test_range_join_no_nested_loop_in_plan(spark):
    from deployment_spark.operators.rangejoin import range_join
    from deployment_spark.plans import audit

    pts = spark.range(100).select(F.col("id").alias("pid"), (F.col("id") * 1.0).alias("v"))
    iv = spark.range(10).select(
        F.col("id").alias("band_id"), (F.col("id") * 10.0).alias("lo"),
        (F.col("id") * 10.0 + 15.0).alias("hi"),
    )
    plan = audit.physical_plan(range_join(pts, iv, "v", "lo", "hi", 10.0))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
