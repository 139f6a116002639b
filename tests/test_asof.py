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
