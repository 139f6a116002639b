"""Watermarked stream-stream joins — the attribution shape
(impressions ⋈ clicks) every event-driven training-data pipeline needs
(beyond-reference extension, flagged like ST4; the reference processes
its streams only as batch files, ``Milvus/stream1.py:251-260``).

Semantics: click matches impressions with the same key where
``imp_ts <= click_ts <= imp_ts + attribution_window`` — a per-key
interval join. On streams, BOTH sides carry watermarks and the join
condition carries the time bound, so Spark can size and expire the join
state: an impression is held only until its attribution window passes
the click-side watermark, giving O(window × arrival rate) state instead
of unbounded buffering. That state bound is the whole design at scale —
without the time-range condition the stream-stream join must keep every
row forever.

``attribution_join_batch`` is the exact batch twin (same condition as a
plain join) — the parity oracle for tests and the shape for backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clause(key: str, imp_ts: str, click_ts: str, attribution_window: str):
    return F.expr(
        f"{key} = _ck AND {click_ts} >= {imp_ts} "
        f"AND {click_ts} <= {imp_ts} + INTERVAL {attribution_window}"
    )


def attribution_join(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    imp_ts: str = "imp_ts",
    click_ts: str = "click_ts",
    attribution_window: str = "30 minutes",
    imp_watermark: str = "1 hour",
    click_watermark: str = "1 hour",
) -> DataFrame:
    """Streaming inner attribution join (append output mode). The two
    inputs must share ONLY the ``key`` column name; all other columns
    must be disjoint (select/alias first — plain-join contract).

    Watermark guidance: ``imp_watermark`` must cover
    ``attribution_window`` plus expected disorder, or valid late clicks
    lose their impression; state expiry follows the tighter of the two.
    """
    imp = impressions.withWatermark(imp_ts, imp_watermark)
    clk = (
        clicks.withColumnRenamed(key, "_ck")
        .withWatermark(click_ts, click_watermark)
    )
    return imp.join(
        clk, _clause(key, imp_ts, click_ts, attribution_window), "inner"
    ).drop("_ck")


def attribution_join_batch(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    imp_ts: str = "imp_ts",
    click_ts: str = "click_ts",
    attribution_window: str = "30 minutes",
) -> DataFrame:
    """Batch twin: identical join condition, no watermarks — the parity
    oracle (stream result ≡ batch result once all files are processed)
    and the backfill shape. At scale this is a plain equi-join on the
    key with a time post-filter, AQE-skew-splittable; for heavily skewed
    keys compose with ``operators.skew`` salting."""
    clk = clicks.withColumnRenamed(key, "_ck")
    return impressions.join(
        clk, _clause(key, imp_ts, click_ts, attribution_window), "inner"
    ).drop("_ck")
