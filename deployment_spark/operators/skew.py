"""Skew-safe operators (SURVEY §4 scale notes).

AQE's skew handling covers shuffle JOINS, but a window function over a
hot key cannot be split by AQE: every row of the key lands in one task,
and at 100 TB one viral key (one hot user, one boilerplate document
hash) serializes the stage. The classic fix is algebraic: operations
that are associative per key (top-N, min/max, sum) compute in two
phases — partial per (key, salt) on balanced partitions, then final
over the tiny per-salt survivors.

``salted_topn_per_key`` == the plain window top-N row-for-row (property:
top-N of a union = top-N of per-part top-Ns), with the same
deterministic tie-break; the hot key's work spreads over ``salt`` tasks
and the final phase sees ≤ n·salt rows per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_exprs(order_col: str | Column, ascending: bool, tie_cols: list[str]):
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    first = oc.asc() if ascending else oc.desc()
    return [first] + [F.col(t).asc() for t in tie_cols]


def topn_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str | Column,
    n: int,
    ascending: bool = False,
    tie_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Plain window top-N per key (T2/T3 shape) — the baseline the salted
    variant must match row-for-row."""
    w = Window.partitionBy(*keys).orderBy(*_order_exprs(order_col, ascending, tie_cols or []))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def salted_topn_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str | Column,
    n: int,
    salt: int = 16,
    ascending: bool = False,
    tie_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Two-phase top-N for skewed keys.

    Phase 1 partitions by (keys, salt) — the hot key's rows spread over
    ``salt`` balanced tasks, each keeping its local top-N. Phase 2 ranks
    the ≤ n·salt survivors per key. Salt is a deterministic hash of the
    whole row, so reruns produce identical partitioning; results equal
    :func:`topn_per_key` exactly (same composite tie-break) — asserted
    by tests and the `skewed_topn` catalog entry's plain-window oracle."""
    ties = tie_cols or []
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    salted = df.withColumn("_salt", salt_col)
    w1 = Window.partitionBy(*keys, "_salt").orderBy(
        *_order_exprs(order_col, ascending, ties)
    )
    partial = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n)
        .drop("_r1", "_salt")
    )
    return topn_per_key(partial, keys, order_col, n, ascending, ties, rank_col)
