"""Dataset profiling — exact and sketch forms (the observability pass a
training-data pipeline runs before a job; see also ``q_table_profile``,
the oracle-gated exact entry).

One wide aggregate either way: a single scan and a single reduce no
matter how many columns are profiled; the unpivot to long form happens
on the 1-row aggregate result (free). The two forms differ only in the
cardinality/quantile estimators:

- ``exact=True``: ``count_distinct`` + exact interpolated
  ``percentile`` — engine-portable results (DuckDB replays them
  bit-for-bit), but count_distinct shuffles every distinct value and
  exact percentile buffers per-group values: fine at test SF, wrong at
  100 TB.
- ``exact=False`` (default): ``approx_count_distinct`` (HyperLogLog++,
  constant-size sketch, mergeable map-side) + ``approx_percentile``
  (Greenwald-Khanna, bounded buffer). Shuffle stays O(sketch), not
  O(distinct values) — the only viable shape at corpus scale.

``tests/test_profiling.py`` pins the sketch answers to the exact ones
within the configured error bounds, so the scale path is quality-gated
the same way the recall entries are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_FIELDS = [
    "rows", "nulls", "n_distinct", "min_v", "max_v", "mean_v", "stddev_v", "median_v",
]


def profile_numeric(
    df: DataFrame,
    cols: list[str],
    exact: bool = False,
    rsd: float = 0.05,
    percentile_accuracy: int = 10000,
) -> DataFrame:
    """Long-form profile ``(column, rows, nulls, n_distinct, min_v,
    max_v, mean_v, stddev_v, median_v)`` for the given numeric columns.

    ``rsd``: relative standard deviation target for HLL++ (exact=False).
    ``percentile_accuracy``: Greenwald-Khanna accuracy knob (higher =
    tighter bound, more buffer; error ≤ 1/accuracy of the rank).
    """
    aggs = []
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd=rsd)
        )
        median = (
            F.percentile(F.col(c), F.lit(0.5))
            if exact
            else F.percentile_approx(F.col(c), F.lit(0.5), F.lit(percentile_accuracy))
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            # min/max cast to double like mean/median: stack() requires
            # identical types at each position ACROSS columns, so a mixed
            # long+double column list would otherwise raise
            # STACK_COLUMN_DIFF_TYPES
            F.round(F.min(c).cast("double"), 4).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__mean"),
            F.round(F.stddev_samp(c), 4).alias(f"{c}__stddev"),
            F.round(median.cast("double"), 4).alias(f"{c}__median"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max, "
        f"{c}__mean, {c}__stddev, {c}__median"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as (column, {', '.join(PROFILE_FIELDS)})"
    )
