"""As-of (point-in-time) join — the time-series operator Spark's built-in
joins don't express (brief: custom operators list; pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

Each left row picks the single most recent right row with
``right.time <= left.time`` within the same ``by`` keys (backward
direction; ``>=``/soonest for forward), optionally bounded by a
tolerance.

Scale shape — why NOT the naive forms:

- inequality join + window: Catalyst plans ``l.ts >= r.ts`` as a range
  join that explodes to O(|L|·|R|) per key before the window prunes.
- per-key ``applyInPandas`` + ``merge_asof``: Python in the hot path and
  a full per-key materialization.

Instead: tag both sides, UNION, and run one ``last(ignorenulls)``
window ordered by (time, side) per key — the classic tagged-union
sweep. ONE shuffle on the by-keys, zero row blowup, stays JVM-side.
At equal timestamps the right row sorts first, so a simultaneous quote
is visible to the trade — DuckDB ``ASOF JOIN`` (``>=``) agrees, which is
what the ``events_asof_purchase`` catalog entry proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the single
    nearest preceding (backward) or following (forward) right row per
    ``by`` group; unmatched (or out-of-tolerance) rows keep NULLs —
    pandas ``merge_asof`` semantics.

    ``right`` should be unique per (by, time) — with duplicates the
    winner is the union sweep's last-in-order, deterministic but
    arbitrary, as in DuckDB.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = by or []
    rcols = right_cols or [
        c for c in right.columns if c not in by and c != time_col
    ]
    out_rcols = {c: f"{c}{suffix}" if c in left.columns else c for c in rcols}
    rtime_out = f"{time_col}{suffix}"

    # The right time AND all payload columns ride in ONE struct carried by
    # a single last(ignorenulls): per-column carries would backfill a
    # genuinely-NULL payload field from an OLDER right row, mixing columns
    # of different right rows — pandas merge_asof / DuckDB ASOF take the
    # whole nearest row, NULLs included. The struct is non-null for every
    # right row (even all-NULL payloads), so ignorenulls skips only the
    # interleaved left rows.
    rstruct = StructType(
        [StructField("_rtime", right.schema[time_col].dataType)]
        + [StructField(f"_r_{c}", right.schema[c].dataType) for c in rcols]
    )
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(rstruct).alias("_r"),
    )
    rhs = right.select(
        *[
            F.col(c) if c in by or c == time_col else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        F.struct(
            F.col(time_col).alias("_rtime"),
            *[F.col(c).alias(f"_r_{c}") for c in rcols],
        ).alias("_r"),
    )
    u = lhs.unionByName(rhs)

    # backward: sweep forward in time, right rows first at equal ts;
    # forward: sweep is the mirror (descending), right still first.
    t = F.col(time_col)
    order = [t.asc(), F.col("_side").asc()] if direction == "backward" else [
        t.desc(),
        F.col("_side").asc(),
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        u.select(
            *[F.col(c) for c in left.columns],
            F.col("_side"),
            F.last("_r", ignorenulls=True).over(w).alias("_rr"),
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )

    if tolerance_us is not None:
        gap = (
            F.unix_micros(F.col(time_col)) - F.unix_micros(F.col("_rr._rtime"))
            if direction == "backward"
            else F.unix_micros(F.col("_rr._rtime")) - F.unix_micros(F.col(time_col))
        )
        # out-of-tolerance drops the WHOLE struct — time and payload null
        # together, never a half-matched row
        carried = carried.withColumn("_rr", F.when(gap <= tolerance_us, F.col("_rr")))
    return carried.select(
        *[F.col(c) for c in left.columns],
        F.col("_rr._rtime").alias(rtime_out),
        *[F.col(f"_rr._r_{c}").alias(out_rcols[c]) for c in rcols],
    )
