"""Distributed Count-Min sketch (brief: "a novel sketch" — frequency
estimation over columns too hot/high-cardinality for exact counting).

A CMS is a (depth × width) counter grid; item x increments cell
(d, h_d(x) % width) for each of the ``depth`` independent hash rows, and
a point estimate reads the MIN over its cells (one-sided error: never an
undercount; overcount ≤ εN with ε = e/width at probability 1 − e^-depth).

Spark-first realization: the grid IS a DataFrame of (depth, cell, cnt) —
built with one explode + one groupBy (map-side partial agg folds each
partition's counts before the exchange, so the shuffle is at most
depth·width rows per partition regardless of data size). Merging two
sketches = unionByName + groupBy sum, which makes the sketch table
maintainable incrementally exactly like any rollup. Estimation joins the
probe set against the grid — no driver-side materialization of either.

Hashes: xxhash64 salted by the depth index — the same
independent-seeded-hash construction minhash uses (dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, col: str, width: int = 1024, depth: int = 5
) -> DataFrame:
    """Build the sketch table (depth, cell, cnt) for one column."""
    return (
        df.select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth"),
            F.col(col).alias("_v"),
        )
        .select(
            "depth",
            F.pmod(F.xxhash64(F.col("_v"), F.col("depth")), F.lit(width)).alias("cell"),
        )
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketches over disjoint data merge by cell-wise addition — the
    property that lets per-partition / per-day sketches roll up."""
    return (
        a.unionByName(b).groupBy("depth", "cell").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, width: int = 1024, depth: int = 5
) -> DataFrame:
    """Point-frequency estimates for each probe value: min over the
    probe's ``depth`` cells. Absent cells count 0 (left join +
    coalesce), so unseen values estimate 0 unless they collide
    everywhere."""
    cells = probes.select(F.col(col).alias("probe")).distinct().select(
        "probe",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth"),
    ).withColumn(
        "cell", F.pmod(F.xxhash64(F.col("probe"), F.col("depth")), F.lit(width))
    )
    joined = cells.join(sketch, ["depth", "cell"], "left").select(
        "probe", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy("probe").agg(F.min("cnt").alias("est_count"))
