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


def _md5_cell(value_col, depth_col, width: int):
    """Portable row-hash: first 8 hex chars of md5(value|depth) parsed as
    an int, mod width. Every primitive (md5, substring, base-16 parse,
    mod) exists in ANSI SQL / DuckDB, so a grid built this way is
    bit-reproducible outside Spark — the same portability trade
    ``dedup.simhash_portable`` makes vs xxhash64. 8 hex chars = 32 bits,
    plenty against widths ≤ 2^20."""
    digest = F.md5(F.concat(value_col.cast("string"), F.lit("|"), depth_col.cast("string")))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % width).alias("cell")


def cms_build_portable(
    df: DataFrame, col: str, width: int = 1024, depth: int = 5
) -> DataFrame:
    """Oracle-checkable sketch build: identical plan shape to
    :func:`cms_build` (explode → hash → map-side-combined groupBy), only
    the row-hash differs. NULL values are excluded (md5(NULL) is NULL in
    both engines; the xxhash64 variant hashes them — don't mix grids
    built by the two variants). Prefer :func:`cms_build` in production:
    one native 64-bit hash beats md5 + hex parse per cell."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth"),
            F.col(col).alias("_v"),
        )
        .select("depth", _md5_cell(F.col("_v"), F.col("depth"), width))
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate_portable(
    sketch: DataFrame, probes: DataFrame, col: str, width: int = 1024, depth: int = 5
) -> DataFrame:
    """Point estimates against a :func:`cms_build_portable` grid."""
    cells = (
        probes.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("probe"))
        .distinct()
        .select(
            "probe",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth"),
        )
        .withColumn("cell", _md5_cell(F.col("probe"), F.col("depth"), width))
    )
    joined = cells.join(sketch, ["depth", "cell"], "left").select(
        "probe", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy("probe").agg(F.min("cnt").alias("est_count"))


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


class StreamingCMS:
    """Continuously-maintained CMS: a ``foreachBatch`` hook merges each
    micro-batch's sketch into a stored grid (SnapshotStore keyed by the
    composite cell key), the same replay-safe refresh discipline as
    ``streaming.rollup.ContinuousAggregate`` — the batch_id commits
    atomically with the merge, so an at-least-once replay is skipped
    instead of double-counted. The merge is cell-wise addition over a
    grid bounded by depth × width rows: refresh cost is CONSTANT in both
    stream history and batch size (after the batch's own map-side
    combine), the whole point of maintaining a sketch instead of exact
    counts at 100 TB."""

    def __init__(self, store, col: str, width: int = 1024, depth: int = 5) -> None:
        if store.key != "cms_key":
            raise ValueError(
                "StreamingCMS needs a SnapshotStore keyed by 'cms_key' "
                f"(got {store.key!r})"
            )
        self.store = store
        self.col = col
        self.width = width
        self.depth = depth

    def _keyed(self, grid: DataFrame) -> DataFrame:
        return grid.withColumn(
            "cms_key", F.concat_ws("|", F.col("depth"), F.col("cell"))
        )

    def refresh(
        self,
        batch_df: DataFrame,
        batch_id: int | None = None,
        run_id: str | None = None,
    ) -> None:
        # run_id scopes batch_id (batch ids restart at 0 under a fresh
        # checkpoint); manual refreshes carry the last guard forward
        # instead of wiping it — same discipline as ContinuousAggregate
        if batch_id is not None:
            meta = {"cms_batch_id": batch_id, "cms_run_id": run_id}
        else:
            meta = self.store.commit_meta() if self.store.exists() else None
        prev = self.store.commit_meta() if self.store.exists() else {}
        if (
            batch_id is not None
            and prev.get("cms_batch_id") == batch_id
            and prev.get("cms_run_id") == run_id
        ):
            return  # replayed micro-batch: already merged (same run)
        newp = cms_build(batch_df, self.col, self.width, self.depth)
        if not self.store.exists():
            self.store.create(self._keyed(newp), meta=meta)
            return
        merged = cms_merge(self.store.read().drop("cms_key"), newp)
        self.store.upsert(self._keyed(merged), meta=meta)

    def attach(self, stream_df: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = stream_df.writeStream.foreachBatch(
            lambda df, bid: self.refresh(df, bid, run_id=checkpoint_dir)
        ).option("checkpointLocation", checkpoint_dir)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def sketch(self) -> DataFrame:
        return self.store.read().select("depth", "cell", "cnt")

    def estimate(self, probes: DataFrame, col: str) -> DataFrame:
        return cms_estimate(self.sketch(), probes, col, self.width, self.depth)
