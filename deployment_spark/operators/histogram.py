"""Mergeable fixed-bin histogram — continuous quantile/distribution
tracking over batches and streams (companion to the CMS frequency sketch
and the continuous aggregate; brief: "a novel sketch").

Why not ``percentile_approx`` alone: Spark's GK sketch answers one batch
exactly once — it is not exposed as a mergeable value you can store and
fold the next micro-batch into. A fixed-bin histogram IS mergeable
(cell-wise addition, same algebra as the CMS grid), so a stream can
maintain a distribution forever at O(bins) state, and quantiles read off
the cumulative bins at query time with error bounded by bin width.

Shapes:
- ``hist_build``: one pass, map-side combined groupBy — shuffle is at
  most ``bins`` rows per partition regardless of data size;
- ``hist_merge``: unionByName + sum (disjoint-data merge);
- ``hist_quantiles``: cumulative window over ≤ ``bins`` rows (driver-
  scale), linear interpolation inside the winning bin;
- ``StreamingHistogram``: foreachBatch merge into a SnapshotStore with
  the same (run_id, batch_id) replay guard as ContinuousAggregate /
  StreamingCMS.

The bin range [lo, hi) is fixed at build time (training-data pipelines
know their domains: token counts, doc lengths, quality scores). Values
outside clamp into the edge bins, so the histogram never drops rows —
tail quantiles degrade gracefully instead of erroring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bin_expr(col: str, lo: float, hi: float, bins: int):
    w = (hi - lo) / bins
    raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(w))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def hist_build(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 256
) -> DataFrame:
    """(bin, cnt) table for one numeric column; nulls are excluded (they
    are counted by profiling, not by the distribution)."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    return (
        df.filter(F.col(col).isNotNull())
        .select(_bin_expr(col, lo, hi, bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame, qs: list[float], lo: float, hi: float, bins: int = 256
) -> DataFrame:
    """(q, value) estimates from cumulative bin counts with linear
    interpolation inside the target bin; error ≤ one bin width. The
    window runs over ≤ ``bins`` rows — driver-scale by construction."""
    w = (hi - lo) / bins
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
    )
    total = hist.agg(F.sum("cnt").alias("_n"))
    probes = hist.sparkSession.createDataFrame([(float(q),) for q in qs], ["q"])
    # first bin whose cumulative count reaches q·N
    hit = (
        probes.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(cum))
        .filter(F.col("cum") >= F.col("q") * F.col("_n"))
        .groupBy("q", "_n")
        .agg(F.min("bin").alias("bin"))
    )
    # interpolate within the bin: position of the target rank among the
    # bin's own counts
    detail = hit.join(F.broadcast(cum), "bin").select(
        "q",
        (
            F.lit(lo)
            + (F.col("bin") + (
                (F.col("q") * F.col("_n") - (F.col("cum") - F.col("cnt")))
                / F.greatest(F.col("cnt"), F.lit(1))
            )) * F.lit(w)
        ).alias("value"),
    )
    return detail


class StreamingHistogram:
    """Continuously-maintained histogram: micro-batch grids merge into a
    SnapshotStore keyed by ``hist_key`` (the bin), replay-safe via the
    (run_id, batch_id) guard. Refresh cost is O(bins) regardless of
    stream history."""

    def __init__(self, store, col: str, lo: float, hi: float, bins: int = 256) -> None:
        if store.key != "hist_key":
            raise ValueError(
                "StreamingHistogram needs a SnapshotStore keyed by 'hist_key' "
                f"(got {store.key!r})"
            )
        self.store = store
        self.col = col
        self.lo, self.hi, self.bins = lo, hi, bins

    def _keyed(self, grid: DataFrame) -> DataFrame:
        return grid.withColumn("hist_key", F.col("bin").cast("string"))

    def refresh(self, batch_df: DataFrame, batch_id: int | None = None, run_id: str | None = None) -> None:
        if batch_id is not None:
            meta = {"hist_batch_id": batch_id, "hist_run_id": run_id}
        else:
            meta = self.store.commit_meta() if self.store.exists() else None
        prev = self.store.commit_meta() if self.store.exists() else {}
        if (
            batch_id is not None
            and prev.get("hist_batch_id") == batch_id
            and prev.get("hist_run_id") == run_id
        ):
            return
        newp = hist_build(batch_df, self.col, self.lo, self.hi, self.bins)
        if not self.store.exists():
            self.store.create(self._keyed(newp), meta=meta)
            return
        merged = hist_merge(self.store.read().drop("hist_key"), newp)
        self.store.upsert(self._keyed(merged), meta=meta)

    def attach(self, stream_df: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = stream_df.writeStream.foreachBatch(
            lambda df, bid: self.refresh(df, bid, run_id=checkpoint_dir)
        ).option("checkpointLocation", checkpoint_dir)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def histogram(self) -> DataFrame:
        return self.store.read().select("bin", "cnt")

    def quantiles(self, qs: list[float]) -> DataFrame:
        return hist_quantiles(self.histogram(), qs, self.lo, self.hi, self.bins)
