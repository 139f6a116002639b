"""Continuous aggregate ("hypertable rollup", brief: custom operators
list) — a materialized time-bucket rollup maintained INCREMENTALLY by
the stream, so dashboard queries scan the tiny aggregate table instead
of re-aggregating raw events.

TimescaleDB's continuous-aggregate semantics, Spark-first:

- the rollup table is a :class:`~deployment_spark.operators.crud.SnapshotStore`
  keyed by (bucket, dims) — snapshot isolation means a dashboard read
  never sees a half-refreshed rollup;
- each micro-batch computes PARTIAL aggregates (count, sum — the
  mergeable forms; avg is derived at read time, never stored) for the
  buckets it touches, merges them with the stored partials for ONLY
  those buckets, and upserts — O(batch + touched buckets) per refresh,
  independent of table history;
- late events within the watermark land in their true bucket and simply
  re-merge it: the rollup is eventually exact, which the test asserts
  (streamed rollup == batch groupBy over the same rows, including a
  late-arrival file).

At 100 TB the raw table is append-only parquet and this rollup is the
only thing interactive queries touch; the same shape extends to
multiple resolutions (hour → day → month) by chaining rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ContinuousAggregate:
    """Incrementally-maintained time-bucket rollup over a stream."""

    def __init__(
        self,
        store,
        bucket: str = "1 hour",
        ts_col: str = "ts",
        dims: list[str] | None = None,
        value_col: str = "value",
    ) -> None:
        self.store = store
        self.bucket = bucket
        self.ts_col = ts_col
        self.dims = dims or []
        self.value_col = value_col
        # the upsert key: bucket start + dims, packed into one string key
        # (SnapshotStore is single-key; a composite natural key is the
        # standard workaround)
        self.key_cols = ["bucket_start", *self.dims]
        if store.key != "agg_key":
            raise ValueError(
                "ContinuousAggregate needs a SnapshotStore keyed by 'agg_key' "
                f"(got {store.key!r})"
            )

    def _partials(self, df: DataFrame) -> DataFrame:
        b = F.window(F.col(self.ts_col), self.bucket)
        return (
            df.withColumn("bucket_start", b.start)
            .groupBy("bucket_start", *self.dims)
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                # double from day one: the merge in refresh() adds 0.0D,
                # so an integer-typed sum would flip long -> double on the
                # first merge — which the store's strict (name, type)
                # schema check now rejects as drift
                F.sum(F.col(self.value_col).cast("double")).alias("val_sum"),
            )
            .withColumn(
                "agg_key",
                F.concat_ws(
                    "|",
                    F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss"),
                    *self.dims,
                ),
            )
        )

    def refresh(
        self,
        batch_df: DataFrame,
        batch_id: int | None = None,
        run_id: str | None = None,
    ) -> None:
        """foreachBatch hook: merge this batch's partial aggregates into
        the stored rollup — read-modify-write of ONLY the touched keys
        (everything else rides along untouched in the upsert's base).

        Replay-safe: foreachBatch is at-least-once (a crash between this
        merge and the checkpoint commit re-runs the same batch_id), so
        the batch_id is committed ATOMICALLY with the merge (it rides in
        the store's pointer swap) and a replayed batch is skipped instead
        of double-merging its deltas.

        ``run_id`` scopes the batch_id: batch ids restart at 0 under a
        FRESH checkpoint, so equality on batch_id alone would silently
        skip a genuinely-new first batch. ``attach`` passes the
        checkpoint dir (the exact scope within which batch ids are
        comparable); replays share it, new checkpoints differ."""
        if batch_id is not None:
            meta = {"rollup_batch_id": batch_id, "rollup_run_id": run_id}
        else:
            # manual/batch-twin refresh: carry the last stream guard
            # forward instead of wiping it (a wipe would re-enable
            # double-merging a later genuine replay)
            meta = self.store.commit_meta() if self.store.exists() else None
        prev = self.store.commit_meta() if self.store.exists() else {}
        if (
            batch_id is not None
            and prev.get("rollup_batch_id") == batch_id
            and prev.get("rollup_run_id") == run_id
        ):
            return  # replay of an already-merged batch (same run)
        newp = self._partials(batch_df)
        if not self.store.exists():
            self.store.create(newp, meta=meta)
            return
        base = self.store.read()
        merged = (
            newp.alias("n")
            .join(base.alias("o"), "agg_key", "left")
            .select(
                F.col("agg_key"),
                F.col("n.bucket_start").alias("bucket_start"),
                *[F.col(f"n.{d}").alias(d) for d in self.dims],
                (F.col("n.cnt") + F.coalesce(F.col("o.cnt"), F.lit(0))).alias("cnt"),
                (
                    F.col("n.val_sum") + F.coalesce(F.col("o.val_sum"), F.lit(0.0))
                ).alias("val_sum"),
            )
        )
        self.store.upsert(merged, meta=meta)

    def read(self) -> DataFrame:
        """The dashboard view: derived averages computed at read time
        from the mergeable partials."""
        return self.store.read().select(
            "bucket_start",
            *self.dims,
            "cnt",
            F.round("val_sum", 4).alias("val_sum"),
            F.round(F.try_divide(F.col("val_sum"), F.col("cnt")), 4).alias("val_avg"),
        )

    def attach(self, stream_df: DataFrame, checkpoint_dir: str, available_now: bool = True):
        """Wire the rollup into a stream via foreachBatch. The checkpoint
        dir doubles as the replay-guard run id (see ``refresh``)."""
        writer = (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.refresh(df, bid, run_id=checkpoint_dir)
            )
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
