"""User sessionization (SURVEY §2.12 ST5 — custom stateful operator).

The classic gap-based session split: a user's events belong to one
session until a silence longer than ``gap_minutes`` opens a new one.

Two implementations with identical semantics:

- :func:`sessionize` / :func:`session_stats` — batch: lag-window session
  flags → running-sum session sequence → per-session aggregate. One
  shuffle on the user key; the windows and the aggregate share that
  exchange. SQL-expressible, so the catalog entry is value-checked
  against DuckDB (`user_sessions`).
- :func:`sessionize_stream` — streaming: ``applyInPandasWithState``
  keeps (session_start, last_ts, n_events, sum_value) per user across
  micro-batches and EMITS a session the moment a later event closes it
  (gap exceeded). Open sessions stay in state — production closes them
  with a timeout or a flush sentinel; the test suite closes them with
  successor events and checks emitted sessions ≡ the batch twin minus
  each user's still-open last session.

State size is O(active users) × 4 longs — at 100 TB-scale event streams
the bound is live users, not events, which is the point of the
gap-session formulation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Add ``session_seq`` (1-based per user). Ties on ``ts_col`` are
    ordered by ``order_col`` for determinism; tie order cannot move a
    session boundary (gap 0 never exceeds the threshold), it only fixes
    the window evaluation order."""
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev = F.lag(ts_col).over(w)
    is_new = (
        prev.isNull() | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_us)
    ).cast("long")
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregate: start/end/n_events. The groupBy reuses the
    user-key exchange the sessionize window already created — one shuffle
    total (verified in tests/test_plans.py)."""
    s = sessionize(df, user_col, ts_col, order_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_stream(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Streaming gap sessions via ``applyInPandasWithState``.

    Emits (user_id, session_start_us, session_end_us, n_events) for every
    session CLOSED — by a successor event, or, when ``watermark_delay``
    is set, by the event-time watermark passing ``last_event + gap``
    (EventTimeTimeout: idle users' sessions flush without waiting for
    their next event; state is removed, so state size tracks ACTIVE
    users). Without a watermark, open sessions stay in state
    (NoTimeout) and production closes them with a flush sentinel.

    State per user is three longs; micro-batch boundaries are invisible
    (state carries the open session across batches — asserted by the
    multi-batch tests).

    Out-of-order contract (three-long state cannot re-split history):
    within a batch, events are sorted. Across batches, a straggler
    within ``gap`` of the open session's start EXTENDS the session
    backwards (start = min(start, t)); a straggler more than ``gap``
    older can never merge with the open session and emits as its own
    single-event session. Stragglers older than an ALREADY-EMITTED
    session can therefore produce a separate session where the batch
    twin would have merged them — bound that window with the watermark
    (events older than the watermark are dropped upstream), or use the
    batch twin for exact retrospective sessionization."""
    gap_us = gap_minutes * 60_000_000
    use_timeout = watermark_delay is not None

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
        if use_timeout and state.hasTimedOut:
            start, last, cnt = state.get
            state.remove()
            yield pd.DataFrame([(key[0], start, last, cnt)], columns=cols)
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        ts_us = (
            rows[ts_col].astype("datetime64[us]").astype("int64").sort_values().to_numpy()
        )
        if state.exists:
            start, last, cnt = state.get
        else:
            start, last, cnt = int(ts_us[0]), int(ts_us[0]) - 1, 0
            # last < first ts and cnt 0: the first event below opens the
            # session instead of closing a phantom empty one
        closed = []
        for t in ts_us:
            t = int(t)
            if cnt > 0 and t < start - gap_us:
                # cross-batch straggler older than the open session by
                # more than the gap: it can never merge with the open
                # session, and everything between it and `start` was
                # already processed — emit it as its own closed
                # single-event session. (A straggler WITHIN gap of
                # `start` extends the session backwards below.)
                closed.append((key[0], t, t, 1))
                continue
            if cnt > 0 and t - last > gap_us:
                closed.append((key[0], start, last, cnt))
                start, cnt = t, 0
            start = min(start, t) if cnt > 0 else start
            last = max(last, t)
            cnt += 1
        state.update((start, last, cnt))
        if use_timeout:
            # flush when the watermark passes session end + gap; the API
            # requires a timestamp beyond the current watermark
            timeout_ms = (last + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    src = (
        stream_df.withWatermark(ts_col, watermark_delay) if use_timeout else stream_df
    )
    return src.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=StructType(
            [
                StructField("start", LongType()),
                StructField("last", LongType()),
                StructField("cnt", LongType()),
            ]
        ),
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
