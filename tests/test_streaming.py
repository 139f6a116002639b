"""Streaming ingest parity (ST3): streamed micro-batch ingest total must
equal batch ingest of the same files; checkpoint resume ingests only new
files (the reference's skiprows-offset bookkeeping, done right)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from deployment_spark.functions.text import packet_text_v1
from deployment_spark.operators.crud import SnapshotStore
from deployment_spark.schemas import PACKET_COLUMNS, sample_packet_rows
from deployment_spark.streaming.ingest import (
    ingest_to_store,
    packet_csv_stream,
    windowed_event_counts,
)


def write_chunk(spark, path: str, start: int, n: int) -> None:
    (
        sample_packet_rows(spark, start + n)
        .filter(F.col("frame_number").cast("long") >= start)
        .coalesce(1)
        .write.mode("append")
        .option("header", "true")
        .csv(path)
    )


def clean(df):
    return df.withColumn("packet_text", packet_text_v1()).withColumn(
        "frame_number", F.col("frame_number").cast("long")
    )


def test_stream_ingest_equals_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    # reference cadence: 1,000-row chunks landed incrementally (stream1.py:21)
    write_chunk(spark, landing, 0, 1000)
    write_chunk(spark, landing, 1000, 1000)

    store = SnapshotStore(spark, str(tmp_path / "corpus"), key="frame_number")
    q = ingest_to_store(packet_csv_stream(spark, landing), store, ckpt, transform=clean)
    q.awaitTermination(120)
    assert store.count() == 2000

    # resume: only the NEW file is ingested (checkpoint, not skiprows math)
    write_chunk(spark, landing, 2000, 500)
    q2 = ingest_to_store(packet_csv_stream(spark, landing), store, ckpt, transform=clean)
    q2.awaitTermination(120)
    assert store.count() == 2500

    # batch read of the same landing dir agrees (ST3 parity assertion)
    batch = clean(spark.read.option("header", "true").schema(
        spark.read.option("header", "true").csv(landing).schema
    ).csv(landing))
    assert batch.count() == 2500
    assert store.read().select("packet_text").distinct().count() == batch.select(
        packet_text_v1().alias("packet_text")
    ).distinct().count()


def test_first_batch_dedups_on_key(spark, tmp_path):
    """The FIRST micro-batch goes through store.insert's pk dedup too
    (round-1 advice: it used to call create() directly, letting in-batch
    duplicate keys land in the store — stream1.py:265 parity)."""
    landing = str(tmp_path / "landing")
    # one file with duplicate frame_numbers: rows 0..499 written twice
    chunk = sample_packet_rows(spark, 500)
    chunk.unionByName(chunk).coalesce(1).write.mode("append").option(
        "header", "true"
    ).csv(landing)

    store = SnapshotStore(spark, str(tmp_path / "corpus"), key="frame_number")
    q = ingest_to_store(packet_csv_stream(spark, landing), store, str(tmp_path / "ckpt"), transform=clean)
    q.awaitTermination(120)
    assert store.count() == 500  # not 1000


def test_windowed_event_counts_matches_batch(spark, sf_dir, tmp_path):
    # land the events table as files, stream them through the windowed agg
    from deployment_spark.schemas import load_table

    src = load_table(spark, sf_dir, "events")
    landing = str(tmp_path / "events_landing")
    src.coalesce(2).write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema(src.schema).parquet(landing)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = {
        (r.window_start, r.event_type): r.cnt
        for r in (
            src.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type",
            ).agg(F.count(F.lit(1)).alias("cnt"))
        ).collect()
    }
    assert streamed == batch


def test_stateful_sessionize_stream_equals_batch(spark, tmp_path):
    """ST5 — applyInPandasWithState gap sessions: sessions closed by a
    successor event must exactly equal the batch twin's sessions minus
    each user's final (still-open) one, across MULTIPLE micro-batches
    (maxFilesPerTrigger=1), proving state carries open sessions over
    batch boundaries."""
    import datetime as dt
    import uuid

    from deployment_spark.streaming.sessionize import session_stats, sessionize_stream

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 users; per user: events at minute offsets forming known sessions
    # with a 30-min gap. Session boundaries deliberately straddle the
    # 4-file split below.
    offs = [0, 5, 10, 50, 55, 120, 125, 126, 300, 301]
    for u in range(3):
        for m in offs:
            rows.append((eid, u, base + dt.timedelta(minutes=m, seconds=u)))
            eid += 1
    rows.sort(key=lambda r: r[2])  # arrival order = event time
    landing = str(tmp_path / "events_landing")
    os.makedirs(landing)
    files = 4
    per = (len(rows) + files - 1) // files
    for i in range(files):
        chunk = rows[i * per : (i + 1) * per]
        if chunk:
            spark.createDataFrame(
                chunk, "event_id LONG, user_id LONG, ts TIMESTAMP"
            ).coalesce(1).write.mode("overwrite").parquet(f"{landing}/f{i}")

    schema = "event_id LONG, user_id LONG, ts TIMESTAMP"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/f*")
    )
    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.sql(f"select * from {sink}").collect()
    }

    batch_df = spark.createDataFrame(rows, schema)
    stats = session_stats(batch_df, gap_minutes=30)
    # drop each user's last session (open at end-of-stream, not emitted)
    last = stats.groupBy("user_id").agg(F.max("session_seq").alias("last_seq"))
    closed = stats.join(last, "user_id").filter(F.col("session_seq") < F.col("last_seq"))
    want = {
        (
            r.user_id,
            int(r.session_start.timestamp() * 1_000_000),
            int(r.session_end.timestamp() * 1_000_000),
            r.n_events,
        )
        for r in closed.collect()
    }
    assert want  # the construction really produces closed sessions
    assert got == want


def test_sessionize_stream_event_time_timeout_flushes_idle_users(spark, tmp_path):
    """With a watermark, an idle user's open session must flush via
    EventTimeTimeout once other users' events advance the watermark past
    session_end + gap — no successor event needed, state removed."""
    import datetime as dt
    import uuid

    from deployment_spark.streaming.sessionize import sessionize_stream

    base = dt.datetime(2024, 1, 1)

    def ev(eid, uid, minutes):
        return (eid, uid, base + dt.timedelta(minutes=minutes))

    us = 1_000_000

    def at(minutes):
        return int((base + dt.timedelta(minutes=minutes)).timestamp() * us)

    # user 0: two events early, then silence. user 1 keeps the watermark
    # moving across files.
    files = [
        [ev(0, 0, 0), ev(1, 0, 5), ev(2, 1, 0)],
        [ev(3, 1, 100)],
        [ev(4, 1, 200)],
        [ev(5, 1, 300)],
    ]
    landing = str(tmp_path / "ett_landing")
    os.makedirs(landing)
    for i, chunk in enumerate(files):
        spark.createDataFrame(
            chunk, "event_id LONG, user_id LONG, ts TIMESTAMP"
        ).coalesce(1).write.mode("overwrite").parquet(f"{landing}/f{i}")

    stream = (
        spark.readStream.schema("event_id LONG, user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/f*")
    )
    sink = f"ett_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark_delay="1 minute")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.sql(f"select * from {sink}").collect()
    }
    want = {
        (0, at(0), at(5), 2),      # idle user: flushed by TIMEOUT
        (1, at(0), at(0), 1),      # closed by successor at minute 100
        (1, at(100), at(100), 1),  # closed by successor at minute 200
        (1, at(200), at(200), 1),  # closed by successor at minute 300
        # user 1's session at minute 300 stays open (watermark never passes)
    }
    assert got == want


def test_continuous_aggregate_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Hypertable-rollup semantics: the incrementally-maintained hourly
    rollup (foreachBatch partial-merge upserts) must equal a batch
    groupBy over all raw rows — including a LATE file that re-merges
    already-written buckets."""
    from deployment_spark.operators.crud import SnapshotStore
    from deployment_spark.schemas import load_table
    from deployment_spark.streaming.rollup import ContinuousAggregate

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    # wave 1: events outside 10:00-11:00 on Jan 2; wave 2 (the "late"
    # file): exactly that hour — its buckets may already exist
    late_lo = "2024-01-02 10:00:00"
    late_hi = "2024-01-02 11:00:00"
    wave1 = ev.filter(~F.col("ts").between(late_lo, late_hi))
    wave2 = ev.filter(F.col("ts").between(late_lo, late_hi))
    assert wave2.count() > 0
    landing = str(tmp_path / "roll_landing")
    wave1.coalesce(2).write.mode("append").parquet(landing)

    store = SnapshotStore(spark, str(tmp_path / "rollup_store"), key="agg_key")
    agg = ContinuousAggregate(store, bucket="1 hour", dims=["event_type"])
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    q = agg.attach(stream, str(tmp_path / "roll_ckpt"))
    q.awaitTermination(120)

    # late arrival: wave 2 lands, stream resumes from checkpoint
    wave2.coalesce(1).write.mode("append").parquet(landing)
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    q2 = agg.attach(stream2, str(tmp_path / "roll_ckpt"))
    q2.awaitTermination(120)

    got = {
        (str(r.bucket_start), r.event_type): (r.cnt, r.val_sum, r.val_avg)
        for r in agg.read().collect()
    }
    want = {
        (str(r.bucket_start), r.event_type): (r.cnt, r.val_sum, r.val_avg)
        for r in (
            ev.withColumn("bucket_start", F.window("ts", "1 hour").start)
            .groupBy("bucket_start", "event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.round(F.sum("value"), 4).alias("val_sum"),
                F.round(F.avg("value"), 4).alias("val_avg"),
            )
            .collect()
        )
    }
    assert got == want


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate keys across micro-batches (within the watermark) are
    dropped in-flight; each key lands exactly once."""
    import datetime as dt
    import uuid

    from deployment_spark.streaming.ingest import streaming_dedup

    base = dt.datetime(2024, 1, 1)
    f1 = [(i, base + dt.timedelta(minutes=i)) for i in range(50)]
    # second file: 30 dupes of the first (same key, same ts) + 20 new
    f2 = f1[:30] + [(100 + i, base + dt.timedelta(minutes=50 + i)) for i in range(20)]
    landing = str(tmp_path / "dedup_landing")
    os.makedirs(landing)
    for i, chunk in enumerate([f1, f2]):
        spark.createDataFrame(chunk, "k LONG, ts TIMESTAMP").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{landing}/f{i}")

    stream = (
        spark.readStream.schema("k LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/f*")
    )
    sink = f"sd_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_dedup(stream, ["k"], watermark="10 hours")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r.k for r in spark.sql(f"select k from {sink}").collect()]
    assert sorted(got) == sorted(set(got))  # no dupes landed
    assert set(got) == set(range(50)) | {100 + i for i in range(20)}


def test_rollup_refresh_is_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering the SAME batch_id
    (crash-before-checkpoint replay) must not double-merge partials."""
    import datetime as dt

    from deployment_spark.operators.crud import SnapshotStore
    from deployment_spark.streaming.rollup import ContinuousAggregate

    base = dt.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i), "click", 2.0) for i in range(10)],
        "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE",
    )
    store = SnapshotStore(spark, str(tmp_path / "replay_store"), key="agg_key")
    agg = ContinuousAggregate(store, bucket="1 hour", dims=["event_type"])
    agg.refresh(batch, batch_id=0)
    first = {(str(r.bucket_start), r.event_type): (r.cnt, r.val_sum) for r in agg.read().collect()}
    agg.refresh(batch, batch_id=0)  # replay
    again = {(str(r.bucket_start), r.event_type): (r.cnt, r.val_sum) for r in agg.read().collect()}
    assert first == again
    # a genuinely NEW batch still merges
    agg.refresh(batch, batch_id=1)
    final = {(str(r.bucket_start), r.event_type): r.cnt for r in agg.read().collect()}
    assert all(c == 20 for c in final.values())


def test_sessionize_stream_straggler_contract(spark, tmp_path):
    """Cross-batch stragglers: within-gap ones extend the open session
    BACKWARDS (emitted bounds contain every member); older-than-gap ones
    emit as their own single-event session."""
    import datetime as dt
    import uuid

    from deployment_spark.streaming.sessionize import sessionize_stream

    base = dt.datetime(2024, 1, 1)
    us = 1_000_000

    def at(minutes):
        return int((base + dt.timedelta(minutes=minutes)).timestamp() * us)

    def ev(eid, m):
        return (eid, 0, base + dt.timedelta(minutes=m))

    # batch 1: open session at minute 60. batch 2: straggler at 45
    # (within gap 30 of start) + straggler at 10 (older than gap) +
    # closer at minute 200.
    files = [[ev(0, 60), ev(1, 61)], [ev(2, 45), ev(3, 10), ev(4, 200)]]
    landing = str(tmp_path / "straggle")
    os.makedirs(landing)
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, "event_id LONG, user_id LONG, ts TIMESTAMP").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{landing}/f{i}")
    stream = (
        spark.readStream.schema("event_id LONG, user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/f*")
    )
    sink = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.sql(f"select * from {sink}").collect()
    }
    want = {
        (at(10), at(10), 1),   # older-than-gap straggler: own session
        (at(45), at(61), 3),   # session EXTENDED backwards to 45, closed by 200
    }
    assert got == want


def test_attribution_join_stream_equals_batch(spark, tmp_path):
    """Watermarked stream-stream attribution join ≡ its batch twin once
    all files are processed: clicks match impressions of the same user
    within the attribution window; out-of-window and keyless clicks drop.
    State stays bounded because both sides carry watermarks and the join
    condition carries the time range."""
    import datetime as dt

    from deployment_spark.streaming.joins import (
        attribution_join,
        attribution_join_batch,
    )

    base = dt.datetime(2024, 1, 1)

    def t(m):
        return base + dt.timedelta(minutes=m)

    imp_rows = [
        # (user, imp_id, imp_ts)
        (1, 100, t(0)), (1, 101, t(40)), (2, 200, t(5)),
        (3, 300, t(10)), (4, 400, t(0)),
    ]
    clk_rows = [
        # (user, click_id, click_ts)
        (1, 9000, t(20)),   # attributes to imp 100 (within 30m)
        (1, 9001, t(55)),   # attributes to imp 101 only (100 is 55m old)
        (2, 9002, t(50)),   # out of window for imp 200 -> drops
        (3, 9003, t(10)),   # boundary: click_ts == imp_ts attributes
        (5, 9004, t(15)),   # no impression for user 5 -> drops
    ]
    imp_dir, clk_dir = str(tmp_path / "imps"), str(tmp_path / "clicks")
    spark.createDataFrame(
        imp_rows, "user_id LONG, imp_id LONG, imp_ts TIMESTAMP"
    ).coalesce(1).write.mode("append").parquet(imp_dir)
    spark.createDataFrame(
        clk_rows, "user_id LONG, click_id LONG, click_ts TIMESTAMP"
    ).coalesce(1).write.mode("append").parquet(clk_dir)

    imp_stream = spark.readStream.schema(
        "user_id LONG, imp_id LONG, imp_ts TIMESTAMP"
    ).parquet(imp_dir)
    clk_stream = spark.readStream.schema(
        "user_id LONG, click_id LONG, click_ts TIMESTAMP"
    ).parquet(clk_dir)

    joined = attribution_join(imp_stream, clk_stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.click_id, r.imp_id)
        for r in spark.sql("SELECT click_id, imp_id FROM attr_out").collect()
    }
    want = {(9000, 100), (9001, 101), (9003, 300)}
    assert got == want

    batch = attribution_join_batch(
        spark.read.parquet(imp_dir), spark.read.parquet(clk_dir)
    )
    assert {(r.click_id, r.imp_id) for r in batch.collect()} == want


def test_streaming_entry_restores_session_conf(spark, sf_dir):
    """Catalog entries must be order-independent: q_streaming_hourly_counts
    needs spark.sql.legacy.parquet.nanosAsLong during its schema probe +
    stream run, but must not leak it into the session (a later entry
    reading the same parquet would silently see nanos as longs)."""
    from deployment_spark.queries import q_streaming_hourly_counts

    key = "spark.sql.legacy.parquet.nanosAsLong"
    session_value = spark.conf.get(key, None)  # 'true' per session.py:55
    try:
        # simulate a caller session that never set the legacy conf
        spark.conf.unset(key)
        out = q_streaming_hourly_counts(spark, sf_dir)
        assert out.count() > 0
        assert spark.conf.get(key, None) is None, "entry leaked session conf"
    finally:
        if session_value is not None:
            spark.conf.set(key, session_value)
    # and with the engine's session default in place, the entry restores
    # that exact value rather than clobbering it
    out = q_streaming_hourly_counts(spark, sf_dir)
    assert out.count() > 0
    assert spark.conf.get(key, None) == session_value


def test_curated_ingest_dedups_across_micro_batches(spark, tmp_path):
    """curated_ingest_to_store: two files land as two micro-batches
    (maxFilesPerTrigger=1); the second carries exact and near copies of
    the first's docs plus an intra-batch dup — none may land. The store
    must equal kept(U1) + incremental(U2 vs kept), i.e. the manual
    two-step admission."""
    from deployment_spark.operators.dedup import incremental_dedup
    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    u1 = docs.filter(F.col("doc_id") < 80)
    u2 = (
        docs.filter((F.col("doc_id") >= 80) & (F.col("doc_id") < 120))
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionByName(
            u1.filter(F.col("doc_id") < 6).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            u1.filter((F.col("doc_id") >= 6) & (F.col("doc_id") < 12)).select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
            )
        )
    )
    landing = str(tmp_path / "landing")
    u1.coalesce(1).write.parquet(f"{landing}/batch=000")
    u2.coalesce(1).write.parquet(f"{landing}/batch=001")

    store = SnapshotStore(spark, str(tmp_path / "corpus"), key="doc_id")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    q = curated_ingest_to_store(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {r.doc_id for r in store.read().select("doc_id").collect()}
    # no planted duplicate landed
    assert not any(i >= 200000 for i in got)
    # equals the manual two-step admission over the same split
    # (micro-batch order is the lexicographic file order; batch 1 runs
    # the full exact+near admission against an empty kept set too)
    kept1 = incremental_dedup(u1, u1.limit(0))
    manual = {r.doc_id for r in kept1.collect()} | {
        r.doc_id for r in incremental_dedup(u2, kept1.select("doc_id", "text")).collect()
    }
    assert got == manual

    # replay safety: a fresh checkpoint re-delivers BOTH files against
    # the populated store — every id is already kept, the batch reduces
    # to empty, nothing double-lands
    n_before = store.count()
    q2 = curated_ingest_to_store(
        stream, store, str(tmp_path / "ckpt_replay")
    )
    q2.awaitTermination(180)
    assert store.count() == n_before


def test_curated_ingest_maintains_signature_index(spark, tmp_path):
    """index_dir mode: the wrapper appends each admitted batch's band
    signatures, admission reads the index instead of recomputing kept
    MinHash, and the final store matches the index-less run."""
    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    u1 = docs.filter(F.col("doc_id") < 60)
    u2 = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 90)).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        u1.filter(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 200000).alias("doc_id"), "text"
        )
    )
    landing = str(tmp_path / "landing")
    u1.coalesce(1).write.parquet(f"{landing}/b=000")
    u2.coalesce(1).write.parquet(f"{landing}/b=001")

    def run(root, index_dir=None):
        store = SnapshotStore(spark, f"{root}/corpus", key="doc_id")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(landing)
        )
        q = curated_ingest_to_store(
            stream, store, f"{root}/ckpt", index_dir=index_dir
        )
        q.awaitTermination(180)
        return store

    plain = run(str(tmp_path / "plain"))
    idx_dir = str(tmp_path / "sig_index")
    indexed = run(str(tmp_path / "indexed"), index_dir=idx_dir)
    a = {r.doc_id for r in plain.read().select("doc_id").collect()}
    b = {r.doc_id for r in indexed.read().select("doc_id").collect()}
    assert a == b
    # the index covers exactly the admitted ids
    sig_ids = {
        r.doc_id
        for r in spark.read.parquet(idx_dir).select("doc_id").distinct().collect()
    }
    assert sig_ids == b

def test_curated_ingest_watermark_is_max_seen_not_max_kept(spark, tmp_path):
    """r5 ADVICE (ingest.py:140): the replay watermark must be the max id
    SEEN per batch, not the max id KEPT — a batch whose highest ids were
    all dropped duplicates must still reduce to a no-op on replay. Old
    behavior: the dropped tail sat above the max-kept watermark, got
    re-evaluated against the grown kept set, and the replayed 'batch'
    committed a fresh (empty) version. Pinned here via the version
    counter: a full replay may not commit at all."""
    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    u1 = docs.filter(F.col("doc_id") < 50)
    # batch 2: 20 genuinely-new docs, then a TAIL of exact dups of u1
    # docs at the HIGHEST ids in the batch (they all get dropped)
    u2 = (
        docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 70))
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionByName(
            u1.filter(F.col("doc_id") < 8).select(
                (F.col("doc_id") + 900000).alias("doc_id"), "text"
            )
        )
    )
    landing = str(tmp_path / "landing")
    u1.coalesce(1).write.parquet(f"{landing}/b=000")
    u2.coalesce(1).write.parquet(f"{landing}/b=001")

    store = SnapshotStore(spark, str(tmp_path / "corpus"), key="doc_id")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    q = curated_ingest_to_store(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    kept = {r.doc_id for r in store.read().select("doc_id").collect()}
    assert not any(i >= 900000 for i in kept)  # the dup tail was dropped
    # the persisted watermark covers the dropped tail
    max_seen = u2.agg(F.max("doc_id")).collect()[0][0]
    assert store.commit_meta()["curated_max_seen"] == max_seen
    assert max_seen > max(kept)  # i.e. the fix is actually exercised

    # fresh-checkpoint replay of both files: zero new commits, store
    # byte-identical (old code would bump the version on the dropped
    # tail's re-evaluation)
    v_before = store.current_version()
    q2 = curated_ingest_to_store(stream, store, str(tmp_path / "ckpt2"))
    q2.awaitTermination(180)
    assert store.current_version() == v_before
    assert {r.doc_id for r in store.read().select("doc_id").collect()} == kept


def test_curated_ingest_reconciles_lost_index_append(spark, tmp_path):
    """r5 ADVICE (ingest.py:193): store.insert and the signature-index
    append are non-atomic; a crash between them loses the batch's
    signatures and every later batch silently admits near-dups of those
    docs. The wrapper must detect (index max id < kept max id) and
    backfill before admission. Simulated by deleting the index after
    batch 1, then streaming batch 2 through the same checkpoint."""
    import shutil

    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    u1 = docs.filter(F.col("doc_id") < 60)
    # batch 2: new docs + near-copies of u1 docs (first word stripped) —
    # these are caught ONLY via the kept side's MinHash signatures
    u2 = (
        docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 80))
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionByName(
            u1.filter(F.col("doc_id") < 10).select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
            )
        )
    )
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    idx_dir = str(tmp_path / "sig_index")
    store = SnapshotStore(spark, str(tmp_path / "corpus"), key="doc_id")

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("recursiveFileLookup", "true")
            .parquet(landing)
        )
        q = curated_ingest_to_store(stream, store, ckpt, index_dir=idx_dir)
        q.awaitTermination(180)

    u1.coalesce(1).write.parquet(f"{landing}/b=000")
    drain()
    shutil.rmtree(idx_dir)  # the 'crash lost the index append' state

    u2.coalesce(1).write.parquet(f"{landing}/b=001")
    drain()  # same checkpoint: only batch 2 is delivered

    kept = {r.doc_id for r in store.read().select("doc_id").collect()}
    # the near-dups were caught — possible only because the kept
    # signatures were backfilled before admission
    assert not any(i >= 300000 for i in kept)
    assert any(i >= 100000 for i in kept)  # new docs landed
    # index coverage is whole again: exactly the kept ids
    sig_ids = {
        r.doc_id
        for r in spark.read.parquet(idx_dir).select("doc_id").distinct().collect()
    }
    assert sig_ids == kept


def test_curated_ingest_quality_gate(spark, tmp_path):
    """admit_filter: a quality gate runs before dedup, rejected docs
    never land, and — like dropped duplicates — they still advance the
    replay watermark (re-delivery is a no-op even for an all-rejected
    batch)."""
    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    u1 = docs.filter(F.col("doc_id") < 40)
    # batch 2 is ALL short junk — the gate must reject every row
    u2 = spark.createDataFrame(
        [(100000 + i, "junk") for i in range(10)], "doc_id long, text string"
    )
    landing = str(tmp_path / "landing")
    u1.coalesce(1).write.parquet(f"{landing}/b=000")
    u2.coalesce(1).write.parquet(f"{landing}/b=001")

    store = SnapshotStore(spark, str(tmp_path / "corpus"), key="doc_id")
    gate = lambda df: df.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 5)

    def drain(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(landing)
        )
        q = curated_ingest_to_store(stream, store, ckpt, admit_filter=gate)
        q.awaitTermination(180)

    drain(str(tmp_path / "ckpt"))
    kept = {r.doc_id for r in store.read().select("doc_id").collect()}
    assert kept and not any(i >= 100000 for i in kept)  # junk rejected
    # the all-rejected batch still advanced the watermark
    assert store.commit_meta()["curated_max_seen"] == 100009
    v = store.current_version()
    drain(str(tmp_path / "ckpt2"))  # full replay: no-op
    assert store.current_version() == v
    assert {r.doc_id for r in store.read().select("doc_id").collect()} == kept


def test_curated_ingest_mor_store_o_batch_inserts(spark, tmp_path):
    """Curated ingest over a MERGE-ON-READ store: the assume_new insert
    path appends one O(batch) segment per micro-batch (no base read),
    and the final kept set matches the cow run exactly."""
    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    u1 = docs.filter(F.col("doc_id") < 50)
    u2 = (
        docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80))
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionByName(
            u1.filter(F.col("doc_id") < 6).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
    )
    landing = str(tmp_path / "landing")
    u1.coalesce(1).write.parquet(f"{landing}/b=000")
    u2.coalesce(1).write.parquet(f"{landing}/b=001")

    def run(mode):
        store = SnapshotStore(
            spark, str(tmp_path / f"corpus_{mode}"), key="doc_id", mode=mode
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(landing)
        )
        q = curated_ingest_to_store(stream, store, str(tmp_path / f"ckpt_{mode}"))
        q.awaitTermination(180)
        return store

    cow = run("cow")
    mor = run("mor")
    a = {r.doc_id for r in cow.read().select("doc_id").collect()}
    b = {r.doc_id for r in mor.read().select("doc_id").collect()}
    assert a == b and not any(i >= 200000 for i in a)
    # mor landed one segment per committing batch, zero tombstones —
    # the O(batch) shape (create + assume_new insert, no rewrite)
    m = mor._read_manifest(mor.current_version())
    assert len(m["segments"]) == 2 and m["tombstones"] == []


def test_curated_ingest_all_rejected_batch_commits_meta_only(spark, tmp_path):
    """r6 ADVICE (ingest.py all-rejected branch): on an EXISTING store an
    all-rejected batch persists its replay watermark via a meta-only
    pointer rewrite — the version may not bump and no snapshot may be
    rewritten (the old path inserted zero rows, which on cow rewrote the
    whole corpus per rejected batch)."""
    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    u1 = docs.filter(F.col("doc_id") < 40)
    u2 = spark.createDataFrame(
        [(100000 + i, "junk") for i in range(10)], "doc_id long, text string"
    )
    landing = str(tmp_path / "landing")
    u1.coalesce(1).write.parquet(f"{landing}/b=000")
    u2.coalesce(1).write.parquet(f"{landing}/b=001")
    store = SnapshotStore(spark, str(tmp_path / "corpus"), key="doc_id")
    gate = lambda df: df.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 5)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    q = curated_ingest_to_store(
        stream, store, str(tmp_path / "ckpt"), admit_filter=gate
    )
    q.awaitTermination(180)
    # batch 1 created v1; batch 2 (all rejected) must NOT have committed
    assert store.current_version() == 1
    # ... yet its watermark is durable, so a replay stays a no-op
    assert store.commit_meta()["curated_max_seen"] == 100009


def test_concurrent_reader_during_curated_ingest_with_maintenance(spark, tmp_path):
    """r7 (VERDICT r6 next #7): the store claims snapshot isolation, but
    the gated tests only covered racing WRITERS. Here a reader thread
    iterates published versions (current and the two before it) WHILE a
    5-batch curated ingest commits, auto-compaction folds segments
    (compact_when=3) and vacuum(keep_last=5) runs concurrently from the
    reader side. Invariants: every read inside the retention window
    succeeds; a published version's row count never changes under a
    re-read (immutability); counts are non-decreasing in version order
    for this append-only workload; the final corpus matches a clean
    sequential replay."""
    import threading
    import time as _time

    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    landing = str(tmp_path / "landing")
    for b in range(5):
        batch = docs.filter(F.col("doc_id") % 5 == b).select(
            (F.col("doc_id") + b * 1_000_000).alias("doc_id"), "text"
        )
        if b > 0:  # plant cross-batch exact dups that must be dropped
            batch = batch.unionByName(
                docs.filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 15 * b)).select(
                    (F.col("doc_id") + b * 1_000_000 + 900_000).alias("doc_id"),
                    "text",
                )
            )
        batch.coalesce(1).write.parquet(f"{landing}/b={b:03d}")

    store = SnapshotStore(
        spark, str(tmp_path / "corpus"), key="doc_id", mode="mor", compact_when=3
    )
    errors: list[str] = []
    count_at_version: dict[int, int] = {}
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                if not store.exists():
                    _time.sleep(0.02)
                    continue
                cur = store.current_version()
                for v in range(max(1, cur - 2), cur + 1):
                    n = store.read(v).count()
                    prev = count_at_version.get(v)
                    if prev is not None and prev != n:
                        errors.append(
                            f"published v{v} changed size {prev} -> {n}"
                        )
                    count_at_version[v] = n
                store.vacuum(keep_last=5)
            except Exception as e:  # any reader failure is a race caught
                errors.append(f"v~{store.current_version()}: {e!r}")
            _time.sleep(0.02)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        q = curated_ingest_to_store(
            (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true")
                .parquet(landing)
            ),
            store,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(300)
        # keep reading a little after the last commit (post-stream
        # compaction/vacuum interleavings)
        _time.sleep(0.5)
    finally:
        stop.set()
        t.join(timeout=30)

    assert not errors, errors[:5]
    # append-only curated ingest: row counts non-decreasing by version
    versions = sorted(count_at_version)
    counts = [count_at_version[v] for v in versions]
    assert counts == sorted(counts), dict(zip(versions, counts))
    # final state equals a clean sequential replay into a fresh store
    ref = SnapshotStore(spark, str(tmp_path / "ref"), key="doc_id")
    q2 = curated_ingest_to_store(
        (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(landing)
        ),
        ref,
        str(tmp_path / "ckpt_ref"),
    )
    q2.awaitTermination(300)
    got = {r.doc_id for r in store.read().select("doc_id").collect()}
    want = {r.doc_id for r in ref.read().select("doc_id").collect()}
    assert got == want


def test_curated_ingest_with_html_strip_preclean(spark, tmp_path):
    """Composition: strip_html as a curated-ingest admit transform —
    the 'clean as you ingest' shape a crawl pipeline runs. Raw HTML
    pages land; the gate strips tags/boilerplate BEFORE dedup, so two
    pages whose differences are markup-only become exact duplicates
    and only the first is admitted, with cleaned text in the store."""
    from deployment_spark.streaming.ingest import curated_ingest_to_store
    from deployment_spark.operators.textstats import strip_html

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.filter(F.col("doc_id") < 30)
    wrap1 = F.concat(F.lit("<html><body><p>"), F.col("text"),
                     F.lit("</p></body></html>"))
    # same content, different markup + nav boilerplate
    wrap2 = F.concat(F.lit('<html><body><div class="nav">Home About</div><p>'),
                     F.col("text"), F.lit("</p><footer>Copyright Example Corp</footer></body></html>"))
    b0 = base.select("doc_id", wrap1.alias("text"))
    b1 = base.select((F.col("doc_id") + 1000).alias("doc_id"), wrap2.alias("text"))
    landing = str(tmp_path / "landing")
    b0.coalesce(1).write.parquet(f"{landing}/b=000")
    b1.coalesce(1).write.parquet(f"{landing}/b=001")

    def preclean(df):
        return strip_html(df).select("doc_id", F.col("text_clean").alias("text"))

    store = SnapshotStore(spark, str(tmp_path / "corpus"), key="doc_id")
    q = curated_ingest_to_store(
        (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(landing)
        ),
        store,
        str(tmp_path / "ckpt"),
        admit_filter=preclean,
    )
    q.awaitTermination(180)
    rows = {r.doc_id: r.text for r in store.read().collect()}
    # the streaming composition must admit exactly what the direct batch
    # admission admits: preclean batch 1, run incremental_dedup against
    # an empty kept set. (NOT simply "all 30": the base docs themselves
    # contain a MinHash near-dup pair — doc 12 — which the gate drops
    # intra-batch by design; asserting all-30 pinned the near-dup gate
    # OFF, which is the opposite of the composition under test.)
    from deployment_spark.operators.dedup import incremental_dedup

    b0_clean = preclean(b0)
    expected = {
        r.doc_id
        for r in incremental_dedup(b0_clean, b0_clean.limit(0)).collect()
    }
    assert expected and expected < {r.doc_id for r in base.collect()}
    assert set(rows) == expected, sorted(set(rows) ^ expected)
    # batch 2's pages differ from batch 1's ONLY in markup/boilerplate:
    # after the strip they are exact duplicates and none may land
    assert not {i for i in rows if i >= 1000}
    assert all("<" not in t for t in rows.values())


def test_ingest_maintains_knn_graph_across_batches(spark, tmp_path):
    """r11 (VERDICT r10 #1): with ``knn_graph_maintain`` on,
    ingest_to_store keeps the edge store EXACTLY equal to
    knn_graph(current corpus) after ≥3 ingested batches (the Milvus
    per-insert HNSW maintenance analog, stream1.py:282); each batch's
    graph commit is an O(new+touched) upsert, not a rebuild (pinned by
    physical segment rows). The decay pin: graph-assisted recall over
    the STALE batch-1 graph is strictly below recall over the
    maintained graph on batch-3 queries — proving the maintenance arm
    is load-bearing, not decorative."""
    from deployment_spark.operators.crud import SnapshotStore
    from deployment_spark.operators.knn import (
        graph_assisted_topk,
        knn_graph,
        read_knn_graph,
    )
    from deployment_spark.operators.similarity import topk_similarity_join_expr
    from deployment_spark.streaming.ingest import ingest_to_store

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    k = 5
    landing = str(tmp_path / "g_landing")
    bounds = [(0, 59), (60, 119), (120, 179), (180, 239)]
    for i, (lo, hi) in enumerate(bounds):
        emb.filter(F.col("vec_id").between(lo, hi)).coalesce(1).write.parquet(
            f"{landing}/b={i:03d}"
        )
    store = SnapshotStore(spark, str(tmp_path / "g_store"), key="vec_id")
    groot = str(tmp_path / "g_edges")
    q = ingest_to_store(
        (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(landing)
        ),
        store,
        str(tmp_path / "g_ckpt"),
        knn_graph_maintain={"root": groot, "k": k},
    )
    q.awaitTermination(240)
    corpus = store.read()
    assert corpus.count() == 240

    def as_map(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.src_id, {})[r.rank] = r.dst_id
        return out

    maintained = read_knn_graph(spark, groot)
    want = knn_graph(corpus, k=k)
    assert as_map(maintained) == as_map(want)  # exact after 4 batches
    # write-volume bound: the graph store's physical edge rows stay far
    # below batches × full-graph (a per-batch rebuild would write
    # ≥ 4 × 240·k; exact-upsert writes full(60·k) + 3 bounded deltas)
    gstore = SnapshotStore(spark, groot, key="edge_id", mode="mor")
    m = gstore._read_manifest(gstore.current_version())
    phys = sum(e["rows"] for e in m["segments"])
    assert phys < 4 * 240 * k, phys
    assert gstore.current_version() == 4  # one graph commit per batch
    # derived-state retention bounded (auto-vacuum keep_versions=2):
    # dead manifests swept with the versions they described
    manifests = [
        f
        for f in os.listdir(groot)
        if f.startswith("m") and f.endswith(".json")
    ]
    assert len(manifests) <= 2, manifests

    # decay pin: late-arriving queries against the STALE batch-1 graph
    # lose recall that the maintained graph preserves
    queries = emb.filter(F.col("vec_id").between(180, 199)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {}
    for r in topk_similarity_join_expr(corpus, queries, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    stale = knn_graph(emb.filter(F.col("vec_id") < 60), k=k)
    # self-seeds: each late query seeds at its own row — the crispest
    # decay probe, because a STALE graph has no edges at all for rows
    # that landed after it was built (they are reachable neither as
    # candidates nor as expansions), while the maintained graph's
    # one-hop neighborhood of self IS the exact top-k by construction
    seeds = queries.select("query_id", F.col("query_id").alias("vec_id"))

    def recall(graph):
        got = {}
        rows = graph_assisted_topk(
            corpus, queries, seeds, graph, k=k, hops=1
        ).collect()
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(
            len(exact[qid] & got.get(qid, set())) / k for qid in exact
        ) / len(exact)

    r_stale, r_maint = recall(stale), recall(maintained)
    assert r_maint > r_stale, (r_stale, r_maint)
    assert r_maint == 1.0, r_maint  # self + maintained 1-hop = exact top-k
    assert r_stale <= 1 / k + 1e-9, r_stale  # stale graph: self only


def test_curated_ingest_maintains_bm25_index(spark, tmp_path):
    """r11: with ``bm25_maintain`` on, curated ingest keeps the BM25
    inverted index EXACTLY equal to a from-scratch build over the kept
    corpus after 3 micro-batches (scores bit-identical to bm25_scores),
    at O(batch) appends — pinned by the stats-partial count (one per
    non-empty append, never a rebuild). Replay with a fresh checkpoint
    lands nothing: postings files, stats rows, and scores unchanged.
    Deleting the index and landing one more batch exercises the
    build-from-store backfill (maintenance enabled on a store with
    history)."""
    from deployment_spark.operators.retrieval import BM25Index, bm25_scores
    from deployment_spark.streaming.ingest import curated_ingest_to_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    landing = str(tmp_path / "bm_landing")
    bounds = [(0, 59), (60, 119), (120, 179)]
    for i, (lo, hi) in enumerate(bounds):
        docs.filter(F.col("doc_id").between(lo, hi)).coalesce(1).write.parquet(
            f"{landing}/b={i:03d}"
        )
    store = SnapshotStore(spark, str(tmp_path / "bm_store"), key="doc_id")
    broot = str(tmp_path / "bm_idx")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    q = curated_ingest_to_store(
        stream,
        store,
        str(tmp_path / "bm_ckpt"),
        bm25_maintain={"root": broot},
    )
    q.awaitTermination(240)

    kept = store.read().select("doc_id", "text")
    idx = BM25Index(spark, broot)
    terms = ["dup", "vector", "batch"]

    def smap(df):
        return {r.doc_id: (r.dl, r.matched_terms, r.bm25) for r in df.collect()}

    want = smap(bm25_scores(kept, terms))
    assert smap(idx.search_scores(terms)) == want
    stats = spark.read.parquet(idx.stats_dir)
    # batch 1 lands via build (1 partial) + 2 appends = 3 partials; a
    # per-batch rebuild would collapse to 1 and an O(corpus) recompute
    n_stats = stats.count()
    assert n_stats == 3, n_stats
    assert idx.max_indexed_id() == kept.agg(F.max("doc_id")).collect()[0][0]

    # replay: fresh checkpoint, same files — watermark rejects every
    # batch before maintenance sees admitted rows; nothing moves
    files_before = set(spark.read.parquet(idx.postings_dir).inputFiles())
    q2 = curated_ingest_to_store(
        stream, store, str(tmp_path / "bm_ckpt2"), bm25_maintain={"root": broot}
    )
    q2.awaitTermination(240)
    assert set(spark.read.parquet(idx.postings_dir).inputFiles()) == files_before
    assert spark.read.parquet(idx.stats_dir).count() == n_stats
    assert smap(idx.search_scores(terms)) == want

    # index lost entirely (compaction-crash contract: absence is safe):
    # next batch triggers the one-time build over everything landed
    import shutil

    shutil.rmtree(broot)
    docs.filter(F.col("doc_id").between(180, 239)).coalesce(1).write.parquet(
        f"{landing}/b=003"
    )
    q3 = curated_ingest_to_store(
        stream, store, str(tmp_path / "bm_ckpt3"), bm25_maintain={"root": broot}
    )
    q3.awaitTermination(240)
    kept2 = store.read().select("doc_id", "text")
    assert kept2.count() > kept.count()
    assert smap(idx.search_scores(terms)) == smap(bm25_scores(kept2, terms))


def test_ingest_maintains_standing_topk(spark, tmp_path):
    """r11: with ``standing_topk_maintain`` on, ingest_to_store keeps a
    fixed query set's EXACT top-k current across 4 streamed batches
    (top-k(C∪B) = top-k(top-k(C) ∪ top-k(B)) under the engine's total
    order) in O(nq·k) state with one state commit per batch. A full
    replay through a fresh checkpoint moves nothing (the dedupe+merge
    algebra makes re-offered candidates no-ops). Enabling maintenance
    late on a store with history triggers the one-time backfill."""
    from deployment_spark.operators.similarity import topk_similarity_join_expr
    from deployment_spark.streaming.ingest import (
        ingest_to_store,
        read_standing_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    landing = str(tmp_path / "sq_landing")
    for i, (lo, hi) in enumerate([(0, 99), (100, 199), (200, 299), (300, 399)]):
        emb.filter(F.col("vec_id").between(lo, hi)).coalesce(1).write.parquet(
            f"{landing}/b={i:03d}"
        )
    store = SnapshotStore(spark, str(tmp_path / "sq_store"), key="vec_id")
    sroot = str(tmp_path / "sq_state")

    def run(ck, root):
        q = ingest_to_store(
            (
                spark.readStream.schema(emb.schema)
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true")
                .parquet(landing)
            ),
            store,
            str(tmp_path / ck),
            standing_topk_maintain={"root": root, "queries": queries, "k": 5},
        )
        q.awaitTermination(240)

    def smap(root):
        return {
            (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
            for r in read_standing_topk(spark, root).collect()
        }

    run("sq_ckpt", sroot)
    want = {
        (r.query_id, r.rank): (r.vec_id, round(r.similarity, 9))
        for r in topk_similarity_join_expr(store.read(), queries, k=5).collect()
    }
    got = smap(sroot)
    assert got == want
    assert len(got) == 5 * 5  # state stays nq·k — never corpus-scale
    sstore = SnapshotStore(spark, sroot, key="slot_id")
    assert sstore.current_version() == 4  # one state commit per batch
    # derived-state retention is BOUNDED (auto-vacuum keep_versions=2):
    # old snapshots are garbage, not time travel
    vdirs = [d for d in os.listdir(sroot) if d.startswith("v") and d[1:].isdigit()]
    assert len(vdirs) <= 2, vdirs

    # replay: fresh checkpoint, same files, same state root — no-op
    run("sq_ckpt2", sroot)
    assert smap(sroot) == want

    # late enable: a DIFFERENT state root sees the store with history on
    # its first batch → one-time backfill over everything landed
    sroot2 = str(tmp_path / "sq_state2")
    run("sq_ckpt3", sroot2)
    assert smap(sroot2) == want
