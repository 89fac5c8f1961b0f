"""Stateful streaming sessionization: applyInPandasWithState carries open
sessions across micro-batches; closed sessions match the batch gate query's
semantics (gap > gap_seconds opens a new session; n/duration/sum per
session)."""

import datetime as dt
import time

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def test_stateful_sessionization_across_batches(spark, tmp_path):
    from splade_easy_spark.streaming import sessionize_stream

    base = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    # batch 1: user 1 has two events 100s apart; user 2 one event
    b1 = [(0, base, 1, 10.0), (1, base + 100 * sec, 1, 5.0), (2, base, 2, 1.0)]
    # batch 2: user 1 returns past the gap (closes session 1);
    #          user 2 returns within the gap (extends, stays open)
    b2 = [(3, base + 3000 * sec, 1, 2.0), (4, base + 500 * sec, 2, 7.0)]

    src = str(tmp_path / "src")
    spark.createDataFrame(b1, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mod-times → deterministic trigger order
    spark.createDataFrame(b2, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM sess_out").collect()
    closed = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"], r["sum_value"])
        for r in rows
    }
    # user 1 session 1 was carried across the batch boundary and closed by
    # the gap: exactly the batch-query numbers (2 events, 100 s, 10+5)
    assert closed[(1, 1)] == (2, 100, 15.0)
    # user 2's session went idle: the watermark (batch-2 max ts = +3000s)
    # passed its last event (+500s) + gap → flushed by event-time timeout
    assert closed[(2, 1)] == (2, 500, 8.0)
    # user 1's new session started at +3000s: timeout +4800s is past the
    # watermark → still open, not emitted
    assert (1, 2) not in closed
    assert len(closed) == 2


def test_stateful_sessionization_within_batch_splits(spark, tmp_path):
    """Multiple sessions closed inside ONE micro-batch (vectorized segment
    split) — plus the carried state opening afterwards."""
    from splade_easy_spark.streaming import sessionize_stream

    base = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    rows = [
        (0, base, 7, 1.0),
        (1, base + 10 * sec, 7, 2.0),  # session 1: 2 events
        (2, base + 5000 * sec, 7, 3.0),  # session 2: 1 event
        (3, base + 10000 * sec, 7, 4.0),  # session 3: open at end
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out2")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_out2").collect()
    }
    assert got == {(7, 1): (2, 10, 3.0), (7, 2): (1, 0, 3.0)}


def test_late_event_keeps_session_bounds_monotone(spark, tmp_path):
    """Round-2 ADVICE (low): a late-but-within-watermark event that is
    OLDER than the carried session state must extend the session's start
    backward — never move `last` backward (which shrank duration_s and
    closed the session prematurely)."""
    from splade_easy_spark.streaming import sessionize_stream

    base = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    # batch 1: user 1 at +1000s
    b1 = [(0, base + 1000 * sec, 1, 4.0)]
    # batch 2: LATE user-1 event at +500s (inside the 2000s watermark and
    # within the gap of the carried last=+1000s) + a far-future user-2
    # event that advances the watermark past user 1's last+gap → flush
    b2 = [(1, base + 500 * sec, 1, 6.0), (2, base + 100_000 * sec, 2, 1.0)]

    src = str(tmp_path / "src")
    spark.createDataFrame(b1, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream, gap_seconds=1800, watermark="2000 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"], r["sum_value"])
        for r in spark.sql("SELECT * FROM late_sess_out").collect()
    }
    # the session spans [+500, +1000]: 2 events, 500s, 4+6 — a backward
    # `last` would have reported duration 0 or closed at the wrong time
    assert rows[(1, 1)] == (2, 500, 10.0)
