"""Stateful streaming sessionization (applyInPandasWithState): closed
sessions emitted by the stream must match the batch lag-window ground
truth for the same events."""

import pandas as pd
import pytest

from sonar_tantivy_spark.streaming.sessionize import (
    sessionize_batch_equivalent,
    sessionize_stream,
)

T0 = pd.Timestamp("2026-01-01 00:00:00")


def _events():
    rows = []
    # user a: two sessions (gap 2h between them), then a late straggler
    for off in (0, 600, 1200):          # session 1: 3 events
        rows.append(("a", T0 + pd.Timedelta(seconds=off)))
    for off in (9000, 9600):            # session 2: 2 events (gap 7800s)
        rows.append(("a", T0 + pd.Timedelta(seconds=off)))
    # user b: one long session, events 20 min apart (never gapped out)
    for off in (0, 1200, 2400, 3600):
        rows.append(("b", T0 + pd.Timedelta(seconds=off)))
    # user c: single event
    rows.append(("c", T0))
    return pd.DataFrame(rows, columns=["user_id", "ts"])


def test_streaming_sessions_match_batch(spark, tmp_path):
    pdf = _events()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    # a far-future heartbeat batch pushes the watermark past every
    # last+gap so all open sessions flush via the event-time timeout
    flush = pd.DataFrame([("zz", T0 + pd.Timedelta(days=2))],
                         columns=["user_id", "ts"])

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(flush).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # one more empty-ish batch lets the timeout fire after the
        # watermark update from the flush batch
        spark.createDataFrame(flush).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] != "zz"
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch_equivalent(
            spark.createDataFrame(pdf), gap_s=1800).collect()
    }
    assert got == want, (sorted(got), sorted(want))


def test_out_of_order_event_extends_session_backwards(spark, tmp_path):
    """A later micro-batch delivers an event that PRECEDES the stored
    session window (within the watermark): the closed session must
    start at the earlier timestamp — the ADVICE r2 case where start_s
    was frozen at first-arrival order."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write(rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    write([("d", T0 + pd.Timedelta(seconds=1000))])
    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # out-of-order: 600s BEFORE the stored session start, admitted
        # (watermark = 1000s - 30min < 0)
        write([("d", T0 + pd.Timedelta(seconds=400))])
        q.processAllAvailable()
        for _ in range(2):  # heartbeats: advance watermark, fire timeout
            write([("zz", T0 + pd.Timedelta(days=2))])
            q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] == "d"
    }
    assert got == {("d", T0 + pd.Timedelta(seconds=400),
                    T0 + pd.Timedelta(seconds=1000), 2)}, got


def test_batch_equivalent_shape(spark):
    df = sessionize_batch_equivalent(spark.createDataFrame(_events()))
    rows = {(r["user_id"], r["n_events"]) for r in df.collect()}
    assert rows == {("a", 3), ("a", 2), ("b", 4), ("c", 1)}
