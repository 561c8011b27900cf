"""Watermarked windowed aggregation: append-mode windows must equal the
batch ground truth over on-time events, and an event arriving behind the
watermark must be dropped (the late-data contract)."""

import pandas as pd

from sonar_tantivy_spark.streaming.windowed import (
    windowed_counts_batch,
    windowed_counts_stream,
)

T0 = pd.Timestamp("2026-01-01 00:00:00")


def _on_time():
    rows = []
    for off, et, v in [(0, "view", 1.0), (60, "view", 3.0),
                       (120, "click", 2.0),          # hour 0
                       (3700, "view", 5.0), (3800, "click", 4.0)]:  # hour 1
        rows.append((T0 + pd.Timedelta(seconds=off), et, v))
    return pd.DataFrame(rows, columns=["ts", "event_type", "value"])


def test_watermark_finalizes_and_drops_late(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    sdf = spark.createDataFrame(_on_time())
    sdf.coalesce(1).write.parquet(src)

    stream = (spark.readStream.schema("ts timestamp, event_type string, value double")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (windowed_counts_stream(stream, window="1 hour", watermark="30 minutes")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).outputMode("append").start())

    def push(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()

    try:
        q.processAllAvailable()
        # heartbeat far in the future -> watermark passes both windows'
        # end + 30min, hours 0 and 1 finalize and emit
        push([(T0 + pd.Timedelta(days=1), "hb", 0.0)])
        push([(T0 + pd.Timedelta(days=1, seconds=60), "hb", 0.0)])
        # a LATE hour-0 event, far behind the watermark: must be dropped
        push([(T0 + pd.Timedelta(seconds=30), "view", 99.0)])
        push([(T0 + pd.Timedelta(days=1, seconds=120), "hb", 0.0)])
    finally:
        q.stop()

    got = {(r["window_start"], r["event_type"]): (r["cnt"], r["avg_value"])
           for r in spark.read.parquet(out).collect()
           if r["event_type"] != "hb"}
    want = {(r["window_start"], r["event_type"]): (r["cnt"], r["avg_value"])
            for r in windowed_counts_batch(
                spark.createDataFrame(_on_time())).collect()}
    # every finalized window matches the batch truth on on-time events —
    # i.e. the late view (value 99.0) influenced nothing
    assert got == want
    h0_view = got[(T0.to_pydatetime(), "view")]
    assert h0_view == (2, 2.0)  # not 3 events, avg not polluted by 99.0
