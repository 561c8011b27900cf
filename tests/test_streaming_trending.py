"""Streaming trending-terms: finalized windows must equal the batch
ground truth (same analyzer as the index build), late turns must be
dropped, and the burst detector must flag a planted hot term."""

import pandas as pd

from sonar_tantivy_spark.streaming.trending import (
    bursting_terms,
    top_terms,
    trending_terms_batch,
    trending_terms_stream,
)

T0 = pd.Timestamp("2026-01-01 00:00:00")


def _turns():
    rows = []
    # hour 0: steady chatter; "trendalpha" absent
    for i in range(6):
        rows.append((T0 + pd.Timedelta(minutes=i), "the table is sorted"))
    # hour 1: trendalpha bursts
    for i in range(12):
        rows.append((T0 + pd.Timedelta(hours=1, minutes=i),
                     "trendalpha trendalpha spiking in the table"))
    return pd.DataFrame(rows, columns=["ts", "text"])


def test_stream_matches_batch_and_drops_late(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(_turns()).coalesce(1).write.parquet(src)

    stream = (spark.readStream.schema("ts timestamp, text string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (trending_terms_stream(stream, window="1 hour",
                               watermark="30 minutes")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt).outputMode("append").start())

    def push(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "text"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()

    try:
        q.processAllAvailable()
        # advance the watermark past both windows -> they finalize
        push([(T0 + pd.Timedelta(days=1), "heartbeat")])
        # a LATE hour-0 turn behind the watermark: must change nothing
        push([(T0 + pd.Timedelta(minutes=1), "the the the the")])
        push([(T0 + pd.Timedelta(days=1, seconds=60), "heartbeat")])
    finally:
        q.stop()

    got = {(r["window_start"], r["term"]): r["cnt"]
           for r in spark.read.parquet(out).collect()
           if r["term"] != "heartbeat"}
    want = {(r["window_start"], r["term"]): r["cnt"]
            for r in trending_terms_batch(
                spark.createDataFrame(_turns())).collect()}
    assert got == want  # emit-once-final + late drop + analyzer parity
    # the burst term leads hour 1
    ranked = top_terms(spark.read.parquet(out), k=3).collect()
    h1 = [r for r in ranked
          if r["window_start"] == (T0 + pd.Timedelta(hours=1)).to_pydatetime()]
    assert h1[0]["term"] == "trendalpha" and h1[0]["cnt"] == 24


def test_burst_detector_flags_planted_term(spark):
    counts = trending_terms_batch(spark.createDataFrame(_turns()))
    # 'the' appears in both hours (6 -> 12): ratio 2.0, not a burst at 4x;
    # 'trendalpha' has no prior window -> no trailing mean -> not flagged
    # (a brand-new term is "new", not "bursting"); plant a second corpus
    # where trendalpha existed quietly before spiking
    rows = [(T0 + pd.Timedelta(minutes=i), "trendalpha quiet")
            for i in range(2)]
    rows += [(T0 + pd.Timedelta(hours=1, minutes=i), "trendalpha loud")
             for i in range(12)]
    import pandas as pd2
    c2 = trending_terms_batch(spark.createDataFrame(
        pd2.DataFrame(rows, columns=["ts", "text"])))
    hot = {r["term"] for r in bursting_terms(c2, min_ratio=4.0,
                                             min_cnt=10).collect()}
    assert hot == {"trendalpha"}
    cold = {r["term"] for r in bursting_terms(counts, min_ratio=4.0,
                                              min_cnt=10).collect()}
    assert "the" not in cold


def test_burst_baseline_zero_fills_window_gaps(spark):
    """A term that burst once, went quiet for 9 windows, then bursts
    identically again MUST be flagged the second time: the trailing mean
    divides by windows ELAPSED since first appearance (quiet gaps count
    as zero), not by the windows the term happened to appear in — a
    sparse mean would pin the baseline at the old burst height forever."""
    rows = [(T0 + pd.Timedelta(hours=0, minutes=i), "flashterm seen")
            for i in range(12)]
    rows += [(T0 + pd.Timedelta(hours=10, minutes=i), "flashterm again")
             for i in range(12)]
    counts = trending_terms_batch(spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "text"])))
    hot = bursting_terms(counts, min_ratio=4.0, min_cnt=10,
                         window="1 hour").collect()
    flagged = {(r["term"], r["window_start"]) for r in hot}
    # second burst: trailing sum 12 over 10 elapsed windows -> mean 1.2,
    # ratio 10x.  Sparse mean would have been 12 -> ratio 1.0, missed.
    assert ("flashterm",
            (T0 + pd.Timedelta(hours=10)).to_pydatetime()) in flagged
    # first appearance has no prior window: never flagged as a "burst"
    assert ("flashterm", T0.to_pydatetime()) not in flagged
