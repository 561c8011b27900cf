"""Streaming exact dedup (dropDuplicatesWithinWatermark) — the surviving
set must match batch exact-dedup over the same documents, and duplicate
copies arriving in LATER micro-batches (within the watermark) must be
dropped."""

import pandas as pd

from pyspark.sql import functions as F

from sonar_tantivy_spark.streaming.dedup import content_fingerprint, dedup_stream

T0 = pd.Timestamp("2026-01-01 00:00:00")


def _batch(rows):
    return pd.DataFrame(rows, columns=["doc_id", "text", "ts"])


def test_streaming_dedup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write(rows):
        spark.createDataFrame(_batch(rows)).coalesce(1) \
            .write.mode("append").parquet(src)

    # batch 1: three uniques, one in-batch duplicate
    write([(0, "alpha beta gamma", T0),
           (1, "delta epsilon", T0 + pd.Timedelta(seconds=10)),
           (2, "alpha beta gamma", T0 + pd.Timedelta(seconds=20)),
           (3, "zeta eta", T0 + pd.Timedelta(seconds=30))])

    stream = (spark.readStream
              .schema("doc_id long, text string, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (dedup_stream(stream, watermark="1 hour")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # batch 2: cross-batch duplicates (within the watermark) + new
        write([(4, "delta epsilon", T0 + pd.Timedelta(seconds=40)),
               (5, "theta iota", T0 + pd.Timedelta(seconds=50)),
               (6, "zeta eta", T0 + pd.Timedelta(seconds=60))])
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out).collect()
    all_docs = spark.createDataFrame(_batch(
        [(0, "alpha beta gamma", T0),
         (1, "delta epsilon", T0 + pd.Timedelta(seconds=10)),
         (2, "alpha beta gamma", T0 + pd.Timedelta(seconds=20)),
         (3, "zeta eta", T0 + pd.Timedelta(seconds=30)),
         (4, "delta epsilon", T0 + pd.Timedelta(seconds=40)),
         (5, "theta iota", T0 + pd.Timedelta(seconds=50)),
         (6, "zeta eta", T0 + pd.Timedelta(seconds=60))]))
    want_fps = {r["fp"] for r in all_docs.select(
        content_fingerprint().alias("fp")).distinct().collect()}

    # one survivor per distinct content, fingerprints match batch dedup
    assert len(got) == len(want_fps) == 4
    assert {r["fingerprint"] for r in got} == want_fps
    # cross-batch duplicates (docs 4 and 6) must NOT survive
    assert {r["doc_id"] for r in got} == {0, 1, 3, 5}


def test_fingerprint_matches_batch_dedup_expression(spark):
    """The stream fingerprint must equal the batch pipeline's
    (pl_clean_corpus) fingerprint for the same text — no drift."""
    from sonar_tantivy_spark import driver_queries as dq

    df = spark.createDataFrame(
        [("b a a c",), ("c a b",), ("x y",)], "text string")
    a = [r["f"] for r in
         df.select(content_fingerprint().alias("f")).collect()]
    b = [r["f"] for r in
         df.select(F.split("text", " ").alias("w"))
         .select(dq._bag_fingerprint_expr().alias("f")).collect()]
    assert a == b
