"""Streaming trending-terms: windowed term frequencies over a turn
stream, using the SAME analyzer as the index build.

The ingest-side twin of the block-max story (bench corpus v2's bursty
``trendalpha`` term): while the batch engine proves a trending term can
be served by scanning only the segments of its burst window, this
operator SURFACES such bursts at ingest time — tokenize each micro-batch
with the engine's Arrow-vectorized analyzer (functions shared with
operators/build.py so stream and index can never disagree on what a
"term" is), explode to (ts, term), and count per (event-time window,
term) behind a watermark.

Scale shape: the tokenizer is one Arrow pass per micro-batch; the
aggregation is partial map-side, state keyed by (window, term) — memory
is O(active windows x distinct terms), independent of turn volume.  In
append mode a window's counts emit exactly once when the watermark
passes its end, so the downstream top-k (`top_terms`, plain batch rank
over the emitted counts) never sees a partial window.

Top-k is deliberately NOT inside the stream: ranking needs the window's
complete counts, which is exactly what append-mode finalization
guarantees — the standard split (stream aggregates, batch ranks) keeps
streaming state bounded and the rank window out of the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sonar_tantivy_spark.operators.build import make_tokenize_udf


def _term_counts(turns: DataFrame, window: str, text_col: str,
                 ts_col: str, tokenizer: str) -> DataFrame:
    """Shared stream/batch aggregate: (window_start, term, cnt)."""
    udf = make_tokenize_udf(tokenizer)
    terms = (
        turns.select(ts_col, udf(F.col(text_col).cast("string")).alias("tk"))
        .select(ts_col, F.explode("tk.terms").alias("term"))
    )
    return (
        terms.groupBy(F.window(ts_col, window).alias("w"), "term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "term", "cnt")
    )


def trending_terms_stream(turns: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          text_col: str = "text", ts_col: str = "ts",
                          tokenizer: str = "en_stem") -> DataFrame:
    """``turns`` is a streaming df with at least (ts_col timestamp,
    text_col string).  Returns the per-window term-count stream; write
    with ``outputMode("append")`` so each window emits exactly once,
    final, when the watermark passes its end."""
    return _term_counts(turns.withWatermark(ts_col, watermark), window,
                        text_col, ts_col, tokenizer)


def trending_terms_batch(turns: DataFrame, window: str = "1 hour",
                         text_col: str = "text", ts_col: str = "ts",
                         tokenizer: str = "en_stem") -> DataFrame:
    """Batch ground truth for the same aggregate (parity test target)."""
    return _term_counts(turns, window, text_col, ts_col, tokenizer)


def top_terms(counts: DataFrame, k: int = 10) -> DataFrame:
    """Rank the emitted (finalized) window counts: top-k terms per
    window by count desc, term asc.  A per-window rank over the tiny
    aggregated table — run as a batch over the stream's sink."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("cnt"), F.asc("term"))
    return (counts.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k))


def bursting_terms(counts: DataFrame, min_ratio: float = 4.0,
                   min_cnt: int = 10, window: str = "1 hour") -> DataFrame:
    """Burst detection over finalized windows: terms whose count in a
    window exceeds ``min_ratio`` x their trailing per-window mean
    (previous windows only).  One rank-free pass over the aggregated
    counts — the ingest-side signal that a term like corpus v2's
    ``trendalpha`` just went hot.

    The trailing mean is ZERO-FILLED over window gaps: it divides the
    trailing count sum by the number of windows ELAPSED since the term's
    first appearance (``window`` must match the duration the counts were
    aggregated at), not by the number of windows the term happened to
    appear in.  A sparse mean would inflate baselines for intermittent
    terms — a term that burst once long ago and bursts identically again
    would never be flagged; with elapsed-window normalization the quiet
    gap correctly drags its baseline down.  No gap rows are generated:
    the fill is pure arithmetic on the existing aggregate."""
    import pandas as pd
    from pyspark.sql import Window

    win_secs = float(pd.Timedelta(window).total_seconds())
    w = (Window.partitionBy("term").orderBy("window_start")
         .rowsBetween(Window.unboundedPreceding, -1))
    wall = Window.partitionBy("term").orderBy("window_start")
    elapsed = (
        (F.unix_timestamp("window_start")
         - F.unix_timestamp(F.first("window_start").over(wall)))
        / F.lit(win_secs)
    )
    base = F.sum("cnt").over(w) / elapsed
    return (counts.withColumn("trailing_mean", base)
            .filter(F.col("trailing_mean").isNotNull()
                    & (F.col("cnt") >= min_cnt)
                    & (F.col("cnt") >= min_ratio * F.col("trailing_mean")))
            .select("window_start", "term", "cnt",
                    F.round("trailing_mean", 4).alias("trailing_mean")))
