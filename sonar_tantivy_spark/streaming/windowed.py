"""Watermarked tumbling-window aggregation over an event stream.

The streaming twin of the batch ``ev_windowed_counts`` contract query
(driver_queries.py): same grouping (hour window x event_type), same
aggregates, expressed as a Structured Streaming plan.  The watermark
bounds state: a window finalizes (and, in append mode, emits exactly
once) when the event-time watermark passes ``window.end``; events
arriving later than the watermark are dropped by the engine, which is
the documented late-data contract.

At scale this is the canonical shape — partial aggregation map-side,
state keyed by (window, event_type) in the state store, O(active
windows x types) memory regardless of input volume, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg(events: DataFrame, window: str) -> DataFrame:
    """The one aggregate spec both paths share — their equality is the
    point of the batch-vs-stream parity test."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("cnt"),
             F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "cnt", "avg_value")
    )


def windowed_counts_stream(events: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """``events`` is a streaming df with ``ts timestamp, event_type
    string, value double``.  Returns the windowed aggregate stream;
    write with ``outputMode("append")`` for emit-once-final semantics."""
    return _agg(events.withWatermark("ts", watermark), window)


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch ground truth for the same grouping (no watermark — batch
    sees everything, so compare against the stream's non-late subset)."""
    return _agg(events, window)
