"""Custom stateful streaming operator: inactivity-gap session windows.

The micro-batch path computes sessions with a lag-window over the events
table (driver_queries.ev_sessionize).  This is the true-streaming
equivalent: ``applyInPandasWithState`` keeps per-user state
(session start / last event / count), closes a session when an incoming
event arrives more than ``gap_s`` after the last one, and uses an
event-time timeout so a session with no further events is flushed once
the watermark passes ``last + gap`` — the standard Structured Streaming
pattern for session windows with late-data tolerance.

Output rows are CLOSED sessions only (append mode):
    (user_id, session_start, session_end, n_events)

Scale shape: state is partitioned by user_id (the groupBy key), each
group's state is O(1), and the Arrow batches flow through pandas — no
per-row Python.

Batch equivalence requires ``watermark delay >= gap_s`` (the default
pairs 30 min with 30 min): any event admitted by the watermark then
satisfies t >= WM >= max_seen_ts - gap >= session_start - gap, so an
out-of-order arrival can only extend the OPEN session backwards (the
``min`` below) — it can never land in a prior inactivity gap, whose
session the append-mode stream may already have emitted.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id string, session_start timestamp, "
                 "session_end timestamp, n_events long")
STATE_SCHEMA = "start long, last long, n long"

DEFAULT_GAP_S = 1800  # 30-min inactivity gap, like ev_sessionize


_WM_UNITS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
             "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}


def _watermark_seconds(watermark: str) -> int:
    parts = watermark.strip().split()
    if len(parts) == 2 and parts[0].isdigit() and parts[1] in _WM_UNITS:
        return int(parts[0]) * _WM_UNITS[parts[1]]
    raise ValueError(f"unparseable watermark {watermark!r} "
                     "(expected e.g. '30 minutes')")


def sessionize_stream(
    events: DataFrame,
    *,
    gap_s: int = DEFAULT_GAP_S,
    watermark: str = "30 minutes",
) -> DataFrame:
    """events(user_id, ts, ...) stream → closed-session stream."""
    # batch equivalence REQUIRES delay >= gap (see module docstring):
    # below it, an admitted out-of-order event can land in a prior
    # inactivity gap whose session was already emitted — enforce the
    # invariant instead of silently mis-splitting sessions
    if _watermark_seconds(watermark) < gap_s:
        raise ValueError(
            f"watermark delay ({watermark!r}) must be >= gap_s "
            f"({gap_s} s) for append-mode batch equivalence")

    def fn(key: tuple, pdfs, state: GroupState):
        user_id = key[0]

        def close(start_s: int, last_s: int, n: int) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_s, unit="s")],
                "session_end": [pd.Timestamp(last_s, unit="s")],
                "n_events": [n],
            })

        if state.hasTimedOut:
            start_s, last_s, n = state.get
            state.remove()
            yield close(start_s, last_s, n)
            return

        ts = sorted(
            int(t) for pdf in pdfs
            for t in (pdf["ts"].astype("int64") // 1_000_000_000))
        start_s, last_s, n = state.get if state.exists else (None, None, 0)
        out = []
        for t in ts:
            if last_s is not None and t - last_s > gap_s:
                out.append(close(start_s, last_s, n))
                start_s, n = t, 0
            if start_s is None:
                start_s = t
            # cross-batch out-of-order event within the watermark that
            # PRECEDES the stored window: extend the session start
            # backwards (with watermark delay >= gap, an admitted event
            # can never fall in a prior inactivity gap — see docstring —
            # so merging into the open session is exact)
            start_s = min(start_s, t)
            n += 1
            last_s = max(t, last_s or t)
        state.update((start_s, last_s, n))
        # flush via event time: when the watermark passes last + gap the
        # open session can no longer be extended
        state.setTimeoutTimestamp((last_s + gap_s) * 1000)
        if out:
            yield pd.concat(out, ignore_index=True)

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_equivalent(events: DataFrame,
                                gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """The batch ground truth for the streaming operator: lag-window gap
    marking → session groups → (start, end, count) per session."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    e = F.col("ts").cast("long")
    gap = e - F.lag(e).over(w)
    marked = events.withColumn(
        "new_s", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0))
    sess = marked.withColumn("session_no",
                             F.sum("new_s").over(
                                 w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"))
        .drop("session_no")
    )
