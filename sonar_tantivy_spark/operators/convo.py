"""Conversation-level operators over the transcript shape
(conv_id, turn_idx, role, text, tool, ts) — the turn table's natural
GROUP is the conversation, and training pipelines consume transcripts
per-conversation: filter whole conversations by quality, build
(context → response) training pairs, measure agentic tool cadence.

Every operator here shuffles AT MOST once, on conv_id — conversations
are small (tens of turns) and numerous (billions at 10^12 turns), the
ideal partition key: no skew beyond the longest conversation, and every
window/aggregation below is bounded by one conversation's turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation profile: turn/role/tool counts, duration, mean
    reply gap, token volume — ONE hash-agg on conv_id.  The standard
    pre-filter table for conversation-level curation (drop single-turn
    or tool-spam conversations before any per-turn work)."""
    n_tokens = F.size(F.split("text", " ")).cast("long")
    e = F.col("ts").cast("double")
    return (
        turns.groupBy("conv_id").agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
            .cast("long").alias("n_user"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
            .cast("long").alias("n_assistant"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_tool_calls"),
            F.sum(n_tokens).alias("n_tokens"),
            (F.max(e) - F.min(e)).alias("duration_s"),
            F.round(((F.max(e) - F.min(e))
                     / F.greatest(F.count("*") - 1, F.lit(1))), 4)
            .alias("mean_gap_s"),
        )
    )


def reply_latency(turns: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, role, latency_s): seconds since the previous
    turn in the same conversation — the user-wait / model-think signal.
    One lag window per conversation; first turns drop out (no
    predecessor)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_e = F.lag(F.col("ts").cast("double")).over(w)
    return (
        turns.select(
            "conv_id", "turn_idx", "role",
            (F.col("ts").cast("double") - prev_e).alias("latency_s"))
        .filter(F.col("latency_s").isNotNull())
    )


def context_pairs(turns: DataFrame, context_turns: int = 3,
                  sep: str = "\n") -> DataFrame:
    """(context → response) training examples: for every assistant
    turn, the concatenation of up to ``context_turns`` preceding turns
    (role-prefixed) and the assistant text as the target.  One window
    over conv_id; collect_list over a bounded rows-frame keeps per-row
    state at ``context_turns`` texts — NEVER the whole conversation."""
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(-context_turns, -1))
    line = F.concat_ws(": ", "role", "text")
    ctx = F.array_join(F.collect_list(line).over(w), sep)
    out = turns.select(
        "conv_id", "turn_idx", "role",
        ctx.alias("context"),
        F.col("text").alias("response"),
    )
    return (out.filter((F.col("role") == "assistant")
                       & (F.length("context") > 0))
            .drop("role"))


def tool_call_rate(turns: DataFrame, window: str = "1 hour") -> DataFrame:
    """Per (event-time window, tool) call counts over assistant/tool
    turns — the agentic-usage rollup; plain windowed hash-agg."""
    return (
        turns.filter(F.col("tool").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), "tool")
        .agg(F.count("*").cast("long").alias("n_calls"),
             F.countDistinct("conv_id").cast("long").alias("n_convs"))
        .select(F.col("w.start").alias("window_start"), "tool",
                "n_calls", "n_convs")
    )
