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


def render_conversations(turns: DataFrame, sep: str = "\n") -> DataFrame:
    """(conv_id, text, n_turns, n_tokens): each conversation rendered
    as ONE training document — turns in turn_idx order, role-prefixed
    (``role: text``), joined by ``sep``.  The canonical transcript →
    pretraining-document step.  ONE hash-agg on conv_id:
    ``array_sort(collect_list(struct(turn_idx, line)))`` restores turn
    order inside the aggregation buffer (bounded by one conversation's
    turns), so there is no window sort and no second exchange.
    ``n_tokens`` is the sum of per-line whitespace token counts (the
    separator never fuses tokens across turns)."""
    line = F.concat_ws(": ", "role", "text")
    rec = F.struct(F.col("turn_idx"), line.alias("line"),
                   F.size(F.split(line, " ")).cast("long").alias("nt"))
    recs = F.array_sort(F.collect_list(rec))
    return (
        turns.groupBy("conv_id").agg(
            F.array_join(F.transform(recs, lambda s: s["line"]), sep)
            .alias("text"),
            F.count("*").cast("long").alias("n_turns"),
            F.aggregate(recs, F.lit(0).cast("long"),
                        lambda acc, s: acc + s["nt"]).alias("n_tokens"),
        )
    )


PACK_CONVO_BUDGET = 512   # tokens per packed sequence
PACK_CONVO_SHARDS = 1024  # pack-tape shards (parallelism unit)


def pack_conversations(turns: DataFrame,
                       budget: int = PACK_CONVO_BUDGET,
                       n_shards: int = PACK_CONVO_SHARDS) -> DataFrame:
    """Conversation-aware sequence packing: whole conversations laid on
    a token tape (conv_id order within a hash shard) and cut every
    ``budget`` tokens — a conversation lands in the bin its FIRST token
    falls in and NEVER splits across sequences (the property plain
    doc-packing can't give transcripts: a training example always sees
    whole conversations).  Same compromise as q_pl_pack_sequences: a
    bin may overflow by less than one conversation.

    Scale shape: render is one conv_id hash-agg; packing is one
    exchange on the hash shard with a per-shard running sum (window
    bounded by the shard's rows).  Shards are independent, so packing
    parallelizes to ``n_shards`` regardless of corpus size, and
    appending new conversations only ever extends shards (no global
    re-pack).  Deterministic: shard = xxhash64(conv_id) mod n_shards,
    order within shard = conv_id."""
    d = render_conversations(turns).withColumn(
        "shard", F.pmod(F.xxhash64("conv_id"), F.lit(n_shards)))
    w = (Window.partitionBy("shard").orderBy("conv_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    seq_id = F.concat_ws("#", F.col("shard").cast("string"),
                         F.floor(start / budget).cast("string"))
    return d.select("conv_id", seq_id.alias("seq_id"),
                    (start % budget).cast("long").alias("seq_off"),
                    "n_turns", "n_tokens")
