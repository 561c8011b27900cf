"""Incremental index maintenance via Structured Streaming.

The reference is fully batch, but its visibility model — readers see new
docs after each ``add_documents`` commit (ReloadPolicy::OnCommit,
/root/reference/src-rust/index.rs:186-191, 214-225) — maps naturally to
``foreachBatch``: every micro-batch runs the ordinary segment build and
lands as an atomic manifest commit, so queries always see a consistent
snapshot and a crashed stream resumes from Spark's checkpoint without
double-committing (epoch = f(batch_id) → duplicate segment_ids are
rejected, the same idempotence that guards batch resume).

Usage:
    q = start_incremental_indexing(stream_df, index, order_cols=[...])
    q.processAllAvailable(); q.stop()
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sonar_tantivy_spark.catalog import Index
from sonar_tantivy_spark.sources.tableio import SegmentExistsError


def epoch_committed(index: Index, epoch: str) -> bool:
    """Replay ledger: an ingest epoch counts as committed if any live
    segment carries it OR a compaction retired it (merge._retire_epochs)
    — so crash-replayed micro-batches are ignored even after their
    original segments were merged away."""
    m = index.storage.manifest()
    if any(s.get("epoch") == epoch for s in m["segments"]):
        return True
    return epoch in set(m.get("retired_epochs", []))


def start_incremental_indexing(
    stream_df: DataFrame,
    index: Index,
    *,
    order_cols: list[str],
    seg_size: int | None = None,
    checkpoint_dir: str,
    trigger_once: bool = False,
    auto_compact_above: int | None = None,
):
    """Attach the index build as a foreachBatch sink of ``stream_df``.

    Each micro-batch becomes >=1 new segment(s) under epoch ``b<batch_id>``;
    replayed batches (after a crash between sink success and checkpoint
    write) are absorbed by duplicate-segment rejection.

    ``auto_compact_above``: the tantivy-LogMergePolicy analog — when the
    manifest grows past this many segments, the sink compacts back down
    to it (single-pass merge, atomic swap; results stay bit-identical),
    so a long-running stream never accumulates unbounded tiny segments.
    Global docids shift across a compaction of unevenly-sized streamed
    segments are avoided by construction: compaction preserves manifest
    order and cumulative bases.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if epoch_committed(index, f"b{batch_id}"):
            return  # batch replay after a crash — already ingested
        # persist so the n_hint count and the build share ONE source read
        # (matters for non-file sources that re-fetch per action)
        batch_df = batch_df.persist()
        try:
            n = batch_df.count()  # sizes the build's tasks (n_hint)
            if n == 0:
                return
            index.add_df(
                batch_df,
                order_cols=order_cols,
                seg_size=seg_size,
                num_segments=None if seg_size else 1,
                epoch=f"b{batch_id}",
                n_hint=n,
            )
        except SegmentExistsError:
            pass  # raced replay of the same epoch — already committed
        finally:
            batch_df.unpersist()
        if auto_compact_above is not None and \
                len(index.segment_info()) > auto_compact_above:
            from sonar_tantivy_spark.operators.merge import tiered_compact

            # cheapest-window merge (LogMergePolicy analog): rewrites
            # only the small adjacent segments, not the whole index —
            # a long stream pays ~log total rewrite, not linear/trigger
            tiered_compact(index, auto_compact_above)

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
