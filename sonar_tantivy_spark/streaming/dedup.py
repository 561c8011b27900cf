"""Streaming exact deduplication — content-fingerprint drop-duplicates
with bounded state.

Training-data ingest is a stream; exact dedup must happen before
anything expensive touches a copy.  This operator fingerprints each
document (bag-of-words md5 — the SAME expression as the batch dedup in
driver_queries, so batch and stream can never drift) and drops
duplicate fingerprints with ``dropDuplicatesWithinWatermark``: state
for a fingerprint is kept only until the watermark passes its event
time, so state size is bounded by the dedup horizon instead of growing
with the corpus — the only viable shape for an unbounded stream.

Semantics: within one horizon every fingerprint survives exactly once
(the first arrival); duplicates farther apart than the horizon than can
re-emerge, which is the documented trade of bounded state.  For global
exactness compose with the batch window-min dedup downstream
(pl_clean_corpus) — stream dedup cuts the volume, batch dedup is the
guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_fingerprint(text_col: str = "text") -> Column:
    """Bag-of-words md5 — shared with the batch dedup
    (driver_queries._bag_fingerprint_expr keeps the same shape)."""
    w = F.split(F.col(text_col), " ")
    return F.md5(F.concat_ws(",", F.sort_array(F.array_distinct(w))))


def dedup_stream(
    docs: DataFrame,
    *,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """docs stream → stream with duplicate contents dropped (first
    arrival per fingerprint within the watermark horizon survives)."""
    return (
        docs.withColumn("fingerprint", content_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
