"""Block-granular (within-segment) WAND pruning on a COMPACTED index.

VERDICT r3 #4: segment-level max-tf bounds lose discrimination exactly
when pruning matters most — after compaction leaves few huge segments
(the 100×-scale steady state).  The termdict now carries a per-block
max-tf map (blk = docid // block_docs, build.py:termdict_from_postings)
and top_k_pruned prunes at UNIT granularity: docid-range predicates
that parquet row-group stats can skip at the reader.

The corpus plants the needle term hot (tf=6) in TWO separated bands so
that after compact_to(2) EACH compacted segment holds one hot band:
segment-level bounds are uniform (both segments max_tf 6 — the old
granularity can skip nothing), but block bounds discriminate and the
θ-probe must drop every cold (tf=1 trickle) block while staying
bit-identical to the exhaustive plan.  Mirrors tantivy's per-block
max-tf skips (reference: searcher.search behind
/root/reference/src-rust/index.rs:260).
"""

import os
import shutil
import tempfile

import pandas as pd
import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.operators.merge import compact_to
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA

N_DOCS = 8_000
SEG_SIZE = 1_000       # build: 8 segments -> compact_to(2): 2 x 4000 docs
BLOCK = 256            # 4000/256 -> 16 blocks per compacted segment
HOT = [(1_000, 1_100), (5_000, 5_100)]  # one band per compacted segment


def _corpus() -> pd.DataFrame:
    rows = []
    for i in range(N_DOCS):
        hot = any(lo <= i < hi for lo, hi in HOT)
        filler = [f"pad{(i + j) % 7}" for j in range(8)]
        if hot:
            words = filler + ["needleword"] * 6
        elif i % 40 == 0:
            words = filler + ["needleword"] + ["calmfill"] * 5
        else:
            words = filler + ["calmfill"] * 6
        if 1_000 <= i < 1_100:
            words.append("bandalpha")  # band-A-only marker (absence test)
        rows.append({
            "conv_id": f"conv-{i:08d}", "turn_idx": 0, "role": "user",
            "text": " ".join(words), "tool": "bash",
            "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i),
        })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def compacted_index(spark):
    old = os.environ.get("STSPARK_BLOCK_DOCS")
    os.environ["STSPARK_BLOCK_DOCS"] = str(BLOCK)
    base = tempfile.mkdtemp(prefix="stspark-blockwand-")
    try:
        cat = IndexCatalog(spark, base)
        idx = cat.create_index("bw", TRANSCRIPT_SCHEMA)
        idx.add_df(spark.createDataFrame(_corpus()),
                   order_cols=["conv_id", "turn_idx"], seg_size=SEG_SIZE)
        compact_to(idx, target_segments=2)
        assert len(idx.storage.manifest()["segments"]) == 2
        yield idx
    finally:
        if old is None:
            os.environ.pop("STSPARK_BLOCK_DOCS", None)
        else:
            os.environ["STSPARK_BLOCK_DOCS"] = old
        shutil.rmtree(base, ignore_errors=True)


def _rows(df):
    return [(r["docid_g"], round(r["score"], 9)) for r in df.collect()]


def test_block_skips_inside_uniform_segments(compacted_index):
    idx = compacted_index
    s = idx.searcher()
    node = A.parse_json({"term": {"text": "needleword"}}, idx.schema)
    pruned = _rows(s.top_k_pruned(node, limit=10))
    st = dict(s.last_prune)
    exact = _rows(s.top_k(node, limit=10))
    assert pruned == exact  # pruning may never change results
    assert st["segments_total"] == 2
    # segment granularity can skip NOTHING here (both segments carry a
    # hot band, identical max_tf) — the win must come from blocks
    assert st["segments_skipped"] == 0
    assert st["theta"] > 0.0
    # deterministic corpus: 16 trickle-covered blocks per segment = 32
    # units; the probe takes the best-bounded quarter (8: the 4 hot
    # blocks + 4 cold), θ = the 10th tf-6 score, and every remaining
    # cold (tf=1) block is provably below it
    assert st["blocks_total"] == 32
    assert st["blocks_skipped"] == 24


def test_block_absence_proof_conjunction(compacted_index):
    # must [needleword, bandalpha]: bandalpha exists ONLY in band A's
    # blocks of segment 1, so every other block is a zero-bound absence
    # PROOF (a required term never appears there) — dropped without any
    # θ-probe, single-scan plan over the surviving docid ranges
    idx = compacted_index
    s = idx.searcher()
    node = A.parse_json(
        {"bool": {"must": [{"term": {"text": "needleword"}},
                           {"term": {"text": "bandalpha"}}]}}, idx.schema)
    pruned = _rows(s.top_k_pruned(node, limit=10))
    st = dict(s.last_prune)
    exact = _rows(s.top_k(node, limit=10))
    assert pruned == exact
    assert len(pruned) == 10
    # the OTHER segment has no bandalpha AT ALL -> zero SEGMENT bound,
    # dropped before block bounding; of segment 0's 16 blocks only
    # blocks 3-4 (docids 1000-1099) contain bandalpha — the other 14
    # are zero-bound absence proofs
    assert st["segments_skipped"] == 1
    assert st["blocks_total"] == 16
    assert st["blocks_skipped"] == 14


def test_compaction_stays_bit_identical(spark, compacted_index):
    # the merged termdict was re-aggregated from the REBASED postings;
    # a full scored OR must match the exhaustive plan bit-for-bit
    idx = compacted_index
    s = idx.searcher()
    node = A.parse_json(
        {"bool": {"should": [{"term": {"text": "needleword"}},
                             {"term": {"text": "pad3"}}]}}, idx.schema)
    assert _rows(s.top_k_pruned(node, limit=25)) == \
        _rows(s.top_k(node, limit=25))


def test_block_pred_reaches_scan(compacted_index):
    # the surviving docid ranges must reach the postings SCAN side of
    # the plan (filter before the aggregation exchange, row-group
    # prunable), not sit above it — use the absence-proof conjunction,
    # whose single-job plan carries the range predicate
    idx = compacted_index
    s = idx.searcher()
    node = A.parse_json(
        {"bool": {"must": [{"term": {"text": "needleword"}},
                           {"term": {"text": "bandalpha"}}]}}, idx.schema)
    df = s.top_k_pruned(node, limit=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "docid" in plan and (">= 768" in plan or ">= 1024" in plan), \
        plan[:4000]
