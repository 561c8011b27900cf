"""Regression: the WAND bound for SLOPPY phrases must use the last
term's max_tf, not min(max_tf) over all terms.

The slop branch of _cand_phrase scores tf as the surviving-position
count of the LAST phrase term (size(__m)) — one predecessor position
can validate up to 1+slop successor positions, so a doc with
``alpha x1, beta x30`` scores tf=30 while min(max_tf)=1.  A bound of
min(max_tf) under-estimates that doc, and top_k_pruned can prune the
segment holding the genuine global top-1 (ADVICE r4, high).

The corpus here is hand-built to make the old bound provably wrong:

- 2 "hot" segments: one doc each of ("alpha beta " * 6) — exact
  adjacent pairs, tf=6 both terms, short vs avgdl.  These get the
  highest OLD bounds, are probed, and set θ to their true score.
- 1 "killer" segment: one doc "alpha" + "beta"*30 — true global
  top-1 under slop>=30 (tf=30 > 6 with similar length), but
  min(max_tf)=1 there, so the OLD bound sits far below θ and the
  segment was skipped → wrong top-1.
- 3 decoy segments with a single adjacent "alpha beta" (tf=1): they
  give the low-bound cluster enough mass that the bimodality gate
  fires and the probe path actually runs.
- long filler docs (no alpha/beta) raise avgdl so the short scoring
  docs sit below the length norm's pivot; filler segments bound at
  0.0 and drop as absence proofs in both old and new code.

Parity pruned == exact is the contract; the top-1 coming from the
killer doc is what discriminates the fix."""

import pandas as pd
import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA

SEG = 50  # docs per segment; << BLOCK_DOCS so 1 block == 1 segment

FILLER = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua enim "
          "ad minim veniam quis nostrud exercitation ullamco laboris nisi "
          "aliquip ex ea commodo consequat duis aute irure reprehenderit")


def _corpus():
    """8 segments x 50 docs.  Segment layout (docid order is the
    (conv_id, turn_idx) order below):
      seg 0, 1 : hot doc at slot 0, fillers after
      seg 2    : killer doc at slot 0
      seg 3-5  : decoy doc at slot 0
      seg 6, 7 : all filler (zero-bound, dropped)
    """
    hot = ("alpha beta " * 6).strip()             # len 12, tf 6/6
    killer = ("alpha " + "beta " * 30).strip()    # len 31, tf 1/30
    decoy = "alpha beta"                          # len 2,  tf 1/1
    rows = []
    specials = {0: hot, 1: hot, 2: killer, 3: decoy, 4: decoy, 5: decoy}
    for seg in range(8):
        for i in range(SEG):
            text = specials[seg] if (seg in specials and i == 0) else FILLER
            rows.append({
                "conv_id": f"c{seg:02d}", "turn_idx": i, "role": "user",
                "text": text, "tool": "",
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i),
            })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def slop_index(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("slopbound"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("slopbound", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(_corpus()),
               order_cols=["conv_id", "turn_idx"], seg_size=SEG)
    return idx


def _rows(df):
    return [(int(r["docid_g"]), round(float(r["score"]), 9))
            for r in df.collect()]


def test_slop_bound_does_not_prune_true_top1(slop_index):
    idx = slop_index
    s = idx.searcher()
    node = A.parse_json(
        {"phrase": {"text": {"terms": ["alpha", "beta"], "slop": 30}}},
        idx.schema)
    # limit=1: the probe (2 hot segments, 1 matching doc each) returns
    # >= 1 row, so θ becomes the hot docs' true score and actually
    # prunes — at limit=3 the probe under-fills and θ stays 0.0
    exact = _rows(s.top_k(node, limit=1))
    # precondition: the killer doc (docid 100 = seg 2 slot 0) IS the
    # true global top-1 — otherwise this test discriminates nothing
    assert exact[0][0] == 2 * SEG
    pruned = _rows(s.top_k_pruned(node, limit=1))
    assert pruned == exact


def test_slop_bound_dominates_every_doc_score(slop_index):
    """Soundness, probe-independent: for every live segment the bound
    must be >= the best ACTUAL slop-phrase score inside it."""
    import collections

    idx = slop_index
    s = idx.searcher()
    node = A.parse_json(
        {"phrase": {"text": {"terms": ["alpha", "beta"], "slop": 30}}},
        idx.schema)
    bounds = s._segment_bounds(node)
    per_seg = collections.defaultdict(float)
    for r in s.top_k(node, limit=100).collect():
        per_seg[r["segment_id"]] = max(per_seg[r["segment_id"]],
                                       float(r["score"]))
    assert per_seg, "query matched nothing — corpus broken"
    for sid, best in per_seg.items():
        assert bounds[sid] >= best - 1e-9, (sid, bounds[sid], best)


def test_exact_phrase_bound_unchanged(slop_index):
    """slop=0 must keep the tighter min(max_tf) bound — parity and the
    decoy segments still pruning under the exact branch."""
    idx = slop_index
    s = idx.searcher()
    node = A.parse_json(
        {"phrase": {"text": {"terms": ["alpha", "beta"]}}}, idx.schema)
    exact = _rows(s.top_k(node, limit=3))
    pruned = _rows(s.top_k_pruned(node, limit=3))
    assert pruned == exact
