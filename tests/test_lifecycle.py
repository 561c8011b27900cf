"""Segment lifecycle: compaction parity, WAND pruning parity,
resume-from-checkpoint idempotence, string-grammar extras."""

import pandas as pd
import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.operators.merge import compact, compact_to
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)

N = 900


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N)


def _build(spark, tmp, corpus, name, **kw):
    cat = IndexCatalog(spark, str(tmp))
    idx = cat.create_index(name, TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], **kw)
    return idx


def _topk(idx, q, k=10, pruned=False):
    node = A.parse_json(q, idx.schema) if isinstance(q, dict) else \
        A.parse_string(q, idx.schema)
    s = idx.searcher()
    df = s.top_k_pruned(node, limit=k) if pruned else s.top_k(node, limit=k)
    return [(r["docid_g"], round(r["score"], 9)) for r in df.collect()]


def test_compaction_preserves_results(spark, tmp_path, corpus):
    idx = _build(spark, tmp_path, corpus, "c1", num_segments=3)
    q = {"bool": {"should": [{"term": {"text": "hello"}},
                             {"term": {"text": "the"}}]}}
    before = _topk(idx, q)
    assert len(idx.segment_info()) == 3
    compact(idx)
    assert len(idx.segment_info()) == 1
    after = _topk(idx, q)
    assert before == after
    # global stats unchanged
    s = idx.searcher()
    assert s.num_docs == N


def test_compact_to_preserves_results(spark, tmp_path, corpus):
    idx = _build(spark, tmp_path, corpus, "c2", num_segments=4)
    q = {"bool": {"should": [{"term": {"text": "hello"}},
                             {"term": {"text": "the"}}]}}
    before = _topk(idx, q)
    compact_to(idx, target_segments=2)
    assert len(idx.segment_info()) == 2
    assert _topk(idx, q) == before
    # idempotent at target: nothing left to merge
    assert compact_to(idx, target_segments=2) == []
    assert _topk(idx, q) == before


def test_wand_pruning_parity(spark, tmp_path, corpus):
    """Pruned path must be bit-identical to the exact plan across every
    boundable shape: OR, AND, phrase, mixed bool, range-filtered, boost,
    single term, constant-score."""
    idx = _build(spark, tmp_path, corpus, "w1", num_segments=4)
    for q in ({"bool": {"should": [{"term": {"text": "hello"}},
                                   {"term": {"text": "mundo"}}]}},
              {"bool": {"should": [{"term": {"text": "hello"}},
                                   {"term": {"text": "world"}},
                                   {"term": {"text": "the"}}]}},
              {"term": {"text": "the"}},
              {"bool": {"must": [{"term": {"text": "hello"}},
                                 {"term": {"text": "world"}}]}},
              {"phrase": {"text": {"terms": ["hello", "world"]}}},
              {"bool": {"must": [{"term": {"text": "hello"}}],
                        "should": [{"term": {"text": "the"}}],
                        "must_not": [{"term": {"text": "stems"}}]}},
              {"bool": {"must": [{"term": {"text": "needle"}},
                                 {"term": {"role": "tool"}}]}},
              {"bool": {"must": [
                  {"term": {"text": "hello"}},
                  {"range": {"ts": {"gte": "2026-01-01 00:00:00",
                                    "lte": "2026-01-03 00:00:00"}}}]}},
              "hello^2 world",
              {"fuzzy": {"text": {"value": "helo", "distance": 1}}}):
        exact = _topk(idx, q)
        pruned = _topk(idx, q, pruned=True)
        assert exact == pruned, q


def test_wand_actually_skips_segments(spark, tmp_path):
    """Skew evidence: the hot term's high-tf segment sets θ above the
    other segments' block-max bounds, so they are skipped — and the
    result still matches the exact plan."""
    docs = []
    for i in range(200):
        if i < 50:
            text = "hot hot hot hot hot"
        elif i % 10 == 0:
            text = "hot " + " ".join(f"fill{j}" for j in range(20))
        else:
            text = " ".join(f"fill{j}" for j in range(20))
        docs.append({"conv_id": f"c{i:04d}", "turn_idx": 0, "role": "user",
                     "text": text, "tool": "bash",
                     "ts": pd.Timestamp("2026-01-01")})

    cat = IndexCatalog(spark, str(tmp_path))
    idx = cat.create_index("skew", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(pd.DataFrame(docs)),
               order_cols=["conv_id", "turn_idx"], num_segments=4)
    q = {"term": {"text": "hot"}}
    exact = _topk(idx, q)
    pruned = _topk(idx, q, pruned=True)
    assert exact == pruned
    s = idx.searcher()
    assert s.last_prune["segments_skipped"] >= 1, s.last_prune
    # the default query path IS the pruned path
    assert [(r["docid_g"], round(r["score"], 9))
            for r in idx.query_df(q).collect()] == exact


def test_vacuum_removes_superseded_epochs(spark, tmp_path, corpus):
    """After compaction, vacuum deletes the epochs the manifest no
    longer references; live data and results are untouched."""
    import os

    from sonar_tantivy_spark.operators.merge import vacuum

    idx = _build(spark, tmp_path, corpus, "gc1", num_segments=4)
    q = {"bool": {"should": [{"term": {"text": "hello"}},
                             {"term": {"text": "the"}}]}}
    before = _topk(idx, q)
    data_dir = os.path.join(idx.storage.root, "data")
    pre_epochs = set(os.listdir(data_dir))
    assert vacuum(idx) == []  # everything still referenced
    compact_to(idx, target_segments=2)
    removed = vacuum(idx)
    assert removed and set(removed) <= pre_epochs
    live = set(os.listdir(data_dir))
    assert live.isdisjoint(removed)
    idx._searcher = None  # drop cached tables pointing at dead paths
    assert _topk(idx, q) == before


def test_docs_time_partition_pruning(spark, tmp_path, corpus):
    """The docs row store is hive-partitioned by a ts month bucket; a
    ts-range clause must reach the scan as a PartitionFilter (file-level
    pruning, the Iceberg ts-partitioning analog) and results must agree
    with the unpartitioned-filter semantics."""
    idx = _build(spark, tmp_path, corpus, "tp1", num_segments=2)
    q = {"bool": {"must": [
        {"term": {"text": "hello"}},
        {"range": {"ts": {"gte": "2026-01-02 00:00:00",
                          "lte": "2026-01-03 00:00:00"}}}]}}
    node = A.parse_json(q, idx.schema)
    s = idx.searcher()
    rng = [c for c in node.must if isinstance(c, A.RangeQ)][0]
    plan = s._cand_range(rng)._jdf.queryExecution().executedPlan().toString()
    assert "__tsbucket" in plan.split("PartitionFilters", 1)[-1], plan
    # correctness unchanged vs the pure ts filter
    docs = s._table("docs")
    from pyspark.sql import functions as SF
    want = {(r["segment_id"], r["docid"]) for r in docs.filter(
        (SF.col("ts") >= "2026-01-02 00:00:00")
        & (SF.col("ts") <= "2026-01-03 00:00:00"))
        .select("segment_id", "docid").collect()}
    got = {(r["segment_id"], r["docid"])
           for r in s._cand_range(rng).collect()}
    assert got == want


def test_resume_idempotence(spark, tmp_path, corpus):
    # reference build, one shot
    ref = _build(spark, tmp_path, corpus, "full", num_segments=3)
    want = _topk(ref, {"term": {"text": "hello"}})

    # crashed build: commit then surgically drop the last two segments from
    # the manifest (simulates dying after a partial per-segment commit)
    cat = IndexCatalog(spark, str(tmp_path))
    idx = cat.create_index("crash", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3, epoch="fix")
    m = idx.storage.manifest()
    assert len(m["segments"]) == 3
    dropped = m["segments"][1:]
    m["segments"] = m["segments"][:1]
    m["opstamp"] -= sum(s["max_doc"] for s in dropped)
    idx.storage._write_json("manifest.json", m)

    # re-run the same epoch: only the missing segments are rebuilt
    metas = idx.add_df(spark.createDataFrame(corpus),
                       order_cols=["conv_id", "turn_idx"],
                       num_segments=3, epoch="fix")
    assert sorted(x["segment_id"] for x in metas) == \
        sorted(s["segment_id"] for s in dropped)
    assert len(idx.segment_info()) == 3

    got = _topk(idx, {"term": {"text": "hello"}})
    assert got == want

    # a third run is a no-op (duplicate segments are never re-committed)
    assert idx.add_df(spark.createDataFrame(corpus),
                      order_cols=["conv_id", "turn_idx"],
                      num_segments=3, epoch="fix") == []


def test_string_grammar_range_and_field(spark, tmp_path, corpus):
    idx = _build(spark, tmp_path, corpus, "g1", num_segments=2)
    # field-scoped term
    got = _topk(idx, "role:tool")
    assert got, "role:tool should match tool turns"
    # must/must_not via +/-
    plus = _topk(idx, "+hello -world")
    json_q = {"bool": {"must": [{"term": {"text": "hello"}}],
                       "must_not": [{"term": {"text": "world"}}]}}
    assert plus == _topk(idx, json_q)
    # range clause on a fast field
    node = A.parse_string('hello +turn_idx:[0 TO 1]', idx.schema)
    assert isinstance(node, A.BoolQ) and node.must


def test_build_metrics_lineage(spark, tmp_path, corpus):
    idx = _build(spark, tmp_path, corpus, "m1", num_segments=2)
    import os
    path = os.path.join(idx.storage.root, "metrics.jsonl")
    assert os.path.exists(path)
    import json
    rows = [json.loads(x) for x in open(path)]
    assert len(rows) == 2
    assert all(r["docs_per_sec_batch"] > 0 and r["segment_id"] for r in rows)


def test_ts_bucket_granularity_override(spark, tmp_path, corpus, monkeypatch):
    """SPARK_GRAFT_TS_BUCKET=year forces coarse buckets; values carry the
    string-guard prefix and the manifest records the format."""
    import os

    monkeypatch.setenv("SPARK_GRAFT_TS_BUCKET", "year")
    idx = _build(spark, tmp_path, corpus, "yb1", num_segments=2)
    metas = idx.storage.manifest()["segments"]
    assert all(m["tsbucket_fmt"] == "yyyy" for m in metas)
    docs_dir = metas[0]["tables"]["docs"]
    buckets = [d for d in os.listdir(docs_dir) if d.startswith("__tsbucket=")]
    assert buckets == ["__tsbucket=b2026"]
    # range query still correct through the coarse bucket
    got = _topk(idx, {"bool": {"must": [
        {"term": {"text": "hello"}},
        {"range": {"ts": {"gte": "2026-01-01 00:00:00",
                          "lte": "2026-01-02 00:00:00"}}}]}})
    ref = _build(spark, tmp_path, corpus, "yb2", num_segments=2)
    monkeypatch.delenv("SPARK_GRAFT_TS_BUCKET")
    assert got == _topk(ref, {"bool": {"must": [
        {"term": {"text": "hello"}},
        {"range": {"ts": {"gte": "2026-01-01 00:00:00",
                          "lte": "2026-01-02 00:00:00"}}}]}})


def test_n_hint_partitioning_invariance(spark, tmp_path, corpus):
    """Builds at wildly different task counts (n_hint collapses the
    micro-batch to a handful of partitions vs the default 4x-cores
    over-partitioning) must produce identical docids, scores, and stored
    docs — the rank-is-partitioning-invariant contract that makes the
    streaming path's adaptive sizing safe."""
    a = _build(spark, tmp_path / "a", corpus, "a", num_segments=3)
    b = _build(spark, tmp_path / "b", corpus, "b", num_segments=3,
               n_hint=len(corpus))
    for q in ("hello", "tell me more", 'role:user AND hello'):
        ra, rb = a.query(q, limit=20), b.query(q, limit=20)
        assert ra == rb, q
    # segment ids embed the wall-clock epoch; the doc layout must match
    assert ([s["max_doc"] for s in a.segment_info()]
            == [s["max_doc"] for s in b.segment_info()])


def test_tiered_compact_preserves_results(spark, tmp_path, corpus):
    """Cheapest-window merge: picks the contiguous run with the fewest
    docs, preserves global docids / scores bit-identically, and stops at
    the cap."""
    from sonar_tantivy_spark.operators.merge import tiered_compact

    idx = _build(spark, tmp_path, corpus, "tc", num_segments=6)
    q = {"bool": {"should": [{"term": {"text": "hello"}},
                             {"term": {"text": "the"}}]}}
    before = _topk(idx, q)
    sizes_before = [s["max_doc"] for s in idx.segment_info()]
    meta = tiered_compact(idx, max_segments=4)
    assert meta is not None
    infos = idx.segment_info()
    assert len(infos) == 4
    # merged window was the cheapest contiguous triple
    w = len(sizes_before) - 4 + 1
    best = min(range(len(sizes_before) - w + 1),
               key=lambda i: sum(sizes_before[i:i + w]))
    assert meta["max_doc"] == sum(sizes_before[best:best + w])
    assert _topk(idx, q) == before
    # under the cap: no-op
    assert tiered_compact(idx, max_segments=4) is None
    assert _topk(idx, q) == before


def test_tiered_compact_cap_below_one(spark, tmp_path, corpus):
    """auto_compact_above=0 must behave like 'one segment', not crash
    (regression: empty-window min() ValueError)."""
    from sonar_tantivy_spark.operators.merge import tiered_compact

    idx = _build(spark, tmp_path, corpus, "tc0", num_segments=3)
    q = {"term": {"text": "hello"}}
    before = _topk(idx, q)
    meta = tiered_compact(idx, max_segments=0)
    assert meta is not None and len(idx.segment_info()) == 1
    assert _topk(idx, q) == before


def test_sorted_pruning_parity_and_skips(spark, tmp_path, corpus):
    """Sorted-collector zone-map pruning must be bit-identical to the
    unpruned sorted plan, and must actually skip segments when the sort
    field's ranges separate (docid order follows (conv_id, turn_idx), so
    ts ranges overlap per segment only partially)."""
    idx = _build(spark, tmp_path, corpus, "sp1", num_segments=4)
    s = idx.searcher()
    for q in ({"term": {"text": "hello"}}, {"all": {}},
              {"term": {"text": "zzz-no-such-term"}}):
        node = A.parse_json(q, idx.schema)
        exact = [(r["docid_g"], r["score"]) for r in
                 s.top_k(node, limit=10, sort_by="ts").collect()]
        pruned = [(r["docid_g"], r["score"]) for r in
                  s.top_k_sorted_pruned(node, limit=10, sort_by="ts").collect()]
        assert exact == pruned, q
    # skip evidence on a query with matches everywhere: an {all} query
    # sorted ts-desc fills k from the newest-bounded probe, and θ then
    # rules out any segment whose max ts is older
    node = A.parse_json({"all": {}}, idx.schema)
    s.top_k_sorted_pruned(node, limit=10, sort_by="ts").collect()
    st = s.last_prune
    assert st["segments_total"] == 4
    assert st["segments_skipped"] >= 1, st
    # non-fast sort fields fall back silently (reference semantics)
    r = s.top_k_sorted_pruned(node, limit=5, sort_by="text")
    assert r.collect() is not None


def test_merge_field_stats_mixed_epoch_formats():
    """Merging a pre-epoch-format segment with a new one must NOT emit
    epoch bounds built from only the new inputs — an understated
    max_epoch would let the sorted collector prune a segment holding
    true top-k rows (review r3)."""
    from sonar_tantivy_spark.operators.merge import _merge_field_stats

    old_seg = {"field_stats": {"ts": {
        "min": "2026-06-01 00:00:00", "max": "2026-06-30 00:00:00"}}}
    new_seg = {"field_stats": {"ts": {
        "min": "2026-01-01 00:00:00", "max": "2026-01-05 00:00:00",
        "min_epoch": 1767225600.0, "max_epoch": 1767571200.0}}}
    for run in ([old_seg, new_seg], [new_seg, old_seg]):
        merged = _merge_field_stats(run)["ts"]
        assert merged["max"] == "2026-06-30 00:00:00"
        assert "min_epoch" not in merged and "max_epoch" not in merged
    # both inputs epoch-format: epochs union normally
    both = _merge_field_stats([new_seg, new_seg])["ts"]
    assert both["max_epoch"] == 1767571200.0


def test_sorted_pruning_timezone_independent(spark, tmp_path, corpus):
    """Sorted-collector pruning must stay bit-identical when the Spark
    session timezone differs from the host zone AND from the build
    session's zone — the ADVICE r2 silent-wrong-results case.  Zone
    maps now carry tz-independent epoch bounds, so pruning neither
    drops true top-k rows (a too-small bound) nor degrades."""
    from sonar_tantivy_spark.operators.search import Searcher

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # build under a zone WEST of UTC (host is UTC): with the old
        # ISO-string bounds this shifts θ comparisons by 7-8 h — larger
        # than the per-segment ts spread — and silently mis-prunes
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        idx = _build(spark, tmp_path, corpus, "sptz", num_segments=4)
        for qtz in ("America/Los_Angeles", "Asia/Tokyo", "UTC"):
            spark.conf.set("spark.sql.session.timeZone", qtz)
            s = Searcher(spark, idx.schema, idx.storage)  # fresh caches
            node = A.parse_json({"all": {}}, idx.schema)
            exact = [(r["docid_g"], r["score"]) for r in
                     s.top_k(node, limit=10, sort_by="ts").collect()]
            pruned = [(r["docid_g"], r["score"]) for r in
                      s.top_k_sorted_pruned(
                          node, limit=10, sort_by="ts").collect()]
            assert exact == pruned, qtz
            assert s.last_prune["segments_skipped"] >= 1, \
                (qtz, s.last_prune)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_docid_assign_broadcast_offsets_branch(spark, corpus):
    """Cluster-scale docid assignment: above 4096 range partitions the
    literal offset map would break codegen, so the build switches to a
    broadcast-joined offset table (build.py) — its ranks must be
    identical to the literal-map branch."""
    from pyspark.sql import functions as SF

    from sonar_tantivy_spark.operators import build as B

    df = spark.createDataFrame(corpus)
    small, c1, n1 = B._assign_docids(df, ["conv_id", "turn_idx"], 8)
    big, c2, n2 = B._assign_docids(df, ["conv_id", "turn_idx"], 1100)
    try:
        assert n1 == n2 == len(corpus)
        key = lambda d: [(r["conv_id"], r["turn_idx"], r["docid_g"])
                         for r in d.select("conv_id", "turn_idx", "docid_g")
                         .orderBy("docid_g").collect()]
        assert key(small) == key(big)
    finally:
        c1.unpersist()
        c2.unpersist()


def test_vacuum_keeps_partially_live_epochs(spark, tmp_path, corpus):
    """A tiered merge replaces only a WINDOW of an epoch's segments, so
    the epoch directory stays partially live — vacuum must not touch it
    (only fully-unreferenced epochs die)."""
    import os

    from sonar_tantivy_spark.operators.merge import tiered_compact, vacuum

    idx = _build(spark, tmp_path, corpus, "pv1", num_segments=4)
    q = {"term": {"text": "hello"}}
    before = _topk(idx, q)
    build_epochs = set(os.listdir(os.path.join(idx.storage.root, "data")))
    tiered_compact(idx, max_segments=3)  # merges 2 of the 4 in-place
    removed = vacuum(idx)
    # original epoch still referenced by the 2 unmerged segments
    assert not (set(removed) & build_epochs)
    idx._searcher = None
    assert _topk(idx, q) == before
    # merge everything -> the build epoch is now fully dead
    from sonar_tantivy_spark.operators.merge import compact
    compact(idx)
    removed = vacuum(idx)
    assert set(removed) >= build_epochs
    idx._searcher = None
    assert _topk(idx, q) == before
