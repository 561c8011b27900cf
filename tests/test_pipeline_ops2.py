"""Plan-shape + invariant tests for the round-3 pipeline additions:
TF-IDF keyword extraction, token-budget sequence packing, overlapping
chunking, and JSON property extraction.  Value-level parity is covered
by the DuckDB oracles (tools/verify_contract.py); these tests pin the
SCALE properties — chunking must stay map-only, packing must shuffle
exactly once, TF-IDF must broadcast the termdict side."""

import pytest

from sonar_tantivy_spark import driver_queries as dq

SF = "/root/testdata/sf0.001"

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunk_plan_map_only(spark):
    """Chunking is per-doc column math: its plan may not contain a
    shuffle or a join of any kind."""
    plan = _physical_plan(dq.QUERIES["pl_chunk_docs"](spark, SF))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_chunk_covers_every_token(spark):
    """Every token position of every doc lands in >= 1 chunk; chunk
    texts are exact slices of the source; overlap is SIZE-STRIDE."""
    docs = {r["doc_id"]: r["text"].split(" ") for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}
    rows = dq.QUERIES["pl_chunk_docs"](spark, SF).collect()
    seen: dict[int, set] = {d: set() for d in docs}
    for r in rows:
        w = docs[r["doc_id"]]
        st = r["chunk_idx"] * dq.CHUNK_STRIDE
        want = w[st:st + dq.CHUNK_SIZE]
        assert r["chunk_text"] == " ".join(want)
        assert r["n_chunk_tokens"] == len(want) > 0
        seen[r["doc_id"]].update(range(st, st + len(want)))
    for d, w in docs.items():
        assert seen[d] == set(range(len(w))), f"doc {d} has uncovered tokens"


def test_pack_single_exchange(spark):
    """Packing's only shuffle is the one (source, shard) exchange the
    running-sum window needs; no join operator."""
    plan = _physical_plan(dq.QUERIES["pl_pack_sequences"](spark, SF))
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_pack_invariants(spark):
    """Offsets stay under the budget; within each (source, shard) the
    token tape is contiguous: start_{i+1} = start_i + n_tokens_i from a
    zero origin, with the bin = start // BUDGET."""
    rows = dq.QUERIES["pl_pack_sequences"](spark, SF).collect()
    by_shard: dict[tuple, list] = {}
    for r in rows:
        src, shard, b = r["seq_id"].rsplit("#", 2)
        assert 0 <= r["seq_off"] < dq.PACK_BUDGET
        start = int(b) * dq.PACK_BUDGET + r["seq_off"]
        by_shard.setdefault((src, shard), []).append(
            (r["doc_id"], start, r["n_tokens"]))
    assert by_shard
    for docs in by_shard.values():
        docs.sort()
        tape = 0
        for _, start, n in docs:
            assert start == tape
            tape += n


def test_tfidf_plan_and_shape(spark):
    """The df side joins broadcast (termdict ≪ corpus at scale); per
    doc exactly <= K rows, ranked by score then term."""
    df = dq.QUERIES["tx_tfidf_topk"](spark, SF)
    plan = _physical_plan(df)
    for banned in BANNED:
        assert banned not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    rows = df.collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in per_doc.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= dq.TFIDF_TOPK
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True) or all(
            abs(a - b) < 1e-3 for a, b in zip(scores, scores[1:]))


def test_json_props_totals(spark):
    """Per-type counts sum to the events table; min <= avg <= max."""
    ev_n = spark.read.parquet(f"{SF}/events.parquet").count()
    rows = dq.QUERIES["ev_json_props"](spark, SF).collect()
    assert sum(r["cnt"] for r in rows) == ev_n
    for r in rows:
        assert r["k_min"] <= r["k_avg"] <= r["k_max"]
