"""Conversation-level operators: values vs a hand-computed fixture and
brute-force pandas truth on the generated corpus; plan shape = at most
one conv_id exchange, no joins."""

import pandas as pd
import pytest

from sonar_tantivy_spark.operators import convo
from sonar_tantivy_spark.sources.transcripts import generate_transcripts

N = 3000


@pytest.fixture(scope="module")
def turns(spark):
    return spark.createDataFrame(generate_transcripts(N)).cache()


def test_conversation_stats_match_pandas(spark, turns):
    got = {r["conv_id"]: r for r in convo.conversation_stats(turns).collect()}
    pdf = generate_transcripts(N)
    for conv_id, g in pdf.groupby("conv_id"):
        r = got[conv_id]
        assert r["n_turns"] == len(g)
        assert r["n_user"] == int((g["role"] == "user").sum())
        assert r["n_assistant"] == int((g["role"] == "assistant").sum())
        assert r["n_tool_calls"] == int(g["tool"].notna().sum())
        assert r["n_tokens"] == int(g["text"].str.split(" ").str.len().sum())
        e = (g["ts"] - pd.Timestamp(0)).dt.total_seconds()
        assert abs(r["duration_s"] - (e.max() - e.min())) < 1e-6
    assert len(got) == pdf["conv_id"].nunique()


def test_reply_latency(spark, turns):
    rows = convo.reply_latency(turns).collect()
    pdf = generate_transcripts(N)
    pdf["e"] = (pdf["ts"] - pd.Timestamp(0)).dt.total_seconds()
    want = {}
    for conv_id, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        lat = g["e"].diff()
        for ti, lt in zip(g["turn_idx"].iloc[1:], lat.iloc[1:]):
            want[(conv_id, ti)] = lt
    assert len(rows) == len(want)
    for r in rows:
        assert abs(r["latency_s"] - want[(r["conv_id"], r["turn_idx"])]) < 1e-6
        assert r["latency_s"] >= 0


def test_context_pairs_shape_and_content(spark, turns):
    rows = convo.context_pairs(turns, context_turns=3).collect()
    pdf = generate_transcripts(N)
    by_conv = {c: g.sort_values("turn_idx").reset_index(drop=True)
               for c, g in pdf.groupby("conv_id")}
    assert rows
    for r in rows[:200]:
        g = by_conv[r["conv_id"]]
        i = int(r["turn_idx"])
        assert g.loc[i, "role"] == "assistant"
        lo = max(0, i - 3)
        want_ctx = "\n".join(
            f"{g.loc[j, 'role']}: {g.loc[j, 'text']}" for j in range(lo, i))
        assert r["context"] == want_ctx
        assert r["response"] == g.loc[i, "text"]
    # turn 0 assistant rows (no context) are excluded
    assert all(r["turn_idx"] > 0 for r in rows)


def test_tool_call_rate_totals(spark, turns):
    rows = convo.tool_call_rate(turns).collect()
    pdf = generate_transcripts(N)
    assert sum(r["n_calls"] for r in rows) == int(pdf["tool"].notna().sum())
    per_tool = pd.Series({t: int((pdf["tool"] == t).sum())
                          for t in pdf["tool"].dropna().unique()})
    got_tool = {}
    for r in rows:
        got_tool[r["tool"]] = got_tool.get(r["tool"], 0) + r["n_calls"]
    assert got_tool == per_tool.to_dict()


@pytest.mark.parametrize("op", ["conversation_stats", "reply_latency",
                                "context_pairs"])
def test_single_exchange_no_join(spark, turns, op):
    df = getattr(convo, op)(turns)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 1, plan


def test_render_conversations(spark, turns):
    """Rendered text = role-prefixed turns in turn_idx order; token
    count = sum of per-line whitespace tokens."""
    got = {r["conv_id"]: r for r in
           convo.render_conversations(turns).collect()}
    pdf = generate_transcripts(N)
    for cid, grp in pdf.groupby("conv_id"):
        g = grp.sort_values("turn_idx")
        lines = [f"{r.role}: {r.text}" for r in g.itertuples()]
        assert got[cid]["text"] == "\n".join(lines)
        assert got[cid]["n_turns"] == len(g)
        assert got[cid]["n_tokens"] == sum(
            len(ln.split(" ")) for ln in lines)


def test_pack_conversations(spark, turns):
    """Bin assignment matches a pandas replay of the shard tape;
    conversations never split (one seq_id per conv_id by construction
    — assert the running offsets are consistent with whole-conv
    placement)."""
    out = convo.pack_conversations(turns, budget=64, n_shards=8).collect()
    got = {r["conv_id"]: r for r in out}
    assert len(got) == len(out)  # one row (= one sequence) per conv
    rendered = {r["conv_id"]: r["n_tokens"] for r in
                convo.render_conversations(turns).collect()}
    shards = {r["conv_id"]: int(r["seq_id"].split("#")[0]) for r in out}
    by_shard: dict[int, list] = {}
    for cid, sh in shards.items():
        by_shard.setdefault(sh, []).append(cid)
    for sh, cids in by_shard.items():
        run = 0
        for cid in sorted(cids):
            assert got[cid]["seq_id"] == f"{sh}#{run // 64}"
            assert got[cid]["seq_off"] == run % 64
            run += rendered[cid]


def test_render_single_exchange(spark, turns):
    plan = convo.render_conversations(turns) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Join" not in plan
    plan2 = convo.pack_conversations(turns) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Exchange") == 2 and "Join" not in plan2
