"""ES ``script_score`` query — the safe arithmetic Painless subset
(numbers, names, + − × ÷ % **, unary minus; ast-walked, no calls or
attributes) over ``_score`` and numeric stored fields, translated to
ONE whole-stage-codegen'd JVM column (plans/ast.py ScriptScoreQ,
operators/search.py _script_col).  Pinned rules: null fields read 0.0,
division by zero → score 0.0, match set = the child's."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N_TURNS = 800


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus.to_dict("records"),
                       {"text": "en_stem", "role": "raw", "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxscriptscore"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


def _topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


def test_parse_script_score(index):
    n = A.parse_json({"script_score": {
        "query": {"term": {"text": "hello"}},
        "script": {"source": "_score * 2 + turn_idx / 10"}}},
        index.schema)
    assert isinstance(n, A.ScriptScoreQ)
    assert n.fields == ["turn_idx"]
    # bare-string script form
    n = A.parse_json({"script_score": {
        "query": {"term": {"text": "hello"}},
        "script": "_score + 1"}}, index.schema)
    assert n.fields == []


def test_parse_script_score_rejections(index):
    schema = index.schema
    with pytest.raises(A.QueryError):  # call syntax
        A.parse_json({"script_score": {
            "query": {"term": {"text": "hello"}},
            "script": "__import__('os')"}}, schema)
    with pytest.raises(A.QueryError):  # attribute access
        A.parse_json({"script_score": {
            "query": {"term": {"text": "hello"}},
            "script": "_score.real"}}, schema)
    with pytest.raises(A.QueryError):  # non-numeric field
        A.parse_json({"script_score": {
            "query": {"term": {"text": "hello"}},
            "script": "_score * text"}}, schema)
    with pytest.raises(A.QueryError):  # unknown field
        A.parse_json({"script_score": {
            "query": {"term": {"text": "hello"}},
            "script": "nosuch + 1"}}, schema)
    with pytest.raises(A.QueryError):  # missing script
        A.parse_json({"script_score": {
            "query": {"term": {"text": "hello"}}}}, schema)


SCRIPTS = [
    "_score * 2 + turn_idx / 10",
    "_score + turn_idx % 3",
    "(_score + 1) ** 2 - turn_idx",
    "-_score + 5",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_score_parity(index, oracle, script):
    q = {"script_score": {"query": {"term": {"text": "hello"}},
                          "script": script}}
    node = A.parse_json(q, index.schema)
    truth = sorted(oracle.score(node).items(),
                   key=lambda kv: (-round(kv[1], 7), kv[0]))[:10]
    got = _topk(index, node)
    assert [d for d, _ in got] == [d for d, _ in truth]
    for (gd, gs), (td, ts) in zip(got, truth):
        assert gs == pytest.approx(ts, rel=1e-9)


def test_match_set_unchanged(index):
    base = A.parse_json({"term": {"text": "hello"}}, index.schema)
    scripted = A.parse_json({"script_score": {
        "query": {"term": {"text": "hello"}},
        "script": "_score * 0 + 1"}}, index.schema)
    ids_base = sorted(d for d, _ in _topk(index, base, k=N_TURNS))
    got = _topk(index, scripted, k=N_TURNS)
    assert sorted(d for d, _ in got) == ids_base
    assert all(s == 1.0 for _, s in got)


def test_division_by_zero_scores_zero(index):
    # turn_idx is 0 for every conversation's first turn → 1/0 → null
    # → coalesced 0.0 (the pinned gap rule); child = match-all so the
    # zero rows are guaranteed present
    node = A.ScriptScoreQ(A.AllQ(), "1 / turn_idx", ["turn_idx"])
    got = dict(_topk(index, node, k=N_TURNS))
    assert len(got) == N_TURNS  # match set unchanged
    assert min(got.values()) == 0.0
