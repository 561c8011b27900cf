"""span_containing / span_within (Lucene SpanContainingQuery /
SpanWithinQuery) — BEYOND-REFERENCE (toshi's DSL exposes no spans).

The engine supports the RIGID-big pin (plans/ast.py SpanContainQ):
big must be a slop-0 in-order chain (its span for final position q is
exactly [q−(k−1), q]) and little a single-clause span; everything else
is rejected at parse.  Verified by: grammar/rejection unit tests, a
hand-built corpus with enumerated spans, rank+score parity against the
pure-Python oracle replica on the deterministic transcript corpus, and
the k=1 degeneration identity (big == little == span_term ⇒ both modes
score bit-identically to the plain span_term)."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N_TURNS = 1000


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def oracle(corpus):
    docs = corpus.to_dict("records")
    return OracleIndex(docs, {"text": "en_stem", "role": "raw",
                              "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxspancontain"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=4)
    return idx


HAND_SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position",
                              "tokenizer": "default"},
                 "stored": True}},
]

# spans of big = [alpha, (beta|gamma)] (rigid).  NOTE docids are
# assigned in order_cols=["body"] sort order, so the comments below
# name the FINAL docid of each row:
HAND_DOCS = [
    {"body": "alpha beta gamma"},        # docid 1: span [0,1]; gamma@2 outside
    {"body": "alpha gamma delta"},       # docid 2: span [0,1]; gamma@1 INSIDE
    {"body": "alpha beta alpha gamma"},  # docid 0: spans [0,1],[2,3]; gamma@3 in
    {"body": "gamma alpha beta"},        # docid 3: span [1,2]; gamma@0 outside
]


@pytest.fixture(scope="module")
def hand_index(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxhandcontain"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("hand", HAND_SCHEMA)
    idx.add_df(spark.createDataFrame(HAND_DOCS),
               order_cols=["body"], num_segments=1)
    return idx


def _engine_topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


BIG_LITTLE = {"big": {"span_near": {"clauses": [
    {"span_term": {"body": "alpha"}},
    {"span_or": {"clauses": [{"span_term": {"body": "beta"}},
                             {"span_term": {"body": "gamma"}}]}}]}},
    "little": {"span_term": {"body": "gamma"}}}


# -------------------------------------------------------------- grammar
def test_parse_span_contain(index):
    schema = index.schema
    n = A.parse_json({"span_containing": {
        "big": {"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_term": {"text": "world"}}]}},
        "little": {"span_term": {"text": "hello"}}}}, schema)
    assert isinstance(n, A.SpanContainQ)
    assert n.mode == "containing" and n.field == "text"
    assert n.big.clauses == [("hello",), ("world",)]
    assert n.little == ("hello",)
    n = A.parse_json({"span_within": {
        "big": {"span_term": {"text": "hello"}},
        "little": {"span_or": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_term": {"text": "needle"}}]}}}}, schema)
    assert n.mode == "within" and n.big.clauses == [("hello",)]
    assert n.little == ("hello", "needl")


def test_parse_span_contain_rejections(index):
    schema = index.schema
    with pytest.raises(A.QueryError):  # sloppy big: extents inexact
        A.parse_json({"span_containing": {
            "big": {"span_near": {"clauses": [
                {"span_term": {"text": "hello"}},
                {"span_term": {"text": "world"}}], "slop": 1}},
            "little": {"span_term": {"text": "hello"}}}}, schema)
    with pytest.raises(A.QueryError):  # unordered big
        A.parse_json({"span_containing": {
            "big": {"span_near": {"clauses": [
                {"span_term": {"text": "hello"}},
                {"span_term": {"text": "world"}}],
                "in_order": False}},
            "little": {"span_term": {"text": "hello"}}}}, schema)
    with pytest.raises(A.QueryError):  # span_near little
        A.parse_json({"span_within": {
            "big": {"span_term": {"text": "hello"}},
            "little": {"span_near": {"clauses": [
                {"span_term": {"text": "hello"}}]}}}}, schema)
    with pytest.raises(A.QueryError):  # cross-field
        A.parse_json({"span_containing": {
            "big": {"span_term": {"text": "hello"}},
            "little": {"span_term": {"role": "user"}}}}, schema)
    with pytest.raises(A.QueryError):  # missing little
        A.parse_json({"span_containing": {
            "big": {"span_term": {"text": "hello"}}}}, schema)


# ------------------------------------------------------------ hand truth
def test_containing_hand_spans(hand_index):
    node = A.parse_json({"span_containing": dict(BIG_LITTLE)},
                        hand_index.schema)
    got = _engine_topk(hand_index, node)
    # docids 0 and 2 match, each with ONE containing span (tf = 1)
    assert sorted(d for d, _ in got) == [0, 2]


def test_within_hand_spans(hand_index):
    node = A.parse_json({"span_within": dict(BIG_LITTLE)},
                        hand_index.schema)
    got = _engine_topk(hand_index, node)
    # same docs; tf = 1 little position inside a span in each
    assert sorted(d for d, _ in got) == [0, 2]


def test_containing_vs_within_scoring_side(hand_index):
    """containing scores from BIG (idf over alpha+beta+gamma), within
    from LITTLE (idf over gamma alone) — same match set, different
    scores on the same docs."""
    c = A.parse_json({"span_containing": dict(BIG_LITTLE)},
                     hand_index.schema)
    w = A.parse_json({"span_within": dict(BIG_LITTLE)},
                     hand_index.schema)
    sc = dict(_engine_topk(hand_index, c))
    sw = dict(_engine_topk(hand_index, w))
    assert set(sc) == set(sw)
    for d in sc:
        assert sc[d] > sw[d]  # big idf-sum strictly exceeds little's


# -------------------------------------------------------- degenerations
def test_k1_same_term_degenerates_to_span_term(index):
    schema = index.schema
    plain = A.parse_json({"span_term": {"text": "hello"}}, schema)
    truth = _engine_topk(index, plain)
    for kind in ("span_containing", "span_within"):
        n = A.parse_json({kind: {
            "big": {"span_term": {"text": "hello"}},
            "little": {"span_term": {"text": "hello"}}}}, schema)
        assert _engine_topk(index, n) == truth


# ------------------------------------------------------------ parity
CONTAIN_QUERIES = {
    "containing_or_slot": {"span_containing": {
        "big": {"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_or": {"clauses": [
                {"span_term": {"text": "world"}},
                {"span_term": {"text": "mundo"}}]}}]}},
        "little": {"span_term": {"text": "mundo"}}}},
    "within_or_slot": {"span_within": {
        "big": {"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_or": {"clauses": [
                {"span_term": {"text": "world"}},
                {"span_term": {"text": "mundo"}}]}}]}},
        "little": {"span_term": {"text": "world"}}}},
    "within_single_big": {"span_within": {
        "big": {"span_term": {"text": "stemming"}},
        "little": {"span_or": {"clauses": [
            {"span_term": {"text": "stemmed"}},
            {"span_term": {"text": "stems"}}]}}}},
}


@pytest.mark.parametrize("name", sorted(CONTAIN_QUERIES))
def test_span_contain_parity(index, oracle, name):
    node = A.parse_json(CONTAIN_QUERIES[name], index.schema)
    truth = sorted(oracle.score(node).items(),
                   key=lambda kv: (-round(kv[1], 7), kv[0]))[:10]
    got = _engine_topk(index, node)
    assert [d for d, _ in got] == [d for d, _ in truth]
    for (gd, gs), (td, ts) in zip(got, truth):
        assert gs == pytest.approx(ts, abs=1e-6)


def test_dead_little_matches_nothing(index):
    node = A.parse_json({"span_containing": {
        "big": {"span_term": {"text": "hello"}},
        "little": {"span_term": {"text": "zzzabsentterm"}}}},
        index.schema)
    assert _engine_topk(index, node) == []
