"""ES ``intervals`` query — a REWRITE layer onto the span machinery
(plans/ast.py _intervals_node): match / any_of / all_of compile to
SpanNearQ, so execution, scoring, WAND bounds and oracle parity are the
span family's.  These tests pin the rewrite itself (shape equivalences
are BIT-identical to the explicit span form) plus the documented
rejections (unlimited max_gaps, multi-clause any_of members,
prefix/wildcard/fuzzy sources)."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)

N_TURNS = 800


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxintervals"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(generate_transcripts(N_TURNS)),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


def _topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), round(float(r["score"]), 7))
            for r in rows]


# -------------------------------------------------------------- rewrite
def test_match_rewrites_to_chain(index):
    n = A.parse_json({"intervals": {"text": {"match": {
        "query": "hello world", "max_gaps": 2, "ordered": True}}}},
        index.schema)
    assert isinstance(n, A.SpanNearQ)
    assert n.clauses == [("hello",), ("world",)]
    assert n.slop == 2 and n.in_order is True
    # single token: no max_gaps needed
    n = A.parse_json({"intervals": {"text": {"match": {
        "query": "hello"}}}}, index.schema)
    assert n.clauses == [("hello",)] and n.slop == 0


def test_any_of_rewrites_to_alternatives(index):
    n = A.parse_json({"intervals": {"text": {"any_of": {"intervals": [
        {"match": {"query": "world"}},
        {"match": {"query": "mundo"}}]}}}}, index.schema)
    assert n.clauses == [("world", "mundo")]


def test_all_of_with_any_of_members(index):
    n = A.parse_json({"intervals": {"text": {"all_of": {
        "intervals": [
            {"match": {"query": "hello"}},
            {"any_of": {"intervals": [
                {"match": {"query": "world"}},
                {"match": {"query": "mundo"}}]}}],
        "max_gaps": 1, "ordered": True}}}}, index.schema)
    assert n.clauses == [("hello",), ("world", "mundo")]
    assert n.slop == 1 and n.in_order is True


# ---------------------------------------------------------- equivalence
def test_intervals_equals_explicit_span_near(index):
    iv = A.parse_json({"intervals": {"text": {"match": {
        "query": "hello world", "max_gaps": 2, "ordered": True}}}},
        index.schema)
    sp = A.parse_json({"span_near": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_term": {"text": "world"}}],
        "slop": 2, "in_order": True}}, index.schema)
    assert _topk(index, iv) == _topk(index, sp)
    assert _topk(index, iv)  # non-empty on the planted corpus


def test_unordered_intervals_match(index):
    iv = A.parse_json({"intervals": {"text": {"match": {
        "query": "world hello", "max_gaps": 1, "ordered": False}}}},
        index.schema)
    sp = A.parse_json({"span_near": {"clauses": [
        {"span_term": {"text": "world"}},
        {"span_term": {"text": "hello"}}],
        "slop": 1, "in_order": False}}, index.schema)
    assert _topk(index, iv) == _topk(index, sp)


# ------------------------------------------------------------ rejection
def test_intervals_rejections(index):
    schema = index.schema
    with pytest.raises(A.QueryError):  # unlimited gaps
        A.parse_json({"intervals": {"text": {"match": {
            "query": "hello world"}}}}, schema)
    with pytest.raises(A.QueryError):  # negative gaps
        A.parse_json({"intervals": {"text": {"match": {
            "query": "hello world", "max_gaps": -1}}}}, schema)
    with pytest.raises(A.QueryError):  # multi-clause any_of member
        A.parse_json({"intervals": {"text": {"any_of": {"intervals": [
            {"match": {"query": "hello world", "max_gaps": 1}}]}}}},
            schema)
    with pytest.raises(A.QueryError):  # unsupported source
        A.parse_json({"intervals": {"text": {"prefix": {
            "prefix": "hel"}}}}, schema)
    with pytest.raises(A.QueryError):  # all_of multi-member needs gaps
        A.parse_json({"intervals": {"text": {"all_of": {"intervals": [
            {"match": {"query": "hello"}},
            {"match": {"query": "world"}}]}}}}, schema)
    with pytest.raises(A.QueryError):  # zero-token match
        A.parse_json({"intervals": {"text": {"match": {
            "query": "   "}}}}, schema)
