"""Span queries (span_term / span_or / span_near / span_first) —
BEYOND-REFERENCE (toshi's DSL exposes no spans; semantics follow
Lucene's span family with the engine's documented per-adjacent-pair
window pin, plans/ast.py SpanNearQ).  Verified by: JSON-DSL grammar
unit tests, rank+score parity against the pure-Python oracle replica
on the deterministic transcript corpus, and degeneration identities
(span_term == term scores; slop-0 single-term clauses == exact
phrase)."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N_TURNS = 1200


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def oracle(corpus):
    docs = corpus.to_dict("records")
    return OracleIndex(docs, {"text": "en_stem", "role": "raw", "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxspan"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=4)
    return idx


def _engine_topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


# -------------------------------------------------------------- grammar
def test_parse_span_shapes(index):
    schema = index.schema
    n = A.parse_json({"span_term": {"text": "hello"}}, schema)
    assert isinstance(n, A.SpanNearQ) and n.clauses == [("hello",)]
    n = A.parse_json({"span_or": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_term": {"text": "needle"}}]}}, schema)
    assert n.clauses == [("hello", "needl")]  # Porter2-stemmed
    n = A.parse_json({"span_near": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_or": {"clauses": [{"span_term": {"text": "world"}},
                                 {"span_term": {"text": "needle"}}]}}],
        "slop": 2, "in_order": False}}, schema)
    assert n.clauses == [("hello",), ("world", "needl")]
    assert n.slop == 2 and n.in_order is False
    n = A.parse_json({"span_first": {
        "match": {"span_term": {"text": "hello"}}, "end": 3}}, schema)
    assert isinstance(n, A.SpanFirstQ) and n.end == 3
    # span_term values are ANALYZED (stemming included), like the
    # engine's term/phrase inputs
    n = A.parse_json({"span_term": {"text": "Stems"}}, schema)
    assert n.clauses == [("stem",)]


def test_parse_span_errors(index):
    schema = index.schema
    with pytest.raises(A.QueryError):  # nested span_near
        A.parse_json({"span_near": {"clauses": [
            {"span_near": {"clauses": [{"span_term": {"text": "a"}}]}},
            {"span_term": {"text": "b"}}]}}, schema)
    with pytest.raises(A.QueryError):  # mixed fields
        A.parse_json({"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_term": {"role": "user"}}]}}, schema)
    with pytest.raises(A.QueryError):  # multi-token span_term value
        A.parse_json({"span_term": {"text": "hello world"}}, schema)
    with pytest.raises(A.QueryError):  # span_first needs end >= 1
        A.parse_json({"span_first": {
            "match": {"span_term": {"text": "hello"}}, "end": 0}}, schema)
    with pytest.raises(A.QueryError):  # negative slop
        A.parse_json({"span_near": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
            "slop": -1}}, schema)
    with pytest.raises(A.QueryError):  # empty clause list
        A.parse_json({"span_or": {"clauses": []}}, schema)


# ------------------------------------------------------- degenerations
def test_span_term_equals_term_query(index):
    """A lone span_term scores tf = positions count = the term's tf —
    bit-identical to the plain term query."""
    span = A.parse_json({"span_term": {"text": "hello"}}, index.schema)
    term = A.parse_json({"term": {"text": "hello"}}, index.schema)
    assert _engine_topk(index, span) == _engine_topk(index, term)


def test_span_near_slop0_equals_exact_phrase(index):
    span = A.parse_json({"span_near": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_term": {"text": "world"}}], "slop": 0}}, index.schema)
    phrase = A.parse_json(
        {"phrase": {"text": {"terms": ["hello", "world"]}}}, index.schema)
    assert _engine_topk(index, span) == _engine_topk(index, phrase)


def test_span_first_monotone_in_end(index):
    """Growing ``end`` only ADDS matches; end >= max dl is the plain
    span."""
    def docs(end):
        node = A.parse_json({"span_first": {
            "match": {"span_term": {"text": "hello"}}, "end": end}},
            index.schema)
        return {d for d, _ in _engine_topk(index, node, k=500)}

    d3, d10, d_all = docs(3), docs(10), docs(100000)
    assert d3 <= d10 <= d_all
    span = A.parse_json({"span_term": {"text": "hello"}}, index.schema)
    assert d_all == {d for d, _ in _engine_topk(index, span, k=500)}


# ------------------------------------------------------- oracle parity
PARITY = {
    "span_or": {"span_or": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_term": {"text": "needle"}}]}},
    "span_near_ordered": {"span_near": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_term": {"text": "world"}}], "slop": 2}},
    "span_near_unordered": {"span_near": {"clauses": [
        {"span_term": {"text": "world"}},
        {"span_term": {"text": "hello"}}],
        "slop": 2, "in_order": False}},
    "span_near_with_or": {"span_near": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_or": {"clauses": [{"span_term": {"text": "world"}},
                                 {"span_term": {"text": "needle"}}]}}],
        "slop": 3}},
    "span_first": {"span_first": {
        "match": {"span_term": {"text": "hello"}}, "end": 4}},
    "span_first_near": {"span_first": {
        "match": {"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_term": {"text": "world"}}], "slop": 1}}, "end": 6}},
    "span_in_bool": {"bool": {
        "must": [{"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_term": {"text": "world"}}], "slop": 2}}],
        "should": [{"term": {"text": "needle"}}]}},
    "span_dead_alternative": {"span_near": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_or": {"clauses": [
            {"span_term": {"text": "world"}},
            {"span_term": {"text": "zzznosuchterm"}}]}}], "slop": 1}},
}


@pytest.mark.parametrize("name", sorted(PARITY))
def test_span_parity(index, oracle, name):
    node = A.parse_json(PARITY[name], index.schema)
    got = _engine_topk(index, node)
    want = oracle.top_k(node, 10)
    assert [d for d, _ in got] == [d for d, _ in want], name
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_span_all_dead_clause_matches_nothing(index):
    node = A.parse_json({"span_near": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_term": {"text": "zzznosuchterm"}}]}}, index.schema)
    assert _engine_topk(index, node) == []


def test_span_count_and_explain(index):
    """Spans ride the whole collector surface: count + explain."""
    q = {"span_near": {"clauses": [
        {"span_term": {"text": "hello"}},
        {"span_term": {"text": "world"}}], "slop": 2}}
    n = index.count(q)
    assert n == len(_engine_topk(index, A.parse_json(q, index.schema),
                                 k=100000))
    ex = index.explain(q)
    assert ex["segments_total"] >= 1


# --------------------------------------------------------------- span_not
def test_parse_span_not(index):
    schema = index.schema
    n = A.parse_json({"span_not": {
        "include": {"span_term": {"text": "hello"}},
        "exclude": {"span_or": {"clauses": [
            {"span_term": {"text": "world"}},
            {"span_term": {"text": "needle"}}]}},
        "pre": 1, "post": 2}}, schema)
    assert isinstance(n, A.SpanNotQ)
    assert n.include == ("hello",) and n.exclude == ("world", "needl")
    assert n.pre == 1 and n.post == 2
    # dist sets both windows symmetrically (the ES parameter)
    n = A.parse_json({"span_not": {
        "include": {"span_term": {"text": "hello"}},
        "exclude": {"span_term": {"text": "world"}},
        "dist": 3}}, schema)
    assert n.pre == 3 and n.post == 3
    with pytest.raises(A.QueryError):  # chain include rejected
        A.parse_json({"span_not": {
            "include": {"span_near": {"clauses": [
                {"span_term": {"text": "a"}},
                {"span_term": {"text": "b"}}]}},
            "exclude": {"span_term": {"text": "c"}}}}, schema)
    with pytest.raises(A.QueryError):  # mixed fields
        A.parse_json({"span_not": {
            "include": {"span_term": {"text": "hello"}},
            "exclude": {"span_term": {"role": "user"}}}}, schema)
    with pytest.raises(A.QueryError):  # negative window
        A.parse_json({"span_not": {
            "include": {"span_term": {"text": "hello"}},
            "exclude": {"span_term": {"text": "world"}},
            "pre": -1}}, schema)


SPAN_NOT_PARITY = {
    "span_not_basic": {"span_not": {
        "include": {"span_term": {"text": "hello"}},
        "exclude": {"span_term": {"text": "world"}}}},
    "span_not_window": {"span_not": {
        "include": {"span_term": {"text": "hello"}},
        "exclude": {"span_or": {"clauses": [
            {"span_term": {"text": "world"}},
            {"span_term": {"text": "needle"}}]}},
        "pre": 2, "post": 3}},
    "span_not_dist": {"span_not": {
        "include": {"span_or": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_term": {"text": "mundo"}}]}},
        "exclude": {"span_term": {"text": "the"}}, "dist": 1}},
}


@pytest.mark.parametrize("name", sorted(SPAN_NOT_PARITY))
def test_span_not_parity(index, oracle, name):
    node = A.parse_json(SPAN_NOT_PARITY[name], index.schema)
    got = _engine_topk(index, node)
    want = oracle.top_k(node, 10)
    assert [d for d, _ in got] == [d for d, _ in want], name
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)
    assert got, name  # non-trivial on this corpus


def test_span_not_dead_exclude_is_plain_span(index):
    """A zero-df exclude degenerates to the include span — same scores
    as the bare span_term (the single-scan path, no second job)."""
    node = A.parse_json({"span_not": {
        "include": {"span_term": {"text": "hello"}},
        "exclude": {"span_term": {"text": "zzznosuchterm"}}}}, index.schema)
    bare = A.parse_json({"span_term": {"text": "hello"}}, index.schema)
    assert _engine_topk(index, node) == _engine_topk(index, bare)


def test_span_not_dead_include_matches_nothing(index):
    node = A.parse_json({"span_not": {
        "include": {"span_term": {"text": "zzznosuchterm"}},
        "exclude": {"span_term": {"text": "hello"}}}}, index.schema)
    assert _engine_topk(index, node) == []


# -------------------------------------------------------- match_bool_prefix
def test_match_bool_prefix_rewrite(index):
    schema = index.schema
    n = A.parse_json({"match_bool_prefix": {"text": "hello wor"}}, schema)
    assert isinstance(n, A.BoolQ) and len(n.should) == 2
    assert isinstance(n.should[0], A.TermQ) and n.should[0].term == "hello"
    assert isinstance(n.should[1], A.PrefixQ) and n.should[1].prefix == "wor"
    # single token degenerates to the bare prefix (the ES rule)
    n = A.parse_json({"match_bool_prefix": {"text": "wor"}}, schema)
    assert isinstance(n, A.PrefixQ)
    # dict spec form
    n = A.parse_json({"match_bool_prefix": {"text": {"query": "a b"}}},
                     schema)
    assert isinstance(n, A.BoolQ)


def test_match_bool_prefix_parity(index, oracle):
    node = A.parse_json({"match_bool_prefix": {"text": "hello wor"}},
                        index.schema)
    got = _engine_topk(index, node)
    want = oracle.top_k(node, 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert got


# ------------------------------------------------- regex prefix pushdown
def test_regex_literal_prefix_extraction():
    from sonar_tantivy_spark.operators.search import regex_literal_prefix

    assert regex_literal_prefix("he.*o") == "he"
    assert regex_literal_prefix("h.llo") == "h"
    assert regex_literal_prefix("hello") == "hello"
    assert regex_literal_prefix(".*x") == ""
    assert regex_literal_prefix("ab?c") == "a"      # 'b' may vanish
    assert regex_literal_prefix("ab*c") == "a"      # 'b' may repeat
    assert regex_literal_prefix("ab+c") == "a"      # 'b' guaranteed? no: stop conservative
    assert regex_literal_prefix("a{2}b") == ""      # 'a' quantified
    assert regex_literal_prefix(r"a\.b") == "a.b"   # escaped literal dot
    assert regex_literal_prefix(r"a\db") == "a"     # \d is a class
    assert regex_literal_prefix("(ab)c") == ""
    assert regex_literal_prefix("[ab]c") == ""
    assert regex_literal_prefix("wor") == "wor"


def test_regex_prefix_pushdown_results_unchanged(index, oracle):
    """The StartsWith prefilter must be pure pruning: engine results
    stay rank- and score-identical to the pure-Python oracle for
    patterns with a literal head, an empty head (no prefilter), and a
    dead head."""
    for pat in ["he.*o", "h.llo", "w.*d", ".*orld", "zz.*q"]:
        node = A.parse_json({"regex": {"text": pat}}, index.schema)
        got = _engine_topk(index, node, k=100)
        want = oracle.top_k(node, 100)
        assert [d for d, _ in got] == [d for d, _ in want], pat
        assert all(sc == 1.0 for _, sc in got)


def test_fuzzy_prefix_length(index, oracle):
    """ES fuzzy prefix_length: candidates share the query's first P
    chars verbatim; P=0 is today's behavior, P large enough excludes
    edits in the head ('hello' vs query 'jello' dies at P>=1)."""
    base = A.parse_json({"fuzzy": {"text": {"value": "helo",
                                            "distance": 1}}}, index.schema)
    p1 = A.parse_json({"fuzzy": {"text": {"value": "helo", "distance": 1,
                                          "prefix_length": 1}}}, index.schema)
    assert p1.prefix_length == 1
    got_b = {d for d, _ in _engine_topk(index, base, k=500)}
    got_1 = {d for d, _ in _engine_topk(index, p1, k=500)}
    assert got_1 <= got_b
    for node in (base, p1):
        got = {d for d, _ in _engine_topk(index, node, k=500)}
        assert got == set(oracle.score(node)), node.prefix_length
    # a head-edit candidate dies under prefix_length: query 'jello'
    # matches 'hello' at distance 1 only while P == 0
    j0 = A.parse_json({"fuzzy": {"text": {"value": "jello",
                                          "distance": 1}}}, index.schema)
    j1 = A.parse_json({"fuzzy": {"text": {"value": "jello", "distance": 1,
                                          "prefix_length": 1}}}, index.schema)
    assert {d for d, _ in _engine_topk(index, j0, k=500)}
    assert _engine_topk(index, j1, k=500) == []
    with pytest.raises(A.QueryError):
        A.parse_json({"fuzzy": {"text": {"value": "helo",
                                         "prefix_length": -1}}}, index.schema)


# ------------------------------------------------------ more_like_this node
def test_mlt_node_equals_method(index):
    """The more_like_this QUERY NODE resolves to the same hits as the
    Index.more_like_this method (same seed ranking, same BM25 path,
    seed excluded per ES include=false)."""
    seed = 7
    via_method = [(h["docid"], round(h["score"], 6))
                  for h in index.more_like_this(seed, "text")]
    res = index.query_json({"query": {"more_like_this": {
        "fields": ["text"], "like": [{"_id": seed}],
        "max_query_terms": 5, "min_doc_freq": 2}}, "limit": 10})
    via_node = [(h["docid"], round(h["score"], 6)) for h in res["docs"]]
    assert via_node == via_method and via_node
    assert all(d != seed for d, _ in via_node)


def test_mlt_node_composes_in_bool(index):
    """MLT inside a bool filter — the reason it's a node: restrict
    similar docs to user turns only."""
    seed = 7
    res = index.query_json({"query": {"bool": {
        "must": [{"more_like_this": {"fields": ["text"],
                                     "like": [{"_id": seed}]}}],
        "filter": [{"term": {"role": "user"}}]}}, "limit": 50})
    plain = index.query_json({"query": {"more_like_this": {
        "fields": ["text"], "like": [{"_id": seed}]}}, "limit": 1000})
    filtered = {h["docid"] for h in res["docs"]}
    allhits = {h["docid"] for h in plain["docs"]}
    assert filtered <= allhits
    assert all(h["doc"]["role"] == ["user"] for h in res["docs"])


def test_mlt_node_errors(index):
    with pytest.raises(A.QueryError):  # two likes
        index.query_json({"query": {"more_like_this": {
            "fields": ["text"], "like": [{"_id": 1}, {"_id": 2}]}}})
    with pytest.raises(A.QueryError):  # two fields
        index.query_json({"query": {"more_like_this": {
            "fields": ["text", "role"], "like": [{"_id": 1}]}}})
    with pytest.raises(A.QueryError):  # non-indexed field
        index.query_json({"query": {"more_like_this": {
            "fields": ["conv_id"], "like": [{"_id": 1}]}}})
    with pytest.raises(KeyError):  # out-of-range seed docid
        index.query_json({"query": {"more_like_this": {
            "fields": ["text"], "like": [{"_id": 10**9}]}}})


# ------------------------------------------------------------- span_multi
def test_span_multi_parse_shapes(index):
    schema = index.schema
    n = A.parse_json({"span_multi": {"match": {
        "prefix": {"text": "hel"}}}}, schema)
    assert isinstance(n, A.SpanNearQ)
    assert n.clauses == [A.SpanExpand("prefix", "hel")]
    # wildcard with a trailing star is the prefix marker; no metas at
    # all degenerates to a verbatim term tuple
    n = A.parse_json({"span_multi": {"match": {
        "wildcard": {"text": "hel*"}}}}, schema)
    assert n.clauses == [A.SpanExpand("prefix", "hel")]
    n = A.parse_json({"span_multi": {"match": {
        "wildcard": {"text": "hello"}}}}, schema)
    assert n.clauses == [("hello",)]
    n = A.parse_json({"span_multi": {"match": {
        "regexp": {"text": "hel+o"}}}}, schema)
    assert n.clauses == [A.SpanExpand("regex", "hel+o")]
    with pytest.raises(A.QueryError):  # fuzzy pinned out
        A.parse_json({"span_multi": {"match": {
            "fuzzy": {"text": "helo"}}}}, schema)
    with pytest.raises(A.QueryError):  # not inside span_or
        A.parse_json({"span_or": {"clauses": [
            {"span_multi": {"match": {"prefix": {"text": "hel"}}}}]}},
            schema)


def test_span_multi_near_equals_expanded_span_or(index):
    """span_near [span_multi(prefix hel), world] is bit-identical to
    the explicitly spelled span_or of the expanded dictionary terms."""
    marker = A.SpanExpand("prefix", "hel")
    terms = index._span_expand_terms("text", marker)
    assert "hello" in terms and len(terms) >= 1
    # standalone: bit-identical to the expanded span_or, and non-empty
    alone = index.query_json({"query": {"span_multi": {"match": {
        "prefix": {"text": "hel"}}}}, "limit": 10})
    alone_exp = index.query_json({"query": {"span_or": {"clauses": [
        {"span_term": {"text": t}} for t in terms]}}, "limit": 10})
    got = [(h["docid"], h["score"]) for h in alone["docs"]]
    assert got == [(h["docid"], h["score"]) for h in alone_exp["docs"]]
    assert got  # 'hello' is a planted marker: matches exist
    # inside a chain: still bit-identical to the spelled-out span_or
    via_multi = index.query_json({"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": "hel"}}}},
        {"span_term": {"text": "world"}}], "slop": 1}}, "limit": 10})
    explicit = index.query_json({"query": {"span_near": {"clauses": [
        {"span_or": {"clauses": [{"span_term": {"text": t}}
                                 for t in terms]}},
        {"span_term": {"text": "world"}}], "slop": 1}}, "limit": 10})
    assert [(h["docid"], h["score"]) for h in via_multi["docs"]] == \
        [(h["docid"], h["score"]) for h in explicit["docs"]]


def test_span_multi_empty_and_overcap(index):
    # empty expansion -> the whole span matches nothing
    assert index.query_json({"query": {"span_multi": {"match": {
        "prefix": {"text": "zzzznope"}}}}, "limit": 5})["docs"] == []
    # the 50k-word vocab all starts with 'w': expansion must REFUSE,
    # not silently truncate (the Lucene TooManyClauses contract)
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"span_multi": {"match": {
            "prefix": {"text": "w"}}}}, "limit": 5})
