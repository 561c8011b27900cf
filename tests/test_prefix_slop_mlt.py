"""Round-4 query extensions: prefix queries (``foo*``), sloppy phrases
(``"a b"~N``), and more_like_this — all BEYOND-REFERENCE additions, so
there is no tantivy contract to pin; the contract is the one documented
in plans/ast.py (ordered within-window slop; lowercased-unstemmed
prefix; tf·idf seed selection) and it is verified three ways: grammar
unit tests, rank+score parity against the extended pure-Python oracle
on the deterministic transcript corpus, and plan-shape pushdown."""

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
    base = str(tmp_path_factory.mktemp("idx4"))
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
def test_grammar_prefix_and_slop():
    schema = None  # lexer-only assertions need no schema

    toks = A._lex_query('title:qui* "a b"~2 foo\\*')
    assert ("prefix", "qui") in toks
    assert any(t[0] == "phrase" and t[2] == 2 for t in toks)
    # escaped star stays a literal term
    assert ("term", "foo*") in toks
    # bare "*" is not a prefix
    assert ("term", "*") in A._lex_query("*")
    with pytest.raises(A.QueryError):
        A._lex_query('"a b"~x')


def test_parse_prefix_and_slop(index):
    schema = index.schema
    node = A.parse_string("text:qui*", schema)
    assert isinstance(node, A.PrefixQ) and node.prefix == "qui"
    # prefix fragments fold case but are never stemmed
    node = A.parse_string("text:Stems*", schema)
    assert node.prefix == "stems"
    node = A.parse_string('text:"hello world"~3', schema)
    assert isinstance(node, A.PhraseQ) and node.slop == 3
    node = A.parse_json(
        {"phrase": {"text": {"terms": ["hello", "world"], "slop": 2}}},
        schema)
    assert node.slop == 2
    node = A.parse_json({"prefix": {"text": "Wor"}}, schema)
    assert isinstance(node, A.PrefixQ) and node.prefix == "wor"
    with pytest.raises(A.QueryError):
        A.parse_json({"phrase": {"text": {"terms": ["a", "b"], "slop": -1}}},
                     schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"prefix": {"text": ""}}, schema)


# ------------------------------------------------------- oracle parity
PARITY = {
    "prefix_hel": {"prefix": {"text": "hel"}},
    "prefix_rare": {"prefix": {"text": "mun"}},
    "slop1": {"phrase": {"text": {"terms": ["hello", "world"], "slop": 1}}},
    "slop3": {"phrase": {"text": {"terms": ["hello", "world"], "slop": 3}}},
    "slop_in_bool": {"bool": {
        "must": [{"phrase": {"text": {"terms": ["hello", "world"],
                                      "slop": 2}}}],
        "should": [{"term": {"text": "needle"}}]}},
    "slop2_unordered": {"phrase": {"text": {
        "terms": ["hello", "world"], "slop": 2, "in_order": False}}},
    "slop3_unordered": {"phrase": {"text": {
        "terms": ["world", "hello"], "slop": 3, "in_order": False}}},
    "prefix_in_bool": {"bool": {
        "must": [{"term": {"text": "hello"}},
                 {"prefix": {"text": "wor"}}]}},
}


@pytest.mark.parametrize("name", sorted(PARITY))
def test_extension_parity(index, oracle, name):
    node = A.parse_json(PARITY[name], index.schema)
    got = _engine_topk(index, node)
    want = oracle.top_k(node, 10)
    assert [d for d, _ in got] == [d for d, _ in want], name
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_slop_zero_is_exact_phrase(index):
    """slop=0 must reproduce the exact-phrase plan's results
    bit-for-bit (it compiles through the array_intersect branch)."""
    exact = A.parse_json(
        {"phrase": {"text": {"terms": ["hello", "world"]}}}, index.schema)
    slop0 = A.parse_json(
        {"phrase": {"text": {"terms": ["hello", "world"], "slop": 0}}},
        index.schema)
    assert _engine_topk(index, exact) == _engine_topk(index, slop0)


def test_slop_widens_monotonically(index, oracle):
    """Every exact-phrase match is a slop-1 match is a slop-3 match."""
    def matches(slop):
        node = A.PhraseQ("text", ["hello", "world"], slop=slop)
        return set(oracle.score(node))

    m0, m1, m3 = matches(0), matches(1), matches(3)
    assert m0 <= m1 <= m3


def test_slop_respects_order(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path))
    schema = [{"name": "body", "type": "text",
               "options": {"indexing": {"record": "position",
                                        "tokenizer": "en_stem"},
                           "stored": True}}]
    idx = cat.create_index("o", schema)
    idx.add_df(spark.createDataFrame(
        [("alpha beta",), ("beta alpha",), ("alpha gap beta",)],
        "body string"), order_cols=["body"])
    hits = idx.query('"alpha beta"~5', limit=10)
    bodies = sorted(h["doc"]["body"][0] for h in hits)
    assert bodies == ["alpha beta", "alpha gap beta"]  # never "beta alpha"


def test_unordered_slop_lucene_transposition_cost(spark, tmp_path):
    """in_order=False pins the Lucene 2-term rule: a transposition
    costs 2 slop — "beta alpha" matches "alpha beta"~2 unordered but
    NEVER ~1; ordered mode never matches it at any slop."""
    cat = IndexCatalog(spark, str(tmp_path))
    schema = [{"name": "body", "type": "text",
               "options": {"indexing": {"record": "position",
                                        "tokenizer": "en_stem"},
                           "stored": True}}]
    idx = cat.create_index("u", schema)
    idx.add_df(spark.createDataFrame(
        [("alpha beta",), ("beta alpha",), ("beta gap alpha",),
         ("alpha gap beta",)], "body string"), order_cols=["body"])

    def bodies(slop, in_order):
        q = {"phrase": {"body": {"terms": ["alpha", "beta"], "slop": slop,
                                 "in_order": in_order}}}
        res = idx.query_json({"query": q, "limit": 10})
        return sorted(h["doc"]["body"][0] for h in res["docs"])

    assert bodies(1, False) == ["alpha beta", "alpha gap beta"]
    assert bodies(2, False) == ["alpha beta", "alpha gap beta",
                                "beta alpha"]
    # "beta gap alpha": q at p-2 → |q-p-1| = 3
    assert bodies(3, False) == ["alpha beta", "alpha gap beta",
                                "beta alpha", "beta gap alpha"]
    assert bodies(5, True) == ["alpha beta", "alpha gap beta"]
    # slop=0 unordered IS the exact phrase (either mode)
    assert bodies(0, False) == bodies(0, True) == ["alpha beta"]


def test_unordered_slop_pruned_parity(index):
    """top_k_pruned == top_k for unordered slop (the last-term max_tf
    bound covers the unordered surviving set too)."""
    s = index.searcher()
    node = A.parse_json(
        {"phrase": {"text": {"terms": ["world", "hello"], "slop": 2,
                             "in_order": False}}}, index.schema)
    def rows(df):
        return [(int(r["docid_g"]), round(float(r["score"]), 9))
                for r in df.collect()]
    assert rows(s.top_k_pruned(node, limit=10)) == \
        rows(s.top_k(node, limit=10))


# --------------------------------------------------------- plan shapes
def test_prefix_pushdown(index):
    """The prefix predicate reaches the parquet scan as
    StringStartsWith — no termdict expansion join in the plan."""
    s = index.searcher()
    node = A.parse_string("text:hel*", index.schema)
    plan = s.candidates(node)._jdf.queryExecution().toString()
    assert "StringStartsWith(term,hel)" in plan, plan
    assert "Join" not in s.candidates(node)._jdf.queryExecution() \
        .executedPlan().toString()


# ------------------------------------------------------ more_like_this
def test_more_like_this_matches_composed_query(index, oracle):
    """more_like_this(seed) == the oracle's should-OR of the seed's
    top tf·idf terms, with the seed itself removed."""
    from sonar_tantivy_spark.functions import bm25

    seed = 7
    # seed term selection, independently recomputed (min_df=2: df-1
    # terms can only match the seed itself)
    tfs = {t: len(ps[seed]) for (f, t), ps in oracle.postings.items()
           if f == "text" and seed in ps
           and len(oracle.postings[(f, t)]) >= 2}
    ranked = sorted(((tf * oracle.idf("text", t), t)
                     for t, tf in tfs.items()), key=lambda x: (-x[0], x[1]))
    top = [t for _, t in ranked[:5]]
    node = A.BoolQ(should=[A.TermQ("text", t) for t in top])
    want = [(d, s) for d, s in oracle.top_k(node, 11) if d != seed][:10]
    got = index.more_like_this(seed, "text", top_terms=5, limit=10)
    assert [h["docid"] for h in got] == [d for d, _ in want]
    for h, (_, s) in zip(got, want):
        assert h["score"] == pytest.approx(s, abs=1e-9)
    assert all(h["docid"] != seed for h in got)


def test_more_like_this_unknown_doc(index):
    # bound-check consistent with termvectors/delete_docs (r5): an id
    # past the last segment errors instead of silently seeding nothing
    with pytest.raises(KeyError):
        index.more_like_this(10**9, "text")


def test_more_like_this_self_similarity(index):
    """The top hit shares vocabulary with the seed (sanity: scores
    positive, k respected)."""
    got = index.more_like_this(0, "text", limit=5)
    assert 0 < len(got) <= 5
    assert all(h["score"] > 0 for h in got)


# ------------------------------------------------- snippet expansion
def test_snippet_highlights_expansion_matches(spark, tmp_path):
    """Prefix / fuzzy / regex queries highlight the dictionary terms
    they matched (termdict expansion), not nothing."""
    cat = IndexCatalog(spark, str(tmp_path))
    schema = [{"name": "body", "type": "text",
               "options": {"indexing": {"record": "position",
                                        "tokenizer": "en_stem"},
                           "stored": True}}]
    idx = cat.create_index("sn", schema)
    idx.add_df(spark.createDataFrame(
        [("the quick brown fox",), ("a quill pen",)], "body string"),
        order_cols=["body"])
    hits = idx.query("qui*", snippet_field="body", limit=10)
    snips = sorted(h["snippet"] for h in hits)
    assert any("<b>quick</b>" in s for s in snips), snips
    assert any("<b>quill</b>" in s for s in snips), snips
    fuzzy = idx.query_json({"query": {"fuzzy": {"body": {"value": "quick",
                                                         "distance": 1}}},
                            "limit": 10})
    hit = idx.query("quick", snippet_field="body")[0]
    assert "<b>quick</b>" in hit["snippet"]
    # must_not expansion clauses never highlight
    hits = idx.query("fox -quil*", snippet_field="body", limit=10)
    assert all("<b>quill</b>" not in (h["snippet"] or "") for h in hits)
