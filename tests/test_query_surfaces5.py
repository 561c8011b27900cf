"""Round-5 beyond-reference query surfaces: ES ``terms`` set,
``exists``, ``dis_max``, and ``match_phrase_prefix``.

Semantics pinned:

  * terms: doc matches iff it holds ANY of the verbatim terms;
    constant score 1.0 (ES default ConstantScore rewrite).  Values are
    NOT analyzed (ES rule) — only case-folded on non-raw fields.
  * exists: any indexed token in the field (indexed fields) / any
    non-null stored value (stored-only fields); constant score 1.0.
  * dis_max: union of clause matches, score = max + tie * (sum - max).
  * match_phrase_prefix: exact adjacency chain + final slot matched by
    any dictionary term with the prefix; constant score 1.0
    (expansion-query rule shared with prefix/fuzzy/regex).

Covered paths: JSON parse shapes (incl. errors), small-corpus semantic
truths, pruned-vs-plain parity against the pure-Python OracleIndex on
the 900-turn transcript corpus (exercises the WAND bounds for the new
nodes), and the absence-proof behavior of TermSetQ/PhrasePrefixQ."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N_TURNS = 900


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def oracle(corpus):
    docs = corpus.to_dict("records")
    return OracleIndex(docs, {"text": "en_stem", "role": "raw", "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("qs5"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


# ------------------------------------------------------------- JSON shapes
def test_parse_json_shapes(index):
    n = A.parse_json({"terms": {"text": ["Hello", "NEEDLE"]}}, index.schema)
    assert isinstance(n, A.TermSetQ)
    assert n.terms == ["hello", "needle"]  # case-folded, NOT stemmed
    n = A.parse_json({"terms": {"role": ["User"]}}, index.schema)
    assert n.terms == ["User"]  # raw field: verbatim
    n = A.parse_json({"exists": {"field": "tool"}}, index.schema)
    assert isinstance(n, A.ExistsQ) and n.field == "tool"
    n = A.parse_json(
        {"dis_max": {"queries": [{"term": {"text": "hello"}},
                                 {"term": {"text": "world"}}],
                     "tie_breaker": 0.3}}, index.schema)
    assert isinstance(n, A.DisMaxQ) and n.tie_breaker == 0.3
    n = A.parse_json({"match_phrase_prefix": {"text": "hello wor"}},
                     index.schema)
    assert isinstance(n, A.PhrasePrefixQ)
    assert n.terms == ["hello"] and n.prefix == "wor"
    # single token degenerates to a plain prefix query
    n = A.parse_json({"match_phrase_prefix": {"text": "wor"}}, index.schema)
    assert isinstance(n, A.PrefixQ) and n.prefix == "wor"


def test_parse_json_errors(index):
    with pytest.raises(A.QueryError):
        A.parse_json({"terms": {"text": []}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"exists": {"field": "nope"}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"dis_max": {"queries": []}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"dis_max": {"queries": [{"term": {"text": "a"}}],
                                  "tie_breaker": 1.5}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"match_phrase_prefix": {"text": "   "}}, index.schema)


# ------------------------------------------------------- small-corpus truth
@pytest.fixture(scope="module")
def small(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("qs5s")))
    schema = [
        {"name": "body", "type": "text",
         "options": {"indexing": {"record": "position",
                                  "tokenizer": "en_stem"},
                     "stored": True}},
        {"name": "tool", "type": "text",
         "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                     "stored": True}},
    ]
    idx = cat.create_index("s", schema)
    rows = [
        ("alpha beta gamma", "bash"),
        ("alpha delta", None),
        ("beta gamma delta", "python"),
        ("epsilon zeta", None),
        ("alpha beta gamble", None),
    ]
    idx.add_df(spark.createDataFrame(rows, "body string, tool string"),
               order_cols=["body"])
    return idx


def _bodies(idx, q, k=10):
    res = idx.query_json({"query": q, "limit": k})
    return sorted(h["doc"]["body"][0] for h in res["docs"])


def test_terms_set_semantics(small):
    assert _bodies(small, {"terms": {"body": ["epsilon", "delta"]}}) == [
        "alpha delta", "beta gamma delta", "epsilon zeta"]
    # all-zero-df set short-circuits to empty (no scan)
    assert _bodies(small, {"terms": {"body": ["nope1", "nope2"]}}) == []
    # constant score 1.0
    res = small.query_json(
        {"query": {"terms": {"body": ["alpha"]}}, "limit": 10})
    assert all(h["score"] == 1.0 for h in res["docs"])


def test_exists_semantics(small):
    got = _bodies(small, {"exists": {"field": "tool"}})
    assert got == ["alpha beta gamma", "beta gamma delta"]


def test_dismax_semantics(small):
    """Score = max + tie*(sum-max), verified against the two term
    scores; tie=0 is pure best-field."""
    qa = {h["doc"]["body"][0]: h["score"] for h in small.query_json(
        {"query": {"term": {"body": "alpha"}}, "limit": 10})["docs"]}
    qb = {h["doc"]["body"][0]: h["score"] for h in small.query_json(
        {"query": {"term": {"body": "beta"}}, "limit": 10})["docs"]}
    for tie in (0.0, 0.4):
        got = {h["doc"]["body"][0]: h["score"] for h in small.query_json(
            {"query": {"dis_max": {
                "queries": [{"term": {"body": "alpha"}},
                            {"term": {"body": "beta"}}],
                "tie_breaker": tie}}, "limit": 10})["docs"]}
        assert set(got) == set(qa) | set(qb)
        for b, s in got.items():
            vals = [v for v in (qa.get(b), qb.get(b)) if v is not None]
            want = max(vals) + tie * (sum(vals) - max(vals))
            assert s == pytest.approx(want, rel=1e-9)


def test_phrase_prefix_semantics(small):
    # "alpha be*" matches both "alpha beta ..." docs (beta) and the
    # gamble doc?  no — 'be' must be ADJACENT to alpha: beta qualifies
    # in docs 0 and 4; doc 2 has beta but not after alpha
    got = _bodies(small, {"match_phrase_prefix": {"body": "alpha bet"}})
    assert got == ["alpha beta gamble", "alpha beta gamma"]
    # expansion across DIFFERENT dictionary terms: 'ga' matches gamma
    # AND gamble in the final slot (all three beta-adjacent docs)
    got = _bodies(small, {"match_phrase_prefix": {"body": "beta ga"}})
    assert got == ["alpha beta gamble", "alpha beta gamma",
                   "beta gamma delta"]
    # chain term present but never adjacent to a prefix match
    assert _bodies(small, {"match_phrase_prefix": {"body": "delta ga"}}) == []
    # zero-df chain term short-circuits
    assert _bodies(small, {"match_phrase_prefix": {"body": "nope ga"}}) == []
    res = small.query_json(
        {"query": {"match_phrase_prefix": {"body": "alpha bet"}},
         "limit": 10})
    assert all(h["score"] == 1.0 for h in res["docs"])


def test_phrase_prefix_snippet_highlights_expansion(small):
    """Snippet plumbing: the chain terms come from
    collect_positive_terms, the prefix slot's dictionary expansions
    from expand_snippet_terms (same best-effort route as PrefixQ)."""
    from sonar_tantivy_spark.operators.snippet import (
        collect_positive_terms,
        generate_snippet,
    )
    node = A.parse_json({"match_phrase_prefix": {"body": "beta ga"}},
                        small.schema)
    lits = collect_positive_terms(node).get("body", set())
    assert lits == {"beta"}
    s = small.searcher()
    exp = s.expand_snippet_terms(node, "body")
    assert {"gamma", "gambl"} <= exp  # en_stem: gamble -> gambl
    snip = generate_snippet("alpha beta gamble", lits | exp, "en_stem")
    assert "<b>beta</b> <b>gamble</b>" in snip


# ------------------------------------------------ oracle parity (pruned too)
PARITY = [
    # verbatim members: stemmed dictionary forms match, raw
    # "needle" (df 0 — the dictionary holds "needl") is dead weight
    {"terms": {"text": ["hello", "needl", "trendalpha", "needle"]}},
    {"terms": {"role": ["tool", "system"]}},
    {"exists": {"field": "tool"}},
    {"dis_max": {"queries": [{"term": {"text": "hello"}},
                             {"term": {"text": "world"}},
                             {"term": {"text": "needle"}}],
                 "tie_breaker": 0.0}},
    {"dis_max": {"queries": [{"term": {"text": "hello"}},
                             {"phrase": {"text": ["hello", "world"]}}],
                 "tie_breaker": 0.5}},
    {"match_phrase_prefix": {"text": "hello wor"}},
    # dis_max nested inside a bool must with a filter
    {"bool": {"must": [{"dis_max": {
        "queries": [{"term": {"text": "hello"}},
                    {"term": {"text": "needle"}}],
        "tie_breaker": 0.2}}],
        "filter": [{"term": {"role": "tool"}}]}},
]


@pytest.mark.parametrize("i", range(len(PARITY)))
def test_oracle_parity_and_pruned(index, oracle, i):
    node = A.parse_json(PARITY[i], index.schema)
    s = index.searcher()
    want = oracle.top_k(node, 10)
    for df in (s.top_k(node, limit=10), s.top_k_pruned(node, limit=10)):
        got = [(int(r["docid_g"]), float(r["score"])) for r in df.collect()]
        assert [d for d, _ in got] == [d for d, _ in want], i
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-12)


def test_plan_shapes(index):
    """The 100x-safe shapes, plan-asserted: terms set is ONE scan with
    the In predicate pushed (no termdict join); match_phrase_prefix is
    ONE postings scan (exact terms + prefix expansion share it, no
    join); dis_max of terms is clause-union -> ONE aggregation
    exchange, no join."""
    s = index.searcher()

    def plan(node):
        return (s.candidates(node)._jdf.queryExecution()
                .executedPlan().toString())
    p = plan(A.TermSetQ("text", ["hello", "needl"]))
    assert "Join" not in p and p.count("Scan parquet") == 1
    assert "In(term" in p  # pushed into the postings scan
    p = plan(A.parse_json({"match_phrase_prefix": {"text": "hello wor"}},
                          index.schema))
    assert "Join" not in p and p.count("Scan parquet") == 1
    p = plan(A.parse_json(
        {"dis_max": {"queries": [{"term": {"text": "hello"}},
                                 {"term": {"text": "world"}}],
                     "tie_breaker": 0.3}}, index.schema))
    assert "Join" not in p and p.count("Exchange") == 1


def test_termset_absence_proof(index, oracle):
    """A terms set whose members are all absent from a segment bounds
    that segment at 0.0 — and an all-absent set matches nothing without
    reading postings (None short-circuit)."""
    node = A.TermSetQ("text", ["zzznope1", "zzznope2"])
    s = index.searcher()
    assert s.top_k(node, limit=10).collect() == []
    # mixed set still finds the live term's docs
    node = A.TermSetQ("text", ["zzznope1", "needl"])
    got = {int(r["docid_g"]) for r in s.top_k(node, limit=100).collect()}
    want = set(oracle.score(A.TermQ("text", "needl")))
    assert got == want
