"""Round-5 (late) query surfaces: ES ``wildcard``, ``constant_score``,
``match``, pagination (``offset``/``from``), and search aggregations
(``aggs``: terms / histogram / date_histogram / stats / percentiles /
cardinality).

Semantics pinned:

  * wildcard: ``?`` = one char, ``*`` = any run; pattern case-folded,
    never stemmed (Lucene wildcard rule).  Rewrites to the cheapest
    existing node — no-wildcard pattern → verbatim constant-score
    TermSetQ, ``lit*`` → PrefixQ (StartsWith postings pushdown),
    anything else → RegexQ with literal runs escaped.  Constant score
    1.0 (Lucene's constant-score multi-term rewrite).
  * constant_score: match set = the wrapped filter's, every hit scored
    ``boost`` — scores REPLACED, not multiplied (that's BoostQ).
  * match: analyzed text → bool of terms; operator=or (default, shoulds
    + minimum_should_match) or and (musts).  Single analyzed token
    degenerates to a plain TermQ.
  * offset: ES from/size — depth-(offset+limit) top-k, sliced; page
    boundaries are deterministic via the global-docid tie-break.
  * aggs: ES request/response shapes over the FULL match set; docs with
    a null agg field drop out (ES missing-value rule); terms buckets
    order by (doc_count desc, key asc); percentiles default EXACT
    interpolated (approx opt-in), cardinality defaults to the HLL
    sketch (exact opt-in).
"""

import numpy as np
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
    base = str(tmp_path_factory.mktemp("qs6"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


# ------------------------------------------------------------- JSON shapes
def test_wildcard_parse_rewrites(index):
    # no wildcard chars -> verbatim constant-score single-term set
    n = A.parse_json({"wildcard": {"text": "Hello"}}, index.schema)
    assert isinstance(n, A.TermSetQ) and n.terms == ["hello"]
    # pure trailing-star -> prefix pushdown
    n = A.parse_json({"wildcard": {"text": "hel*"}}, index.schema)
    assert isinstance(n, A.PrefixQ) and n.prefix == "hel"
    # general -> term-dictionary regex with literal runs escaped
    n = A.parse_json({"wildcard": {"text": "h?l*o"}}, index.schema)
    assert isinstance(n, A.RegexQ) and n.pattern == "h.l.*o"
    n = A.parse_json({"wildcard": {"text": {"value": "a.b?"}}}, index.schema)
    assert isinstance(n, A.RegexQ) and n.pattern == "a\\.b."
    # raw fields: verbatim case
    n = A.parse_json({"wildcard": {"role": "Us*"}}, index.schema)
    assert isinstance(n, A.PrefixQ) and n.prefix == "Us"


def test_constant_score_and_match_parse(index):
    n = A.parse_json({"constant_score": {
        "filter": {"term": {"text": "hello"}}, "boost": 1.7}}, index.schema)
    assert isinstance(n, A.ConstScoreQ) and n.boost == 1.7
    assert isinstance(n.child, A.TermQ)
    n = A.parse_json({"match": {"text": "hello"}}, index.schema)
    assert isinstance(n, A.TermQ)  # single token degenerates
    n = A.parse_json({"match": {"text": "hello world"}}, index.schema)
    assert isinstance(n, A.BoolQ) and len(n.should) == 2 and not n.must
    n = A.parse_json({"match": {"text": {
        "query": "hello world", "operator": "and"}}}, index.schema)
    assert isinstance(n, A.BoolQ) and len(n.must) == 2 and not n.should
    n = A.parse_json({"match": {"text": {
        "query": "hello world the", "minimum_should_match": 2}}},
        index.schema)
    assert isinstance(n, A.BoolQ) and n.min_should == 2


def test_parse_errors(index):
    with pytest.raises(A.QueryError):
        A.parse_json({"wildcard": {"text": ""}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"wildcard": {"nope": "a*"}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"constant_score": {"boost": 2.0}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"match": {"text": {
            "query": "a", "operator": "xor"}}}, index.schema)
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "offset": -1})


# ------------------------------------------------------- small-corpus truth
@pytest.fixture(scope="module")
def small(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("qs6s")))
    schema = [
        {"name": "body", "type": "text",
         "options": {"indexing": {"record": "position",
                                  "tokenizer": "en_stem"},
                     "stored": True}},
        {"name": "tool", "type": "text",
         "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                     "stored": True}},
        {"name": "n", "type": "i64", "options": {"stored": True,
                                                 "fast": True}},
    ]
    idx = cat.create_index("s", schema)
    rows = [
        ("alpha beta gamma", "bash", 5),
        ("alpha delta", None, 15),
        ("beta gamma delta", "python", 25),
        ("epsilon zeta", None, 35),
        ("alpha beta gamble", "bash", 45),
    ]
    idx.add_df(spark.createDataFrame(rows, "body string, tool string, n long"),
               order_cols=["body"])
    return idx


def _bodies(idx, q, k=10):
    res = idx.query_json({"query": q, "limit": k})
    return sorted(h["doc"]["body"][0] for h in res["docs"])


def test_wildcard_semantics(small):
    assert _bodies(small, {"wildcard": {"body": "ga*"}}) == [
        "alpha beta gamble", "alpha beta gamma", "beta gamma delta"]
    assert _bodies(small, {"wildcard": {"body": "?lpha"}}) == [
        "alpha beta gamble", "alpha beta gamma", "alpha delta"]
    # ? is exactly ONE char: g?mma misses 'gamma'? no — matches; gm?a none
    assert _bodies(small, {"wildcard": {"body": "g?mma"}}) == [
        "alpha beta gamma", "beta gamma delta"]
    assert _bodies(small, {"wildcard": {"body": "gm?a"}}) == []
    # no-wildcard pattern: verbatim dictionary term, constant score
    res = small.query_json(
        {"query": {"wildcard": {"body": "delta"}}, "limit": 10})
    assert sorted(h["doc"]["body"][0] for h in res["docs"]) == [
        "alpha delta", "beta gamma delta"]
    assert all(h["score"] == 1.0 for h in res["docs"])


def test_constant_score_semantics(small):
    res = small.query_json({"query": {"constant_score": {
        "filter": {"term": {"body": "alpha"}}, "boost": 1.7}}, "limit": 10})
    assert sorted(h["doc"]["body"][0] for h in res["docs"]) == [
        "alpha beta gamble", "alpha beta gamma", "alpha delta"]
    assert all(h["score"] == pytest.approx(1.7) for h in res["docs"])
    # wrapping a SCORED bool replaces, never multiplies
    res = small.query_json({"query": {"constant_score": {
        "filter": {"bool": {"should": [{"term": {"body": "alpha"}},
                                       {"term": {"body": "beta"}}]}},
        "boost": 0.25}}, "limit": 10})
    assert all(h["score"] == pytest.approx(0.25) for h in res["docs"])
    assert len(res["docs"]) == 4
    # count() sees the full match set (boost never reads as absence)
    assert small.count({"constant_score": {
        "filter": {"term": {"body": "alpha"}}, "boost": 0.0}}) == 3


def test_match_semantics(small):
    assert _bodies(small, {"match": {"body": {
        "query": "alpha beta", "operator": "and"}}}) == [
        "alpha beta gamble", "alpha beta gamma"]
    assert _bodies(small, {"match": {"body": "alpha beta"}}) == [
        "alpha beta gamble", "alpha beta gamma", "alpha delta",
        "beta gamma delta"]
    assert _bodies(small, {"match": {"body": {
        "query": "alpha beta delta", "minimum_should_match": 2}}}) == [
        "alpha beta gamble", "alpha beta gamma", "alpha delta",
        "beta gamma delta"]
    # match scoring == the equivalent bool-should of terms
    a = small.query_json({"query": {"match": {"body": "alpha beta"}},
                          "limit": 10})
    b = small.query_json({"query": {"bool": {"should": [
        {"term": {"body": "alpha"}}, {"term": {"body": "beta"}}]}},
        "limit": 10})
    assert [(h["docid"], h["score"]) for h in a["docs"]] == \
        [(h["docid"], h["score"]) for h in b["docs"]]


def test_multi_match_parse(index):
    n = A.parse_json({"multi_match": {
        "query": "hello world", "fields": ["text^2", "role"],
        "tie_breaker": 0.3}}, index.schema)
    assert isinstance(n, A.DisMaxQ) and n.tie_breaker == 0.3
    assert isinstance(n.queries[0], A.BoostQ) and n.queries[0].boost == 2.0
    assert isinstance(n.queries[0].child, A.BoolQ)  # 2 analyzed tokens
    # role is raw-tokenized: "hello world" stays ONE verbatim token
    assert isinstance(n.queries[1], A.TermQ)
    n = A.parse_json({"multi_match": {
        "query": "hello world", "fields": ["text", "role"],
        "type": "most_fields"}}, index.schema)
    assert isinstance(n, A.BoolQ) and len(n.should) == 2
    # single field degenerates to the plain match node
    n = A.parse_json({"multi_match": {
        "query": "hello", "fields": ["text"]}}, index.schema)
    assert isinstance(n, A.TermQ)
    # cross_fields is IMPLEMENTED (rewrites onto combined_fields) —
    # single same-analyzer field parses; mixed analyzers still reject
    n = A.parse_json({"multi_match": {
        "query": "hello", "fields": ["text"],
        "type": "cross_fields"}}, index.schema)
    assert isinstance(n, A.CombinedFieldsQ)
    for bad in (
        {"multi_match": {"query": "a", "fields": []}},
        {"multi_match": {"query": "a", "fields": ["text", "role"],
                         "type": "cross_fields"}},  # en_stem vs raw
        {"multi_match": {"query": "a", "fields": ["nope"]}},
        {"multi_match": {"query": "a", "fields": ["text", "role"],
                         "tie_breaker": 2.0}},
    ):
        with pytest.raises(A.QueryError):
            A.parse_json(bad, index.schema)


def test_multi_match_best_fields_equals_dismax(small):
    """best_fields multi_match scores exactly as the hand-built dis_max
    of per-field matches (the Lucene rewrite it compiles to).  On the
    raw ``tool`` field the text stays one verbatim token (df 0 here),
    so the body clause decides every score."""
    bq = {"bool": {"should": [{"term": {"body": "alpha"}},
                              {"term": {"body": "beta"}}]}}
    node = A.parse_json({"multi_match": {
        "query": "alpha beta", "fields": ["body^2", "tool"],
        "tie_breaker": 0.4}}, small.schema)
    want_node = A.DisMaxQ(
        [A.BoostQ(A.parse_json(bq, small.schema), 2.0),
         A.TermQ("tool", "alpha beta")], 0.4)
    s = small.searcher()
    got = [(int(r["docid_g"]), float(r["score"]))
           for r in s.top_k(node, limit=10).collect()]
    want = [(int(r["docid_g"]), float(r["score"]))
            for r in s.top_k(want_node, limit=10).collect()]
    assert got == want and len(got) == 4
    # and through the public JSON surface
    res = small.query_json({"query": {"multi_match": {
        "query": "alpha beta", "fields": ["body^2", "tool"],
        "tie_breaker": 0.4}}, "limit": 10})
    assert [(h["docid"], h["score"]) for h in res["docs"]] == got


def test_significant_terms_jlh(small):
    """JLH truth on the 5-doc corpus: matched = the 3 'alpha' docs.
    alpha: fg/M=1 vs bg/N=0.6 -> 0.4*(1/0.6)=2/3; gambl: 1/3 vs 0.2 ->
    (2/15)*(5/3)=2/9; beta: 2/3 vs 0.6 -> (1/15)*(10/9)=2/27; gamma and
    delta under-represented -> dropped."""
    res = small.query_json({"query": {"term": {"body": "alpha"}},
                            "limit": 0, "aggs": {
        "sig": {"significant_terms": {"field": "body", "size": 10}}}})
    sig = res["aggs"]["sig"]
    assert sig["doc_count"] == 3
    got = [(b["key"], b["doc_count"], b["bg_count"]) for b in sig["buckets"]]
    assert got == [("alpha", 3, 3), ("gambl", 1, 1), ("beta", 2, 3)]
    scores = [b["score"] for b in sig["buckets"]]
    assert scores == pytest.approx([2 / 3, 2 / 9, 2 / 27])
    # validation: needs an indexed field
    with pytest.raises(A.QueryError):
        small.query_json({"query": {"all": {}}, "aggs": {
            "x": {"significant_terms": {"field": "n"}}}})


@pytest.fixture(scope="module")
def sigtext(spark, tmp_path_factory):
    """Corpus with planted boilerplate: three exact copies of a spammy
    passage all match 'alpha' — the case filter_duplicate_text exists
    for."""
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("qs6st")))
    schema = [
        {"name": "body", "type": "text",
         "options": {"indexing": {"record": "position",
                                  "tokenizer": "en_stem"},
                     "stored": True}},
        {"name": "n", "type": "i64", "options": {"stored": True}},
    ]
    idx = cat.create_index("st", schema)
    rows = [
        ("alpha beta gamma", 0),
        ("alpha spam spam offer", 1),
        ("alpha spam spam offer", 2),
        ("alpha spam spam offer", 3),
        ("beta delta", 4),
        ("epsilon beta", 5),
    ]
    idx.add_df(spark.createDataFrame(rows, "body string, n long"),
               order_cols=["n"])
    return idx


def test_significant_text_jlh(sigtext):
    """Hand-computed JLH over the re-analyzed matched text (M=4, N=6):
    alpha 1 vs 4/6 -> 0.5; offer/spam 3/4 vs 0.5 -> 0.375 (tie broken
    by term asc); gamma 1/4 vs 1/6 -> 0.125; beta under-represented."""
    res = sigtext.query_json({"query": {"term": {"body": "alpha"}},
                              "limit": 0, "aggs": {
        "sig": {"significant_text": {"field": "body", "size": 10}}}})
    sig = res["aggs"]["sig"]
    assert sig["doc_count"] == 4
    got = [(b["key"], b["doc_count"], b["bg_count"])
           for b in sig["buckets"]]
    assert got == [("alpha", 4, 4), ("offer", 3, 3), ("spam", 3, 3),
                   ("gamma", 1, 1)]
    scores = [b["score"] for b in sig["buckets"]]
    assert scores == pytest.approx([0.5, 0.375, 0.375, 0.125])


def test_significant_text_filter_duplicate_text(sigtext):
    """With filter_duplicate_text the three boilerplate copies collapse
    to one doc (M=2): spam/offer fall to background rate and VANISH,
    gamma jumps to the top — the anti-boilerplate behavior the option
    exists for.  JLH: gamma 1/2 vs 1/6 -> 1.0; alpha 1 vs 2/3 -> 0.5."""
    res = sigtext.query_json({"query": {"term": {"body": "alpha"}},
                              "limit": 0, "aggs": {
        "sig": {"significant_text": {"field": "body", "size": 10,
                                     "filter_duplicate_text": True}}}})
    sig = res["aggs"]["sig"]
    assert sig["doc_count"] == 2
    got = [(b["key"], b["doc_count"]) for b in sig["buckets"]]
    assert got == [("gamma", 1), ("alpha", 2)]
    scores = [b["score"] for b in sig["buckets"]]
    assert scores == pytest.approx([1.0, 0.5])


def test_significant_text_rejections(sigtext):
    with pytest.raises(A.QueryError):  # numeric field has no tokenizer
        sigtext.query_json({"query": {"all": {}}, "aggs": {
            "x": {"significant_text": {"field": "n"}}}})


# ------------------------------------------------------------- pagination
def test_offset_pagination(index):
    """Pages tile the depth-k prefix exactly: concatenating pages of
    size 5 reproduces the single limit-20 result, and an offset past
    the match count returns empty."""
    q = {"term": {"text": "the"}}  # df=371 here: pages are real
    full = index.query_json({"query": q, "limit": 20})["docs"]
    pages = []
    for off in (0, 5, 10, 15):
        pages.extend(index.query_json(
            {"query": q, "limit": 5, "offset": off})["docs"])
    assert [(h["docid"], h["score"]) for h in pages] == \
        [(h["docid"], h["score"]) for h in full]
    # ES alias "from"
    alias = index.query_json({"query": q, "limit": 5, "from": 5})["docs"]
    assert [(h["docid"], h["score"]) for h in alias] == \
        [(h["docid"], h["score"]) for h in full[5:10]]
    n = index.count(q)
    assert index.query_json({"query": q, "limit": 10,
                             "offset": n + 50})["docs"] == []
    # offset also applies under sort_by (the sorted collector)
    srt = index.query_json({"query": q, "limit": 20, "sort_by": "ts"})["docs"]
    pg = index.query_json({"query": q, "limit": 5, "offset": 5,
                           "sort_by": "ts"})["docs"]
    assert [h["docid"] for h in pg] == [h["docid"] for h in srt[5:10]]


def test_search_after_pagination(index, oracle):
    """The cursor path: pages chained by the previous page's last
    (score, docid) tile the global order exactly like offset pages —
    but execute as a pure filter, never a depth-(P*k) top-k — and the
    pruned path returns identical pages (unit bounds stay valid upper
    bounds under the cursor filter; theta comes from the filtered
    probe)."""
    q = {"term": {"text": "the"}}  # df=371 here: every page is full
    full = index.query_json({"query": q, "limit": 20})["docs"]
    cursor, pages = None, []
    for _ in range(4):
        req = {"query": q, "limit": 5}
        if cursor is not None:
            req["search_after"] = cursor
        page = index.query_json(req)["docs"]
        pages.extend(page)
        if len(page) < 5:
            break  # exhausted — fewer matches than 4 pages
        cursor = [page[-1]["score"], page[-1]["docid"]]
    assert [(h["docid"], h["score"]) for h in pages] == \
        [(h["docid"], h["score"]) for h in full]
    # plain vs pruned parity with a cursor (cursor = the engine's own
    # hit 10, as a real client would chain it), against the oracle tail
    node = A.parse_json(q, index.schema)
    want = oracle.top_k(node, 20)  # oracle rows are (docid, score)
    s = index.searcher()
    head = s.top_k(node, limit=10).collect()
    cur = (float(head[-1]["score"]), int(head[-1]["docid_g"]))
    for df in (s.top_k(node, limit=10, after=cur),
               s.top_k_pruned(node, limit=10, after=cur)):
        got = [(int(r["docid_g"]), float(r["score"])) for r in df.collect()]
        assert [d for d, _ in got] == [d for d, _ in want[10:20]]
        for (_, a), (_, b) in zip(got, want[10:20]):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-12)
    # sort_by + search_after: cursor on the sort value
    srt = index.query_json({"query": q, "limit": 20, "sort_by": "ts"})["docs"]
    cur = [srt[4]["score"], srt[4]["docid"]]
    pg = index.query_json({"query": q, "limit": 5, "sort_by": "ts",
                           "search_after": cur})["docs"]
    assert [h["docid"] for h in pg] == [h["docid"] for h in srt[5:10]]


def test_search_after_errors(index):
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "offset": 5,
                          "search_after": [1.0, 3]})
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "search_after": [1.0]})


def _score_map(idx, q, k=10):
    res = idx.query_json({"query": q, "limit": k})
    return {h["docid"]: h["score"] for h in res["docs"]}


def test_rescore_semantics(small):
    """ES rescore contract: new score = mode(qw*primary, rw*secondary)
    for window docs the secondary matches, qw*primary otherwise;
    window re-sorts, page cut from it.  Verified by composing the
    primary and phrase scores fetched independently."""
    primary_q = {"bool": {"should": [{"term": {"body": "alpha"}},
                                     {"term": {"body": "beta"}}]}}
    phrase_q = {"phrase": {"body": ["alpha", "beta"]}}
    prim = _score_map(small, primary_q)
    ph = _score_map(small, phrase_q)
    for mode, combine in [("total", lambda p, r: p + r),
                          ("multiply", lambda p, r: p * r),
                          ("max", max)]:
        res = small.query_json({"query": primary_q, "limit": 10,
                                "rescore": {"window_size": 10, "query": {
                                    "rescore_query": phrase_q,
                                    "query_weight": 0.7,
                                    "rescore_query_weight": 2.0,
                                    "score_mode": mode}}})
        got = {h["docid"]: h["score"] for h in res["docs"]}
        want = {d: (combine(0.7 * p, 2.0 * ph[d]) if d in ph else 0.7 * p)
                for d, p in prim.items()}
        assert set(got) == set(want)
        for d in got:
            assert got[d] == pytest.approx(want[d], rel=1e-9)
    # ordering follows the rescored values (phrase docs jump ahead)
    res = small.query_json({"query": primary_q, "limit": 10,
                            "rescore": {"window_size": 10, "query": {
                                "rescore_query": phrase_q,
                                "rescore_query_weight": 10.0}}})
    top2 = [h["docid"] for h in res["docs"][:2]]
    assert sorted(top2) == sorted(ph.keys())
    # a no-match rescore query leaves the primary order, scaled by qw
    res = small.query_json({"query": primary_q, "limit": 10,
                            "rescore": {"window_size": 10, "query": {
                                "rescore_query": {"term": {"body": "zzz"}},
                                "query_weight": 2.0}}})
    got = {h["docid"]: h["score"] for h in res["docs"]}
    assert got == {d: pytest.approx(2.0 * p) for d, p in prim.items()}


def test_rescore_collapse_vs_aggs_refused(small):
    """Combining rescore/collapse with facets/aggs raises instead of
    silently dropping one of them."""
    base = {"query": {"term": {"body": "alpha"}},
            "aggs": {"t": {"terms": {"field": "tool"}}}}
    with pytest.raises(A.QueryError):
        small.query_json({**base, "collapse": {"field": "tool"}})
    with pytest.raises(A.QueryError):
        small.query_json({**base, "rescore": {"query": {
            "rescore_query": {"term": {"body": "beta"}}}}})


def test_rescore_errors(small):
    base = {"query": {"term": {"body": "alpha"}}}
    with pytest.raises(A.QueryError):
        small.query_json({**base, "rescore": {"query": {}}})
    with pytest.raises(A.QueryError):
        small.query_json({**base, "rescore": {
            "window_size": 0,
            "query": {"rescore_query": {"term": {"body": "beta"}}}}})
    with pytest.raises(A.QueryError):
        small.query_json({**base, "sort_by": "n", "rescore": {
            "query": {"rescore_query": {"term": {"body": "beta"}}}}})
    with pytest.raises(A.QueryError):
        small.query_json({**base, "search_after": [1.0, 0], "rescore": {
            "query": {"rescore_query": {"term": {"body": "beta"}}}}})
    with pytest.raises(A.QueryError):
        small.query_json({**base, "rescore": {"query": {
            "rescore_query": {"term": {"body": "beta"}},
            "score_mode": "bogus"}}})


# ------------------------------------------------------------ aggregations
def _matched_rows(corpus, oracle, node):
    ids = sorted(oracle.score(node))
    return corpus.iloc[ids]


def test_aggs_against_pandas_truth(index, corpus, oracle):
    node = A.parse_json({"term": {"text": "hello"}}, index.schema)
    rows = _matched_rows(corpus, oracle, node)
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 3, "aggs": {
        "roles": {"terms": {"field": "role", "size": 10}},
        "idx_hist": {"histogram": {"field": "turn_idx", "interval": 2}},
        "daily": {"date_histogram": {"field": "ts",
                                     "calendar_interval": "day"}},
        "idx_stats": {"stats": {"field": "turn_idx"}},
        "idx_pct": {"percentiles": {"field": "turn_idx",
                                    "percents": [50, 90]}},
        "tools": {"cardinality": {"field": "tool", "exact": True}},
    }})
    assert len(res["docs"]) == 3  # top-k rides along
    aggs = res["aggs"]

    vc = rows["role"].value_counts()
    want = sorted(((int(c), k) for k, c in vc.items()),
                  key=lambda t: (-t[0], t[1]))
    got = [(b["doc_count"], b["key"]) for b in aggs["roles"]["buckets"]]
    assert got == want

    hist = (rows["turn_idx"] // 2 * 2).value_counts().sort_index()
    assert [(b["key"], b["doc_count"]) for b in
            aggs["idx_hist"]["buckets"]] == \
        [(float(k), int(v)) for k, v in hist.items()]

    daily = rows["ts"].dt.floor("D").value_counts().sort_index()
    assert [(b["key_as_string"], b["doc_count"]) for b in
            aggs["daily"]["buckets"]] == \
        [(k.isoformat(), int(v)) for k, v in daily.items()]

    st = aggs["idx_stats"]
    assert st["count"] == len(rows)
    assert st["min"] == int(rows["turn_idx"].min())
    assert st["max"] == int(rows["turn_idx"].max())
    assert st["sum"] == int(rows["turn_idx"].sum())
    assert st["avg"] == pytest.approx(float(rows["turn_idx"].mean()))

    # exact interpolated percentiles == numpy 'linear'
    for p in (50, 90):
        assert aggs["idx_pct"]["values"][str(float(p))] == pytest.approx(
            float(np.percentile(rows["turn_idx"].to_numpy(), p)))

    assert aggs["tools"]["value"] == rows["tool"].dropna().nunique()


def test_aggs_extended_range_ranks(index, corpus, oracle):
    """extended_stats (population variance per ES), range ([from,to)
    conditional-sum buckets), percentile_ranks (exact % <= value)."""
    node = A.parse_json({"term": {"text": "hello"}}, index.schema)
    rows = _matched_rows(corpus, oracle, node)
    v = rows["turn_idx"].astype(float)
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "ext": {"extended_stats": {"field": "turn_idx"}},
        "rng": {"range": {"field": "turn_idx", "ranges": [
            {"to": 3}, {"from": 3, "to": 6}, {"from": 6}]}},
        "pr": {"percentile_ranks": {"field": "turn_idx",
                                    "values": [2, 5]}},
    }})
    ext = res["aggs"]["ext"]
    assert ext["count"] == len(v)
    assert ext["sum_of_squares"] == pytest.approx((v * v).sum())
    assert ext["variance"] == pytest.approx(v.var(ddof=0))
    assert ext["std_deviation"] == pytest.approx(v.std(ddof=0))
    b = res["aggs"]["rng"]["buckets"]
    assert [x["doc_count"] for x in b] == [
        int((v < 3).sum()), int(((v >= 3) & (v < 6)).sum()),
        int((v >= 6).sum())]
    assert b[0]["key"] == "*-3" and b[2]["key"] == "6-*"
    pr = res["aggs"]["pr"]["values"]
    for x in (2, 5):
        assert pr[str(float(x))] == pytest.approx(
            100.0 * (v <= x).mean())
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"range": {"field": "turn_idx", "ranges": [{}]}}}})
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"percentile_ranks": {"field": "turn_idx"}}}})


def test_aggs_top_hits_sub_agg(index, corpus, oracle):
    """terms agg with a top_hits sub-agg: per bucket, the bucket's
    best-scoring docs under (score desc, docid asc), stored fields
    included — verified against the oracle scores + corpus roles."""
    node = A.parse_json({"term": {"text": "the"}}, index.schema)
    scores = oracle.score(node)
    res = index.query_json({"query": {"term": {"text": "the"}},
                            "limit": 0, "aggs": {
        "roles": {"terms": {"field": "role", "size": 3, "aggs": {
            "best": {"top_hits": {"size": 2}}}}}}})
    buckets = res["aggs"]["roles"]["buckets"]
    assert buckets and all("best" in b for b in buckets)
    for b in buckets:
        members = [(d, s) for d, s in scores.items()
                   if corpus.iloc[d]["role"] == b["key"]]
        want = sorted(members, key=lambda t: (-t[1], t[0]))[:2]
        got = [(h["docid"], h["score"]) for h in b["best"]["hits"]]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, wv) in zip(got, want):
            assert a == pytest.approx(wv, rel=1e-9)
        # stored fields ride along like normal query hits
        assert b["best"]["hits"][0]["doc"]["role"] == [b["key"]]
    with pytest.raises(A.QueryError):  # unknown sub-agg kind
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"terms": {"field": "role", "aggs": {
                "y": {"bogus": {"field": "turn_idx"}}}}}}})


def test_aggs_approx_paths(index, corpus, oracle):
    """The 100 TB default paths: HLL cardinality within its published
    error envelope, sketch percentiles within the value range."""
    node = A.parse_json({"term": {"text": "hello"}}, index.schema)
    rows = _matched_rows(corpus, oracle, node)
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "card": {"cardinality": {"field": "conv_id"}},
        "pct": {"percentiles": {"field": "turn_idx", "percents": [50],
                                "approx": True}},
    }})
    exact = rows["conv_id"].nunique()
    assert abs(res["aggs"]["card"]["value"] - exact) <= max(2, 0.1 * exact)
    p50 = res["aggs"]["pct"]["values"]["50.0"]
    assert rows["turn_idx"].min() <= p50 <= rows["turn_idx"].max()


def test_aggs_null_bucket_dropped(small):
    """ES missing-value rule: null agg fields drop out of bucketed aggs
    (no null bucket) and out of count/cardinality."""
    res = small.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
        "tools": {"terms": {"field": "tool"}},
        "card": {"cardinality": {"field": "tool", "exact": True}},
    }})
    keys = [b["key"] for b in res["aggs"]["tools"]["buckets"]]
    assert keys == ["bash", "python"] and None not in keys
    assert res["aggs"]["card"]["value"] == 2


def test_aggs_validation_errors(index):
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"bogus": {"field": "role"}}}})
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"terms": {}}}})
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"terms": {"field": "nosuchfield"}}}})
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"histogram": {"field": "turn_idx", "interval": 0}}}})
    # ES typing rules, rejected at parse time (not an executor cast)
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"stats": {"field": "role"}}}})
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"date_histogram": {"field": "turn_idx",
                                     "calendar_interval": "day"}}}})


def test_field_collapse(index, corpus, oracle):
    """Collapse by conv_id: one hit per conversation — the group's
    best (score desc, docid asc) doc — then the usual top-k; with
    sort_by, the group winner is by the fast-field value instead
    (latest matching turn per conversation)."""
    q = {"term": {"text": "the"}}
    node = A.parse_json(q, index.schema)
    scores = oracle.score(node)
    best: dict[str, tuple] = {}
    for d, sc in scores.items():
        cv = corpus.iloc[d]["conv_id"]
        key = (-sc, d)
        if cv not in best or key < best[cv]:
            best[cv] = key
    winners = sorted(best.values())[:10]  # [(-score, docid), ...]
    want = [(d, -negs) for negs, d in winners]
    res = index.query_json({"query": q, "limit": 10,
                            "collapse": {"field": "conv_id"}})
    got = [(h["docid"], h["score"]) for h in res["docs"]]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)
    # every conv_id distinct, and no conv appears twice vs plain top-k
    convs = [corpus.iloc[d]["conv_id"] for d, _ in got]
    assert len(convs) == len(set(convs))
    # sorted variant: latest matching turn per conversation by ts
    res = index.query_json({"query": q, "limit": 10, "sort_by": "ts",
                            "collapse": {"field": "conv_id"}})
    rows = corpus.iloc[sorted(scores)]
    latest = (rows.sort_values(["ts"], ascending=False)
              .groupby("conv_id", sort=False).head(1))
    want_ids = list(latest.sort_values("ts", ascending=False)
                    .head(10).index)
    assert [h["docid"] for h in res["docs"]] == want_ids
    with pytest.raises(A.QueryError):
        index.query_json({"query": q, "collapse": {"field": "nope"}})
    with pytest.raises(A.QueryError):
        index.query_json({"query": q, "collapse": {"field": "conv_id"},
                          "search_after": [1.0, 0]})


def test_function_score_parse_errors(index):
    for bad in (
        {"function_score": {"functions": [
            {"field_value_factor": {"field": "turn_idx"}}]}},  # no query
        {"function_score": {"query": {"all": {}}}},  # no functions
        {"function_score": {"query": {"all": {}}, "field_value_factor": {
            "field": "turn_idx", "modifier": "log2p"}}},
        {"function_score": {"query": {"all": {}}, "field_value_factor": {
            "field": "text"}}},  # non-numeric
        {"function_score": {"query": {"all": {}}, "gauss": {
            "turn_idx": {"origin": 0, "scale": 2, "decay": 1.5}}}},
        {"function_score": {"query": {"all": {}}, "score_mode": "max",
                            "field_value_factor": {"field": "turn_idx"}}},
    ):
        with pytest.raises(A.QueryError):
            A.parse_json(bad, index.schema)


def test_function_score_values(small):
    """Exact value check on the 5-doc corpus: fvf log1p(0.1*n)
    multiplies the BM25 score; missing values use the missing param;
    gauss replace yields pure decay ordering."""
    import math

    q = {"term": {"body": "alpha"}}
    prim = _score_map(small, q)
    res = small.query_json({"query": {"function_score": {
        "query": q, "field_value_factor": {
            "field": "n", "factor": 0.1, "modifier": "log1p"}}},
        "limit": 10})
    # add_df orders by body: gamble(45)=0, gamma(5)=1, "alpha delta"(15)=2
    ns = {0: 45, 1: 5, 2: 15}
    for h in res["docs"]:
        want = prim[h["docid"]] * math.log(1.0 + 0.1 * ns[h["docid"]])
        assert h["score"] == pytest.approx(want, rel=1e-9)
    # gauss replace: pure decay, doc with n closest to origin wins
    res = small.query_json({"query": {"function_score": {
        "query": q, "boost_mode": "replace",
        "gauss": {"n": {"origin": 15, "scale": 10, "decay": 0.5}}}},
        "limit": 10})
    assert res["docs"][0]["docid"] == 2  # n=15 == origin
    assert res["docs"][0]["score"] == pytest.approx(1.0)
    d5 = math.exp(-(10.0 ** 2) / (2 * (-(10.0 ** 2) / (2 * math.log(0.5)))))
    assert res["docs"][1]["score"] == pytest.approx(d5, rel=1e-9)  # n=5


def test_function_score_date_recency(index, corpus, oracle):
    """Recency boost on the date fast field: gauss(ts, origin=max ts)
    with boost_mode replace ranks matching turns by |ts - origin| —
    newest first (the canonical 'boost recent conversations' ask)."""
    q = {"term": {"text": "the"}}
    node = A.parse_json(q, index.schema)
    matched = sorted(oracle.score(node))
    rows = corpus.iloc[matched]
    origin = rows["ts"].max()
    res = index.query_json({"query": {"function_score": {
        "query": q, "boost_mode": "replace",
        "gauss": {"ts": {"origin": str(origin), "scale": 3600.0,
                         "decay": 0.5}}}}, "limit": 10})
    want = list(rows.assign(d=(rows["ts"] - origin).abs())
                .sort_values(["d"], kind="stable").head(10).index)
    got = [h["docid"] for h in res["docs"]]
    assert got == want


def test_term_suggester(small):
    """ES term-suggester semantics on the 5-doc corpus (dictionary:
    alpha x3, beta x3, gamma x2, delta x3... by df; tool is a separate
    field).  suggest_mode=missing only corrects absent tokens;
    popular requires freq > the token's own df; always suggests for
    everything.  Ordering: (distance asc, freq desc, term asc)."""
    # 'alpa' is absent -> corrected to alpha (dist 1); 'beta' present
    got = small.suggest("body", "alpa beta", mode="missing")
    assert got["beta"] == []
    assert [s["text"] for s in got["alpa"]][0] == "alpha"
    top = got["alpa"][0]
    assert top["freq"] == 3 and top["score"] == pytest.approx(0.75)
    # always: beta's neighbors zeta (dist 1) then delta (dist 2)
    got = small.suggest("body", "beta", mode="always")
    assert [s["text"] for s in got["beta"]][:2] == ["zeta", "delta"]
    # popular: nothing beats beta's own df=3
    got = small.suggest("body", "beta", mode="popular")
    assert got["beta"] == []
    with pytest.raises(A.QueryError):
        small.suggest("body", "x", mode="bogus")
    with pytest.raises(A.QueryError):
        small.suggest("nope", "x")


# ------------------------------------------------ oracle parity (pruned too)
PARITY = [
    {"constant_score": {"filter": {"term": {"text": "hello"}},
                        "boost": 1.5}},
    {"constant_score": {"filter": {"bool": {
        "should": [{"term": {"text": "hello"}},
                   {"term": {"text": "world"}}]}}, "boost": 0.5}},
    {"bool": {"must": [{"term": {"text": "hello"}}],
              "should": [{"constant_score": {
                  "filter": {"term": {"text": "world"}}, "boost": 3.0}}]}},
    {"wildcard": {"text": "h?llo"}},
    {"wildcard": {"text": "wba*"}},
    {"wildcard": {"text": "w*d"}},
    {"match": {"text": {"query": "hello world", "operator": "and"}}},
    {"match": {"text": {"query": "hello world the",
                        "minimum_should_match": 2}}},
    {"multi_match": {"query": "hello world", "fields": ["text^2", "role"],
                     "tie_breaker": 0.3}},
    {"multi_match": {"query": "hello world", "fields": ["text", "role"],
                     "type": "most_fields"}},
    {"function_score": {"query": {"term": {"text": "hello"}},
                        "field_value_factor": {"field": "turn_idx",
                                               "factor": 0.5,
                                               "modifier": "log1p"}}},
    {"function_score": {"query": {"term": {"text": "the"}},
                        "boost_mode": "sum", "score_mode": "sum",
                        "functions": [
                            {"field_value_factor": {"field": "turn_idx",
                                                    "modifier": "sqrt"}},
                            {"gauss": {"turn_idx": {"origin": 3,
                                                    "scale": 2.0,
                                                    "decay": 0.5}}}]}},
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


def test_constant_score_plan_shape(index):
    """constant_score of a term compiles to the same single-scan
    filter-project plan as the bare term — the child's BM25 arithmetic
    is pruned out by Catalyst (score column overwritten), no join, no
    extra exchange."""
    s = index.searcher()
    node = A.parse_json({"constant_score": {
        "filter": {"term": {"text": "hello"}}, "boost": 2.0}}, index.schema)
    p = s.candidates(node)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p and p.count("Scan parquet") == 1
    assert "element_at" not in p  # fieldnorm decode pruned out


# --------------------------------------------------- metric sub-aggs (r5)
def test_metric_sub_aggs_terms(index, corpus, oracle):
    """Metric sub-aggs under a terms bucket — computed in the SAME
    groupBy (one shuffle) — against pandas groupby truth.  Uses the
    ES sibling shape for one agg to pin the normalization."""
    node = A.parse_json({"term": {"text": "the"}}, index.schema)
    rows = _matched_rows(corpus, oracle, node)
    res = index.query_json({"query": {"term": {"text": "the"}},
                            "limit": 0, "aggs": {
        # in-body sub-agg form
        "roles": {"terms": {"field": "role", "size": 10, "aggs": {
            "mean_idx": {"avg": {"field": "turn_idx"}},
            "sum_idx": {"sum": {"field": "turn_idx"}},
            "lo": {"min": {"field": "turn_idx"}},
            "hi": {"max": {"field": "turn_idx"}},
            "n_tool": {"value_count": {"field": "tool"}},
            "tools": {"cardinality": {"field": "tool"}},
            "st": {"stats": {"field": "turn_idx"}},
        }}},
        # ES sibling form {kind: {...}, "aggs": {...}}
        "roles2": {"terms": {"field": "role", "size": 10},
                   "aggs": {"mean_idx": {"avg": {"field": "turn_idx"}}}},
    }})
    g = rows.groupby("role")
    for b in res["aggs"]["roles"]["buckets"]:
        grp = g.get_group(b["key"])
        assert b["doc_count"] == len(grp)
        assert b["mean_idx"]["value"] == pytest.approx(
            float(grp["turn_idx"].mean()))
        assert b["sum_idx"]["value"] == int(grp["turn_idx"].sum())
        assert b["lo"]["value"] == int(grp["turn_idx"].min())
        assert b["hi"]["value"] == int(grp["turn_idx"].max())
        # value_count / cardinality skip nulls (ES missing-value rule)
        assert b["n_tool"]["value"] == int(grp["tool"].notna().sum())
        exact = grp["tool"].dropna().nunique()
        assert abs(b["tools"]["value"] - exact) <= max(1, 0.1 * exact)
        st = b["st"]
        assert st["count"] == len(grp)
        assert st["avg"] == pytest.approx(float(grp["turn_idx"].mean()))
        assert st["sum"] == int(grp["turn_idx"].sum())
    sib = {b["key"]: b for b in res["aggs"]["roles2"]["buckets"]}
    for b in res["aggs"]["roles"]["buckets"]:
        assert sib[b["key"]]["mean_idx"]["value"] == pytest.approx(
            b["mean_idx"]["value"])


def test_metric_sub_aggs_histogram(index, corpus, oracle):
    """Metric sub-aggs ride histogram and date_histogram buckets too."""
    node = A.parse_json({"term": {"text": "hello"}}, index.schema)
    rows = _matched_rows(corpus, oracle, node)
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "h": {"histogram": {"field": "turn_idx", "interval": 3, "aggs": {
            "n_tool": {"value_count": {"field": "tool"}}}}},
        "d": {"date_histogram": {"field": "ts", "calendar_interval": "day",
                                 "aggs": {
            "mean_idx": {"avg": {"field": "turn_idx"}}}}},
    }})
    hg = rows.groupby(rows["turn_idx"] // 3 * 3)
    for b in res["aggs"]["h"]["buckets"]:
        grp = hg.get_group(int(b["key"]))
        assert b["doc_count"] == len(grp)
        assert b["n_tool"]["value"] == int(grp["tool"].notna().sum())
    dg = rows.groupby(rows["ts"].dt.floor("D"))
    for b in res["aggs"]["d"]["buckets"]:
        grp = dg.get_group(b["key_as_string"])
        assert b["mean_idx"]["value"] == pytest.approx(
            float(grp["turn_idx"].mean()))


def test_filters_agg(index, corpus, oracle):
    """ES filters agg: named buckets, each counting matched docs that
    ALSO match the filter query (left-semi of match keys x filter
    candidates) — vs oracle set intersections."""
    main = A.parse_json({"term": {"text": "the"}}, index.schema)
    main_ids = set(oracle.score(main))
    res = index.query_json({"query": {"term": {"text": "the"}},
                            "limit": 0, "aggs": {
        "split": {"filters": {"filters": {
            "users": {"term": {"role": "user"}},
            "hello": {"term": {"text": "hello"}},
        }}}}})
    b = res["aggs"]["split"]["buckets"]
    for fname, q in (("users", {"term": {"role": "user"}}),
                     ("hello", {"term": {"text": "hello"}})):
        sub = A.parse_json(q, index.schema)
        want = len(main_ids & set(oracle.score(sub)))
        assert b[fname]["doc_count"] == want


def test_missing_and_top_metrics(index, corpus, oracle):
    """Top-level avg/sum/min/max/value_count/missing vs pandas truth."""
    node = A.parse_json({"term": {"text": "the"}}, index.schema)
    rows = _matched_rows(corpus, oracle, node)
    res = index.query_json({"query": {"term": {"text": "the"}},
                            "limit": 0, "aggs": {
        "a": {"avg": {"field": "turn_idx"}},
        "s": {"sum": {"field": "turn_idx"}},
        "lo": {"min": {"field": "turn_idx"}},
        "hi": {"max": {"field": "turn_idx"}},
        "n": {"value_count": {"field": "tool"}},
        "no_tool": {"missing": {"field": "tool"}},
    }})
    a = res["aggs"]
    assert a["a"]["value"] == pytest.approx(float(rows["turn_idx"].mean()))
    assert a["s"]["value"] == int(rows["turn_idx"].sum())
    assert a["lo"]["value"] == int(rows["turn_idx"].min())
    assert a["hi"]["value"] == int(rows["turn_idx"].max())
    assert a["n"]["value"] == int(rows["tool"].notna().sum())
    assert a["no_tool"]["doc_count"] == int(rows["tool"].isna().sum())


def test_sub_agg_validation(index):
    # top_hits only under terms
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"histogram": {"field": "turn_idx", "interval": 2,
                                "aggs": {"y": {"top_hits": {}}}}}}})
    # sub-aggs only under bucket aggs
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"stats": {"field": "turn_idx",
                            "aggs": {"y": {"avg": {"field": "turn_idx"}}}}}}})
    # numeric rule applies to sub-agg metrics
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"terms": {"field": "role", "aggs": {
                "y": {"avg": {"field": "role"}}}}}}})
    # top-level metric typing
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"avg": {"field": "role"}}}})
    # filters agg needs named filters
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"filters": {"filters": {}}}}})


# ------------------------------------------------ boosting + query_string (r5)
def test_boosting_semantics(small):
    """ES boosting query: positive's match set, negative matches demoted
    by negative_boost — never excluded (must_not's softer sibling)."""
    res = small.query_json({"query": {"boosting": {
        "positive": {"term": {"body": "alpha"}},
        "negative": {"term": {"body": "beta"}},
        "negative_boost": 0.5}}, "limit": 10})
    bodies = {h["doc"]["body"][0]: h["score"] for h in res["docs"]}
    # match set unchanged: all three alpha docs still hit
    assert set(bodies) == {"alpha beta gamma", "alpha delta",
                           "alpha beta gamble"}
    plain = small.query_json({"query": {"term": {"body": "alpha"}},
                              "limit": 10})
    base = {h["doc"]["body"][0]: h["score"] for h in plain["docs"]}
    for b, s in bodies.items():
        if "beta" in b:
            assert s == pytest.approx(base[b] * 0.5)
        else:
            assert s == pytest.approx(base[b])
    # negative_boost 0 demotes to score 0 but keeps the hit
    res = small.query_json({"query": {"boosting": {
        "positive": {"term": {"body": "alpha"}},
        "negative": {"term": {"body": "beta"}},
        "negative_boost": 0.0}}, "limit": 10})
    assert len(res["docs"]) == 3
    # zero-df negative: nothing demoted
    res = small.query_json({"query": {"boosting": {
        "positive": {"term": {"body": "alpha"}},
        "negative": {"term": {"body": "zzznope"}},
        "negative_boost": 0.1}}, "limit": 10})
    got = {h["doc"]["body"][0]: h["score"] for h in res["docs"]}
    assert got == pytest.approx(base)


def test_boosting_oracle_parity_and_pruned(index, oracle):
    """boosting through BOTH the exact and the block-max-pruned top-k:
    identical ranks and scores vs the Python oracle."""
    node = A.parse_json({"boosting": {
        "positive": {"match": {"text": "the hello"}},
        "negative": {"term": {"role": "tool"}},
        "negative_boost": 0.3}}, index.schema)
    want = oracle.top_k(node, 10)
    s = index.searcher()
    for df in (s.top_k(node, limit=10), s.top_k_pruned(node, limit=10)):
        got = [(int(r["docid_g"]), float(r["score"])) for r in df.collect()]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-12)


def test_boosting_parse_errors(index):
    with pytest.raises(A.QueryError):
        A.parse_json({"boosting": {"positive": {"all": {}}}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"boosting": {
            "positive": {"all": {}}, "negative": {"all": {}},
            "negative_boost": 1.5}}, index.schema)


def test_query_string(index, oracle, small):
    """query_string: the raw grammar behind the JSON DSL; default_field
    scopes bare terms, absent → all indexed fields (Query::Raw rule)."""
    n = A.parse_json({"query_string": {
        "query": '"hello world" AND role:user',
        "default_field": "text"}}, index.schema)
    want = oracle.top_k(n, 10)
    got = [(int(r["docid_g"]), float(r["score"])) for r in
           index.searcher().top_k_pruned(n, limit=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    # scoped vs unscoped: bare term hits only the default field
    scoped = A.parse_json({"query_string": {
        "query": "user", "default_field": "text"}}, index.schema)
    assert not oracle.score(scoped)  # 'user' only in role
    unscoped = A.parse_json({"query_string": {"query": "user"}},
                            index.schema)
    assert oracle.score(unscoped)  # finds role:user
    with pytest.raises(A.QueryError):
        A.parse_json({"query_string": {"query": ""}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"query_string": {
            "query": "x", "default_field": "nosuch"}}, index.schema)


# --------------------------------------------------- phrase suggester (r5)
@pytest.fixture(scope="module")
def psidx(spark, tmp_path_factory):
    """Corpus for the phrase suggester with hand-computable bigram
    counts (stem-stable words only)."""
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("qs6p")))
    schema = [{"name": "body", "type": "text",
               "options": {"indexing": {"record": "position",
                                        "tokenizer": "en_stem"},
                           "stored": True}}]
    idx = cat.create_index("p", schema)
    rows = [("the quick brown fox",),
            ("quick brown fox den",),
            ("brown fox runs",),
            ("brown dog",),
            ("the brown dog den",)]
    idx.add_df(spark.createDataFrame(rows, "body string"),
               order_cols=["body"])
    return idx


def test_phrase_suggester(psidx):
    """Smoothed-bigram LM did-you-mean vs hand counts.

    Corpus unigrams: the=2 quick=2 brown=5 fox=3 den=2 dog=2 run=1
    (V=7); bigrams: quick,brown=2 brown,fox=3 brown,dog=2 fox,den=1
    fox,run=1 the,quick=1 the,brown=1 dog,den=1.  'dog' is itself a
    dist-2 candidate for 'fox' — the LM, not the edit distance, must
    prefer fox (brown,fox=3 > brown,dog=2)."""
    import math

    out = psidx.suggest_phrase("body", "quick broown fox", size=5)
    assert out[0]["text"] == "quick brown fox"
    # the engine's own phrase stays ranked (typo has no dictionary df,
    # but the token is kept as a candidate) and scores strictly lower
    texts = [o["text"] for o in out]
    assert "quick broown fox" in texts
    assert out[0]["score"] > dict((o["text"], o["score"])
                                  for o in out)["quick broown fox"]
    # exact LM check: replicate the engine's formula with hand counts
    s = psidx.searcher()
    n_total = s.avgdl("body") * s.num_docs
    a, v = 0.4, 7
    uni = {"quick": 2, "brown": 5, "fox": 3, "broown": 0}
    bi = {("quick", "brown"): 2, ("brown", "fox"): 3}
    want = (math.log((uni["quick"] + a) / (n_total + a * v))
            + math.log((bi[("quick", "brown")] + a) / (uni["quick"] + a * v))
            + math.log((bi[("brown", "fox")] + a) / (uni["brown"] + a * v)))
    assert out[0]["score"] == pytest.approx(want, rel=1e-6)
    # single token degenerates to unigram ranking
    out1 = psidx.suggest_phrase("body", "brwn", size=2)
    assert out1[0]["text"] == "brown"
    # validation
    with pytest.raises(A.QueryError):
        psidx.suggest_phrase("body", "")
    with pytest.raises(A.QueryError):
        psidx.suggest_phrase("body", "a b c d e f g h i")
    with pytest.raises(A.QueryError):
        psidx.suggest_phrase("body", "x", alpha=0.0)


# -------------------------------------------------- global agg + termvectors
def test_global_agg(index, corpus):
    """global bucket ignores the query: doc_count = whole corpus, and
    metric sub-aggs ride the one all-docs aggregation."""
    res = index.query_json({"query": {"term": {"text": "mundo"}},
                            "limit": 0, "aggs": {
        "everything": {"global": {}, "aggs": {
            "mean_idx": {"avg": {"field": "turn_idx"}},
            "n_tool": {"value_count": {"field": "tool"}}}},
        "matched": {"value_count": {"field": "turn_idx"}},
    }})
    g = res["aggs"]["everything"]
    assert g["doc_count"] == len(corpus)
    assert g["mean_idx"]["value"] == pytest.approx(
        float(corpus["turn_idx"].mean()))
    assert g["n_tool"]["value"] == int(corpus["tool"].notna().sum())
    # the sibling agg still sees only the match set
    assert res["aggs"]["matched"]["value"] < len(corpus)
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"all": {}}, "aggs": {
            "x": {"global": {}, "aggs": {"y": {"top_hits": {}}}}}})


def test_termvectors(index, corpus, oracle):
    """One doc's term vector vs a driver-side re-analysis of the same
    stored text; dfs vs the oracle's postings."""
    from sonar_tantivy_spark.analyzer import analyze_terms

    docid = 17
    got = index.termvectors(docid, "text")
    text = corpus.iloc[docid]["text"]
    toks = analyze_terms(text, "en_stem")
    want: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        want.setdefault(t, []).append(i)
    assert {r["term"]: r["positions"] for r in got} == want
    assert [r["term"] for r in got] == sorted(want)
    for r in got:
        assert r["tf"] == len(want[r["term"]])
        assert r["df"] == len(oracle.postings.get(("text", r["term"]), {}))
    with pytest.raises(KeyError):
        index.termvectors(10 ** 9, "text")


# ----------------------------------------------------------------- ids query
def test_ids_parse(index):
    n = A.parse_json({"ids": {"values": [0, 2, 2, 7]}}, index.schema)
    assert isinstance(n, A.IdsQ) and n.values == [0, 2, 7]  # deduped
    n2 = A.parse_json({"ids": [3, 1]}, index.schema)  # bare-list sugar
    assert isinstance(n2, A.IdsQ) and n2.values == [3, 1]
    # JSON numbers arrive as floats; integral floats pass
    assert A.parse_json({"ids": {"values": [4.0]}}, index.schema).values == [4]
    for bad in ([], [-1], [1.5], [True], ["7"], None):
        with pytest.raises(A.QueryError):
            A.parse_json({"ids": {"values": bad}}, index.schema)


def test_ids_semantics(small):
    """Exact hits at constant score 1.0; out-of-range ids are ES-silently
    ignored; results keep the docid tie-break order."""
    res = small.query_json(
        {"query": {"ids": {"values": [3, 0, 999_999]}}, "limit": 10})
    hits = res["docs"]
    assert [h["docid"] for h in hits] == [0, 3]
    assert all(h["score"] == 1.0 for h in hits)
    # all-out-of-range → empty, never an error (ES rule)
    assert small.query_json(
        {"query": {"ids": {"values": [10_000]}}, "limit": 10})["docs"] == []


def test_ids_multi_segment_and_bool_compose(index, corpus):
    """Global docids resolve across segment boundaries (3-segment
    fixture), and ids composes as a bool filter clause: scored term
    matches restricted to an explicit id set keep their BM25 scores."""
    want = [1, 299, 301, 599, 601, 899]  # straddles both segment seams
    res = index.query_json({"query": {"ids": {"values": want}}, "limit": 10})
    assert [h["docid"] for h in res["docs"]] == want
    # stored text of each hit matches the source row (per-turn equality)
    for h in res["docs"]:
        assert h["doc"]["text"] == [corpus.iloc[h["docid"]]["text"]]
    scored = index.query_json({"query": {"bool": {
        "must": [{"term": {"role": "user"}}],
        "filter": [{"ids": {"values": list(range(0, 900, 2))}}],
    }}, "limit": 5})["docs"]
    assert scored and all(h["docid"] % 2 == 0 for h in scored)
    assert all(h["score"] > 0.0 for h in scored)


def test_ids_cannot_resurrect_deleted(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("qs6ids")))
    idx = cat.create_index("d", [
        {"name": "body", "type": "text",
         "options": {"indexing": {"record": "position",
                                  "tokenizer": "en_stem"},
                     "stored": True}}])
    idx.add_df(spark.createDataFrame(
        [("alpha one",), ("alpha two",), ("alpha three",)], "body string"),
        order_cols=["body"])
    assert idx.delete_docs([1]) == 1
    res = idx.query_json({"query": {"ids": {"values": [0, 1, 2]}},
                          "limit": 10})
    assert [h["docid"] for h in res["docs"]] == [0, 2]


# ---------------------------------------------------------------- terms lookup
def test_terms_lookup(index, corpus):
    """ES terms lookup: the term set reads from another doc's stored
    field at query time — equal to the explicitly spelled terms query;
    missing source doc or a null path value matches nothing."""
    rows = corpus.to_dict("records")
    src = next(i for i, r in enumerate(rows) if r["tool"] is not None)
    via_lookup = index.query_json({"query": {"terms": {
        "tool": {"id": src, "path": "tool"}}}, "limit": 200})
    explicit = index.query_json({"query": {"terms": {
        "tool": [rows[src]["tool"]]}}, "limit": 200})
    got = [(h["docid"], h["score"]) for h in via_lookup["docs"]]
    assert got == [(h["docid"], h["score"]) for h in explicit["docs"]]
    assert got  # non-empty
    # missing source doc -> matches nothing
    assert index.query_json({"query": {"terms": {
        "tool": {"id": 10**6, "path": "tool"}}}, "limit": 5})["docs"] == []
    # null path value (a non-tool turn) -> matches nothing
    nul = next(i for i, r in enumerate(rows) if r["tool"] is None)
    assert index.query_json({"query": {"terms": {
        "tool": {"id": nul, "path": "tool"}}}, "limit": 5})["docs"] == []
    # composes inside bool (the resolution pass recurses)
    both = index.query_json({"query": {"bool": {
        "must": [{"term": {"text": "the"}}],
        "filter": [{"terms": {"tool": {"id": src, "path": "tool"}}}]}},
        "limit": 10})
    assert all(h["doc"]["tool"] == [rows[src]["tool"]]
               for h in both["docs"])
    # rejections: bad shape / unknown path
    with pytest.raises(A.QueryError):
        A.parse_json({"terms": {"tool": {"id": 3}}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"terms": {"tool": {"id": 3, "path": "nope"}}},
                     index.schema)
