"""Round-5 search-surface batch: ES ``wrapper`` query (base64 DSL
passthrough), ``random_score`` function (deterministic Knuth-mix per
seed+field — the oracle-matchable pin replacing ES's internal murmur),
and the ``min_score`` / ``track_total_hits`` search-body options.

Verified by: parse/rejection unit tests, rank+score parity against the
pure-Python oracle, bit-equivalence of a wrapper query to its decoded
form, exact-count checks for track_total_hits, and threshold-window
checks for min_score (incl. the offset interaction)."""

import base64
import json

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N_TURNS = 800
TERM = "wmebaba5"  # mid-frequency Zipf vocab term


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus.to_dict("records"),
                       {"text": "en_stem", "role": "raw", "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxopts"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


def _topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


def _truth(oracle, node, k=10):
    return sorted(oracle.score(node).items(),
                  key=lambda kv: (-round(kv[1], 7), kv[0]))[:k]


# wrapper ------------------------------------------------------------------

def _b64(q: dict) -> str:
    return base64.b64encode(json.dumps(q).encode()).decode()


def test_wrapper_decodes_to_inner_node(index):
    inner = {"bool": {"must": [{"term": {"text": TERM}}]}}
    n1 = A.parse_json({"wrapper": {"query": _b64(inner)}}, index.schema)
    n2 = A.parse_json(inner, index.schema)
    assert type(n1) is type(n2)
    # bare-string body form too
    n3 = A.parse_json({"wrapper": _b64(inner)}, index.schema)
    assert type(n3) is type(n2)


def test_wrapper_bit_identical_results(index):
    inner = {"term": {"text": TERM}}
    got_w = _topk(index, A.parse_json(
        {"wrapper": {"query": _b64(inner)}}, index.schema))
    got_d = _topk(index, A.parse_json(inner, index.schema))
    assert got_w == got_d


def test_wrapper_rejections(index):
    with pytest.raises(A.QueryError):
        A.parse_json({"wrapper": {"query": "!!!notbase64"}}, index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"wrapper": {"query": _b64(["not", "an", "obj"])}},
                     index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"wrapper": {"query": ""}}, index.schema)


# random_score -------------------------------------------------------------

def test_random_score_parse_and_rejections(index):
    n = A.parse_json({"function_score": {
        "query": {"term": {"text": TERM}},
        "functions": [{"random_score": {"field": "turn_idx", "seed": 7}}],
        "boost_mode": "replace"}}, index.schema)
    assert n.functions[0] == {"kind": "random_score", "field": "turn_idx",
                              "seed": 7}
    with pytest.raises(A.QueryError):  # field is required
        A.parse_json({"function_score": {
            "query": {"term": {"text": TERM}},
            "functions": [{"random_score": {"seed": 1}}]}}, index.schema)
    with pytest.raises(A.QueryError):  # non-numeric field
        A.parse_json({"function_score": {
            "query": {"term": {"text": TERM}},
            "functions": [{"random_score": {"field": "role"}}]}},
            index.schema)


@pytest.mark.parametrize("seed,boost_mode", [(0, "replace"), (7, "sum"),
                                             (42, "multiply")])
def test_random_score_oracle_parity(index, oracle, seed, boost_mode):
    node = A.parse_json({"function_score": {
        "query": {"term": {"text": TERM}},
        "functions": [{"random_score": {"field": "turn_idx",
                                        "seed": seed}}],
        "boost_mode": boost_mode}}, index.schema)
    got = _topk(index, node)
    truth = _truth(oracle, node)
    assert [d for d, _ in got] == [d for d, _ in truth]
    for (_, gs), (_, ts) in zip(got, truth):
        assert gs == pytest.approx(ts, rel=1e-9)


def test_random_score_deterministic_and_seed_sensitive(index):
    def run(seed):
        return _topk(index, A.parse_json({"function_score": {
            "query": {"term": {"text": TERM}},
            "functions": [{"random_score": {"field": "turn_idx",
                                            "seed": seed}}],
            "boost_mode": "replace"}}, index.schema))
    assert run(3) == run(3)            # deterministic
    assert run(3) != run(4)            # seed changes the order
    for _, s in run(3):
        assert 0.0 <= s < 1.0          # pinned range


# min_score ----------------------------------------------------------------

def test_min_score_filters_page(index, oracle):
    node = A.parse_json({"term": {"text": TERM}}, index.schema)
    truth = _truth(oracle, node, k=20)
    cut = truth[4][1] - 1e-9  # threshold keeping exactly the top 5
    res = index.query_json({"query": {"term": {"text": TERM}},
                            "limit": 20, "min_score": cut})
    kept = [h["score"] for h in res["docs"]]
    assert len(kept) == 5
    assert all(s >= cut for s in kept)


def test_min_score_before_offset_slice(index, oracle):
    node = A.parse_json({"term": {"text": TERM}}, index.schema)
    truth = _truth(oracle, node, k=20)
    cut = truth[7][1] - 1e-9  # keeps the top 8
    res = index.query_json({"query": {"term": {"text": TERM}},
                            "limit": 20, "offset": 3, "min_score": cut})
    # ES rule: threshold first, THEN from/size → hits 4..8 of the kept set
    assert len(res["docs"]) == 5
    got_ids = [h["doc"]["turn_idx"][0] for h in res["docs"]]
    assert got_ids == [oracle.docs[d]["turn_idx"]
                       for d, _ in truth[3:8]]


def test_min_score_rejects_sort_by(index):
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"term": {"text": TERM}},
                          "sort_by": "turn_idx", "min_score": 0.5})


# track_total_hits ----------------------------------------------------------

def test_track_total_hits_exact(index, oracle):
    node = A.parse_json({"term": {"text": TERM}}, index.schema)
    n_match = len(oracle.score(node))
    res = index.query_json({"query": {"term": {"text": TERM}},
                            "limit": 3, "track_total_hits": True})
    assert res["total"] == {"value": n_match, "relation": "eq"}
    assert len(res["docs"]) == 3  # the page is still the page
    res2 = index.query_json({"query": {"term": {"text": TERM}},
                             "limit": 3})
    assert "total" not in res2  # opt-in only


# --------------------------------------------------------------- post_filter
def test_post_filter_trims_hits_not_aggs(index):
    """ES faceted-navigation contract: aggs/total see the full query
    match set; hits are trimmed by the post_filter with their QUERY
    scores unchanged."""
    full = index.query_json({"query": {"term": {"text": "hello"}},
                             "limit": 100, "track_total_hits": True,
                             "aggs": {"roles": {"terms":
                                                {"field": "role"}}}})
    pf = index.query_json({"query": {"term": {"text": "hello"}},
                           "limit": 100, "track_total_hits": True,
                           "post_filter": {"term": {"role": "user"}},
                           "aggs": {"roles": {"terms":
                                              {"field": "role"}}}})
    # aggs + total identical: the filter never reached them
    assert pf["aggs"] == full["aggs"]
    assert pf["total"] == full["total"]
    # hits: exactly the query hits whose role is user, same scores
    expect = [(h["docid"], h["score"]) for h in full["docs"]
              if h["doc"]["role"] == ["user"]]
    got = [(h["docid"], h["score"]) for h in pf["docs"]]
    assert got == expect and got  # non-trivial trim
    assert len(got) < len(full["docs"])


def test_post_filter_plain_path(index):
    """Without aggs the hit side still composes as bool{must, filter}
    — equal to the explicitly spelled query, bit for bit."""
    pf = index.query_json({"query": {"term": {"text": "hello"}},
                           "post_filter": {"term": {"role": "user"}},
                           "limit": 10})
    explicit = index.query_json({"query": {"bool": {
        "must": [{"term": {"text": "hello"}}],
        "filter": [{"term": {"role": "user"}}]}}, "limit": 10})
    assert [(h["docid"], h["score"]) for h in pf["docs"]] == \
        [(h["docid"], h["score"]) for h in explicit["docs"]]


def test_post_filter_refusals(index):
    with pytest.raises(A.QueryError):
        index.query_json({"query": {"term": {"text": "hello"}},
                          "post_filter": {"term": {"role": "user"}},
                          "collapse": {"field": "conv_id"}})


# ------------------------------------------------------------------- _source
def test_source_filtering(index):
    q = {"query": {"term": {"text": "hello"}}, "limit": 3}
    full = index.query_json(q)["docs"]
    assert "text" in full[0]["doc"] and "role" in full[0]["doc"]
    off = index.query_json({**q, "_source": False})["docs"]
    assert all(h["doc"] == {} for h in off)
    assert [h["docid"] for h in off] == [h["docid"] for h in full]
    only = index.query_json({**q, "_source": ["role"]})["docs"]
    assert all(set(h["doc"]) == {"role"} for h in only)
    exc = index.query_json({**q, "_source":
                            {"excludes": ["text"]}})["docs"]
    assert all("text" not in h["doc"] and "role" in h["doc"]
               for h in exc)
    with pytest.raises(A.QueryError):
        index.query_json({**q, "_source": {"nope": []}})
    with pytest.raises(A.QueryError):
        index.query_json({**q, "_source": 7})


def test_source_false_keeps_highlight(index):
    """ES: highlight is independent of _source — fragments survive a
    _source: false request."""
    res = index.query_json({
        "query": {"term": {"text": "hello"}}, "limit": 3,
        "_source": False,
        "highlight": {"fields": {"text": {}}}})
    assert res["docs"] and all(h["doc"] == {} for h in res["docs"])
    assert any("<em>" in "".join(h.get("highlight", {}).get("text", []))
               for h in res["docs"])


# ----------------------------------------------------------- suggest envelope
def test_suggest_envelope_routes_to_suggesters(index):
    """The ES suggest block routes to the engine's term / phrase /
    completion suggesters and returns identical payloads to the direct
    API calls; a suggest-only request (no query) returns suggesters
    with zero hits."""
    env = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 1, "suggest": {
        "fix": {"text": "helo", "term": {"field": "text", "size": 3}},
        "comp": {"prefix": "hel",
                 "completion": {"field": "text", "size": 3}}}})
    assert env["suggest"]["fix"] == index.suggest("text", "helo", size=3)
    assert env["suggest"]["comp"] == \
        index.suggest_completion("text", "hel", size=3)
    assert env["docs"]  # the query still ran
    only = index.query_json({"suggest": {
        "fix": {"text": "helo", "term": {"field": "text"}}}})
    assert only["docs"] == [] and "fix" in only["suggest"]


def test_suggest_envelope_rejections(index):
    with pytest.raises(A.QueryError):  # two kinds in one block
        index.query_json({"suggest": {"x": {
            "text": "a", "term": {"field": "text"},
            "phrase": {"field": "text"}}}})
    with pytest.raises(A.QueryError):  # missing field
        index.query_json({"suggest": {"x": {"text": "a", "term": {}}}})
    with pytest.raises(A.QueryError):  # no query AND no suggest
        index.query_json({"limit": 5})
