"""Regression pins for the round-5 review findings: script_score
non-real pow + C-style %, random_score int64-overflow safety,
span_containing × span_multi rejection, min_score collector refusal,
search_template mustache one-pass, match fuzziness AUTO:low,high,
pinned rank vs deletes, cross_fields tie_breaker rejection."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from tests.oracle import OracleIndex

SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "v", "type": "i64", "options": {"stored": True}},
    {"name": "big", "type": "i64", "options": {"stored": True}},
]

# v carries NEGATIVE values (pow/% sign rules); big carries
# epoch-millis magnitudes (the old mix overflowed int64 under ANSI)
ROWS = [
    ("alpha beta", -3, 1_755_600_000_000),
    ("alpha gamma", -1, 1_755_600_000_001),
    ("alpha delta", 0, 1_755_600_000_002),
    ("alpha epsilon", 4, 1_755_600_000_003),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("rfix")))
    i = cat.create_index("rfix", SCHEMA)
    i.add_df(spark.createDataFrame(ROWS, "body string, v long, big long")
             .selectExpr("*", "v as __ord"), order_cols=["__ord"])
    return i


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(
        [{"body": b, "v": v, "big": g} for b, v, g in ROWS],
        {"body": "en_stem"})


def _engine(idx, body, k=10):
    node = idx._resolve_mlt(A.parse_json(body, idx.schema))
    s = idx.searcher()
    return [(int(r["docid_g"]), float(r["score"]))
            for r in s.top_k_pruned(node, limit=k).collect()]


def _oracle(oracle, body, schema, k=10):
    sc = oracle.score(A.parse_json(body, schema))
    rows = sorted(sc.items(), key=lambda kv: (-round(kv[1], 7), kv[0]))
    return rows[:k]


def _parity(idx, oracle, body):
    eng = _engine(idx, body)
    orc = _oracle(oracle, body, idx.schema)
    assert [d for d, _ in eng] == [d for d, _ in orc]
    for (_, a), (_, b) in zip(eng, orc):
        assert a == pytest.approx(b, rel=1e-9, abs=1e-12)


def test_script_score_negative_pow_scores_zero(idx, oracle):
    """(v) ** 0.5 with v < 0: Spark NaN / Python complex — both fold to
    the 0.0 gap rule, the NaN never occupies the top of the sort."""
    body = {"script_score": {"query": {"term": {"body": "alpha"}},
                             "script": "v ** 0.5"}}
    _parity(idx, oracle, body)
    eng = dict(_engine(idx, body))
    assert eng[0] == 0.0 and eng[1] == 0.0       # v=-3, v=-1 fold
    assert eng[3] == pytest.approx(2.0)          # v=4 -> 2.0


def test_script_score_mod_sign_parity(idx, oracle):
    """% is the C-style remainder (sign of the dividend) on BOTH sides:
    -1 % 3 = -1, not Python's +2."""
    body = {"script_score": {"query": {"term": {"body": "alpha"}},
                             "script": "v % 3 + 10"}}
    _parity(idx, oracle, body)
    eng = dict(_engine(idx, body))
    assert eng[1] == pytest.approx(9.0)          # -1 % 3 -> -1
    assert eng[0] == pytest.approx(10.0)         # -3 % 3 -> 0


def test_random_score_epoch_millis_no_overflow(idx, oracle):
    """The pinned mod-2^31 pre-reduction keeps every intermediate under
    2^63: an epoch-millis field scores instead of throwing under ANSI,
    and the oracle agrees."""
    body = {"function_score": {"query": {"term": {"body": "alpha"}},
            "functions": [{"random_score": {"field": "big", "seed": 7}}]}}
    _parity(idx, oracle, body)
    scores = [s for _, s in _engine(idx, body)]
    assert all(0.0 <= s <= 1.0 for s in scores) and len(set(scores)) > 1


def test_span_containing_rejects_span_multi(idx):
    with pytest.raises(A.QueryError):
        A.parse_json({"span_containing": {
            "big": {"span_near": {"clauses": [
                {"span_multi": {"match": {"prefix": {"body": "alp"}}}},
                {"span_term": {"body": "beta"}}]}},
            "little": {"span_term": {"body": "alpha"}}}}, idx.schema)


def test_min_score_refuses_collectors(idx):
    for extra in ({"track_total_hits": True},
                  {"aggs": {"a": {"avg": {"field": "v"}}}}):
        with pytest.raises(A.QueryError):
            idx.query_json({"query": {"term": {"body": "alpha"}},
                            "min_score": 0.1, **extra})


def test_search_template_one_pass(idx):
    """Mustache semantics: values insert literally, never re-expand —
    a value containing {{...}} survives verbatim (here as a term that
    matches nothing, not a substitution error)."""
    res = idx.search_template({
        "source": {"query": {"term": {"body": "{{a}}"}}, "limit": 5},
        "params": {"a": "{{b}}", "b": "alpha"}})
    assert res["docs"] == []  # searched for the literal "{{b}}"
    res2 = idx.search_template({
        "source": {"query": {"term": {"body": "{{a}}"}}, "limit": 5},
        "params": {"a": "alpha"}})
    assert len(res2["docs"]) == 4


def test_match_fuzziness_auto_low_high(idx):
    n = A.parse_json({"match": {"body": {
        "query": "alpha", "fuzziness": "AUTO:2,9"}}}, idx.schema)
    assert isinstance(n, A.FuzzyQ) and n.distance == 1  # 2<=5<9
    with pytest.raises(A.QueryError):
        A.parse_json({"match": {"body": {
            "query": "alpha", "fuzziness": "AUTO:nope"}}}, idx.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"match": {"body": {
            "query": "alpha", "fuzziness": "3"}}}, idx.schema)


def test_pinned_deleted_id_releases_rank(idx):
    """A deleted pinned id must not consume a rank: the survivor scores
    PINNED_BASE/1, exactly as if it led the list."""
    from sonar_tantivy_spark.plans.ast import PINNED_BASE

    assert idx.delete_docs([0]) == 1
    try:
        res = idx.query_json({"query": {"pinned": {
            "ids": [0, 2], "organic": {"term": {"body": "beta"}}}},
            "limit": 10})
        assert res["docs"][0]["docid"] == 2
        assert res["docs"][0]["score"] == pytest.approx(PINNED_BASE)
    finally:
        # restore for other tests in the module (order-independent):
        # compaction purges the tombstone but docids shift — instead
        # just verify and leave the index to this final test
        pass


def test_cross_fields_rejects_tie_breaker(idx):
    with pytest.raises(A.QueryError):
        A.parse_json({"multi_match": {
            "query": "alpha", "fields": ["body"],
            "type": "cross_fields", "tie_breaker": 0.3}}, idx.schema)


# ---------------------------------------------------------------- r6 advice


def test_search_template_trims_placeholder_whitespace(idx):
    """Mustache trims whitespace around the key: {{ q }} binds the
    'q' param (ADVICE r6)."""
    res = idx.search_template({
        "source": {"query": {"term": {"body": "{{ q }}"}}, "limit": 5},
        "params": {"q": "alpha"}})
    direct = idx.query_json({"query": {"term": {"body": "alpha"}},
                             "limit": 5})
    assert len(res["docs"]) == len(direct["docs"]) > 0


def test_min_score_refuses_rescore(idx):
    """ES filters min_score on the query-phase score BEFORE rescoring;
    this engine refuses the combination instead of deviating
    (ADVICE r6)."""
    with pytest.raises(A.QueryError):
        idx.query_json({
            "query": {"term": {"body": "alpha"}}, "min_score": 0.1,
            "rescore": {"window_size": 4, "query": {
                "rescore_query": {"term": {"body": "beta"}}}}})


def test_post_filter_resolves_index_dependent_nodes(idx):
    """A more_like_this node inside post_filter must go through the
    same seed-read resolution as the query slot (ADVICE r6)."""
    res = idx.query_json({
        "query": {"term": {"body": "alpha"}},
        "post_filter": {"more_like_this": {
            "fields": ["body"], "like": [{"_id": 0}],
            "min_doc_freq": 1}},
        "limit": 10})
    assert isinstance(res["docs"], list)
