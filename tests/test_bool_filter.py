"""Bool FILTER clauses (round 5) — the ES filter context the toshi DSL
reserves: mandatory like must, but contributing NOTHING to the score.
Compiled as left-semi joins, so filter candidates never enter the
scoring aggregation (the whole point of filter-vs-must at scale).

Pinned semantics:
  * filter-only bool → matches the intersection, constant score 0.0;
  * must + filter    → must scores, filter shrinks the set;
  * should + filter  → Lucene rule: a required clause makes shoulds
    OPTIONAL (score-only) unless minimum_should_match >= 1;
  * must_not composes as usual;
  * a filter's 0-bound is an absence proof for WAND, but a filter-only
    query is unboundable (its real matches score 0.0, which must not
    read as an absence proof — pruned parity pinned below)."""

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
    base = str(tmp_path_factory.mktemp("boolfilter"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


def test_filter_semantics_small(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path))
    schema = [{"name": "body", "type": "text",
               "options": {"indexing": {"record": "position",
                                        "tokenizer": "en_stem"},
                           "stored": True}}]
    idx = cat.create_index("f", schema)
    idx.add_df(spark.createDataFrame(
        [("alpha beta",), ("alpha",), ("beta",), ("alpha beta gamma",)],
        "body string"), order_cols=["body"])

    def hits(q):
        res = idx.query_json({"query": q, "limit": 10})
        return {h["doc"]["body"][0]: h["score"] for h in res["docs"]}

    # filter-only: intersection, score 0.0
    got = hits({"bool": {"filter": [{"term": {"body": "alpha"}},
                                    {"term": {"body": "beta"}}]}})
    assert set(got) == {"alpha beta", "alpha beta gamma"}
    assert all(s == 0.0 for s in got.values())
    # must scores + filter shrinks; score equals the bare-must score
    base = hits({"term": {"body": "alpha"}})
    got = hits({"bool": {"must": [{"term": {"body": "alpha"}}],
                         "filter": [{"term": {"body": "gamma"}}]}})
    assert set(got) == {"alpha beta gamma"}
    assert got["alpha beta gamma"] == base["alpha beta gamma"]
    # should + filter: shoulds optional (Lucene), score-only
    got = hits({"bool": {"filter": [{"term": {"body": "beta"}}],
                         "should": [{"term": {"body": "gamma"}}]}})
    assert set(got) == {"alpha beta", "beta", "alpha beta gamma"}
    assert got["beta"] == 0.0 and got["alpha beta"] == 0.0
    assert got["alpha beta gamma"] > 0.0
    # ... unless minimum_should_match forces them
    got = hits({"bool": {"filter": [{"term": {"body": "beta"}}],
                         "should": [{"term": {"body": "gamma"}}],
                         "minimum_should_match": 1}})
    assert set(got) == {"alpha beta gamma"}
    # must_not composes
    got = hits({"bool": {"filter": [{"term": {"body": "alpha"}}],
                         "must_not": [{"term": {"body": "gamma"}}]}})
    assert set(got) == {"alpha beta", "alpha"}
    # zero-df filter empties the match set
    assert hits({"bool": {"must": [{"term": {"body": "alpha"}}],
                          "filter": [{"term": {"body": "zzz"}}]}}) == {}


PARITY = [
    {"bool": {"must": [{"term": {"text": "hello"}}],
              "filter": [{"term": {"role": "user"}}]}},
    {"bool": {"filter": [{"term": {"text": "hello"}},
                         {"term": {"role": "user"}}]}},
    {"bool": {"filter": [{"term": {"role": "assistant"}}],
              "should": [{"term": {"text": "hello"}},
                         {"term": {"text": "world"}}]}},
    {"bool": {"filter": [{"term": {"role": "assistant"}}],
              "should": [{"term": {"text": "hello"}},
                         {"term": {"text": "world"}}],
              "minimum_should_match": 1}},
    {"bool": {"must": [{"term": {"text": "the"}}],
              "filter": [{"range": {"turn_idx": {"gte": 0, "lte": 4}}}],
              "must_not": [{"term": {"text": "needle"}}]}},
]


@pytest.mark.parametrize("i", range(len(PARITY)))
def test_filter_oracle_parity_and_pruned(index, oracle, i):
    node = A.parse_json(PARITY[i], index.schema)
    s = index.searcher()
    want = oracle.top_k(node, 10)
    for df in (s.top_k(node, limit=10), s.top_k_pruned(node, limit=10)):
        got = [(int(r["docid_g"]), float(r["score"])) for r in df.collect()]
        assert [d for d, _ in got] == [d for d, _ in want], i
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-12)


def test_filter_only_not_pruned_to_empty(index):
    """Score-0 matches must survive top_k_pruned (a 0.0 'bound' here is
    not an absence proof)."""
    node = A.parse_json(
        {"bool": {"filter": [{"term": {"text": "hello"}}]}}, index.schema)
    s = index.searcher()
    exact = [int(r["docid_g"]) for r in s.top_k(node, limit=10).collect()]
    pruned = [int(r["docid_g"])
              for r in s.top_k_pruned(node, limit=10).collect()]
    assert exact and pruned == exact


def test_filter_count(index):
    n_must = index.count({"bool": {"must": [{"term": {"text": "hello"}},
                                            {"term": {"role": "user"}}]}})
    n_filt = index.count({"bool": {"must": [{"term": {"text": "hello"}}],
                                   "filter": [{"term": {"role": "user"}}]}})
    assert n_must == n_filt > 0
