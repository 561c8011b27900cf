"""minimum_should_match on bool queries (round 5).

The toshi BoolQuery DSL carries ``minimum_should_match``; the reference
binary deserializes it with the query (src-rust/search.rs:51 via
toshi-types).  Semantics pinned here are the ES/Lucene contract:

  * a doc matches only if >= m SHOULD clauses match;
  * with must clauses present, m=0 keeps shoulds purely optional
    (Lucene default) — m>0 makes m of them mandatory-as-a-group;
  * no should clauses → the parameter is ignored (ES rule);
  * scoring is unchanged: every matching clause contributes
    (clauses beyond the m-th still add score).

Covered paths: the single-scan bool-of-terms fast path, the general
join path (phrase shoulds force it), the WAND bound (pruned parity +
the can't-reach-m absence proof), and the JSON wire shape."""

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
    base = str(tmp_path_factory.mktemp("msm"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


def _topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


def test_parse_json_minimum_should_match(index):
    node = A.parse_json(
        {"bool": {"should": [{"term": {"text": "hello"}},
                             {"term": {"text": "world"}}],
                  "minimum_should_match": 2}}, index.schema)
    assert node.min_should == 2
    # ES rule: no shoulds → ignored
    node = A.parse_json(
        {"bool": {"must": [{"term": {"text": "hello"}}],
                  "minimum_should_match": 3}}, index.schema)
    assert node.min_should == 0
    with pytest.raises(A.QueryError):
        A.parse_json({"bool": {"should": [{"term": {"text": "a"}}],
                               "minimum_should_match": -1}}, index.schema)


def test_msm_semantics_small(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path))
    schema = [{"name": "body", "type": "text",
               "options": {"indexing": {"record": "position",
                                        "tokenizer": "en_stem"},
                           "stored": True}}]
    idx = cat.create_index("m", schema)
    idx.add_df(spark.createDataFrame(
        [("alpha",), ("alpha beta",), ("alpha beta gamma",),
         ("beta gamma",)], "body string"), order_cols=["body"])

    def bodies(q):
        res = idx.query_json({"query": q, "limit": 10})
        return sorted(h["doc"]["body"][0] for h in res["docs"])

    sh = [{"term": {"body": "alpha"}}, {"term": {"body": "beta"}},
          {"term": {"body": "gamma"}}]
    assert bodies({"bool": {"should": sh}}) == [
        "alpha", "alpha beta", "alpha beta gamma", "beta gamma"]
    assert bodies({"bool": {"should": sh, "minimum_should_match": 2}}) == [
        "alpha beta", "alpha beta gamma", "beta gamma"]
    assert bodies({"bool": {"should": sh, "minimum_should_match": 3}}) == [
        "alpha beta gamma"]
    # m greater than the clause count matches nothing
    assert bodies({"bool": {"should": sh, "minimum_should_match": 4}}) == []
    # with a must: m applies to the shoulds only
    assert bodies({"bool": {"must": [{"term": {"body": "beta"}}],
                            "should": [{"term": {"body": "alpha"}},
                                       {"term": {"body": "gamma"}}],
                            "minimum_should_match": 1}}) == [
        "alpha beta", "alpha beta gamma", "beta gamma"]
    assert bodies({"bool": {"must": [{"term": {"body": "beta"}}],
                            "should": [{"term": {"body": "alpha"}},
                                       {"term": {"body": "gamma"}}],
                            "minimum_should_match": 2}}) == [
        "alpha beta gamma"]


def test_msm_scoring_unchanged_for_survivors(spark, tmp_path):
    """msm filters the match set but never rescales scores: survivors
    score identically with and without the constraint."""
    cat = IndexCatalog(spark, str(tmp_path))
    schema = [{"name": "body", "type": "text",
               "options": {"indexing": {"record": "position",
                                        "tokenizer": "en_stem"},
                           "stored": True}}]
    idx = cat.create_index("sc", schema)
    idx.add_df(spark.createDataFrame(
        [("alpha beta",), ("alpha",), ("beta",), ("alpha beta gamma",)],
        "body string"), order_cols=["body"])
    sh = [{"term": {"body": "alpha"}}, {"term": {"body": "beta"}}]
    base = {h["doc"]["body"][0]: h["score"] for h in idx.query_json(
        {"query": {"bool": {"should": sh}}, "limit": 10})["docs"]}
    msm2 = {h["doc"]["body"][0]: h["score"] for h in idx.query_json(
        {"query": {"bool": {"should": sh, "minimum_should_match": 2}},
         "limit": 10})["docs"]}
    assert set(msm2) == {"alpha beta", "alpha beta gamma"}
    for b, s in msm2.items():
        assert s == base[b]


PARITY = [
    # fast path (all-terms)
    {"bool": {"should": [{"term": {"text": "hello"}},
                         {"term": {"text": "world"}},
                         {"term": {"text": "needle"}}],
              "minimum_should_match": 2}},
    # fast path with must + msm
    {"bool": {"must": [{"term": {"role": "user"}}],
              "should": [{"term": {"text": "hello"}},
                         {"term": {"text": "world"}}],
              "minimum_should_match": 1}},
    # general path (phrase should forces the join plan)
    {"bool": {"should": [{"phrase": {"text": ["hello", "world"]}},
                         {"term": {"text": "needle"}},
                         {"term": {"text": "quick"}}],
              "minimum_should_match": 2}},
    # general path with must
    {"bool": {"must": [{"term": {"text": "the"}}],
              "should": [{"phrase": {"text": ["hello", "world"]}},
                         {"term": {"text": "quick"}}],
              "minimum_should_match": 1}},
]


@pytest.mark.parametrize("i", range(len(PARITY)))
def test_msm_oracle_parity_and_pruned(index, oracle, i):
    node = A.parse_json(PARITY[i], index.schema)
    s = index.searcher()
    want = oracle.top_k(node, 10)
    for df in (s.top_k(node, limit=10), s.top_k_pruned(node, limit=10)):
        got = [(int(r["docid_g"]), float(r["score"])) for r in df.collect()]
        assert [d for d, _ in got] == [d for d, _ in want], i
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-12)
