"""rank_feature / distance_feature queries (ES 7+) — BEYOND-REFERENCE.

rank_feature maps onto numeric STORED fields (ES uses a dedicated
rank_feature field type; the contract is identical: match every doc
with a value, score by a saturating function, compose as a cheap
should-clause relevance signal).  distance_feature adds the
recency/proximity boost (boost·pivot/(pivot+|v−origin|), dates in
epoch seconds — the same unit pin as the gauss decay function).

Verified by: parse/rejection unit tests, score parity against the
pure-Python oracle on the deterministic transcript corpus (numeric and
date variants, every function shape), hand-computed spot values, and
bool-should composition parity."""

import math

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
    return OracleIndex(corpus.to_dict("records"),
                       {"text": "en_stem", "role": "raw", "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxrankfeat"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


def _engine_topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


def _truth_topk(oracle, node, k=10):
    return sorted(oracle.score(node).items(),
                  key=lambda kv: (-round(kv[1], 7), kv[0]))[:k]


# -------------------------------------------------------------- grammar
def test_parse_rank_feature_shapes(index):
    schema = index.schema
    n = A.parse_json({"rank_feature": {
        "field": "turn_idx", "saturation": {"pivot": 3}}}, schema)
    assert isinstance(n, A.RankFeatureQ)
    assert n.fn == "saturation" and n.pivot == 3.0 and n.boost == 1.0
    n = A.parse_json({"rank_feature": {
        "field": "turn_idx", "boost": 2.5,
        "log": {"scaling_factor": 4}}}, schema)
    assert n.fn == "log" and n.scaling_factor == 4.0 and n.boost == 2.5
    n = A.parse_json({"rank_feature": {
        "field": "turn_idx",
        "sigmoid": {"pivot": 5, "exponent": 0.6}}}, schema)
    assert n.fn == "sigmoid" and n.exponent == 0.6
    n = A.parse_json({"rank_feature": {"field": "turn_idx",
                                       "linear": {}}}, schema)
    assert n.fn == "linear"
    d = A.parse_json({"distance_feature": {
        "field": "turn_idx", "origin": 4, "pivot": 2}}, schema)
    assert isinstance(d, A.DistanceFeatureQ) and not d.is_date
    d = A.parse_json({"distance_feature": {
        "field": "ts", "origin": "2024-01-01 00:10:00",
        "pivot": 600}}, schema)
    assert d.is_date


def test_parse_rank_feature_rejections(index):
    schema = index.schema
    with pytest.raises(A.QueryError):  # text field
        A.parse_json({"rank_feature": {
            "field": "text", "saturation": {"pivot": 1}}}, schema)
    with pytest.raises(A.QueryError):  # no auto-pivot
        A.parse_json({"rank_feature": {"field": "turn_idx",
                                       "saturation": {}}}, schema)
    with pytest.raises(A.QueryError):  # two functions
        A.parse_json({"rank_feature": {
            "field": "turn_idx", "saturation": {"pivot": 1},
            "log": {}}}, schema)
    with pytest.raises(A.QueryError):  # sigmoid needs both knobs
        A.parse_json({"rank_feature": {
            "field": "turn_idx", "sigmoid": {"pivot": 1}}}, schema)
    with pytest.raises(A.QueryError):  # missing origin
        A.parse_json({"distance_feature": {
            "field": "turn_idx", "pivot": 2}}, schema)
    with pytest.raises(A.QueryError):  # pivot <= 0
        A.parse_json({"distance_feature": {
            "field": "turn_idx", "origin": 0, "pivot": 0}}, schema)


# ------------------------------------------------------------ hand truth
def test_saturation_spot_value(index, corpus):
    node = A.parse_json({"rank_feature": {
        "field": "turn_idx", "boost": 2.0,
        "saturation": {"pivot": 3}}}, index.schema)
    got = dict(_engine_topk(index, node, k=N_TURNS))
    # every doc has turn_idx → full match set
    assert len(got) == len(corpus)
    d0 = corpus.sort_values(["conv_id", "turn_idx"]).iloc[0]
    assert got[0] == pytest.approx(
        2.0 * d0.turn_idx / (d0.turn_idx + 3.0))


QUERIES = {
    "saturation": {"rank_feature": {"field": "turn_idx",
                                    "saturation": {"pivot": 3}}},
    "log": {"rank_feature": {"field": "turn_idx", "boost": 1.5,
                             "log": {"scaling_factor": 2}}},
    "sigmoid": {"rank_feature": {"field": "turn_idx",
                                 "sigmoid": {"pivot": 4,
                                             "exponent": 0.7}}},
    "linear": {"rank_feature": {"field": "turn_idx", "linear": {}}},
    "distance_num": {"distance_feature": {"field": "turn_idx",
                                          "origin": 5, "pivot": 2,
                                          "boost": 3.0}},
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_rank_feature_parity(index, oracle, name):
    node = A.parse_json(QUERIES[name], index.schema)
    truth = _truth_topk(oracle, node)
    got = _engine_topk(index, node)
    assert [d for d, _ in got] == [d for d, _ in truth]
    for (gd, gs), (td, ts) in zip(got, truth):
        assert gs == pytest.approx(ts, rel=1e-9)


def test_distance_feature_date_parity(index, oracle, corpus):
    origin = str(corpus.ts.iloc[len(corpus) // 2])
    node = A.parse_json({"distance_feature": {
        "field": "ts", "origin": origin, "pivot": 3600}}, index.schema)
    truth = _truth_topk(oracle, node)
    got = _engine_topk(index, node)
    assert [d for d, _ in got] == [d for d, _ in truth]
    for (gd, gs), (td, ts) in zip(got, truth):
        assert gs == pytest.approx(ts, rel=1e-6)


def test_composes_in_bool_should(index, oracle):
    """The canonical ES pattern: bool {must: [match], should:
    [rank_feature]} — BM25 plus the feature signal, summed."""
    q = {"bool": {"must": [{"term": {"text": "hello"}}],
                  "should": [{"rank_feature": {
                      "field": "turn_idx",
                      "saturation": {"pivot": 3}}}]}}
    node = A.parse_json(q, index.schema)
    truth = _truth_topk(oracle, node)
    got = _engine_topk(index, node)
    assert [d for d, _ in got] == [d for d, _ in truth]
    for (gd, gs), (td, ts) in zip(got, truth):
        assert gs == pytest.approx(ts, abs=1e-6)
