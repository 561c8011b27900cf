"""Oracle-parity tier (FIXTURES.md §B): the Spark engine must produce
rank-identical top-k docids and equal (1e-9) BM25 scores against an
independent pure-Python scorer over the deterministic transcript corpus,
for the reference query set Q1–Q14."""

import pandas as pd
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
    base = str(tmp_path_factory.mktemp("idx"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    sdf = spark.createDataFrame(corpus)
    # multiple segments to exercise global-stats aggregation
    idx.add_df(sdf, order_cols=["conv_id", "turn_idx"], num_segments=4)
    return idx


def _ts(i):  # corpus midpoint timestamps for Q11
    return pd.Timestamp("2026-01-01") + pd.Timedelta(hours=i)


QUERIES = {
    "q1_term": {"term": {"text": "hello"}},
    "q2_rare": {"term": {"text": "mundo"}},
    "q3_or": {"bool": {"should": [{"term": {"text": "hello"}},
                                  {"term": {"text": "world"}}]}},
    "q4_must": {"bool": {"must": [{"term": {"text": "hello"}},
                                  {"term": {"text": "world"}}]}},
    "q5_phrase": {"phrase": {"text": {"terms": ["hello", "world"]}}},
    "q6_must_not": {"bool": {"must": [{"term": {"text": "hello"}}],
                             "must_not": [{"term": {"text": "world"}}]}},
    "q7_stem": {"term": {"text": "stems"}},
    "q8_skew": {"term": {"text": "the"}},
    "q9_role": {"bool": {"must": [{"term": {"text": "needle"}},
                                  {"term": {"role": "tool"}}]}},
    "q10_tool": {"bool": {"must": [{"term": {"text": "hello"}},
                                   {"term": {"tool": "python"}}]}},
    "q12_fuzzy": {"fuzzy": {"text": {"value": "helo", "distance": 1}}},
    "q12b_fuzzy_transpose": {"fuzzy": {"text": {"value": "hlelo", "distance": 1,
                                                "transposition": True}}},
    "q13_regex": {"regex": {"text": "stem.*"}},
}


def _engine_topk(index, node, k=10, sort_by=None):
    s = index.searcher()
    rows = s.top_k(node, limit=k, sort_by=sort_by).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(index, oracle, name):
    q = QUERIES[name]
    node = A.parse_json(q, index.schema)
    got = _engine_topk(index, node)
    want = oracle.top_k(node, 10)
    assert [d for d, _ in got] == [d for d, _ in want], (name, got, want)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), (name, got, want)


def test_fuzzy_transposition_differs(index, oracle):
    """'hlelo' needs a transposition to reach 'hello': distance-1 fuzzy
    matches WITH the flag and not without (search.rs:48 semantics)."""
    with_t = A.parse_json(
        {"fuzzy": {"text": {"value": "hlelo", "distance": 1,
                            "transposition": True}}}, index.schema)
    without = A.parse_json(
        {"fuzzy": {"text": {"value": "hlelo", "distance": 1}}}, index.schema)
    got_t = _engine_topk(index, with_t)
    got_p = _engine_topk(index, without)
    assert got_t, "transposition fuzzy should match 'hello' turns"
    assert got_t != got_p
    assert got_p == oracle.top_k(without, 10)


def test_q11_ts_range(index, oracle):
    node = A.BoolQ(
        must=[A.TermQ("text", "hello"),
              A.RangeQ("ts", gte="2026-01-02 00:00:00", lte="2026-01-05 00:00:00")]
    )
    got = _engine_topk(index, node)
    onode = A.BoolQ(
        must=[A.TermQ("text", "hello"),
              A.RangeQ("ts", gte=_ts(24), lte=_ts(96))]
    )
    want = oracle.top_k(onode, 10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_q14_all_sorted_by_ts(index, oracle):
    node = A.AllQ()
    got = _engine_topk(index, node, k=10, sort_by="ts")
    want = oracle.top_k(node, 10, sort_by="ts")
    assert [d for d, _ in got] == [d for d, _ in want]


def test_string_grammar_matches_json(index, oracle):
    # Q3 via the default string grammar: bare terms OR'd over default fields
    node = A.parse_string("hello world", index.schema)
    got = _engine_topk(index, node)
    assert got, "string grammar produced no hits"
    # must contain the same docids as the explicit JSON OR on text: the
    # role/tool raw fields cannot match these terms, so results align
    onode = A.parse_json(QUERIES["q3_or"], index.schema)
    want = oracle.top_k(onode, 10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_per_turn_text_equality(index, corpus):
    """BASELINE.json:15 invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — the docs table round-trips the corpus."""
    s = index.searcher()
    docs = s._table("docs")
    got = (
        docs.join(
            s.spark.createDataFrame(
                [(sid, b) for sid, b in s.bases.items()],
                "segment_id string, base long",
            ),
            on="segment_id",
        )
        .selectExpr("base + docid as docid_g", "conv_id", "turn_idx", "text")
        .orderBy("docid_g")
        .collect()
    )
    assert len(got) == len(corpus)
    expected = corpus.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for i, r in enumerate(got):
        assert r["docid_g"] == i
        assert r["conv_id"] == expected["conv_id"][i]
        assert int(r["turn_idx"]) == int(expected["turn_idx"][i])
        assert r["text"] == expected["text"][i]
