"""ES ``pinned`` query — curated docids rank first, in list order,
above every organic hit (PinnedQueryBuilder semantics: pin score =
PINNED_BASE − rank, unknown ids silently drop, pinned docs surface even
when they do not match the organic query, organic hits never show a
pinned doc twice)."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N_TURNS = 700


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus.to_dict("records"),
                       {"text": "en_stem", "role": "raw", "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxpinned"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


def _topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


def test_parse_pinned(index):
    n = A.parse_json({"pinned": {"ids": [7, 3, 7],
                                 "organic": {"term": {"text": "hello"}}}},
                     index.schema)
    assert isinstance(n, A.PinnedQ)
    assert n.ids == [7, 3]  # deduped, order kept
    with pytest.raises(A.QueryError):
        A.parse_json({"pinned": {"ids": [],
                                 "organic": {"term": {"text": "x"}}}},
                     index.schema)
    with pytest.raises(A.QueryError):
        A.parse_json({"pinned": {"ids": [1]}}, index.schema)


def test_pins_rank_first_in_list_order(index, oracle):
    # mid-frequency Zipf vocab term: hundreds of organic hits, hundreds
    # of non-matching docs — both sides of the pin contract exercised
    organic = {"term": {"text": "wmebaba5"}}
    truth = sorted(oracle.score(A.parse_json(organic, index.schema))
                   .items(), key=lambda kv: (-round(kv[1], 7), kv[0]))
    organic_ids = [d for d, _ in truth]
    # pin two docs that do NOT match the organic query + one that does
    non_match = [d for d in range(N_TURNS) if d not in set(organic_ids)]
    pins = [non_match[5], organic_ids[3], non_match[11]]
    node = A.parse_json({"pinned": {"ids": pins, "organic": organic}},
                        index.schema)
    got = _topk(index, node, k=6)
    assert [d for d, _ in got[:3]] == pins  # list order, above organic
    assert got[0][1] > got[1][1] > got[2][1] > got[3][1]
    # organic tail follows with the pinned organic hit removed
    expect_tail = [d for d in organic_ids if d not in set(pins)][:3]
    assert [d for d, _ in got[3:]] == expect_tail


def test_dead_ids_drop_and_oracle_parity(index, oracle):
    node = A.parse_json({"pinned": {
        "ids": [N_TURNS + 100, 2, N_TURNS + 5],
        "organic": {"term": {"text": "hello"}}}}, index.schema)
    got = _topk(index, node, k=5)
    truth = sorted(oracle.score(node).items(),
                   key=lambda kv: (-round(kv[1], 7), kv[0]))[:5]
    assert [d for d, _ in got] == [d for d, _ in truth]
    assert got[0][0] == 2  # the only live pin leads


def test_pinned_composes_with_limit_zero_count(index):
    node = A.parse_json({"pinned": {
        "ids": [1], "organic": {"term": {"text": "hello"}}}},
        index.schema)
    base = A.parse_json({"term": {"text": "hello"}}, index.schema)
    n_base = len(_topk(index, base, k=N_TURNS))
    n_pinned = len(_topk(index, node, k=N_TURNS))
    # doc 1 may or may not match organically; pinned adds it exactly once
    assert n_pinned in (n_base, n_base + 1)
