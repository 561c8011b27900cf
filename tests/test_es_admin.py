"""ES admin-surface analogs: _analyze, _mget, completion suggestion,
and _reindex.  All BEYOND-REFERENCE conveniences over existing engine
machinery — the tests pin each one's ES-rule contract and its bounded
execution shape (never a corpus-wide job for the point lookups)."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans.ast import QueryError
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)

N_TURNS = 600


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    return IndexCatalog(spark, str(tmp_path_factory.mktemp("esadmin")))


@pytest.fixture(scope="module")
def index(spark, corpus, cat):
    idx = cat.create_index("src", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


# ------------------------------------------------------------- _analyze
def test_analyze_matches_build_analyzer(index):
    out = index.analyze("Running quickly; THE foxes_jump", field="text")
    # en_stem: split on non-alnum (underscore splits!), lower, Porter2
    assert out == [
        {"token": "run", "position": 0},
        {"token": "quick", "position": 1},
        {"token": "the", "position": 2},
        {"token": "fox", "position": 3},
        {"token": "jump", "position": 4},
    ]


def test_analyze_explicit_tokenizer_and_errors(index):
    assert index.analyze("A-B c", tokenizer="default") == [
        {"token": "a", "position": 0},
        {"token": "b", "position": 1},
        {"token": "c", "position": 2},
    ]
    raw = index.analyze("One Whole Value", tokenizer="raw")
    assert raw == [{"token": "One Whole Value", "position": 0}]
    with pytest.raises(QueryError):
        index.analyze("x", field="ts")  # not an analyzed text field
    with pytest.raises(QueryError):
        index.analyze("x", tokenizer="nope")
    with pytest.raises(QueryError):
        index.analyze("x")  # neither field nor tokenizer


# ---------------------------------------------------------------- _mget
def test_mget_order_found_missing(index, corpus):
    n = len(corpus)
    got = index.mget([5, n + 50, 0, 5])
    assert [g["docid"] for g in got] == [5, n + 50, 0, 5]
    assert [g["found"] for g in got] == [True, False, True, True]
    # stored text equals the corpus row at the same global rank
    # (docids are assigned by (conv_id, turn_idx) order == corpus order)
    recs = corpus.to_dict("records")
    assert got[2]["doc"]["text"] == [recs[0]["text"]]
    assert got[0]["doc"]["text"] == [recs[5]["text"]]
    assert got[1]["doc"] == {}


def test_mget_excludes_deleted(spark, cat, corpus):
    idx = cat.create_index("mgetdel", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus.head(50)),
               order_cols=["conv_id", "turn_idx"])
    assert idx.mget([7])[0]["found"] is True
    assert idx.delete_docs([7]) == 1
    got = idx.mget([7, 8])
    assert got[0]["found"] is False and got[1]["found"] is True


# ----------------------------------------------------------- completion
def test_suggest_completion_df_order(index, corpus):
    from collections import Counter

    from sonar_tantivy_spark.analyzer import tokenize

    # truth: per-term document frequency over the corpus
    df = Counter()
    for text in corpus["text"]:
        df.update({t for t, _ in tokenize(text, "en_stem")})
    want = sorted(((t, c) for t, c in df.items() if t.startswith("hel")),
                  key=lambda tc: (-tc[1], tc[0]))[:5]
    got = [(r["text"], r["df"]) for r in index.suggest_completion(
        "text", "hel", size=5)]
    assert got == want and len(got) >= 1
    assert index.suggest_completion("text", "") == []
    assert index.suggest_completion("text", "zzzzz") == []


# -------------------------------------------------------------- reindex
def test_reindex_full_rank_identical(spark, cat, index, corpus):
    cat.create_index("dst_full", TRANSCRIPT_SCHEMA)
    n = cat.reindex("src", "dst_full", num_segments=2)
    assert n == len(corpus)
    dst = cat.open("dst_full")
    # same corpus, same analysis → BIT-IDENTICAL hits (docids preserved
    # by the source-rank order column)
    for q, need_hits in [("hello", True), ("hello world", True),
                         ('"hello world"~2', False)]:
        a = [(h["docid"], round(h["score"], 6)) for h in index.query(q)]
        b = [(h["docid"], round(h["score"], 6)) for h in dst.query(q)]
        assert a == b
        if need_hits:
            assert len(a) > 0, q
    # the internal order column never reaches the destination row store
    docs = dst.searcher()._table("docs")
    assert "__src_ord" not in docs.columns


def test_reindex_filtered_subset(spark, cat, index, corpus):
    cat.create_index("dst_sub", TRANSCRIPT_SCHEMA)
    q = {"term": {"role": "user"}}
    n = cat.reindex("src", "dst_sub", query=q)
    assert n == index.count(q) > 0
    dst = cat.open("dst_sub")
    # every copied doc is a user turn; none match assistant
    assert dst.count({"term": {"role": "user"}}) == n
    assert dst.count({"term": {"role": "assistant"}}) == 0


def test_reindex_reanalyzes_with_dst_schema(spark, cat, index):
    # destination analyzes text WITHOUT stemming → a stemmed-only query
    # term stops matching (proof the postings were rebuilt, not copied)
    noslem = [dict(f) for f in TRANSCRIPT_SCHEMA]
    for f in noslem:
        if f["name"] == "text":
            f = dict(f)
    noslem = [
        {**f, "options": {**f["options"],
                          "indexing": {"record": "position",
                                       "tokenizer": "default"}}}
        if f["name"] == "text" else f
        for f in noslem
    ]
    cat.create_index("dst_default", noslem)
    cat.reindex("src", "dst_default")
    dst = cat.open("dst_default")
    # corpus contains 'turns' (stems to 'turn'); with en_stem the query
    # 'turns' matches via the stem, with default it must match verbatim
    src_stem = index.count({"term": {"text": "turn"}})
    if src_stem > 0:
        assert dst.count({"term": {"text": "turn"}}) < src_stem


def test_reindex_excludes_deleted(spark, cat, corpus):
    idx = cat.create_index("src_del", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus.head(60)),
               order_cols=["conv_id", "turn_idx"])
    idx.delete_docs([0, 1, 2])
    cat.create_index("dst_del", TRANSCRIPT_SCHEMA)
    n = cat.reindex("src_del", "dst_del")
    assert n == 57
    assert cat.open("dst_del").count({"all": {}}) == 57
