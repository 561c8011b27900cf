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


# ----------------------------------------------- search_template / field_caps
def test_search_template_substitution(index):
    """Mustache-subset substitution: string params insert raw inside
    the template's own quotes, numbers as literals; the substituted
    envelope is bit-identical to the direct query_json call."""
    direct = index.query_json({"query": {"term": {"text": "hello"}},
                               "limit": 5})
    templ = index.search_template({
        "source": {"query": {"term": {"text": "{{t}}"}},
                   "limit": "{{k}}"},
        "params": {"t": "hello", "k": 5}})
    assert [(h["docid"], h["score"]) for h in templ["docs"]] == \
        [(h["docid"], h["score"]) for h in direct["docs"]]
    # string source form + escaping round-trip
    templ2 = index.search_template({
        "source": '{"query": {"term": {"text": "{{t}}"}}, "limit": 5}',
        "params": {"t": "hello"}})
    assert [(h["docid"], h["score"]) for h in templ2["docs"]] == \
        [(h["docid"], h["score"]) for h in direct["docs"]]


def test_search_template_errors(index):
    with pytest.raises(QueryError):  # unbound placeholder
        index.search_template({
            "source": {"query": {"term": {"text": "{{missing}}"}}}})
    with pytest.raises(QueryError):  # no source
        index.search_template({"params": {"q": "x"}})


def test_field_caps(index):
    caps = index.field_caps()["fields"]
    assert caps["text"]["text"] == {
        "type": "text", "searchable": True, "aggregatable": True}
    assert caps["role"]["keyword"]["searchable"] is True
    assert caps["ts"]["date"]["aggregatable"] is True
    assert caps["conv_id"]["keyword"]["searchable"] is False  # unindexed
    sub = index.field_caps(["text"])["fields"]
    assert set(sub) == {"text"}


# ------------------------------------------------------------ match fuzziness
def test_match_fuzziness_parse_and_equivalence(index):
    """match+fuzziness: AUTO ladder (stemmed-token length: <3 exact,
    3-5 one edit, >5 two) and bit-identical equivalence with the
    explicitly spelled bool-of-fuzzy."""
    from sonar_tantivy_spark.plans import ast as A

    n = A.parse_json({"match": {"text": {
        "query": "hello needle", "fuzziness": "AUTO"}}}, index.schema)
    assert isinstance(n, A.BoolQ)
    k0, k1 = n.should
    assert isinstance(k0, A.FuzzyQ) and k0.term == "hello" \
        and k0.distance == 1 and k0.transposition
    assert isinstance(k1, A.FuzzyQ) and k1.term == "needl" \
        and k1.distance == 1
    # a <3-char token stays a plain scored TermQ under AUTO
    n2 = A.parse_json({"match": {"text": {
        "query": "ab hello", "fuzziness": "AUTO"}}}, index.schema)
    assert isinstance(n2.should[0], A.TermQ)
    with pytest.raises(QueryError):
        A.parse_json({"match": {"text": {
            "query": "x", "fuzziness": 3}}}, index.schema)

    via_match = index.query_json({"query": {"match": {"text": {
        "query": "hello needle", "fuzziness": 1,
        "prefix_length": 1}}}, "limit": 10})
    explicit = index.query_json({"query": {"bool": {"should": [
        {"fuzzy": {"text": {"value": "hello", "fuzziness": 1,
                            "transpositions": True,
                            "prefix_length": 1}}},
        {"fuzzy": {"text": {"value": "needle", "fuzziness": 1,
                            "transpositions": True,
                            "prefix_length": 1}}}]}}, "limit": 10})
    assert [(h["docid"], h["score"]) for h in via_match["docs"]] == \
        [(h["docid"], h["score"]) for h in explicit["docs"]]
