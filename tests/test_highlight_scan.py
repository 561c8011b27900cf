"""ES ``highlight`` block (multi-fragment, custom tags), the scan_df
full-match-set export, and list_indexes."""

import pytest

from pyspark.sql import functions as F

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.operators.snippet import generate_fragments
from sonar_tantivy_spark.plans.ast import QueryError
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)

DOCS = [
    ("c1", 0, "user",
     "alpha beta gamma " * 12 + "needle in the middle " + "delta " * 12
     + "second needle appears here at the end", None),
    ("c1", 1, "assistant", "no matches in this one", None),
    ("c2", 0, "user", "needle right at the start of a short doc", None),
]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("hl")))
    idx = cat.create_index("t", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(
        DOCS, "conv_id string, turn_idx int, role string, text string, "
              "tool string"),
        order_cols=["conv_id", "turn_idx"])
    return idx


# ---------------------------------------------------------- fragments unit
def test_fragments_non_overlapping_and_ordered():
    text = DOCS[0][3]
    frags = generate_fragments(text, {"needl"}, "en_stem",
                               max_chars=40, number_of_fragments=3)
    # two needle occurrences far apart → exactly two fragments, in
    # document order, each highlighting its own occurrence once
    assert len(frags) == 2
    assert all(f.count("<em>needle</em>") == 1 for f in frags)
    # document order: first fragment from the gamma run, second from
    # the delta run
    assert "gamma" in frags[0] and "delta" in frags[1]


def test_fragments_respect_count_and_tags():
    text = DOCS[0][3]
    one = generate_fragments(text, {"needl"}, "en_stem", max_chars=40,
                             number_of_fragments=1,
                             pre_tag="<b>", post_tag="</b>")
    assert len(one) == 1 and "<b>needle</b>" in one[0]
    assert generate_fragments(text, {"zzz"}, "en_stem") == []
    assert generate_fragments(None, {"needl"}, "en_stem") == []


# -------------------------------------------------------- query_json block
def test_highlight_in_query_json(index):
    res = index.query_json({
        "query": {"term": {"text": "needle"}}, "limit": 10,
        "highlight": {"fields": {"text": {"fragment_size": 40,
                                          "number_of_fragments": 3}}}})
    hits = {h["doc"]["conv_id"][0]: h for h in res["docs"]}
    assert len(hits["c1"]["highlight"]["text"]) == 2
    assert len(hits["c2"]["highlight"]["text"]) == 1
    assert "<em>needle</em>" in hits["c2"]["highlight"]["text"][0]


def test_highlight_custom_tags_and_expansion(index):
    # prefix = an expansion clause: highlighted terms come through the
    # capped termdict read, like the snippet path
    res = index.query_json({
        "query": {"prefix": {"text": "needl"}}, "limit": 10,
        "highlight": {"fields": {"text": {}},
                      "pre_tags": ["[["], "post_tags": ["]]"]}})
    assert any("[[needle]]" in f
               for h in res["docs"]
               for f in h.get("highlight", {}).get("text", []))


def test_highlight_rejects_bad_field(index):
    with pytest.raises(QueryError):
        index.query_json({"query": {"term": {"text": "needle"}},
                          "highlight": {"fields": {"ts": {}}}})
    with pytest.raises(QueryError):
        index.query_json({"query": {"term": {"text": "needle"}},
                          "highlight": {"fields": {}}})
    # an entirely-empty highlight block is a no-op, not an error
    res = index.query_json({"query": {"term": {"text": "needle"}},
                            "highlight": {}})
    assert all("highlight" not in h for h in res["docs"])


# ----------------------------------------------------------------- scan_df
def test_scan_df_full_match_set(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("scan")))
    idx = cat.create_index("t", TRANSCRIPT_SCHEMA)
    corpus = generate_transcripts(400)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=2)
    q = {"term": {"text": "the"}}
    n = idx.count(q)
    out = idx.scan_df(q)
    assert out.count() == n > 10  # unbounded: every match, no top-k
    # scores agree with the search path on the top hits
    top = {int(r["docid_g"]): round(float(r["score"]), 6)
           for r in idx.query_df(q, limit=5).collect()}
    scanned = {int(r["docid"]): round(float(r["score"]), 6)
               for r in out.orderBy(F.desc("score"), "docid")
               .limit(5).collect()}
    assert set(top) == set(scanned)
    assert all(top[d] == scanned[d] for d in top)
    # stored-field variant carries the text column, same row count
    rich = idx.scan_df(q, with_stored=True)
    assert rich.count() == n and "text" in rich.columns


def test_list_indexes(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path))
    assert cat.list_indexes() == []
    cat.create_index("b_idx", TRANSCRIPT_SCHEMA)
    cat.create_index("a_idx", TRANSCRIPT_SCHEMA)
    assert cat.list_indexes() == ["a_idx", "b_idx"]
    cat.delete("b_idx")
    assert cat.list_indexes() == ["a_idx"]
