"""record: basic|freq|position degradation (fixtures.js:22 / tantivy
IndexRecordOption): 'freq' drops the positions column, 'basic' drops tf
too, doc lengths stay exact via the carried dl, and phrase queries over
a non-position field error at parse time."""

import pytest
from pyspark.sql import functions as F

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A

SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "summary", "type": "text",
     "options": {"indexing": {"record": "freq", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "tag", "type": "text",
     "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                 "stored": True}},
    {"name": "id", "type": "text", "options": {"indexing": None, "stored": True}},
]

DOCS = [
    {"id": "0", "body": "alpha beta alpha", "summary": "fast fast slow", "tag": "x"},
    {"id": "1", "body": "beta gamma", "summary": "fast slow slow", "tag": "y"},
    {"id": "2", "body": "alpha beta gamma delta", "summary": "slow slow", "tag": "x"},
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("rec")))
    i = cat.create_index("r", SCHEMA)
    i.add(DOCS)
    return i


def _postings(idx, field):
    s = idx.searcher()
    return s._table("postings").filter(F.col("field") == field).collect()


def test_freq_field_drops_positions_keeps_tf(idx):
    rows = _postings(idx, "summary")
    assert rows
    assert all(r["positions"] is None for r in rows)
    tf = {(r["docid"], r["term"]): r["tf"] for r in rows}
    assert tf[(0, "fast")] == 2 and tf[(2, "slow")] == 2


def test_basic_field_drops_tf_too(idx):
    rows = _postings(idx, "tag")
    assert rows
    assert all(r["positions"] is None and r["tf"] is None for r in rows)


def test_position_field_keeps_everything(idx):
    rows = _postings(idx, "body")
    assert all(r["positions"] is not None and r["tf"] is not None for r in rows)


def test_doclens_exact_for_all_granularities(idx):
    s = idx.searcher()
    lens = {(r["field"], r["docid"]): r["len"]
            for r in s._table("doclens").collect()}
    assert lens[("body", 0)] == 3 and lens[("body", 2)] == 4
    assert lens[("summary", 0)] == 3 and lens[("summary", 2)] == 2
    assert lens[("tag", 0)] == 1


def test_freq_field_scores_with_tf(idx):
    # equal doc lengths (3 tokens each), doc0 has fast x2 vs doc1 x1:
    # tf must drive the ranking, so the stored tf is really being used
    hits = idx.query_json({"query": {"term": {"summary": "fast"}}})["docs"]
    ids = [h["doc"]["id"][0] for h in hits]
    assert ids[0] == "0" and "1" in ids


def test_phrase_on_freq_field_errors(idx):
    with pytest.raises(A.QueryError, match="positions"):
        idx.query_json({"query": {"phrase": {"summary": {"terms": ["fast", "slow"]}}}})
    with pytest.raises(A.QueryError, match="positions"):
        A.parse_string('summary:"fast slow"', idx.schema)


def test_phrase_on_position_field_still_works(idx):
    hits = idx.query_json(
        {"query": {"phrase": {"body": {"terms": ["alpha", "beta"]}}}})["docs"]
    assert {h["doc"]["id"][0] for h in hits} == {"0", "2"}
