"""Hierarchical FacetCollector parity — facet fields hold '/a/b' paths;
requested roots filter, counts roll up one level under roots[0], and
only the first requested root's counts return
(/root/reference/src-rust/search.rs:32-42, 89-98)."""

import pytest

from sonar_tantivy_spark import IndexCatalog

SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "cat", "type": "facet",
     "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                 "stored": True}},
    {"name": "id", "type": "text", "options": {"indexing": None, "stored": True}},
]

DOCS = [
    {"id": "0", "body": "alpha common", "cat": "/tools/search"},
    {"id": "1", "body": "beta common", "cat": "/tools/search"},
    {"id": "2", "body": "gamma common", "cat": "/tools/editor"},
    {"id": "3", "body": "delta common", "cat": "/people/dev/core"},
    {"id": "4", "body": "epsilon common", "cat": "/people/ops"},
    {"id": "5", "body": "alpha only", "cat": "/tools/search"},
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("facets")))
    i = cat.create_index("f", SCHEMA)
    i.add(DOCS)
    return i


def test_hierarchical_root_counts(idx):
    res = idx.query_json(
        {"query": {"term": {"body": "common"}},
         "facets": {"cat": ["/tools"]}})
    assert res["facets"] == {"cat": {"/tools/search": 2, "/tools/editor": 1}}


def test_deep_descendants_roll_up(idx):
    res = idx.query_json(
        {"query": {"term": {"body": "common"}},
         "facets": {"cat": ["/people"]}})
    # /people/dev/core rolls up into /people/dev at root depth + 1
    assert res["facets"] == {"cat": {"/people/dev": 1, "/people/ops": 1}}


def test_first_root_only(idx):
    # reference returns counts for the FIRST requested root only
    res = idx.query_json(
        {"query": {"term": {"body": "common"}},
         "facets": {"cat": ["/people", "/tools"]}})
    assert set(res["facets"]["cat"]) == {"/people/dev", "/people/ops"}


def test_facet_value_is_exact_term(idx):
    # facet paths index as ONE raw term: exact-path term query matches
    res = idx.query_json({"query": {"term": {"cat": "/tools/search"}}})
    assert len(res["docs"]) == 3


def test_no_roots_falls_back_to_flat_counts(idx):
    res = idx.query_json(
        {"query": {"term": {"body": "common"}}, "facets": {"cat": []}})
    assert res["facets"]["cat"]["/tools/search"] == 2
