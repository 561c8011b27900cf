"""Ported reference behavioral suite — the reference's own e2e tests
re-expressed 1:1 (assertions from /root/reference/test/basic.js and
test/segments.js; see FIXTURES.md §A)."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.sources.tableio import SegmentExistsError
from tests.conftest import DOCS1, DOCS2, FIXTURE_SCHEMA


@pytest.fixture()
def catalog(spark, tmp_path):
    return IndexCatalog(spark, str(tmp_path))


def test_catalog_lifecycle(catalog):
    # test/basic.js:7-27 — create ×2, has, delete, has=false
    catalog.create_index("idx1", FIXTURE_SCHEMA)
    catalog.create_index("idx2", FIXTURE_SCHEMA)
    assert catalog.has("idx1")
    assert catalog.has("idx2")
    catalog.delete("idx1")
    assert not catalog.has("idx1")
    assert catalog.has("idx2")


def test_string_query_and_snippet(catalog):
    # test/basic.js:29-60
    idx = catalog.create_index("docs1", FIXTURE_SCHEMA)
    idx.add(DOCS1)

    res = idx.query("mundo")
    assert len(res) == 1
    assert res[0]["doc"]["id"][0] == "first2"
    assert res[0]["snippet"] is None

    res = idx.query("more", snippet_field="body")
    assert len(res) == 1
    assert res[0]["doc"]["id"][0] == "first1"
    assert res[0]["snippet"] == "hi first tell me <b>more</b>"


def test_json_bool_query(catalog):
    # test/basic.js:62-93
    idx = catalog.create_index("docs1", FIXTURE_SCHEMA)
    idx.add(DOCS1)

    res = idx.query_json(
        {"query": {"bool": {"must": [{"term": {"body": "hi"}}],
                            "must_not": [{"term": {"title": "world"}}]}},
         "limit": 10}
    )
    assert len(res["docs"]) == 1
    assert res["docs"][0]["doc"]["id"][0] == "first2"

    res = idx.query_json(
        {"query": {"bool": {"must": [{"term": {"body": "hi"}}],
                            "must_not": [{"term": {"title": "foo"}}]}},
         "limit": 10}
    )
    assert len(res["docs"]) == 2


def test_segment_union(catalog):
    # test/segments.js:7-45 — two 2-doc indexes; register index1's
    # segments into index2 → 4 hits
    i1 = catalog.create_index("seg1", FIXTURE_SCHEMA)
    i2 = catalog.create_index("seg2", FIXTURE_SCHEMA)
    i1.add(DOCS1)
    i2.add(DOCS2)

    assert sorted(h["doc"]["id"][0] for h in i1.query("hi")) == ["first1", "first2"]
    assert sorted(h["doc"]["id"][0] for h in i2.query("hi")) == ["second1", "second2"]

    infos = i1.segment_info()
    assert infos and all(i["max_doc"] == 2 for i in infos)
    i2.add_segments(infos, source=i1)

    hits = i2.query("hi")
    assert len(hits) == 4
    assert sorted(h["doc"]["id"][0] for h in hits) == [
        "first1", "first2", "second1", "second2",
    ]

    # duplicate registration rejected (index.rs:314-316)
    with pytest.raises(SegmentExistsError, match="Segment exists."):
        i2.add_segments(infos, source=i1)


def test_multi_query(catalog):
    # examples/simple.js:22 / index.rs:131-146
    ex1 = [{"id": "0", "title": "Hello, world!", "body": "hi there"},
           {"id": "1", "title": "Hello, moon!", "body": "nothing to see"}]
    ex2 = [{"id": "0", "title": "Hello, mars", "body": "hot hot hot"},
           {"id": "1", "title": "Hello, jupiter!", "body": "cold cold cold"}]
    i1 = catalog.create_index("ex1", FIXTURE_SCHEMA)
    i2 = catalog.create_index("ex2", FIXTURE_SCHEMA)
    i1.add(ex1)
    i2.add(ex2)
    res = catalog.multi_query("hello", ["ex1", "ex2"])
    assert set(res) == {"ex1", "ex2"}
    assert len(res["ex1"]) == 2 and len(res["ex2"]) == 2


def test_ram_index(catalog):
    # create_ram_index path (index.rs:112-117)
    idx = catalog.create_index("ram1", FIXTURE_SCHEMA, ram=True)
    idx.add(DOCS1)
    assert len(idx.query("hi")) == 2
    catalog.delete("ram1")
    assert not catalog.has("ram1")


def test_phrase_repeated_terms(spark, tmp_path):
    """k-term adjacency with REPEATED terms: 'hello hello' must match
    only consecutive occurrences (the same posting row participates at
    two phrase slots — the position-intersect plan must not conflate
    them)."""
    from sonar_tantivy_spark import IndexCatalog

    schema = [{"name": "body", "type": "text",
               "options": {"indexing": {"record": "position",
                                        "tokenizer": "default"},
                           "stored": True}}]
    cat = IndexCatalog(spark, str(tmp_path))
    idx = cat.create_index("rep", schema)
    idx.add([
        {"body": "say hello hello twice"},
        {"body": "hello world hello again"},   # non-consecutive
        {"body": "hello hello hello"},
        {"body": "plain hello here"},
    ])
    two = idx.query_json(
        {"query": {"phrase": {"body": {"terms": ["hello", "hello"]}}},
         "limit": 10})
    got = sorted(h["doc"]["body"][0] for h in two["docs"])
    assert got == ["hello hello hello", "say hello hello twice"]
    three = idx.query_json(
        {"query": {"phrase": {"body": {"terms": ["hello"] * 3}}},
         "limit": 10})
    assert [h["doc"]["body"][0] for h in three["docs"]] == ["hello hello hello"]


def test_ram_index_compaction_and_multibatch(catalog):
    """RAM storage through the full segment lifecycle: multiple add
    batches (one segment each), bit-identical results across a tiered
    compaction, delete cleans up."""
    from sonar_tantivy_spark.operators.merge import tiered_compact

    idx = catalog.create_index("ram2", FIXTURE_SCHEMA, ram=True)
    idx.add(DOCS1)
    idx.add(DOCS2)
    idx.add(DOCS1)
    assert len(idx.segment_info()) == 3
    before = [(h["score"], h["doc"].get("id")) for h in idx.query("hi")]
    assert before
    meta = tiered_compact(idx, max_segments=2)
    assert meta is not None and len(idx.segment_info()) == 2
    idx._searcher = None
    after = [(h["score"], h["doc"].get("id")) for h in idx.query("hi")]
    assert after == before
    catalog.delete("ram2")
    assert not catalog.has("ram2")
