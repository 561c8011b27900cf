"""Index.explain: non-executing query introspection — AST, the exact
candidate plan (pushdown visible), and the block-max per-segment bounds
with provably-empty segments called out."""

from tests.conftest import FIXTURE_SCHEMA


def test_explain_surfaces_bounds_and_plan(spark, tmp_path):
    from sonar_tantivy_spark import IndexCatalog

    cat = IndexCatalog(spark, str(tmp_path))
    idx = cat.create_index("ex", FIXTURE_SCHEMA)
    idx.add([{"title": "Hello world!", "body": "hi first tell me more"}])
    idx.add([{"title": "Ola mundo!", "body": "hi second que pasa"}])

    e = idx.explain("first")
    assert e["segments_total"] == 2 and e["boundable"]
    assert "TermQ" in e["ast"]
    assert "PushedFilters" in e["plan"]
    # 'first' exists only in segment 1: the other is provably empty
    assert len(e["provably_empty_segments"]) == 1
    empty = e["provably_empty_segments"][0]
    assert e["segment_bounds"][empty] == 0.0
    live = [b for s, b in e["segment_bounds"].items() if s != empty]
    assert live and live[0] > 0.0

    # structured entry + unboundable shape (fuzzy -> constant bound 1.0)
    e2 = idx.explain({"fuzzy": {"body": {"value": "frist", "distance": 1,
                                         "transposition": False}}})
    assert e2["boundable"] and set(e2["segment_bounds"].values()) == {1.0}

    # the explain must NOT have executed the query: it is driver-side
    # stats only, so results afterwards still come out correct
    assert len(idx.query("first")) == 1


def test_count_api(spark, tmp_path):
    """Index.count — the Count-collector analog: no top-k, no retrieve,
    zero-df short-circuits driver-side."""
    from sonar_tantivy_spark import IndexCatalog

    cat = IndexCatalog(spark, str(tmp_path))
    idx = cat.create_index("cnt", FIXTURE_SCHEMA)
    idx.add([{"title": "Hello world!", "body": "hi first tell me more"}])
    idx.add([{"title": "Ola mundo!", "body": "hi second que pasa"}])

    assert idx.count("hi") == 2            # across both segments
    assert idx.count("first") == 1         # pruned to one segment
    # zero-df: no postings scan / no scoring job (the termdict stats
    # lookup is still a small Spark collect)
    assert idx.count("zzznotaterm") == 0
    assert idx.count({"bool": {"must": [{"term": {"body": "hi"}}],
                               "must_not": [{"term": {"body": "second"}}]}}) == 1
    # counts agree with the scored path's result set size
    assert idx.count("hi") == len(idx.query("hi", limit=100))
    # boost=0 zeroes scores but not the match set: count must NOT read
    # the 0.0 bound as an absence proof and drop live segments
    assert idx.count("hi^0") == 2
    assert idx.count("first^0") == 1
