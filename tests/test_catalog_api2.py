"""Round-5 API-completeness surfaces: ``Index.validate`` (ES
_validate/query), ``Index.msearch`` (ES _msearch), and catalog index
aliases (ES alias semantics: repointable, no alias chains, no
collisions with real index names, dropped when their index is
deleted)."""

import pytest

from sonar_tantivy_spark import IndexCatalog

SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
]


@pytest.fixture()
def cat(spark, tmp_path):
    return IndexCatalog(spark, str(tmp_path))


def _mk(cat, name, rows):
    idx = cat.create_index(name, SCHEMA)
    idx.add(rows)
    return idx


def test_validate(cat):
    idx = _mk(cat, "v", [{"body": "alpha beta"}])
    assert idx.validate({"term": {"body": "alpha"}}) == {
        "valid": True, "error": None}
    assert idx.validate("alpha AND beta")["valid"] is True
    bad = idx.validate({"term": {"nosuch": "x"}})
    assert bad["valid"] is False and bad["error"]
    bad = idx.validate({"phrase": {"body": {"terms": ["a"], "slop": -1}}})
    assert bad["valid"] is False and "slop" in bad["error"]
    bad = idx.validate("")
    assert bad["valid"] is False


def test_msearch_matches_individual(cat):
    idx = _mk(cat, "m", [{"body": "alpha beta"}, {"body": "alpha gamma"},
                         {"body": "delta"}])
    reqs = [
        {"query": {"term": {"body": "alpha"}}, "limit": 10},
        {"query": {"term": {"body": "delta"}}, "limit": 10},
        {"query": {"term": {"body": "nosuchterm"}}, "limit": 10},
    ]
    batch = idx.msearch(reqs)
    single = [idx.query_json(r) for r in reqs]
    assert [[(h["docid"], h["score"]) for h in r["docs"]] for r in batch] \
        == [[(h["docid"], h["score"]) for h in r["docs"]] for r in single]
    assert batch[2]["docs"] == []


def test_aliases_lifecycle(cat):
    v1 = _mk(cat, "idx_v1", [{"body": "alpha one"}])
    v2 = _mk(cat, "idx_v2", [{"body": "alpha two"}, {"body": "alpha three"}])
    cat.set_alias("live", "idx_v1")
    assert cat.has("live")
    assert len(cat.open("live").query("alpha")) == 1
    # zero-downtime repoint: readers of "live" see v2 immediately
    cat.set_alias("live", "idx_v2")
    assert len(cat.open("live").query("alpha")) == 2
    # one level only: aliasing to an alias fails (target must be real)
    with pytest.raises(KeyError):
        cat.set_alias("live2", "live")
    # collision rules, both directions
    with pytest.raises(FileExistsError):
        cat.set_alias("idx_v1", "idx_v2")  # alias over a real index
    with pytest.raises(FileExistsError):
        cat.create_index("live", SCHEMA)  # index over an alias
    # deleting the target drops its aliases (ES rule)
    cat.delete("idx_v2")
    assert cat.aliases() == {}
    assert not cat.has("live")
    with pytest.raises(KeyError):
        cat.open("live")
    # unaffected index still opens by real name
    assert len(cat.open("idx_v1").query("alpha")) == 1
    v1.query("alpha")  # handle stays usable
