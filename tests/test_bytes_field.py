"""bytes field type (SURVEY.md §1.2, tantivy schema type 'bytes'):
stored binary payloads are retrievable through the query path and never
searchable — the multimodal-column substrate."""

import pytest

from sonar_tantivy_spark import IndexCatalog

SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "payload", "type": "bytes", "options": {"stored": True}},
    {"name": "id", "type": "text", "options": {"indexing": None, "stored": True}},
]

PAYLOADS = {
    "0": b"\x89PNG\r\n\x1a\n fake-image-bytes",
    "1": b"",
    "2": bytes(range(256)),
}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("bytes")))
    i = cat.create_index("b", SCHEMA)
    i.add([
        {"id": "0", "body": "alpha doc", "payload": PAYLOADS["0"]},
        {"id": "1", "body": "beta doc", "payload": PAYLOADS["1"]},
        {"id": "2", "body": "gamma doc", "payload": PAYLOADS["2"]},
        {"id": "3", "body": "delta doc", "payload": None},
    ])
    return i


def test_bytes_roundtrip(idx):
    hits = idx.query("doc")
    got = {h["doc"]["id"][0]: h["doc"].get("payload", [None])[0] for h in hits}
    for k, want in PAYLOADS.items():
        if want == b"":
            # empty payloads round-trip as empty bytes
            assert got[k] is None or bytes(got[k]) == b""
        else:
            assert bytes(got[k]) == want


def test_bytes_absent_payload_retrievable(idx):
    hits = idx.query("delta")
    assert len(hits) == 1
    assert "payload" not in hits[0]["doc"] or hits[0]["doc"]["payload"] == [None]


def test_bytes_field_not_searchable(idx):
    # binary content never enters the postings; searching its text form
    # matches nothing
    assert idx.query("PNG") == []


def test_bytes_not_in_postings(idx):
    s = idx.searcher()
    fields = {r["field"] for r in
              s._table("postings").select("field").distinct().collect()}
    assert fields == {"body"}
