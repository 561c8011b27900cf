"""NDJSON source (the reference's wire format): batch and streaming
ingest paths, explicit-schema typing (date/bytes coercion), malformed-
line dead-lettering, and end-to-end query parity with dict ingestion."""

import base64
import json

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.sources import ndjson
from sonar_tantivy_spark.streaming.incremental import (
    start_incremental_indexing,
)

SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "role", "type": "text",
     "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                 "stored": True}},
    {"name": "ts", "type": "date", "options": {"stored": True, "fast": True}},
    {"name": "blob", "type": "bytes", "options": {"stored": True}},
]

DOCS = [
    {"body": "hello world first", "role": "user",
     "ts": "2026-01-01 10:00:00", "blob": base64.b64encode(b"\x01\x02").decode()},
    {"body": "second doc about sparks", "role": "assistant",
     "ts": "2026-01-02 11:00:00", "blob": None},
    {"body": "third says hello again", "role": "user",
     "ts": "2026-01-03 12:00:00", "blob": None},
]


def _write_ndjson(path, rows, junk=False):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        if junk:
            fh.write("{not json at all\n")


def test_batch_ndjson_roundtrip(spark, tmp_path):
    src = str(tmp_path / "docs.ndjson")
    _write_ndjson(src, DOCS, junk=True)
    cat = IndexCatalog(spark, str(tmp_path / "cat"))
    idx = cat.create_index("nd", SCHEMA)
    df = ndjson.read_documents(spark, src, idx.schema)
    assert [f.dataType.simpleString() for f in df.schema] == \
        ["string", "string", "timestamp", "binary"]
    idx.add_df(df, order_cols=["ts"])
    hits = idx.query("hello")
    assert len(hits) == 2
    assert hits[0]["doc"]["blob"] or hits[1]["doc"]["blob"]  # bytes survive
    # dead-letter surface: exactly the junk line
    bad = ndjson.reject_df(spark, src, idx.schema).collect()
    assert len(bad) == 1 and bad[0][0].startswith("{not json")

    # parity with dict ingestion (same docs via Index.add)
    ref = cat.create_index("nd_ref", SCHEMA)
    ref.add([{**d, "blob": base64.b64decode(d["blob"]) if d["blob"] else None}
             for d in DOCS])
    assert [(h["score"], h["doc"]["body"]) for h in hits] == \
        [(h["score"], h["doc"]["body"]) for h in ref.query("hello")]


def test_streaming_ndjson_ingest(spark, tmp_path):
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    _write_ndjson(str(src_dir / "a.ndjson"), DOCS[:2])
    cat = IndexCatalog(spark, str(tmp_path / "cat2"))
    idx = cat.create_index("nds", SCHEMA)
    stream = ndjson.stream_documents(spark, str(src_dir), idx.schema,
                                     max_files_per_trigger=1)
    q = start_incremental_indexing(
        stream, idx, order_cols=["ts"],
        checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        _write_ndjson(str(src_dir / "b.ndjson"), DOCS[2:])
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(s["max_doc"] for s in idx.segment_info()) == 3
    assert len(idx.query("hello")) == 2
