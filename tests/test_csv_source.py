"""CSV source: batch + streaming ingest, explicit-schema typing
(date/bytes coercion), quoted-multiline values, malformed-row
dead-lettering, and end-to-end query parity with the NDJSON source."""

import base64
import csv as _csv
import json

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.sources import csvsrc, ndjson
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

ROWS = [
    {"body": "hello world first", "role": "user",
     "ts": "2026-01-01 10:00:00",
     "blob": base64.b64encode(b"\x01\x02").decode()},
    {"body": "second doc with a\nquoted newline", "role": "assistant",
     "ts": "2026-01-02 11:00:00", "blob": None},
    {"body": "third says hello again", "role": "user",
     "ts": "2026-01-03 12:00:00", "blob": None},
]

COLS = ["body", "role", "ts", "blob"]


def _write_csv(path, rows):
    with open(path, "w", newline="") as fh:
        w = _csv.DictWriter(fh, fieldnames=COLS, quoting=_csv.QUOTE_ALL)
        w.writeheader()
        for r in rows:
            w.writerow({k: ("" if r[k] is None else r[k]) for k in COLS})


def test_batch_csv_roundtrip_and_parity(spark, tmp_path):
    src = str(tmp_path / "docs.csv")
    _write_csv(src, ROWS)
    cat = IndexCatalog(spark, str(tmp_path / "cat"))
    idx = cat.create_index("cs", SCHEMA)
    df = csvsrc.read_documents(spark, src, idx.schema)
    assert [f.dataType.simpleString() for f in df.schema] == \
        ["string", "string", "timestamp", "binary"]
    idx.add_df(df, order_cols=["ts"])
    hits = idx.query("hello")
    assert len(hits) == 2
    assert any(h["doc"].get("blob") for h in hits)  # bytes survive
    # the quoted embedded newline stays one document
    multi = idx.query("quoted")
    assert len(multi) == 1 and "\n" in multi[0]["doc"]["body"][0]

    # parity with the NDJSON source over the same documents
    nd = str(tmp_path / "docs.ndjson")
    with open(nd, "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")
    ref = cat.create_index("cs_ref", SCHEMA)
    ref.add_df(ndjson.read_documents(spark, nd, ref.schema),
               order_cols=["ts"])
    a = [(h["score"], h["doc"]["body"]) for h in idx.query("hello")]
    b = [(h["score"], h["doc"]["body"]) for h in ref.query("hello")]
    assert a == b


def test_csv_dead_letter(spark, tmp_path):
    src = str(tmp_path / "bad.csv")
    with open(src, "w") as fh:
        fh.write("body,role,ts,blob\n")
        fh.write('"ok doc","user","2026-01-01 10:00:00",""\n')
        # wrong column count → corrupt record
        fh.write('"too","many","cols","here","extra"\n')
    cat = IndexCatalog(spark, str(tmp_path / "cat"))
    idx = cat.create_index("dl", SCHEMA)
    good = csvsrc.read_documents(spark, src, idx.schema).collect()
    assert len(good) == 1 and good[0]["body"] == "ok doc"
    bad = csvsrc.reject_df(spark, src, idx.schema).collect()
    assert len(bad) == 1 and "extra" in bad[0][0]


def test_streaming_csv_ingest(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    _write_csv(str(src / "part1.csv"), ROWS[:2])
    _write_csv(str(src / "part2.csv"), ROWS[2:])
    cat = IndexCatalog(spark, str(tmp_path / "cat"))
    idx = cat.create_index("st", SCHEMA)
    stream = csvsrc.stream_documents(spark, str(src), idx.schema,
                                     max_files_per_trigger=1)
    q = start_incremental_indexing(
        stream, idx, order_cols=["ts"],
        checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(idx.query("hello")) == 2
