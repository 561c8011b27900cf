"""Structured-Streaming incremental indexing + multimodal plumbing."""

import pytest

from pyspark.sql import functions as F

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.operators.multimodal import (
    extract_features,
    media_from_docs,
    near_dup_by_feature,
)
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from sonar_tantivy_spark.streaming.incremental import start_incremental_indexing


def test_incremental_stream_matches_batch(spark, tmp_path):
    corpus = generate_transcripts(400)
    half = len(corpus) // 2
    src = tmp_path / "stream_src"
    ckpt = str(tmp_path / "ckpt")
    sdf_all = spark.createDataFrame(corpus)

    # batch reference
    cat = IndexCatalog(spark, str(tmp_path / "idx"))
    ref = cat.create_index("batch", TRANSCRIPT_SCHEMA)
    ref.add_df(sdf_all, order_cols=["conv_id", "turn_idx"], num_segments=1)
    want = {(r["docid"], round(r["score"], 6))
            for r in ref.query_df("hello", limit=50)
            .selectExpr("docid_g as docid", "score").collect()}

    # streaming: two files arriving over time → two micro-batches
    inc = cat.create_index("inc", TRANSCRIPT_SCHEMA)
    spark.createDataFrame(corpus.iloc[:half]).coalesce(1).write.mode(
        "overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema(sdf_all.schema).option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = start_incremental_indexing(
        stream, inc, order_cols=["conv_id", "turn_idx"], checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
        assert len(inc.segment_info()) >= 1
        spark.createDataFrame(corpus.iloc[half:]).coalesce(1).write.mode(
            "append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    assert sum(s["max_doc"] for s in inc.segment_info()) == len(corpus)
    # same doc set + scores (docids differ by arrival order → compare by
    # scores joined to stored keys)
    got_rows = inc.query("hello", limit=50)
    want_rows = ref.query("hello", limit=50)
    key = lambda r: (r["doc"]["conv_id"][0], r["doc"]["turn_idx"][0])  # noqa: E731
    assert {key(r) for r in got_rows} == {key(r) for r in want_rows}
    gs = {key(r): round(r["score"], 6) for r in got_rows}
    ws = {key(r): round(r["score"], 6) for r in want_rows}
    assert gs == ws
    assert want  # batch reference non-empty


def test_multimodal_features(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"payload text {i % 5}") for i in range(50)], "doc_id long, text string")
    media = media_from_docs(docs)
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(media, dim=8, frame_stride=4)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_frames"] >= 1 and len(r["sha1"]) == 40
    # determinism: same payload → same feature
    by_text = {}
    for r in rows:
        by_text.setdefault(r["sha1"], set()).add(tuple(r["feature"]))
    assert all(len(v) == 1 for v in by_text.values())

    dups = near_dup_by_feature(feats, threshold=0.999).collect()
    # docs with identical text (i % 5) are exact feature dups
    assert len(dups) > 0
    feat_map = {r["media_id"]: tuple(r["feature"]) for r in rows}
    for d in dups:
        assert d["cos"] >= 0.999
        if feat_map[d["m1"]] == feat_map[d["m2"]]:
            assert d["cos"] == pytest.approx(1.0, abs=1e-9)


def test_multimodal_stub_gate(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = media_from_docs(docs)
    with pytest.raises(Exception, match="NotImplementedError|decoders"):
        extract_features(media, decode_stub=False).collect()


def test_multimodal_resize(spark):
    from sonar_tantivy_spark.operators.multimodal import resize_images

    docs = spark.createDataFrame(
        [(i, f"payload text {i}") for i in range(12)],
        "doc_id long, text string")
    media = media_from_docs(docs)
    out = resize_images(media, width=64, height=32).collect()
    assert len(out) == 12
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
    for r in by_kind["image"]:
        assert r["width"] == 64 and r["height"] == 32
        assert len(r["payload"]) == 64 * 32 // 64
    # non-image rows pass through untouched
    for k in ("audio", "video"):
        for r in by_kind[k]:
            assert r["width"] is None and bytes(r["payload"]).startswith(b"payload")
    # determinism: same payload + size -> same fake bytes
    again = {r["media_id"]: bytes(r["payload"])
             for r in resize_images(media, width=64, height=32).collect()}
    for r in out:
        assert bytes(r["payload"]) == again[r["media_id"]]


def test_multimodal_resize_stub_gate(spark):
    from sonar_tantivy_spark.operators.multimodal import resize_images

    docs = spark.createDataFrame([(0, "img")], "doc_id long, text string")
    media = media_from_docs(docs).filter("kind = 'image'")
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        resize_images(media, decode_stub=False).collect()


def test_incremental_auto_compact_and_replay_ledger(spark, tmp_path):
    """LogMergePolicy analog: the stream sink compacts when the manifest
    grows past the threshold, results stay identical to the batch build,
    and the retired-epochs ledger still recognizes replayed batches
    whose segments were merged away."""
    from sonar_tantivy_spark.streaming.incremental import epoch_committed

    corpus = generate_transcripts(400)
    quarters = [corpus.iloc[i::4].sort_values(["conv_id", "turn_idx"])
                for i in range(4)]
    src = tmp_path / "ac_src"
    ckpt = str(tmp_path / "ac_ckpt")
    sdf_all = spark.createDataFrame(corpus)

    cat = IndexCatalog(spark, str(tmp_path / "ac_idx"))
    ref = cat.create_index("ac_batch", TRANSCRIPT_SCHEMA)
    ref.add_df(sdf_all, order_cols=["conv_id", "turn_idx"], num_segments=1)

    inc = cat.create_index("ac_inc", TRANSCRIPT_SCHEMA)
    spark.createDataFrame(quarters[0]).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema(sdf_all.schema)
        .option("maxFilesPerTrigger", "1").parquet(str(src))
    )
    q = start_incremental_indexing(
        stream, inc, order_cols=["conv_id", "turn_idx"],
        checkpoint_dir=ckpt, auto_compact_above=2)
    try:
        q.processAllAvailable()
        for part in quarters[1:]:
            spark.createDataFrame(part).coalesce(1).write.mode(
                "append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(inc.segment_info()) <= 2  # auto-compaction kicked in
    assert sum(s["max_doc"] for s in inc.segment_info()) == len(corpus)
    # replay ledger survives compaction: every batch epoch still counts
    for b in range(4):
        assert epoch_committed(inc, f"b{b}"), b
    assert not epoch_committed(inc, "b99")

    key = lambda r: (r["doc"]["conv_id"][0], r["doc"]["turn_idx"][0])  # noqa: E731
    got = {key(r): round(r["score"], 6) for r in inc.query("hello", limit=50)}
    want = {key(r): round(r["score"], 6) for r in ref.query("hello", limit=50)}
    assert got == want and want
