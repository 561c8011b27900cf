"""Planted-corpus checks for the text-analysis operators: the stopword-
profile langid must recover planted languages, and each Gopher-style
quality rule must fire on a doc crafted to violate it."""

import pytest

from sonar_tantivy_spark import driver_queries as dq

PLANTED = [
    # (doc_id, text, expected_lang)
    (0, "the cat is on a mat and it is the best of all the mats", "en"),
    (1, "der hund ist nicht ein kleiner hund und der ist mit dem ball", "de"),
    (2, "le chat est dans les jardins une fleur pour la maison et le vent",
     "fr"),
    (3, "el gato es un animal y los perros son para el campo con una bola",
     "es"),
    (4, "il cane che corre per la strada non sono io anche come te", "it"),
    (5, "xyzzy plugh foo bar baz quux glorp fnord blip zot", "unk"),
    (6, "het huis van een man is niet dat wat ik op aan zijn voor", "nl"),
    (7, "och att det som en katt på bordet är av trä för oss med dig", "sv"),
]


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("planted"))
    rows = [(d, t, "?", "src0", len(t)) for d, t, _ in PLANTED]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.parquet(f"{base}/documents.parquet")
    return base


def test_langid_recovers_planted_languages(spark, planted_dir):
    got = {r["doc_id"]: r["lang_pred"]
           for r in dq.q_tx_langid(spark, planted_dir).collect()}
    want = {d: lang for d, _, lang in PLANTED}
    assert got == want


QUALITY_DOCS = [
    # (doc_id, text, expect_pass)
    (0, " ".join(["the", "a", "of"] + [f"word{i}" for i in range(30)]), True),
    (1, "the a of tiny doc", False),               # R1: < 20 tokens
    (2, " ".join(["the", "a"] + ["ab"] * 30), False),   # R2/R3: short+repeat
    (4, " ".join(["the", "a", "of"] + [f"word{i}" for i in range(20)]
                 + ["###"] * 10), False),          # R5: symbol ratio > 0.1
    (5, " ".join([f"word{i}" for i in range(30)]), False),  # R4: no stopwords
]


@pytest.fixture(scope="module")
def quality_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("quality"))
    rows = [(d, t, "en", "src0", len(t)) for d, t, _ in QUALITY_DOCS]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.parquet(f"{base}/documents.parquet")
    return base


def test_quality_rules_fire(spark, quality_dir):
    got = {r["doc_id"]: (r["quality"], r["gopher_pass"])
           for r in dq.q_tx_quality(spark, quality_dir).collect()}
    for d, _, expect in QUALITY_DOCS:
        assert got[d][1] == expect, (d, got[d])
    assert got[0][0] == 1.0
    assert got[1][0] < 1.0


WNN = ("the quick brown fox jumps over the lazy dog while the cat "
       "sleeps on the warm mat near the old oak door")


@pytest.fixture(scope="module")
def winnow_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("winnow"))
    shuffled = " ".join(sorted(WNN.split()))          # same bag, new order
    shared_tail = "completely different opening words here " + WNN
    rows = [(0, WNN), (1, WNN), (2, shuffled), (3, shared_tail)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(f"{base}/documents.parquet")
    return base


def test_winnow_position_sensitive_but_overlap_robust(spark, winnow_dir):
    """Winnowing separates reordered text (same bag of words -> different
    fingerprint) yet docs sharing a long substring share selected hashes
    — the two properties the bag-of-words tx_fingerprint lacks."""
    fp = {r["doc_id"]: r["winnow_fp"] for r in
          dq.QUERIES["tx_winnow_fingerprint"](spark, winnow_dir).collect()}
    bag = {r["doc_id"]: r["fingerprint"] for r in
           dq.QUERIES["tx_fingerprint"](spark, winnow_dir).collect()}
    assert fp[0] == fp[1]                 # identical docs, identical fp
    assert bag[0] == bag[2]               # bag fingerprint is order-blind
    assert fp[0] != fp[2]                 # winnowing is not

    # overlap guarantee (Schleimer et al.): doc 3 = prefix + the full
    # doc-0 text, so every doc-0 winnowing window also occurs in doc 3
    # -> the two minima sets intersect.  Recompute the selected minima
    # directly (the contract query returns only the digest).
    from pyspark.sql import Window, functions as F
    from sonar_tantivy_spark.driver_queries import WINNOW_K, WINNOW_W

    d = (spark.read.parquet(f"{winnow_dir}/documents.parquet")
         .select("doc_id", F.split("text", " ").alias("w"))
         .filter(F.size("w") >= WINNOW_K))
    grams = F.expr(
        f"transform(sequence(0, size(w) - {WINNOW_K}), "
        f"i -> concat_ws(' ', slice(w, i + 1, {WINNOW_K})))")
    sh = (d.select("doc_id", F.posexplode(grams).alias("pos", "g"))
          .select("doc_id", "pos", F.md5("g").alias("h")))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    per_doc = Window.partitionBy("doc_id")
    sel = (sh.select("doc_id", "pos", F.min("h").over(win).alias("mh"),
                     F.max("pos").over(per_doc).alias("mp"))
           .filter(F.col("pos") <= F.col("mp") - (WINNOW_W - 1)))
    minima = {did: {r["mh"] for r in sel.filter(F.col("doc_id") == did)
                    .select("mh").distinct().collect()} for did in (0, 3)}
    assert minima[0] and minima[3]
    assert minima[0] & minima[3], "shared substring must share a hash"
