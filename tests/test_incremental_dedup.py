"""Incremental (cross-snapshot) dedup semantics: a planted corpus with
duplicates on BOTH sides of the split must (a) drop exactly the new
docs that near-dup an earlier doc, keeping first occurrences, and
(b) emit NOTHING for old-side duplicate pairs — the old corpus is a
lookup table, never re-paired (the per-ingest cost contract)."""

import pytest
from pyspark.sql import functions as F

from sonar_tantivy_spark import driver_queries as dq


def _write_corpus(spark, path):
    """doc_ids 0..9 = OLD (split at 5... split = (max+1)//2).  Layout
    (12 tokens so every doc shingles):

      old:  0 unique | 1 & 2 IDENTICAL (an old-side dup pair that must
            NOT appear) | 3 unique | 4 = the boilerplate text
      new:  5 = near-dup of old 4 (one extra token) → dropped, dup_of 4
            6 unique → kept
            7 = identical to old 1 → dropped, dup_of 1
            8 = identical to new 7 (and old 1) → dropped, dup_of = 1
            9 = near-dup of new 6 → dropped, dup_of 6
    """
    t = {
        "u0": "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
        "dup12": "one two three four five six seven eight nine ten eleven twelve",
        "u3": "red orange yellow green blue indigo violet cyan magenta teal navy plum",
        "boiler": "the footer text repeated on every page with contact details terms of service",
        "u6": "spark query join filter scan merge sort hash group table column row",
    }
    rows = [
        (0, t["u0"]), (1, t["dup12"]), (2, t["dup12"]), (3, t["u3"]),
        (4, t["boiler"]),
        (5, t["boiler"] + " extra"),
        (6, t["u6"]),
        (7, t["dup12"]),
        (8, t["dup12"]),
        (9, t["u6"] + " extra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = (df.withColumn("lang", F.lit("en"))
          .withColumn("source", F.lit("web"))
          .withColumn("n_chars", F.length("text")))
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_incremental_dedup_semantics(spark, tmp_path):
    path = str(tmp_path)
    _write_corpus(spark, path)
    out = {int(r["doc_id"]): int(r["dup_of"])
           for r in dq.q_dd_incremental_dedup(spark, path).collect()}
    # old-side pair (1, 2) never surfaces — old x old is excluded
    assert 1 not in out and 2 not in out and 0 not in out
    # first occurrences kept, later dups dropped with the SMALLEST
    # verified partner as attribution
    assert out == {5: 4, 7: 1, 8: 1, 9: 6}
