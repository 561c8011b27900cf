"""Segment-table SCHEMA EVOLUTION across epochs (ADVICE r4, medium).

The termdict gained a ``block_mtf`` column in round 4.  Epoch parquet
is immutable, so an index built before that change that gains new
segments afterward holds mixed-schema termdict epochs; load_table's
union must tolerate the missing column (allowMissingColumns → nulls
flow into seg_max_tfs' block_mtf-is-None fallback) instead of throwing
AnalysisException on every query.

Simulated here by REWRITING the first epoch's termdict without the
block_mtf column (pre-r4 shape), then appending a second batch with
the current writer and querying across both."""

import glob
import os
import shutil

import pandas as pd
import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)


def _strip_block_mtf(spark, index_root):
    """Rewrite every termdict epoch currently on disk to the pre-r4
    schema (no block_mtf column), preserving hive partitioning."""
    stripped = 0
    for td_dir in glob.glob(os.path.join(index_root, "data", "*", "termdict")):
        df = spark.read.option("basePath", td_dir).parquet(td_dir)
        if "block_mtf" not in df.columns:
            continue
        pdf_cols = [c for c in df.columns if c != "block_mtf"]
        tmp = td_dir + ".tmp"
        (df.select(*pdf_cols).write.mode("overwrite")
         .partitionBy("segment_id").parquet(tmp))
        shutil.rmtree(td_dir)
        os.replace(tmp, td_dir)
        stripped += 1
    assert stripped >= 1, "no epoch to strip — fixture layout changed?"


@pytest.fixture(scope="module")
def mixed_index(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("schemaevo"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("evo", TRANSCRIPT_SCHEMA)
    pdf = generate_transcripts(2000)
    old, new = pdf.iloc[:1000], pdf.iloc[1000:]
    idx.add_df(spark.createDataFrame(old),
               order_cols=["conv_id", "turn_idx"], num_segments=2)
    _strip_block_mtf(spark, os.path.join(base, "evo"))
    idx.add_df(spark.createDataFrame(new),
               order_cols=["conv_id", "turn_idx"], num_segments=2)
    return cat.open("evo")


def _rows(df):
    return [(int(r["docid_g"]), round(float(r["score"]), 9))
            for r in df.collect()]


def test_mixed_epoch_query_works(mixed_index, spark):
    idx = mixed_index
    s = idx.searcher()
    td = s._table("termdict")
    assert "block_mtf" in td.columns  # union keeps the evolved schema
    node = A.parse_json({"term": {"text": "hello"}}, idx.schema)
    exact = _rows(s.top_k(node, limit=10))
    assert exact  # the query actually matches across both epochs
    # the pruned default path exercises seg_max_tfs + block metadata:
    # null block_mtf rows must degrade to segment granularity, not throw
    pruned = _rows(s.top_k_pruned(node, limit=10))
    assert pruned == exact


def test_mixed_epoch_phrase_and_count(mixed_index):
    idx = mixed_index
    s = idx.searcher()
    node = A.parse_json(
        {"phrase": {"text": {"terms": ["hello", "world"]}}}, idx.schema)
    assert _rows(s.top_k_pruned(node, limit=10)) == _rows(
        s.top_k(node, limit=10))
    n = idx.count({"term": {"text": "hello"}})
    assert n > 0
