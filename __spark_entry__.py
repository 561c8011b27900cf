"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build a real inverted index over the
sf0.001 documents table with the engine's segment pipeline, then answer
a multi-term BM25 top-10 query through the full query path.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + the training-data-pipeline operators); every query has a
DuckDB-equivalent ANSI-SQL oracle except none (all are SQL-expressible).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Build an index over sf0.001 documents → BM25 top-10 'table hash'."""
    from pyspark.sql import functions as F

    from sonar_tantivy_spark import IndexCatalog

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
    base = tempfile.mkdtemp(prefix="stspark-entry-")
    cat = IndexCatalog(spark, base)
    schema = [
        {"name": "text", "type": "text",
         "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                     "stored": True}},
        {"name": "doc_id", "type": "i64", "options": {"stored": True, "fast": True}},
        {"name": "source", "type": "text",
         "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                     "stored": True}},
    ]
    idx = cat.open_or_create("documents", schema)
    if not idx.segment_info():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx.add_df(docs, order_cols=["doc_id"], num_segments=2)
    hits = idx.query_df("table hash", limit=10)
    return hits.select(
        F.col("docid_g").alias("docid"), F.round("score", 4).alias("score")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sonar_tantivy_spark import driver_queries

    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    from sonar_tantivy_spark import driver_queries

    return dict(driver_queries.oracle_sql())
