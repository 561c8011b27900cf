import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("sonar-tantivy-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


# Reference fixture docs (verbatim — /root/reference/test/lib/fixtures.js:1-13)
DOCS1 = [
    {"id": "first1", "title": "Hello world!", "body": "hi first tell me more"},
    {"id": "first2", "title": "Ola mundo!", "body": "hi first que pasa pues"},
]
DOCS2 = [
    {"id": "second1", "title": "Bonjour monde!", "body": "hi second tres bien"},
    {"id": "second2", "title": "Ciao mondo!", "body": "hi second buon giorno"},
]

# Reference fixture schema (fixtures.js:15-48)
FIXTURE_SCHEMA = [
    {"name": "title", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "id", "type": "text", "options": {"indexing": None, "stored": True}},
]
