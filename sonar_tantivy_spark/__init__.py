"""sonar_tantivy_spark — a PySpark-native full-text index + BM25 query
engine with the capabilities of arso-project/sonar-tantivy, built
Spark-first (DataFrame/Catalyst, Arrow-vectorized UDFs, parquet segment
tables with an atomic manifest).

Reference (read-only, behavioral blueprint only): /root/reference.
"""

from sonar_tantivy_spark.catalog import Index, IndexCatalog
from sonar_tantivy_spark.plans.schema import IndexSchema

__all__ = ["Index", "IndexCatalog", "IndexSchema"]
__version__ = "0.1.0"
