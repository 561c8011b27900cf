"""CSV document source — flat-file ingest beside the NDJSON source.

Same contract as sources/ndjson.py over headered CSV: an EXPLICIT Spark
schema derived from the index schema (never inferSchema — at 100 TB
inference is a full extra pass and drifting types silently corrupt the
postings), `bytes` columns base64-encoded, `date` columns ISO-8601,
unknown columns dropped with the Index.add warn-and-skip contract, and
malformed rows surfaced through mode=PERMISSIVE + ``reject_df`` for
dead-lettering.  Batch and streaming:

    df = csvsrc.read_documents(spark, path, index.schema)
    index.add_df(df, order_cols=[...])

    stream = csvsrc.stream_documents(spark, path, index.schema)
    start_incremental_indexing(stream, index, ...)

CSV-specific notes: multiline quoted values are ON (documents contain
newlines), and a row with the wrong column count or an uncastable cell
lands in the reject set rather than silently nulling fields
(mode=PERMISSIVE writes the raw line to the corrupt-record column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sonar_tantivy_spark.plans.schema import IndexSchema

_CORRUPT = "_corrupt_record"

_OPTIONS = {
    "header": "true",
    "mode": "PERMISSIVE",
    "multiLine": "true",
    "escape": '"',
    "columnNameOfCorruptRecord": _CORRUPT,
}


def _csv_schema(schema: IndexSchema) -> T.StructType:
    fields = []
    for f in schema.fields:
        if f.type in ("bytes", "date"):
            st: T.DataType = T.StringType()  # base64 / ISO text; cast after
        else:
            st = f.spark_type
        fields.append(T.StructField(f.name, st, True))
    fields.append(T.StructField(_CORRUPT, T.StringType(), True))
    return T.StructType(fields)


def _coerce(df: DataFrame, schema: IndexSchema) -> DataFrame:
    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        if f.type == "date":
            c = F.to_timestamp(c)
        elif f.type == "bytes":
            c = F.unbase64(c)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def _reader(spark: SparkSession, schema: IndexSchema, streaming: bool):
    r = spark.readStream if streaming else spark.read
    r = r.schema(_csv_schema(schema))
    for k, v in _OPTIONS.items():
        r = r.option(k, v)
    return r


def read_documents(spark: SparkSession, path: str,
                   schema: IndexSchema) -> DataFrame:
    """Batch CSV → typed docs df (good rows only)."""
    raw = _reader(spark, schema, streaming=False).csv(path)
    return _coerce(raw.filter(F.col(_CORRUPT).isNull()), schema)


def reject_df(spark: SparkSession, path: str,
              schema: IndexSchema) -> DataFrame:
    """The malformed rows (for dead-lettering), verbatim.  Same
    cache-then-release workaround as ndjson.reject_df: Spark forbids
    corrupt-record-only queries on the raw scan, and the full-scan
    cache is dropped before returning (only the tiny reject set is
    localCheckpoint()ed)."""
    raw = _reader(spark, schema, streaming=False).csv(path).cache()
    try:
        return (raw.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
                .localCheckpoint(eager=True))
    finally:
        raw.unpersist()


def stream_documents(spark: SparkSession, path: str, schema: IndexSchema,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming CSV → typed docs stream (feed to
    start_incremental_indexing)."""
    reader = _reader(spark, schema, streaming=True)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    raw = reader.csv(path)
    return _coerce(raw.filter(F.col(_CORRUPT).isNull()), schema)
