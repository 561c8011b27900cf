"""NDJSON document source — the reference's interchange format.

The reference ships documents as newline-delimited JSON over its RPC
pipe (rpc.js:64-81 split2 framing; add_documents handles.rs:95-105
parses one JSON doc per request).  This source reads the same shape —
one JSON object per line, keys = schema field names — straight into the
ingest pipeline, batch or streaming:

    df = ndjson.read_documents(spark, path, index.schema)
    index.add_df(df, order_cols=[...])

    stream = ndjson.stream_documents(spark, path, index.schema)
    start_incremental_indexing(stream, index, ...)

Typing: the JSON is read with an EXPLICIT Spark schema derived from the
index schema (never inferSchema — at 100 TB schema inference is a full
extra pass, and drifting inferred types silently corrupt the postings).
`bytes` fields arrive base64-encoded (JSON has no binary) and are
decoded; `date` fields accept ISO-8601 strings.  Unknown keys are
dropped with the same warn-and-skip contract as Index.add
(index.rs:178).  Malformed lines follow mode=PERMISSIVE with a
`_corrupt_record` column surfaced to the caller via `reject_df`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sonar_tantivy_spark.plans.schema import IndexSchema

_CORRUPT = "_corrupt_record"


def _json_schema(schema: IndexSchema) -> T.StructType:
    fields = []
    for f in schema.fields:
        if f.type == "bytes":
            st: T.DataType = T.StringType()  # base64 text in JSON
        elif f.type == "date":
            st = T.StringType()  # ISO-8601; cast after parse
        else:
            st = f.spark_type  # property on FieldDef
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


def read_documents(spark: SparkSession, path: str,
                   schema: IndexSchema) -> DataFrame:
    """Batch NDJSON → typed docs df (good lines only)."""
    raw = spark.read.schema(_json_schema(schema)).option(
        "mode", "PERMISSIVE").json(path)
    return _coerce(raw.filter(F.col(_CORRUPT).isNull()), schema)


def reject_df(spark: SparkSession, path: str,
              schema: IndexSchema) -> DataFrame:
    """The malformed lines (for dead-lettering), verbatim.  Spark
    forbids corrupt-record-only queries on a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the parse is cached first —
    the documented workaround.  The full-scan cache is released before
    returning: the (tiny, by assumption) reject set is eagerly
    localCheckpoint()ed so repeated dead-letter sweeps don't accumulate
    the whole parsed input in executor storage (ADVICE r2)."""
    raw = spark.read.schema(_json_schema(schema)).option(
        "mode", "PERMISSIVE").json(path).cache()
    try:
        return (raw.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
                .localCheckpoint(eager=True))
    finally:
        raw.unpersist()


def stream_documents(spark: SparkSession, path: str, schema: IndexSchema,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming NDJSON → typed docs stream (feed to
    start_incremental_indexing)."""
    reader = spark.readStream.schema(_json_schema(schema))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.json(path)
    return _coerce(raw.filter(F.col(_CORRUPT).isNull()), schema)
