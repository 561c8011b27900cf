"""Per-phase build profiler: where does wall time go at local[N]?

Usage: python tools/profile_build.py <cpus> [turns]
Prints one JSON line with per-phase seconds.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 300000

from bench import _cpu_sample, host_conditions  # noqa: E402

_cpu_before = _cpu_sample()

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("profile-build")
    .config("spark.sql.shuffle.partitions", str(2 * cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", f"{max(8, 2*cpus)}g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
path = os.path.join(CACHE, f"transcripts_v2_{n_turns}")
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    from sonar_tantivy_spark.sources.transcripts import generate_transcripts
    os.makedirs(CACHE, exist_ok=True)
    pdf = generate_transcripts(n_turns)
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(path)

docs_df = spark.read.parquet(path)

from sonar_tantivy_spark.operators import build as B
from sonar_tantivy_spark.sources.tableio import FsStorage
from sonar_tantivy_spark.plans.schema import IndexSchema
from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA

schema = IndexSchema.from_json(TRANSCRIPT_SCHEMA)

base = tempfile.mkdtemp(prefix="stspark-prof-")
storage = FsStorage(base, "prof")
storage.create(json.dumps(TRANSCRIPT_SCHEMA))

phases = {}
t = time.time()

epoch = "e0"
order_cols = ["conv_id", "turn_idx"]
seg_size = 100000
parallelism = spark.sparkContext.defaultParallelism

schema_cols = [f.name for f in schema.fields]
keep = [c for c in docs_df.columns if c in schema_cols or c in order_cols]
docs_df = docs_df.select(*keep)

with_id, ranked_cache, n = B._assign_docids(docs_df, order_cols, parallelism)
phases["docid_assign"] = round(time.time() - t, 2); t = time.time()

import math
num_segments = math.ceil(n / seg_size)
seg_expr = (F.col("docid_g") / F.lit(seg_size)).cast("int")
sid_expr = F.concat(F.lit(f"{epoch}-"), F.lpad(seg_expr.cast("string"), 5, "0"))
from pyspark.storagelevel import StorageLevel
docs_tbl = with_id.withColumn("segment_id", sid_expr).withColumn(
    "docid", (F.col("docid_g") % F.lit(seg_size)).cast("long")
).drop("docid_g").persist(StorageLevel.MEMORY_AND_DISK)
docs_tbl.count()
phases["docs_tbl_cache"] = round(time.time() - t, 2); t = time.time()

from sonar_tantivy_spark.functions.bm25 import fieldnorm_id_col
perdoc_parts = []
for f in schema.indexed_fields:
    if f.name not in docs_tbl.columns:
        continue
    if schema.tokenizer_for(f.name) == "raw":
        perdoc_parts.append(
            docs_tbl.where(F.col(f.name).isNotNull()).select(
                "segment_id", "docid", F.lit(f.name).alias("field"),
                F.lit(1).alias("dl"),
                F.array(F.col(f.name).cast("string")).alias("terms"),
                F.array(F.lit(1)).alias("tfs"),
                F.array(F.array(F.lit(0))).alias("poss"),
            ))
    else:
        udf = B.make_perdoc_postings_udf(schema.tokenizer_for(f.name))
        perdoc_parts.append(
            docs_tbl.select("segment_id", "docid", udf(F.col(f.name).cast("string")).alias("tk"))
            .select("segment_id", "docid", F.lit(f.name).alias("field"),
                    F.col("tk.dl").alias("dl"), F.col("tk.terms").alias("terms"),
                    F.col("tk.tfs").alias("tfs"), F.col("tk.poss").alias("poss")))
perdoc = perdoc_parts[0]
for p in perdoc_parts[1:]:
    perdoc = perdoc.unionByName(p)
perdoc = perdoc.withColumn("norm_id", fieldnorm_id_col(F.col("dl")))
postings = perdoc.select(
    "segment_id", "field", "docid", "norm_id",
    F.explode(F.arrays_zip("terms", "tfs", "poss")).alias("e"),
).select("segment_id", "field", F.col("e.terms").alias("term"), F.col("docid"),
         F.col("e.tfs").alias("tf"), F.col("e.poss").alias("positions"), "norm_id")

storage.write_table(postings.sortWithinPartitions("segment_id", "field", "term", "docid"), epoch, "postings")
phases["postings_write"] = round(time.time() - t, 2); t = time.time()

postings_r = storage.read_epoch_table(spark, epoch, "postings")
doclens = postings_r.groupBy("segment_id", "field", "docid").agg(
    F.sum("tf").cast("long").alias("len"), F.min("norm_id").alias("norm_id"))
storage.write_table(doclens.sortWithinPartitions("segment_id", "field", "docid"), epoch, "doclens")
phases["doclens_write"] = round(time.time() - t, 2); t = time.time()

termdict = postings_r.groupBy("segment_id", "field", "term").agg(
    F.count("*").cast("long").alias("df"), F.max("tf").alias("max_tf"),
    F.sum("tf").cast("long").alias("total_tf"))
storage.write_table(termdict.sortWithinPartitions("segment_id", "field", "term"), epoch, "termdict")
phases["termdict_write"] = round(time.time() - t, 2); t = time.time()

storage.write_table(docs_tbl.sortWithinPartitions("segment_id", "docid"), epoch, "docs")
phases["docs_write"] = round(time.time() - t, 2); t = time.time()

doclens_r = storage.read_epoch_table(spark, epoch, "doclens")
stats = doclens_r.groupBy("segment_id", "field").agg(
    F.sum("len").alias("total_tokens"), F.count("*").alias("docs_with_field")).collect()
phases["stats_collect"] = round(time.time() - t, 2)

phases["total"] = round(sum(phases.values()), 2)
print(json.dumps({"cpus": cpus, "turns": n_turns, "n": n, "phases": phases,
                  "host": host_conditions(_cpu_before, _cpu_sample())}))
shutil.rmtree(base, ignore_errors=True)
spark.stop()
