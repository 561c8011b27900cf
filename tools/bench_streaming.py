"""Streaming-ingest throughput: drive the foreachBatch incremental
indexer over a file-source stream of transcript turns and report
turns/sec end-to-end (micro-batch segment builds + manifest commits +
any auto-compactions), plus a post-stream query check.

Usage: python tools/bench_streaming.py [turns] [batches]
Prints one JSON line {"stream_turns_per_sec": ..., ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from bench import _cpu_sample, host_conditions
    cpu_before = _cpu_sample()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import corpus_parquet
    from sonar_tantivy_spark import IndexCatalog
    from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    from sonar_tantivy_spark.streaming.incremental import (
        start_incremental_indexing,
    )

    corpus = corpus_parquet(spark, turns)
    base = tempfile.mkdtemp(prefix="stspark-stream-")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)
    # re-chunk the corpus into `batches` files so maxFilesPerTrigger=1
    # yields that many micro-batches
    full = spark.read.parquet(corpus)
    from pyspark.sql import functions as F
    # one pass: each chunk value lands wholly in one task, so exactly
    # `batches` files total -> maxFilesPerTrigger=1 gives that many
    # micro-batches (recursiveFileLookup ignores the partition dirs)
    (full.withColumn("__chunk", F.pmod(F.hash("conv_id"), F.lit(batches)))
     .repartition(batches, "__chunk")
     .write.mode("overwrite").partitionBy("__chunk").parquet(src))

    cat = IndexCatalog(spark, os.path.join(base, "cat"))
    idx = cat.create_index("stream", TRANSCRIPT_SCHEMA)
    stream = (spark.readStream.schema(full.schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true").parquet(src))
    t0 = time.time()
    q = start_incremental_indexing(
        stream, idx, order_cols=["conv_id", "turn_idx"],
        checkpoint_dir=ckpt, auto_compact_above=8)
    q.processAllAvailable()
    q.stop()
    wall = time.time() - t0

    n_indexed = sum(s["max_doc"] for s in idx.segment_info())
    hits = idx.query("hello", limit=10)
    out = {
        "stream_turns_per_sec": round(n_indexed / wall, 1),
        "wall_s": round(wall, 2),
        "turns": n_indexed,
        "micro_batches": batches,
        "segments_final": len(idx.segment_info()),
        "query_after_stream_hits": len(hits),
        "cpus": cpus,
    }
    assert n_indexed == turns, (n_indexed, turns)
    assert hits, "post-stream query must return hits"
    host = host_conditions(cpu_before, _cpu_sample())
    if host is not None:  # read walls against host weather (BENCH/BASELINE.md)
        out["host"] = host
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
