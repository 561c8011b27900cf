"""spark-submit entry point: build the index over a transcript parquet
and answer the reference query set — the cluster execution path the
engine ships with (north_rule: "run via spark-submit --py-files").

Usage (see tools/submit_demo.sh):

    cd /root/repo && python tools/make_pyfiles.py        # dist/*.zip
    spark-submit --master local[8] \\
        --py-files dist/sonar_tantivy_spark.zip \\
        tools/submit_job.py <input_parquet> <index_dir> [seg_size]

On a real cluster the only change is --master / deploy-mode: the job
itself is cluster-agnostic (no local paths inside the engine; the index
dir just needs to be shared storage).  Prints one JSON line with build
throughput + query latencies.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    inp = sys.argv[1]
    index_dir = sys.argv[2]
    seg_size = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    spark = SparkSession.builder.appName("sonar-tantivy-spark-build").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imports AFTER session start: on a cluster these resolve from the
    # --py-files zip shipped to every executor's PYTHONPATH
    from sonar_tantivy_spark import IndexCatalog
    from sonar_tantivy_spark.plans import ast as A
    from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    docs = spark.read.parquet(inp)
    n = docs.count()

    cat = IndexCatalog(spark, index_dir)
    idx = cat.open_or_create("transcripts", TRANSCRIPT_SCHEMA)
    # deterministic epoch = f(input): a re-submitted job (crash retry,
    # scheduler re-run) resumes — already-committed segments are skipped
    # by the manifest ledger instead of being double-indexed
    import hashlib
    epoch = "job" + hashlib.sha1(f"{inp}|{n}|{seg_size}".encode()).hexdigest()[:12]
    t0 = time.time()
    metas = idx.add_df(docs, order_cols=["conv_id", "turn_idx"],
                       seg_size=seg_size, epoch=epoch)
    build_wall = time.time() - t0

    lat = {}
    for name, q in {
        "term": {"term": {"text": "hello"}},
        "bool_must": "+hello +world",
        "phrase": {"phrase": {"text": {"terms": ["hello", "world"]}}},
    }.items():
        node = (A.parse_string(q, idx.schema) if isinstance(q, str)
                else A.parse_json(q, idx.schema))
        tq = time.time()
        idx.searcher().top_k(node, limit=10).collect()
        lat[name] = round(time.time() - tq, 3)

    print(json.dumps({
        "turns": n,
        "build_wall_s": round(build_wall, 2),
        "turns_per_sec": round(n / build_wall, 1) if build_wall else None,
        "segments_committed": len(metas),
        "segments_total": len(idx.segment_info()),
        "query_latency_s": lat,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
