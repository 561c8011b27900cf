"""Round-6 isolated A/B benches (guide §1: measure first, isolate).

Interleaves the ROUND-START implementation (loaded from a worktree at
the round-start commit, default /tmp/r06_before) with the current tree
for the two surfaces whose full-bench readings were ambiguous under
host weather: compact_to (merge) and percolate.  Same Spark session,
same prebuilt index/corpus, alternating A/B reps — host bursts hit
both arms.

Usage: python bench_extra.py [turns] [reps]
Prints one JSON line {"merge": {...}, "percolate": {...}}.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BEFORE_TREE = os.environ.get("R06_BEFORE_TREE", "/tmp/r06_before")


def load_from(tree: str, rel: str, name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(tree, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r06-ab")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", f"{max(8, 2 * cpus)}g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import corpus_parquet
    from sonar_tantivy_spark import IndexCatalog
    from sonar_tantivy_spark.operators import merge as merge_after
    from sonar_tantivy_spark.operators import percolate as perc_after
    from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    merge_before = load_from(
        BEFORE_TREE, "sonar_tantivy_spark/operators/merge.py", "merge_b4")
    perc_before = load_from(
        BEFORE_TREE, "sonar_tantivy_spark/operators/percolate.py", "perc_b4")

    docs = spark.read.parquet(corpus_parquet(spark, turns))
    base = tempfile.mkdtemp(prefix="stspark-ab-")
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("ab", TRANSCRIPT_SCHEMA)
    idx.add_df(docs, order_cols=["conv_id", "turn_idx"], seg_size=25000)
    src_root = idx.storage.root

    # ---- merge A/B: fresh copy of the 12-segment index per rep
    def one_merge(compact_to) -> float:
        work = tempfile.mkdtemp(prefix="stspark-ab-m-")
        shutil.rmtree(work)
        shutil.copytree(src_root, work)
        cat2 = IndexCatalog(spark, os.path.dirname(work))
        idx2 = cat2.open(os.path.basename(work))
        t0 = time.time()
        compact_to(idx2, 8)
        wall = time.time() - t0
        shutil.rmtree(work, ignore_errors=True)
        return round(wall, 2)

    merge_walls = {"before": [], "after": []}
    one_merge(merge_after.compact_to)  # warmup (JIT/page cache)
    for _ in range(reps):
        merge_walls["before"].append(one_merge(merge_before.compact_to))
        merge_walls["after"].append(one_merge(merge_after.compact_to))

    # ---- percolate A/B: same 8 saved queries as bench.py
    for pname, pq in {
        "alert_hello": {"term": {"text": "hello"}},
        "alert_phrase": '"hello world"~2',
        "alert_bool": {"bool": {"must": [{"term": {"text": "world"}}],
                                "must_not": [{"term": {"text": "mundo"}}]}},
        "alert_prefix": "hell*",
        "alert_terms": {"terms": {"text": ["needle", "mundo"]}},
        "alert_span": {"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_or": {"clauses": [{"span_term": {"text": "world"}},
                                     {"span_term": {"text": "mundo"}}]}}],
            "slop": 2}},
        "alert_tool": {"exists": {"field": "tool"}},
        "alert_msm": {"bool": {"should": [{"term": {"text": "hello"}},
                                          {"term": {"text": "world"}},
                                          {"term": {"text": "needle"}}],
                               "minimum_should_match": 2}},
    }.items():
        idx.register_query(pname, pq)
    queries = {n: idx._parse_any(q)
               for n, q in idx.registered_queries().items()}

    def one_perc(percolate_df) -> tuple[float, int]:
        t0 = time.time()
        n = percolate_df(docs, idx.schema, queries,
                         keep_cols=["conv_id"]).count()
        return round(time.time() - t0, 2), int(n)

    perc_walls = {"before": [], "after": []}
    one_perc(perc_after.percolate_df)  # warmup
    alerts = set()
    for _ in range(reps):
        w, n = one_perc(perc_before.percolate_df)
        perc_walls["before"].append(w)
        alerts.add(n)
        w, n = one_perc(perc_after.percolate_df)
        perc_walls["after"].append(w)
        alerts.add(n)

    out = {"turns": turns, "cpus": cpus,
           "merge_wall_s": merge_walls,
           "merge_min": {k: min(v) for k, v in merge_walls.items()},
           "percolate_wall_s": perc_walls,
           "percolate_min": {k: min(v) for k, v in perc_walls.items()},
           "alert_counts_agree": len(alerts) == 1}
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
