"""Round-6 query-path A/B: same session, same on-disk index, the
ROUND-START Searcher (loaded from a worktree at the round-start
commit) vs the optimized one, interleaved reps — separates engine
regressions from boot-to-boot substrate swing for the query classes
the round did NOT touch.

Usage: python tools/query_ab_r06.py [turns] [reps]
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
BEFORE_TREE = os.environ.get("R06_BEFORE_TREE", "/tmp/r06_before")


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r06-query-ab")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", f"{max(8, 2 * cpus)}g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import corpus_parquet
    from sonar_tantivy_spark import IndexCatalog
    from sonar_tantivy_spark.operators.merge import compact_to
    from sonar_tantivy_spark.plans import ast as A
    from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    spec = importlib.util.spec_from_file_location(
        "search_b4",
        os.path.join(BEFORE_TREE, "sonar_tantivy_spark/operators/search.py"))
    search_b4 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(search_b4)

    docs = spark.read.parquet(corpus_parquet(spark, turns))
    base = tempfile.mkdtemp(prefix="stspark-qab-")
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("qab", TRANSCRIPT_SCHEMA)
    idx.add_df(docs, order_cols=["conv_id", "turn_idx"], seg_size=25000)
    compact_to(idx, 8)

    queries = {
        "q1_term": {"term": {"text": "hello"}},
        "q18_slop_unordered": {"phrase": {"text": {
            "terms": ["world", "hello"], "slop": 2, "in_order": False}}},
        "q19_msm": {"bool": {"should": [{"term": {"text": "hello"}},
                                        {"term": {"text": "world"}},
                                        {"term": {"text": "mundo"}}],
                             "minimum_should_match": 2}},
        "q23_dismax": {"dis_max": {
            "queries": [{"term": {"text": "hello"}},
                        {"term": {"text": "world"}}], "tie_breaker": 0.3}},
        "q32_span_near": {"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_or": {"clauses": [{"span_term": {"text": "world"}},
                                     {"span_term": {"text": "mundo"}}]}}],
            "slop": 2, "in_order": True}},
        "q34_span_not": {"span_not": {
            "include": {"span_term": {"text": "hello"}},
            "exclude": {"span_term": {"text": "world"}}, "dist": 2}},
    }

    s_after = idx.searcher()
    s_before = search_b4.Searcher(spark, idx.schema, idx.storage)

    out: dict = {}
    for name, q in queries.items():
        node = A.parse_json(q, idx.schema)
        res: dict[str, float] = {}
        rows_seen = set()
        for arm, s in (("before", s_before), ("after", s_after)):
            s.top_k_pruned(node, limit=10).collect()  # warmup per arm
        for arm, s in (("before", s_before), ("after", s_after)):
            res[arm] = []
        for _ in range(reps):  # interleave arms every rep
            for arm, s in (("before", s_before), ("after", s_after)):
                t0 = time.time()
                rows = s.top_k_pruned(node, limit=10).collect()
                res[arm].append(time.time() - t0)
                rows_seen.add(tuple(
                    (int(r["docid_g"]), round(float(r["score"]), 9))
                    for r in rows))
        out[name] = {
            arm: round(statistics.median(v), 4) for arm, v in res.items()}
        out[name]["results_identical"] = len(rows_seen) == 1
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
