"""Benchmark: index-build throughput + BM25 query p50 latencies.

Prints ONE JSON line:
  {"metric": "...", "value": <total wall sec>, "unit": "sec",
   "queries": {name: p50_sec, ...}, "sf": ...,
   "build": {"turns": N, "wall_s": s, "turns_per_sec": r}, ...}

Env:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1) — sets the sf label
  SPARK_GRAFT_CPUS     (default 32)                   — local[N]
  BENCH_TURNS          (default 300000)  transcript corpus size
  BENCH_REPS           (default 5)       per-query repetitions (p50)

The corpus is the deterministic transcript table (FIXTURES.md §B, seed
42), cached as parquet under .bench_cache/ so repeated runs measure the
engine, not the generator.  Runs are WEATHER-GATED: an attempt recorded
while the host is oversubscribed (sys%% / steal%% over the
BENCH_MAX_SYS_PCT / BENCH_MAX_STEAL_PCT thresholds) is retried up to
BENCH_ATTEMPTS times; the final attempt is stamped "degraded": true so
the round artifact can never silently be a weather measurement.  The two-cluster-size scaling evidence
(north_rule) is produced by tools/bench_scaling.py, which runs THIS
build at two parallelism levels in separate processes and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")


def _cpu_sample() -> tuple[float, ...] | None:
    """(user, nice, system, idle, iowait, irq, softirq, steal) jiffies
    from /proc/stat — host-condition telemetry for the bench line."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return tuple(float(x) for x in parts[1:9])
    except (OSError, ValueError, IndexError):
        return None


def host_conditions(before, after) -> dict | None:
    """Steal/system share of total CPU time over the bench run.  This
    VM's host is intermittently oversubscribed: sustained >16-thread
    runs have been observed at 15-30%% steal + 25-50%% system time,
    which degrades wall-clock 3-8x with NO code change.  Recording the
    condition with each run lets a reader separate host weather from
    engine regressions (BENCH/BASELINE.md documents the effect)."""
    if before is None or after is None:
        return None
    d = [a - b for a, b in zip(after, before)]
    total = sum(d)
    if total <= 0:
        return None
    return {
        "steal_pct": round(100.0 * d[7] / total, 1),
        "sys_pct": round(100.0 * d[2] / total, 1),
        "user_pct": round(100.0 * (d[0] + d[1]) / total, 1),
    }


def corpus_parquet(spark, n_turns: int) -> str:
    # v2: + time-banded "trendalpha" bursts (transcripts.py) — the skewed
    # term stats that let block-max segment pruning demonstrate skips
    path = os.path.join(CACHE, f"transcripts_v2_{n_turns}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from sonar_tantivy_spark.sources.transcripts import generate_transcripts

        os.makedirs(CACHE, exist_ok=True)
        pdf = generate_transcripts(n_turns)
        spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(path)
    return path


# Weather gate: a bench line recorded during host oversubscription is
# noise, not a measurement (r3's round artifact was ~2-3x inflated at
# sys=24.2%).  An attempt whose host telemetry exceeds these shares is
# retried; the final attempt is stamped "degraded": true so no reader
# mistakes weather for a regression.
MAX_SYS_PCT = float(os.environ.get("BENCH_MAX_SYS_PCT", "10"))
MAX_STEAL_PCT = float(os.environ.get("BENCH_MAX_STEAL_PCT", "5"))
MAX_ATTEMPTS = int(os.environ.get("BENCH_ATTEMPTS", "3"))
RETRY_WAIT_S = float(os.environ.get("BENCH_RETRY_WAIT", "60"))


def _weather_ok(host: dict | None) -> bool:
    if host is None:
        return True  # no telemetry — cannot gate
    return (host.get("sys_pct", 0.0) <= MAX_SYS_PCT
            and host.get("steal_pct", 0.0) <= MAX_STEAL_PCT)


def main() -> None:
    for attempt in range(1, MAX_ATTEMPTS + 1):
        out = run_attempt()
        host = out.get("host")
        if _weather_ok(host):
            break
        if attempt < MAX_ATTEMPTS:
            print(f"[bench] attempt {attempt}: degraded host window "
                  f"{host} — retrying in {RETRY_WAIT_S:.0f}s",
                  file=sys.stderr)
            time.sleep(RETRY_WAIT_S)
        else:
            out["degraded"] = True
            out["degraded_reason"] = (
                f"host exceeded sys<={MAX_SYS_PCT}% / steal<={MAX_STEAL_PCT}% "
                f"on all {MAX_ATTEMPTS} attempts; wall-times are weather-"
                f"inflated (BENCH/BASELINE.md 'Host weather')")
    out["attempt"] = attempt
    print(json.dumps(out))


def run_attempt() -> dict:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_turns = int(os.environ.get("BENCH_TURNS", "300000"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    # min of 2 builds: this VM's co-tenant bursts can halve one build's
    # throughput; min-wall is the sustained-rate protocol (BENCH/BASELINE.md)
    build_reps = int(os.environ.get("BENCH_BUILD_REPS", "2"))
    warmup = os.environ.get("BENCH_WARMUP", "1") == "1"
    # memory scales with cluster size, like a real N-executor cluster
    mem_gb = int(os.environ.get("BENCH_MEM_GB", str(max(8, 2 * cpus))))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    cpu_before = _cpu_sample()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sonar-tantivy-spark-bench")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", f"{mem_gb}g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sonar_tantivy_spark import IndexCatalog
    from sonar_tantivy_spark.plans import ast as A
    from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    t_all = time.time()
    corpus_path = corpus_parquet(spark, n_turns)
    docs = spark.read.parquet(corpus_path)

    # seg_size must NOT depend on parallelism: the scaling comparison is
    # fixed work at two cluster sizes (north_rule).  25k turns/segment →
    # 12 build segments at the default 300k corpus, compacted to ~6-8 so
    # the query bench exercises the real multi-segment path.
    seg_size = int(os.environ.get("BENCH_SEG_SIZE", "25000"))

    if warmup:
        # untimed warm-cluster pass: JIT the JVM hot paths and fork+import
        # the Arrow Python workers once, so the measured build reflects
        # steady-state throughput (a real cluster is warm, too)
        wpath = corpus_parquet(spark, 30000)
        wbase = tempfile.mkdtemp(prefix="stspark-warm-")
        wcat = IndexCatalog(spark, wbase)
        widx = wcat.create_index("warm", TRANSCRIPT_SCHEMA)
        widx.add_df(spark.read.parquet(wpath),
                    order_cols=["conv_id", "turn_idx"], seg_size=seg_size)
        shutil.rmtree(wbase, ignore_errors=True)

    build_walls = []
    for rep in range(build_reps):
        rbase = tempfile.mkdtemp(prefix="stspark-bench-")
        rcat = IndexCatalog(spark, rbase)
        ridx = rcat.create_index("bench", TRANSCRIPT_SCHEMA)
        t0 = time.time()
        ridx.add_df(docs, order_cols=["conv_id", "turn_idx"], seg_size=seg_size)
        build_walls.append(time.time() - t0)
        if rep < build_reps - 1:
            shutil.rmtree(rbase, ignore_errors=True)
        else:
            base, idx = rbase, ridx
    build_wall = min(build_walls)
    build_tps = n_turns / build_wall

    # background-merge analog (tantivy LogMergePolicy): compact to the
    # term-range-clustered layout queries are served from.  Timed
    # separately — merge runs in the background in a live system.
    # NEVER down to one segment (merge.py:28-31): several segments keep
    # query scans partition-parallel and give block-max segment pruning
    # something to skip — the bench measures the real multi-segment path.
    from sonar_tantivy_spark.operators.merge import compact_to

    target_segments = int(os.environ.get("BENCH_TARGET_SEGMENTS", "8"))
    t0 = time.time()
    if len(idx.segment_info()) > target_segments:
        compact_to(idx, target_segments)
    merge_wall = time.time() - t0

    # live postings footprint (manifest segments only — compaction leaves
    # the superseded epochs on disk until a GC pass)
    postings_bytes = 0
    for seg in idx.storage.manifest()["segments"]:
        for root, _dirs, files in os.walk(seg["tables"]["postings"]):
            postings_bytes += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files if f.endswith(".parquet"))

    queries: dict[str, object] = {
        "q1_term": {"term": {"text": "hello"}},
        "q2_rare": {"term": {"text": "mundo"}},
        "q3_or": "hello world",
        "q4_must": "+hello +world",
        "q5_phrase": {"phrase": {"text": {"terms": ["hello", "world"]}}},
        "q7_stem": {"term": {"text": "stems"}},
        "q8_skew_the": {"term": {"text": "the"}},
        "q9_role_filter": {"bool": {"must": [{"term": {"text": "needle"}},
                                             {"term": {"role": "tool"}}]}},
        "q11_ts_range": {"bool": {"must": [
            {"term": {"text": "hello"}},
            {"range": {"ts": {"gte": "2026-01-02 00:00:00",
                              "lte": "2026-02-01 00:00:00"}}}]}},
        # sorted collector: hits ordered by the ts fast field
        "q14_sort_ts": ("sorted", {"term": {"text": "hello"}}, "ts"),
        # time-banded bursty term: per-segment max_tf discriminates, so
        # the block-max θ-probe must skip the cold segments (scored path)
        "q15_trend": {"term": {"text": "trendalpha"}},
        # round-4 surfaces: prefix pushes StringStartsWith into the
        # postings scan; sloppy phrase reuses the single-scan plan
        "q16_prefix": "hell*",
        "q17_slop": '"hello world"~2',
        # round-5 surfaces: transposing slop (Lucene in_order=false) and
        # minimum_should_match (counting stays inside the one-scan agg)
        "q18_slop_unordered": {"phrase": {"text": {
            "terms": ["world", "hello"], "slop": 2, "in_order": False}}},
        "q19_msm": {"bool": {"should": [{"term": {"text": "hello"}},
                                        {"term": {"text": "world"}},
                                        {"term": {"text": "mundo"}}],
                             "minimum_should_match": 2}},
        # round-5 ES surfaces: terms set (one In-predicate scan),
        # dis_max (union -> one agg exchange), match_phrase_prefix
        # (exact chain + in-scan prefix expansion on the last slot)
        "q22_terms_set": {"terms": {"text": ["hello", "mundo", "needle"]}},
        "q23_dismax": {"dis_max": {
            "queries": [{"term": {"text": "hello"}},
                        {"term": {"text": "world"}}],
            "tie_breaker": 0.3}},
        "q24_phrase_prefix": {"match_phrase_prefix": {"text": "hello wor"}},
        # round-5 late surfaces: wildcard (termdict-regex rewrite; the
        # trailing-star form is q16's prefix pushdown) and
        # constant_score (child scoring pruned to a bare filter scan)
        "q25_wildcard": {"wildcard": {"text": "h?llo"}},
        "q26_const_score": {"constant_score": {
            "filter": {"term": {"text": "hello"}}, "boost": 2.0}},
        # final round-5 surfaces: boosting (one left join against the
        # negative keys; WAND bound carried from the positive child)
        "q29_boosting": {"boosting": {
            "positive": {"term": {"text": "hello"}},
            "negative": {"term": {"text": "world"}},
            "negative_boost": 0.3}},
        # span family: same single-scan positions plan as the phrase
        # classes — an or-clause unions position arrays, span_first is
        # an in-array position predicate (no extra exchange vs q17)
        "q32_span_near": {"span_near": {"clauses": [
            {"span_term": {"text": "hello"}},
            {"span_or": {"clauses": [{"span_term": {"text": "world"}},
                                     {"span_term": {"text": "mundo"}}]}}],
            "slop": 2, "in_order": True}},
        "q33_span_first": {"span_first": {
            "match": {"span_term": {"text": "hello"}}, "end": 3}},
        "q34_span_not": {"span_not": {
            "include": {"span_term": {"text": "hello"}},
            "exclude": {"span_term": {"text": "world"}}, "dist": 2}},
        # combined_fields (BM25F): the genuine two-field blend — one
        # postings scan + one corpus-wide doclens norm-blend agg joined
        # on shared hash partitioning.  role/tool are RAW-tokenized, so
        # the query must be a single verbatim term ("search" = the tool
        # field's hottest value, ~3% of turns); the norm blend still
        # aggregates BOTH fields' doclens for every doc — the class's
        # honest worst-case cost at any scale
        "q35_combined_fields": {"combined_fields": {
            "query": "search", "fields": ["role", "tool^2"]}},
    }
    # query phase: modest shuffle fan-out wins for k=10 result sets.
    # top_k_pruned IS the default path (Index.query/query_df) — bench it,
    # and record how many segments the block-max bound let each query skip.
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    q_p50: dict[str, float] = {}
    q_skips: dict[str, str] = {}
    for name, q in queries.items():
        sort_by = None
        if isinstance(q, tuple):  # ("sorted", json_query, sort_field)
            _, q, sort_by = q
        node = (A.parse_string(q, idx.schema) if isinstance(q, str)
                else A.parse_json(q, idx.schema))
        s = idx.searcher()

        def run_once():
            if sort_by:
                return s.top_k_sorted_pruned(
                    node, limit=10, sort_by=sort_by).collect()
            return s.top_k_pruned(node, limit=10).collect()

        run_once()  # warmup (plan + page cache)
        times = []
        for _ in range(reps):
            tq = time.time()
            rows = run_once()
            times.append(time.time() - tq)
        q_p50[name] = round(statistics.median(times), 4)
        st = getattr(s, "last_prune", {})
        q_skips[name] = (f"{st.get('segments_skipped', 0)}"
                         f"/{st.get('segments_total', 0)}")
        assert rows is not None

    # round-5 surfaces that don't flow through top_k_pruned directly:
    # q20_mlt — more_like_this (one pushdown-filtered seed read + the
    # normal pruned top-k); q21_term_deleted — q1 re-run with a LIVE
    # tombstone ledger, measuring the broadcast anti-join overhead the
    # delete path adds to every query (runs LAST: it mutates the index).
    s = idx.searcher()
    seed_docid = int(s.top_k_pruned(
        A.parse_json({"term": {"text": "hello"}}, idx.schema),
        limit=1).collect()[0]["docid"])
    idx.more_like_this(seed_docid, "text", limit=10)  # warmup
    times = []
    for _ in range(reps):
        tq = time.time()
        idx.more_like_this(seed_docid, "text", limit=10)
        times.append(time.time() - tq)
    q_p50["q20_mlt"] = round(statistics.median(times), 4)

    # q27_aggs — the MultiCollector-style aggregation pass: one scored
    # candidate scan persisted, top-k + a terms agg + a stats agg fed
    # from it (the full-match-set path; no segment pruning by design)
    agg_req = {"query": {"term": {"text": "the"}}, "limit": 10,
               "aggs": {"roles": {"terms": {"field": "role", "aggs": {
                            "mean_idx": {"avg": {"field": "turn_idx"}}}}},
                        "ts": {"stats": {"field": "turn_idx"}}}}
    idx.query_json(agg_req)  # warmup
    times = []
    for _ in range(reps):
        tq = time.time()
        idx.query_json(agg_req)
        times.append(time.time() - tq)
    q_p50["q27_aggs"] = round(statistics.median(times), 4)

    # q30_pipeline_aggs — bucket agg + parent pipeline reduce
    # (cumulative_sum / derivative / bucket_sort) + a sibling
    # max_bucket: the distributed cost is the ONE histogram hash-agg;
    # every pipe is a driver-side reduce over <= #buckets rows, so this
    # should price within noise of a bare histogram
    pipe_req = {"query": {"term": {"text": "the"}}, "limit": 0,
                "aggs": {"h": {"histogram": {
                    "field": "turn_idx", "interval": 4, "aggs": {
                        "cs": {"cumulative_sum":
                               {"buckets_path": "doc_count"}},
                        "dv": {"derivative": {"buckets_path": "doc_count"}},
                        "top": {"bucket_sort": {"sort": [
                            {"doc_count": {"order": "desc"}}],
                            "size": 5}}}}},
                    "best": {"max_bucket": {"buckets_path": "h>doc_count"}}}}
    idx.query_json(pipe_req)  # warmup
    times = []
    for _ in range(reps):
        tq = time.time()
        idx.query_json(pipe_req)
        times.append(time.time() - tq)
    q_p50["q30_pipeline_aggs"] = round(statistics.median(times), 4)

    # q31_composite_page — composite agg page 2 through the after-key
    # cursor (one hash-agg + ordered limit per page; depth-independent)
    comp1 = idx.query_json({"query": {"term": {"text": "the"}},
                            "limit": 0, "aggs": {"c": {"composite": {
                                "sources": [{"r": {"terms":
                                                   {"field": "role"}}},
                                            {"t": {"terms":
                                                   {"field": "tool"}}}],
                                "size": 2}}}})
    after = comp1["aggs"]["c"].get("after_key")
    comp_req = {"query": {"term": {"text": "the"}}, "limit": 0,
                "aggs": {"c": {"composite": {
                    "sources": [{"r": {"terms": {"field": "role"}}},
                                {"t": {"terms": {"field": "tool"}}}],
                    "size": 2, "after": after}}}}
    idx.query_json(comp_req)  # warmup
    times = []
    for _ in range(reps):
        tq = time.time()
        idx.query_json(comp_req)
        times.append(time.time() - tq)
    q_p50["q31_composite_page"] = round(statistics.median(times), 4)

    # q28_search_after — cursor page 2 of the hot-term ranking through
    # the pruned path (a pure sort-key filter: page depth never grows)
    s = idx.searcher()
    node = A.parse_json({"term": {"text": "the"}}, idx.schema)
    head = s.top_k_pruned(node, limit=10).collect()
    cur = (float(head[-1]["score"]), int(head[-1]["docid_g"]))
    s.top_k_pruned(node, limit=10, after=cur).collect()  # warmup
    times = []
    for _ in range(reps):
        tq = time.time()
        s.top_k_pruned(node, limit=10, after=cur).collect()
        times.append(time.time() - tq)
    q_p50["q28_search_after"] = round(statistics.median(times), 4)

    n_del = idx.delete_term("text", "mundo")
    s = idx.searcher()  # ledger changed: fresh reader
    node = A.parse_json({"term": {"text": "hello"}}, idx.schema)
    s.top_k_pruned(node, limit=10).collect()  # warmup
    times = []
    for _ in range(reps):
        tq = time.time()
        s.top_k_pruned(node, limit=10).collect()
        times.append(time.time() - tq)
    q_p50["q21_term_deleted"] = round(statistics.median(times), 4)

    # percolation throughput: 8 saved queries (term / phrase-slop /
    # bool / prefix / span shapes) against the full corpus in ONE
    # map-only pass — turns/sec is the alerting-pipeline capacity
    # number (scales with doc volume only; query count widens the
    # projection, it never adds passes)
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
    t0 = time.time()
    n_alerts = idx.percolate(docs, keep_cols=["conv_id"]).count()
    perc_wall = time.time() - t0
    perc_stats = {"queries": 8, "alerts": int(n_alerts),
                  "wall_s": round(perc_wall, 2),
                  "turns_per_sec": round(n_turns / perc_wall, 1)}

    # ANN quality: recall@5 of the multiprobe-LSH path vs the exact
    # cosine baseline over the sf embeddings (engine-side execution)
    from sonar_tantivy_spark.operators.ann import (measure_recall,
                                                   measure_recall_ivf)

    t0 = time.time()
    ann_stats = measure_recall(spark, sf_dir, n_queries=20)
    ann_stats["wall_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    ivf_stats = measure_recall_ivf(spark, sf_dir, n_queries=20)
    ivf_stats["wall_s"] = round(time.time() - t0, 2)

    total = time.time() - t_all
    out = {
        "metric": "index-build turns/sec + BM25 top-10 p50 (transcripts, seed 42)",
        "value": round(total, 2),
        "unit": "sec",
        "queries": q_p50,
        "segments_skipped": q_skips,
        "ann": ann_stats,
        "ann_ivf": ivf_stats,
        "percolate": perc_stats,
        "sf": sf,
        "build": {
            "turns": n_turns,
            "wall_s": round(build_wall, 2),
            "wall_s_reps": [round(w, 2) for w in build_walls],
            "turns_per_sec": round(build_tps, 1),
            "merge_wall_s": round(merge_wall, 2),
            "cpus": cpus,
            "segments": len(idx.segment_info()),
            "postings_bytes": postings_bytes,
        },
        "deletes": {"tombstones": int(n_del)},
    }
    host = host_conditions(cpu_before, _cpu_sample())
    if host is not None:
        out["host"] = host
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return out


if __name__ == "__main__":
    main()
