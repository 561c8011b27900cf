"""Connected components (large-star/small-star) — round-count and
correctness guarantees the min-label loop could not give."""

import math

from pyspark.sql import functions as F

from sonar_tantivy_spark.operators.cc import connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    labels, rounds = connected_components(df)
    got = {r["node"]: r["cluster"] for r in labels.collect()}
    return got, rounds


def _brute(edges):
    from collections import defaultdict
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for start in adj:
        if start in out:
            continue
        comp, stack = set(), [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x] - comp)
        root = min(comp)
        for x in comp:
            out[x] = root
    return out


def test_deep_chain_converges_in_log_rounds(spark):
    """A 200-node chain has diameter 199: min-label propagation needs
    ~199 rounds, the alternating algorithm O(log n) — the at-scale
    property VERDICT r2 asked to demonstrate."""
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    got, rounds = _labels(spark, edges)
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 2 * int(math.log2(n)) + 2, rounds  # ≤ 17 vs 199


def test_mixed_components(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20),
             (30, 31), (31, 32), (32, 33), (5, 3)]
    got, _ = _labels(spark, edges)
    assert got == _brute(edges)


def test_star_and_singleton_edge(spark):
    edges = [(100, i) for i in range(5)] + [(7, 8)]
    got, rounds = _labels(spark, edges)
    assert got == _brute(edges)
    assert rounds <= 3


def test_random_graphs_match_brute_force(spark):
    """Seeded random graphs (mixed chains/cliques/isolated edges) —
    labels must equal brute-force transitive closure every time."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 60
        edges = list({(rng.randrange(n), rng.randrange(n))
                      for _ in range(45)})
        edges = [(a, b) for a, b in edges if a != b]
        got, _ = _labels(spark, edges)
        assert got == _brute(edges), seed


def test_plan_is_join_plus_agg(spark):
    """Each half-round must stay an equi-join + aggregation — no
    cartesian/broadcast-nested-loop shapes."""
    from sonar_tantivy_spark.operators.cc import _large_star, _small_star

    e = spark.createDataFrame([(2, 1), (3, 2)], "a long, b long")
    for stage in (_large_star(e), _small_star(e)):
        plan = stage._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_dup_clusters_query_matches_oracle_semantics(spark):
    """The rewired dd_dup_clusters must equal the transitive closure of
    its own Jaccard edges (full closure — no silent round cap)."""
    from sonar_tantivy_spark import driver_queries as dq

    sf = "/root/testdata/sf0.01"
    edges = [(r["d1"], r["d2"])
             for r in dq.QUERIES["dd_jaccard_pairs"](spark, sf).collect()]
    want = _brute(edges)
    got = {r["doc_id"]: r["cluster"]
           for r in dq.QUERIES["dd_dup_clusters"](spark, sf).collect()}
    assert got == want
