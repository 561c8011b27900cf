"""Scale-shape guards for the dedup pipeline: the verification queries
must be candidate-bounded — no cartesian product or nested-loop join may
appear in their physical plans (the 100 TB failure mode the round-1
review flagged)."""

import pytest

from sonar_tantivy_spark import driver_queries as dq

SF = "/root/testdata/sf0.001"

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", [
    "dd_minhash_bands", "dd_jaccard_pairs", "dd_embed_cosine_pairs",
    "ann_lsh_bucket", "dd_exact_fingerprint", "dd_simhash",
])
def test_no_all_pairs_plan(spark, name):
    df = dq.QUERIES[name](spark, SF)
    plan = _physical_plan(df)
    for banned in BANNED:
        assert banned not in plan, f"{name} plans an all-pairs join:\n{plan}"


def test_jaccard_is_candidate_bounded(spark):
    """Every verified Jaccard pair must come out of the MinHash candidate
    set (subset relation, not just plan shape)."""
    cands = {(r["d1"], r["d2"]) for r in
             dq.QUERIES["dd_minhash_bands"](spark, SF).collect()}
    pairs = {(r["d1"], r["d2"]) for r in
             dq.QUERIES["dd_jaccard_pairs"](spark, SF).collect()}
    assert pairs <= cands


def test_exact_duplicates_never_lost(spark):
    """J=1.0 pairs collide in every MinHash band, so exact duplicates
    survive candidate bounding by construction."""
    rows = dq.QUERIES["dd_jaccard_pairs"](spark, SF).collect()
    exact = [r for r in rows if r["jaccard"] == 1.0]
    bands = {(r["d1"], r["d2"]): r["n_bands"] for r in
             dq.QUERIES["dd_minhash_bands"](spark, SF).collect()}
    for r in exact:
        assert bands[(r["d1"], r["d2"])] == dq.N_BANDS
