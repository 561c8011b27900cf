"""Brute-force + plan-shape tests for the round-5 curation additions:
stride-1 window duplication signal (suffix-array-dedup shape, Lee et
al. 2022) and intra-document duplicate-line removal (RefinedWeb/CCNet
boilerplate pass).  Value-level cross-engine parity is pinned by the
DuckDB oracles (tools/verify_contract.py); here each operator is
checked against an independent pure-Python reference plus the plan
property that matters at scale (no cartesian pair generation; line
dedup stays map-only with zero Exchange)."""

import tempfile

import pytest

from sonar_tantivy_spark import driver_queries as dq

SF = "/root/testdata/sf0.001"

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}


# ---------------------------------------------------------- dd_window_dup
def test_window_dup_bruteforce(spark):
    """n_windows / n_dup / dup_frac match a pure-Python stride-1
    window count over the whole corpus (self-repeats included)."""
    docs = {d: t.split(" ") for d, t in _docs(spark).items()}
    counts: dict[str, int] = {}
    per_doc: dict[int, list] = {}
    for d, w in docs.items():
        if len(w) < dq.WINDOW_W:
            continue
        ws = [" ".join(w[i:i + dq.WINDOW_W])
              for i in range(len(w) - dq.WINDOW_W + 1)]
        per_doc[d] = ws
        for s in ws:
            counts[s] = counts.get(s, 0) + 1
    rows = {r["doc_id"]: r
            for r in dq.QUERIES["dd_window_dup"](spark, SF).collect()}
    assert set(rows) == set(per_doc)
    for d, ws in per_doc.items():
        dup = sum(1 for s in ws if counts[s] > 1)
        assert rows[d]["n_windows"] == len(ws)
        assert rows[d]["n_dup"] == dup
        assert rows[d]["dup_frac"] == pytest.approx(
            round(dup / len(ws), 4), abs=1e-4)


def test_window_dup_catches_misaligned_span(spark):
    """The property paragraph dedup lacks: a span duplicated at a
    DIFFERENT word offset in the second doc is still flagged, and an
    in-document repeat counts too (suffix-array dedup removes both)."""
    span = " ".join(f"tok{i}" for i in range(dq.WINDOW_W))
    pre = " ".join(f"p{i}" for i in range(3))  # misaligns doc 2
    uniq = " ".join(f"u{i}" for i in range(2 * dq.WINDOW_W))
    selfrep = " ".join(
        f"s{i}" for i in range(dq.WINDOW_W)) + " zz " + " ".join(
        f"s{i}" for i in range(dq.WINDOW_W))
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, span), (2, pre + " " + span), (3, uniq), (4, selfrep)],
            "doc_id long, text string",
        ).write.parquet(f"{td}/documents.parquet")
        rows = {r["doc_id"]: r
                for r in dq.QUERIES["dd_window_dup"](spark, td).collect()}
    # doc 1 is exactly one window, shared with doc 2 despite the offset
    assert rows[1]["n_windows"] == 1 and rows[1]["n_dup"] == 1
    assert rows[2]["n_dup"] == 1          # only the aligned copy matches
    assert rows[3]["n_dup"] == 0
    assert rows[4]["n_dup"] == 2          # the two aligned self-copies


def test_window_dup_no_cartesian(spark):
    plan = _physical_plan(dq.QUERIES["dd_window_dup"](spark, SF))
    assert not any(b in plan for b in BANNED)


# ---------------------------------------------------------- tx_line_dedup
def test_line_dedup_bruteforce(spark):
    """clean_text keeps each segment's FIRST occurrence in order;
    counts match an independent Python pass."""
    docs = {d: t.split(" ") for d, t in _docs(spark).items()}
    rows = {r["doc_id"]: r
            for r in dq.QUERIES["tx_line_dedup"](spark, SF).collect()}
    assert set(rows) == set(docs)
    for d, w in docs.items():
        segs = [" ".join(w[i:i + dq.PARA_W])
                for i in range(0, len(w), dq.PARA_W)]
        seen, kept = set(), []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert rows[d]["n_segs"] == len(segs)
        assert rows[d]["n_removed"] == len(segs) - len(kept)
        assert rows[d]["clean_text"] == " ".join(kept)


def test_line_dedup_drops_repeated_boilerplate(spark):
    """A nav-bar segment repeated 3x in one doc survives exactly once,
    at its first position."""
    nav = " ".join(f"nav{i}" for i in range(dq.PARA_W))
    body = " ".join(f"b{i}" for i in range(dq.PARA_W))
    text = " ".join([nav, body, nav, nav])
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, text)], "doc_id long, text string",
        ).write.parquet(f"{td}/documents.parquet")
        row = dq.QUERIES["tx_line_dedup"](spark, td).collect()[0]
    assert row["n_segs"] == 4 and row["n_removed"] == 2
    assert row["clean_text"] == nav + " " + body


def test_line_dedup_map_only(spark):
    """Zero Exchange: the whole transform is in-row higher-order array
    functions, so it scales as a pure map at any corpus size."""
    plan = _physical_plan(dq.QUERIES["tx_line_dedup"](spark, SF))
    assert "Exchange" not in plan
    assert not any(b in plan for b in BANNED)


# --------------------------------------------------------- pl_dsir_weights
def test_dsir_weights_bruteforce(spark):
    """logw matches a pure-Python DSIR computation (hashed unigram +
    bigram features, Laplace-smoothed target-vs-raw log-ratio)."""
    import hashlib
    import math
    from collections import Counter

    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    B, a = dq.DSIR_BUCKETS, dq.DSIR_ALPHA

    def feats(text):
        w = text.split(" ")
        grams = list(w)
        if len(w) >= 2:
            grams += [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
        return Counter(hashlib.md5(g.encode()).hexdigest()[:4]
                       for g in grams)

    per_doc = {r["doc_id"]: feats(r["text"]) for r in rows}
    raw, tgt = Counter(), Counter()
    for r in rows:
        raw.update(per_doc[r["doc_id"]])
        if r["lang"] == "en":
            tgt.update(per_doc[r["doc_id"]])
    rn, tn = sum(raw.values()), sum(tgt.values())
    want = {}
    for d, c in per_doc.items():
        lw = sum(v * (math.log((tgt[b] + a) / (tn + a * B))
                      - math.log((raw[b] + a) / (rn + a * B)))
                 for b, v in c.items())
        want[d] = (round(lw, 4), sum(c.values()))
    got = {r["doc_id"]: (r["logw"], r["n_feats"])
           for r in dq.q_pl_dsir_weights(spark, SF).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1], d
        assert got[d][0] == pytest.approx(want[d][0], abs=2e-4), d


def test_dsir_selects_target_like_docs(spark):
    """The paper's point: target-language docs average a higher
    importance weight than the rest of the pool."""
    from pyspark.sql import functions as F

    df = dq.q_pl_dsir_weights(spark, SF)
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", (F.col("lang") == "en").alias("is_en")))
    rows = (df.join(docs, "doc_id").groupBy("is_en")
            .agg(F.avg("logw").alias("m")).collect())
    j = {r["is_en"]: r["m"] for r in rows}
    assert j[True] > j[False]


def test_dsir_broadcasts_bounded_stats(spark):
    """THE scale property: hashed features bound the stats table at
    B=65536 rows, so the per-doc join must be a broadcast hash join —
    never a shuffle of the doc-side on the bucket key."""
    plan = _physical_plan(dq.q_pl_dsir_weights(spark, SF))
    assert "CartesianProduct" not in plan
    # the 1-row totals crossJoin broadcasts (benign BNLJ, same shape as
    # tx_lm_xent); the BUCKET join must be a broadcast hash join
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
