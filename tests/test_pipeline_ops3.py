"""Brute-force + plan-shape tests for the round-4 pipeline additions:
paragraph-level dedup signal, per-domain quota sampling, corpus-LM
cross-entropy quality scoring, daily z-score anomaly detection, and
Unicode text normalization.  Value-level cross-engine parity is pinned
by the DuckDB oracles (tools/verify_contract.py); here each operator
is checked against an independent pure-Python reference plus the scale
property that matters for it (two-phase top-K = single-rank truth,
partitioning invariance, broadcastable plan sides)."""

import math

import pytest

from sonar_tantivy_spark import driver_queries as dq
from sonar_tantivy_spark.functions import textnorm

SF = "/root/testdata/sf0.001"

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}


# ----------------------------------------------------------- dd_para_dup
def test_para_dup_bruteforce(spark):
    """dup_para_frac matches a per-doc brute force over 10-word
    segments counted across distinct docs."""
    docs = {d: t.split(" ") for d, t in _docs(spark).items()}
    seg_docs: dict[str, set] = {}
    segs: dict[int, list] = {}
    for d, w in docs.items():
        ss = [" ".join(w[i:i + dq.PARA_W])
              for i in range(0, len(w), dq.PARA_W)]
        segs[d] = ss
        for s in ss:
            seg_docs.setdefault(s, set()).add(d)
    rows = {r["doc_id"]: r
            for r in dq.QUERIES["dd_para_dup"](spark, SF).collect()}
    assert set(rows) == set(docs)
    for d, ss in segs.items():
        dup = sum(1 for s in ss if len(seg_docs[s]) > 1)
        assert rows[d]["n_paras"] == len(ss)
        assert rows[d]["dup_para_frac"] == pytest.approx(
            round(dup / len(ss), 4), abs=1e-4)


def test_para_dup_planted_duplicate(spark):
    """A paragraph planted verbatim in two synthetic docs is flagged in
    both; a unique doc scores 0."""
    shared = " ".join(f"tok{i}" for i in range(dq.PARA_W))
    uniq_a = " ".join(f"a{i}" for i in range(dq.PARA_W))
    uniq_b = " ".join(f"b{i}" for i in range(dq.PARA_W))
    uniq_c = " ".join(f"c{i}" for i in range(2 * dq.PARA_W))
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, shared + " " + uniq_a), (2, shared + " " + uniq_b),
             (3, uniq_c)],
            "doc_id long, text string",
        ).write.parquet(f"{td}/documents.parquet")
        rows = {r["doc_id"]: r
                for r in dq.QUERIES["dd_para_dup"](spark, td).collect()}
    assert rows[1]["dup_para_frac"] == pytest.approx(0.5)
    assert rows[2]["dup_para_frac"] == pytest.approx(0.5)
    assert rows[3]["dup_para_frac"] == 0.0


# ------------------------------------------------------- pl_domain_quota
def test_domain_quota_equals_single_rank(spark):
    """The salted two-phase top-K returns exactly the rows and ranks a
    single global rank-per-source would."""
    import hashlib
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "source").collect()
    by_src: dict[str, list] = {}
    for r in docs:
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        by_src.setdefault(r["source"], []).append((h, r["doc_id"]))
    want = {}
    for src, lst in by_src.items():
        for rk, (_, d) in enumerate(sorted(lst)[:dq.QUOTA_K], start=1):
            want[d] = (src, rk)
    got = {r["doc_id"]: (r["source"], r["rank_in_source"])
           for r in dq.QUERIES["pl_domain_quota"](spark, SF).collect()}
    assert got == want


def test_domain_quota_caps_every_source(spark):
    rows = dq.QUERIES["pl_domain_quota"](spark, SF).collect()
    per_src: dict[str, int] = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert per_src and all(v <= dq.QUOTA_K for v in per_src.values())


def test_domain_quota_salt_invariant(spark, monkeypatch):
    """The effective salt fan-out scales with the cluster
    (_quota_salt), so the OUTPUT must be identical at any fan-out —
    phase 1 keeps a superset of the global top-K per bucket."""
    def run(n):
        monkeypatch.setattr(dq, "_quota_salt", lambda _s: n)
        return sorted((r["doc_id"], r["source"], r["rank_in_source"])
                      for r in dq.QUERIES["pl_domain_quota"](
                          spark, SF).collect())
    assert run(1) == run(3) == run(64)


# ----------------------------------------------------------- tx_lm_xent
def test_lm_xent_bruteforce(spark):
    """xent matches -mean(ln p(gram)) under the corpus trigram
    distribution, computed independently in Python."""
    docs = {d: t.split(" ") for d, t in _docs(spark).items()}
    counts: dict[str, int] = {}
    per_doc: dict[int, list] = {}
    for d, w in docs.items():
        if len(w) < dq.XENT_GRAM:
            continue
        gs = [" ".join(w[i:i + dq.XENT_GRAM])
              for i in range(len(w) - dq.XENT_GRAM + 1)]
        per_doc[d] = gs
        for g in gs:
            counts[g] = counts.get(g, 0) + 1
    total = sum(counts.values())
    rows = {r["doc_id"]: r
            for r in dq.QUERIES["tx_lm_xent"](spark, SF).collect()}
    assert set(rows) == set(per_doc)
    for d, gs in per_doc.items():
        want = -sum(math.log(counts[g] / total) for g in gs) / len(gs)
        assert rows[d]["n_grams"] == len(gs)
        assert rows[d]["xent"] == pytest.approx(want, abs=1e-3)


def test_lm_xent_plan_no_banned_join(spark):
    """No cartesian product; the only nested-loop join allowed is the
    broadcast of the 1-row corpus-total aggregate (a scalar, by
    construction) — the gram-counts join must be an equi-join."""
    plan = _physical_plan(dq.QUERIES["tx_lm_xent"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


# ---------------------------------------------------- ev_zscore_anomaly
def test_zscore_bruteforce(spark):
    import statistics
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .selectExpr("event_type", "ts").collect()
    daily: dict[tuple, int] = {}
    for r in ev:
        ts = r["ts"]
        import datetime
        epoch = int((ts - datetime.datetime(1970, 1, 1)).total_seconds())
        day = (epoch // 86400) * 86400
        daily[(r["event_type"], day)] = daily.get((r["event_type"], day), 0) + 1
    by_type: dict[str, list] = {}
    for (t, _), c in daily.items():
        by_type.setdefault(t, []).append(c)
    rows = {(r["event_type"], r["day_epoch"]): r
            for r in dq.QUERIES["ev_zscore_anomaly"](spark, SF).collect()}
    assert set(rows) == set(daily)
    for (t, day), cnt in daily.items():
        cs = by_type[t]
        mu = statistics.mean(cs)
        sd = statistics.stdev(cs) if len(cs) > 1 else 0.0
        z = (cnt - mu) / sd if sd > 0 else 0.0
        r = rows[(t, day)]
        assert r["cnt"] == cnt
        assert r["z"] == pytest.approx(z, abs=1e-3)
        assert r["is_anomaly"] == (abs(z) >= dq.ZSCORE_THRESH)


# -------------------------------------------------------- tx_normalize
MESSY = [
    "café vs café",              # NFD -> NFC composition
    "tab\tand\nnewline  runs",                # whitespace squash
    "ctrl\x00chars\x1fstripped\x7f",          # C0/DEL strip
    "  leading and trailing  ",               # trim
    "ﬁligature stays",                   # NFC (not NFKC): fi-ligature kept
    "plain ascii unchanged",
    "",
]


def test_normalize_udf_matches_reference(spark):
    """The vectorized Arrow UDF reproduces the pure-Python reference
    semantics byte-for-byte on messy unicode."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(i, s) for i, s in enumerate(MESSY)],
                               "i long, text string")
    got = {r["i"]: r["norm"] for r in
           df.select("i", textnorm.normalize_text(F.col("text"))
                     .alias("norm")).collect()}
    for i, s in enumerate(MESSY):
        assert got[i] == textnorm.normalize_str(s), repr(s)


def test_normalize_idempotent_and_semantics():
    import unicodedata
    for s in MESSY:
        once = textnorm.normalize_str(s)
        assert textnorm.normalize_str(once) == once
        assert unicodedata.is_normalized("NFC", once)
        assert "\x00" not in once and "\t" not in once
        assert "  " not in once
    # NFC keeps compatibility chars (the deliberate NFC-vs-NFKC pin)
    assert "ﬁ" in textnorm.normalize_str("ﬁligature stays")


def test_normalize_driver_query_clean_corpus(spark):
    """On the already-clean synthetic corpus the pass is a no-op:
    changed is all-false and lengths match the raw text."""
    rows = dq.QUERIES["tx_normalize"](spark, SF).collect()
    texts = _docs(spark)
    assert rows and all(not r["changed"] for r in rows)
    for r in rows:
        assert r["n_chars_norm"] == len(texts[r["doc_id"]])


# ------------------------------------------------------- pl_split_hash
def test_split_hash_deterministic_and_sane(spark):
    rows = dq.QUERIES["pl_split_hash"](spark, SF).collect()
    again = dq.QUERIES["pl_split_hash"](spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    frac = {}
    for r in rows:
        frac[r["split"]] = frac.get(r["split"], 0) + 1
    n = sum(frac.values())
    assert set(frac) <= {"train", "val", "test"}
    # 90/5/5 within generous binomial slack at sf0.01 (500 docs)
    assert 0.8 <= frac["train"] / n <= 0.97
    # the split is a pure function of doc_id: bucket agrees with md5
    import hashlib
    for r in rows[:20]:
        assert r["bucket"] == hashlib.md5(
            str(r["doc_id"]).encode()).hexdigest()[:4]


# ------------------------------------------------------- tx_ngram_freq
def test_ngram_freq_bruteforce(spark):
    import collections
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("text").collect()
    cnt = collections.Counter()
    for r in docs:
        w = r["text"].split(" ")
        for i in range(len(w) - 1):
            cnt[w[i] + " " + w[i + 1]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:dq.NGRAM_TOP]
    got = [(r["gram"], r["cnt"])
           for r in dq.QUERIES["tx_ngram_freq"](spark, SF).collect()]
    assert got == want
