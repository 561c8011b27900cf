"""ev_asof_join and tx_repetition — semantics vs brute force, and the
plan shapes that make them 100 TB-safe (no join for as-of, no shuffle
for repetition)."""

from sonar_tantivy_spark import driver_queries as dq

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_matches_brute_force(spark):
    ev = [(r["event_id"], r["ts"], r["user_id"], r["event_type"])
          for r in spark.read.parquet(f"{SF}/events.parquet").collect()]
    # brute force: for each error, scan the user's actions (inclusive
    # as-of at ts ties, event_id tie-break)
    want = {}
    by_user: dict = {}
    for eid, ts, uid, et in ev:
        by_user.setdefault(uid, []).append((ts, et != "error", eid, et))
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r[0], not r[1], r[2]))  # action first
        last_action = None
        for ts, is_action, eid, et in rows:
            if is_action:
                last_action = (et, ts)
            else:
                want[eid] = last_action
    got = {r["event_id"]: ((r["prev_type"], r["prev_ts"])
                           if r["prev_type"] is not None else None)
           for r in dq.QUERIES["ev_asof_join"](spark, SF).collect()}
    assert got == want
    assert any(v is None for v in got.values()) or len(got) > 0


def test_asof_plan_has_no_join(spark):
    """The as-of must compile to scan → one exchange → window — a range
    join (BroadcastNestedLoop / inequality sort-merge) is the at-scale
    failure mode this operator exists to avoid."""
    plan = _plan(dq.QUERIES["ev_asof_join"](spark, SF))
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_repetition_matches_brute_force(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").collect()
    want = {}
    for r in rows:
        w = r["text"].split(" ")
        if len(w) < 3:
            want[r["doc_id"]] = 0.0
            continue
        grams = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]
        frac = (len(grams) - len(set(grams))) / len(grams)
        # Spark/DuckDB round() is HALF_UP; Python's is half-even
        from decimal import ROUND_HALF_UP, Decimal
        want[r["doc_id"]] = float(
            Decimal(repr(frac)).quantize(Decimal("0.0001"),
                                         rounding=ROUND_HALF_UP))
    got = {r["doc_id"]: r["dup_trigram_frac"]
           for r in dq.QUERIES["tx_repetition"](spark, SF).collect()}
    assert got == want
    assert any(v > 0 for v in got.values())  # the signal discriminates


def test_repetition_plan_is_scan_only(spark):
    plan = _plan(dq.QUERIES["tx_repetition"](spark, SF))
    assert "Exchange" not in plan, plan  # per-doc column math, no shuffle
    assert "Join" not in plan, plan


def test_decontaminate_matches_brute_force(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").collect()
    k, mod = dq.DECON_GRAM, dq.DECON_BENCH_MOD
    grams = {}
    for r in rows:
        w = r["text"].split(" ")
        grams[r["doc_id"]] = {" ".join(w[i:i + k])
                              for i in range(len(w) - k + 1)}
    bench = set().union(*(g for d, g in grams.items() if d % mod == 0))
    want = {d: len(g & bench) for d, g in grams.items() if d % mod != 0}
    got = {r["doc_id"]: r["n_shared"]
           for r in dq.QUERIES["pl_decontaminate"](spark, SF).collect()}
    assert got == want
    assert sum(1 for v in got.values() if v > 0) >= 5  # signal exists


def test_funnel_matches_brute_force(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "event_type", "ts").collect()
    import calendar
    by_user: dict = {}
    for r in rows:
        e = calendar.timegm(r["ts"].timetuple())
        by_user.setdefault(r["user_id"], []).append((e, r["event_type"]))
    W = dq.FUNNEL_WINDOW_S
    n = r1 = r2 = r3 = 0
    for evs in by_user.values():
        n += 1
        t1 = min((e for e, t in evs if t == "view"), default=None)
        t2 = min((e for e, t in evs if t == "click" and t1 is not None
                  and t1 < e <= t1 + W), default=None)
        t3 = min((e for e, t in evs if t == "purchase" and t2 is not None
                  and t2 < e <= t2 + W), default=None)
        r1 += t1 is not None
        r2 += t2 is not None
        r3 += t3 is not None
    got = dq.QUERIES["ev_funnel"](spark, SF).collect()[0]
    assert (got["n_users"], got["reached_view"], got["reached_click"],
            got["reached_purchase"]) == (n, r1, r2, r3)
    assert r3 < r2 < n  # the funnel actually narrows


def test_funnel_retention_plans_have_no_join(spark):
    for name in ("ev_funnel", "ev_retention"):
        plan = _plan(dq.QUERIES[name](spark, SF))
        assert "Join" not in plan, (name, plan)


def test_retention_matches_brute_force(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts").collect()
    import calendar
    days: dict = {}
    for r in rows:
        d = calendar.timegm(r["ts"].timetuple()) // 86400 * 86400
        days.setdefault(r["user_id"], set()).add(d)
    want: dict = {}
    for ds in days.values():
        c = min(ds)
        for d in ds:
            key = (c, (d - c) // 86400)
            want[key] = want.get(key, 0) + 1
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in dq.QUERIES["ev_retention"](spark, SF).collect()}
    assert got == want


def test_decontaminate_plan_is_equi_join_only(spark):
    """Containment must go through the gram equi-join — never a
    text-vs-text or nested-loop comparison."""
    plan = _plan(dq.QUERIES["pl_decontaminate"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
