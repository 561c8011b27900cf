"""Aggregation fuzz tier: randomized agg requests vs a pure-Python
reference over the SAME matched rows.  The unit tests pin each agg
kind in isolation; this tier pins the INTERACTIONS — metric sub-aggs
riding ordered/floored terms buckets, pipeline chains over gap-filled
histograms, bucket_sort after value-producing pipes, sibling reduces
over any parent — across 20 seeded random request shapes."""

import random

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N_TURNS = 600
TERMS = ["the", "hello", "tool", "run"]


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus.to_dict("records"),
                       {"text": "en_stem", "role": "raw", "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("aggfuzz"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


# ------------------------------------------------- pure-Python reference
def _metric(rows, kind, field):
    vals = [r[field] for r in rows if r.get(field) is not None]
    if kind == "value_count":
        return {"value": len(vals)}
    if kind == "cardinality":
        return {"value": len(set(vals))}
    if not vals:
        return {"value": None}
    if kind == "avg":
        return {"value": sum(vals) / len(vals)}
    if kind == "sum":
        return {"value": sum(vals)}
    if kind == "min":
        return {"value": min(vals)}
    if kind == "max":
        return {"value": max(vals)}
    raise AssertionError(kind)


def _bpath(bucket, path):
    head = path.split(".")[0]
    if head in ("doc_count", "_count"):
        return float(bucket["doc_count"])
    if head == "_key":
        return float(bucket["key"])
    v = bucket[head]["value"]
    return None if v is None else float(v)


def _ref_pipes(buckets, pipes):
    sorts = []
    for sub_name, pkind, pbody in pipes:
        if pkind == "bucket_sort":
            sorts.append(pbody)
            continue
        path = pbody.get("buckets_path", "doc_count")
        vals = [_bpath(b, path) for b in buckets]
        if pkind == "cumulative_sum":
            run = 0.0
            for b, v in zip(buckets, vals):
                run += (v or 0.0)
                b[sub_name] = {"value": run}
        elif pkind == "derivative":
            for i, b in enumerate(buckets):
                if i and vals[i] is not None and vals[i - 1] is not None:
                    b[sub_name] = {"value": vals[i] - vals[i - 1]}
        elif pkind == "moving_fn":
            w = int(pbody.get("window", 5))
            fn = {"avg": lambda x: sum(x) / len(x), "sum": sum,
                  "min": min, "max": max}[pbody.get("fn", "avg")]
            for i, b in enumerate(buckets):
                win = [v for v in vals[max(0, i - w):i] if v is not None]
                b[sub_name] = {"value": fn(win) if win else None}
    for pbody in sorts:
        for s in reversed(pbody.get("sort") or []):
            (path, sb), = s.items()
            desc = (sb or {}).get("order", "asc") == "desc"
            buckets.sort(key=lambda b: ((v := _bpath(b, path)) is None,
                                        0.0 if v is None else v),
                         reverse=desc)
        frm = int(pbody.get("from", 0))
        size = pbody.get("size")
        buckets = (buckets[frm:frm + int(size)]
                   if size is not None else buckets[frm:])
    return buckets


def _ref_terms(rows, body):
    keyed = {}
    for r in rows:
        k = r.get("role")
        if k is not None:
            keyed.setdefault(k, []).append(r)
    metrics = [(sn, next(iter(sp)), next(iter(sp.values()))["field"])
               for sn, sp in (body.get("aggs") or {}).items()
               if next(iter(sp)) not in ("cumulative_sum", "derivative",
                                         "moving_fn", "bucket_sort")]
    pipes = [(sn, next(iter(sp)), next(iter(sp.values())))
             for sn, sp in (body.get("aggs") or {}).items()
             if next(iter(sp)) in ("cumulative_sum", "derivative",
                                   "moving_fn", "bucket_sort")]
    buckets = [{"key": k, "doc_count": len(v),
                **{sn: _metric(v, mk, f) for sn, mk, f in metrics}}
               for k, v in keyed.items()]
    mdc = int(body.get("min_doc_count", 1))
    buckets = [b for b in buckets if b["doc_count"] >= max(1, mdc)]
    order = body.get("order") or {"_count": "desc"}
    (okey, odir), = order.items()
    desc = odir == "desc"
    if okey == "_count":
        buckets.sort(key=lambda b: ((-1 if desc else 1) * b["doc_count"],
                                    b["key"]))
    elif okey == "_key":
        buckets.sort(key=lambda b: b["key"], reverse=desc)
    else:
        buckets.sort(key=lambda b: (b[okey]["value"] is None,
                                    (-1 if desc else 1)
                                    * (b[okey]["value"] or 0.0),
                                    b["key"]))
    buckets = buckets[:int(body.get("size", 10))]
    return _ref_pipes(buckets, pipes)


def _ref_hist(rows, body):
    interval = float(body["interval"])
    keyed = {}
    for r in rows:
        v = r.get("turn_idx")
        if v is not None:
            k = (v // interval) * interval
            keyed.setdefault(k, []).append(r)
    pipes = [(sn, next(iter(sp)), next(iter(sp.values())))
             for sn, sp in (body.get("aggs") or {}).items()]
    buckets = [{"key": float(k), "doc_count": len(v)}
               for k, v in sorted(keyed.items())]
    mdc = int(body.get("min_doc_count", 1))
    if mdc > 1:
        buckets = [b for b in buckets if b["doc_count"] >= mdc]
    if mdc == 0 and len(buckets) > 1:
        filled, expect = [], buckets[0]["key"]
        for b in buckets:
            while b["key"] - expect > interval / 2:
                filled.append({"key": expect, "doc_count": 0})
                expect += interval
            filled.append(b)
            expect = b["key"] + interval
        buckets = filled
    return _ref_pipes(buckets, pipes)


def _rand_request(rng):
    term = rng.choice(TERMS)
    kind = rng.choice(["terms", "histogram"])
    if kind == "terms":
        body = {"field": "role", "size": rng.choice([3, 10])}
        aggs = {}
        if rng.random() < 0.7:
            aggs["m"] = {rng.choice(["avg", "sum", "min", "max",
                                     "value_count"]):
                         {"field": "turn_idx"}}
        if rng.random() < 0.5:
            body["order"] = ({"m": rng.choice(["asc", "desc"])}
                             if "m" in aggs
                             else {rng.choice(["_count", "_key"]):
                                   rng.choice(["asc", "desc"])})
        if rng.random() < 0.4:
            body["min_doc_count"] = rng.choice([1, 2, 5])
        if rng.random() < 0.5:
            aggs["cs"] = {"cumulative_sum": {"buckets_path": "doc_count"}}
        if aggs:
            body["aggs"] = aggs
        return term, {"a": {"terms": body}}
    body = {"field": "turn_idx", "interval": rng.choice([1.0, 2.0, 4.0]),
            "min_doc_count": rng.choice([0, 1])}
    aggs = {}
    if rng.random() < 0.6:
        aggs["cs"] = {"cumulative_sum": {"buckets_path": "doc_count"}}
    if rng.random() < 0.6:
        aggs["dv"] = {"derivative": {"buckets_path": "doc_count"}}
    if rng.random() < 0.5:
        aggs["mv"] = {"moving_fn": {"buckets_path": "doc_count",
                                    "window": rng.choice([2, 3]),
                                    "fn": rng.choice(["avg", "max",
                                                      "sum"])}}
    if rng.random() < 0.4:
        aggs["bs"] = {"bucket_sort": {"sort": [
            {"doc_count": {"order": "desc"}}, {"_key": {"order": "asc"}}],
            "size": rng.choice([3, 5])}}
    if aggs:
        body["aggs"] = aggs
    req = {"a": {"histogram": body}}
    if rng.random() < 0.5:
        req["sib"] = {rng.choice(["max_bucket", "avg_bucket",
                                  "sum_bucket"]):
                      {"buckets_path": "a>doc_count"}}
    return term, req


def _canon(buckets):
    out = []
    for b in buckets:
        cb = {}
        for k, v in b.items():
            if isinstance(v, dict) and "value" in v:
                cb[k] = (None if v["value"] is None
                         else round(float(v["value"]), 6))
            elif k in ("key", "doc_count"):
                cb[k] = v
        out.append(cb)
    return out


def test_agg_fuzz_vs_reference(index, corpus, oracle):
    rng = random.Random(1234)
    for case in range(20):
        term, req = _rand_request(rng)
        node = A.parse_json({"term": {"text": term}}, index.schema)
        rows = corpus.iloc[sorted(oracle.score(node))].to_dict("records")
        got = index.query_json({"query": {"term": {"text": term}},
                                "limit": 0, "aggs": req})["aggs"]
        body = next(iter(req["a"].values()))
        want = (_ref_terms(rows, body)
                if "terms" in req["a"] else _ref_hist(rows, body))
        assert _canon(got["a"]["buckets"]) == _canon(want), \
            f"case {case}: {req}"
        if "sib" in req:
            kind = next(iter(req["sib"]))
            vals = [float(b["doc_count"]) for b in want]
            if kind == "max_bucket":
                assert got["sib"]["value"] == (max(vals) if vals else None)
            elif kind == "sum_bucket":
                assert got["sib"]["value"] == (sum(vals) if vals else None)
            else:
                assert got["sib"]["value"] == pytest.approx(
                    sum(vals) / len(vals)) if vals else True
