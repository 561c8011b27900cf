"""ES pipeline aggregations + composite agg (round-5 late surfaces).

Semantics pinned (reference behavior: ES pipeline aggs are a
coordinating-node REDUCE over the parent agg's already-reduced bucket
list — cardinality = #buckets, never #docs — which is exactly how the
engine runs them: a driver-side post-pass in search.py _apply_pipes /
the sibling loop, zero extra distributed work):

  * cumulative_sum: running total of buckets_path over the bucket
    order; every bucket gets a value.
  * derivative: bucket[i] − bucket[i−1]; the FIRST bucket carries no
    value at all (the ES contract — nothing to diff against).
  * moving_fn: fn over the window [i−window+shift, i+shift) of PRIOR
    values (ES default shift=0 excludes the current bucket, so bucket
    0 is null); fn ∈ avg/sum/min/max.
  * bucket_sort: applied LAST — re-sorts the final bucket list by
    buckets_path keys and truncates with from/size.
  * max_bucket/min_bucket/avg_bucket/sum_bucket/stats_bucket: sibling
    reduce over another agg's buckets via "parent>path"; max/min
    return ALL arg-keys (ES keys list).
  * composite: deterministic multi-source key paging — buckets ordered
    by the full source tuple asc, after-key = strict lexicographic
    cursor, after_key returned only for a full page.
"""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N_TURNS = 700


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def oracle(corpus):
    docs = corpus.to_dict("records")
    return OracleIndex(docs, {"text": "en_stem", "role": "raw",
                              "tool": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("pipeaggs"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("transcripts", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus),
               order_cols=["conv_id", "turn_idx"], num_segments=3)
    return idx


def _hist_truth(corpus, oracle, index, interval=2):
    node = A.parse_json({"term": {"text": "hello"}}, index.schema)
    rows = corpus.iloc[sorted(oracle.score(node))]
    hist = (rows["turn_idx"] // interval * interval) \
        .value_counts().sort_index()
    return [(float(k), int(v)) for k, v in hist.items()]


def test_cumulative_sum_and_derivative(index, corpus, oracle):
    truth = _hist_truth(corpus, oracle, index)
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "h": {"histogram": {"field": "turn_idx", "interval": 2, "aggs": {
            "cs": {"cumulative_sum": {"buckets_path": "doc_count"}},
            "dv": {"derivative": {"buckets_path": "doc_count"}},
        }}}}})
    buckets = res["aggs"]["h"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in buckets] == truth
    run = 0.0
    for i, b in enumerate(buckets):
        run += b["doc_count"]
        assert b["cs"]["value"] == pytest.approx(run)
        if i == 0:
            assert "dv" not in b  # ES: first bucket has no derivative
        else:
            assert b["dv"]["value"] == pytest.approx(
                b["doc_count"] - buckets[i - 1]["doc_count"])


def test_moving_fn_window_semantics(index, corpus, oracle):
    truth = [v for _, v in _hist_truth(corpus, oracle, index)]
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "h": {"histogram": {"field": "turn_idx", "interval": 2, "aggs": {
            "mv": {"moving_fn": {"buckets_path": "doc_count",
                                 "window": 3, "fn": "avg"}},
            "mx": {"moving_fn": {"buckets_path": "doc_count",
                                 "window": 2, "shift": 1, "fn": "max"}},
        }}}}})
    buckets = res["aggs"]["h"]["buckets"]
    for i, b in enumerate(buckets):
        win = truth[max(0, i - 3):i]  # shift=0 EXCLUDES current bucket
        if not win:
            assert b["mv"]["value"] is None
        else:
            assert b["mv"]["value"] == pytest.approx(sum(win) / len(win))
        win2 = truth[max(0, i - 1):i + 1]  # shift=1 includes current
        assert b["mx"]["value"] == pytest.approx(max(win2))


def test_bucket_sort_truncates_last(index, corpus, oracle):
    truth = _hist_truth(corpus, oracle, index)
    want = sorted(truth, key=lambda t: (-t[1], t[0]))[:3]
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "h": {"histogram": {"field": "turn_idx", "interval": 2, "aggs": {
            "cs": {"cumulative_sum": {"buckets_path": "doc_count"}},
            "top": {"bucket_sort": {"sort": [
                {"doc_count": {"order": "desc"}},
                {"_key": {"order": "asc"}}], "size": 3}},
        }}}}})
    buckets = res["aggs"]["h"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in buckets] == want
    # cumulative_sum ran BEFORE the sort (full-list semantics)
    full = dict()
    run = 0.0
    for k, v in truth:
        run += v
        full[k] = run
    for b in buckets:
        assert b["cs"]["value"] == pytest.approx(full[b["key"]])


def test_sibling_bucket_aggs(index, corpus, oracle):
    truth = _hist_truth(corpus, oracle, index)
    vals = [v for _, v in truth]
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "h": {"histogram": {"field": "turn_idx", "interval": 2}},
        "hmax": {"max_bucket": {"buckets_path": "h>doc_count"}},
        "hmin": {"min_bucket": {"buckets_path": "h>doc_count"}},
        "havg": {"avg_bucket": {"buckets_path": "h>doc_count"}},
        "hsum": {"sum_bucket": {"buckets_path": "h>doc_count"}},
        "hstats": {"stats_bucket": {"buckets_path": "h>doc_count"}},
    }})
    a = res["aggs"]
    assert a["hmax"]["value"] == max(vals)
    assert a["hmax"]["keys"] == [k for k, v in truth if v == max(vals)]
    assert a["hmin"]["value"] == min(vals)
    assert a["havg"]["value"] == pytest.approx(sum(vals) / len(vals))
    assert a["hsum"]["value"] == sum(vals)
    st = a["hstats"]
    assert (st["count"], st["min"], st["max"], st["sum"]) == \
        (len(vals), min(vals), max(vals), sum(vals))


def test_composite_paging_covers_all_buckets(index, corpus, oracle):
    node = A.parse_json({"term": {"text": "hello"}}, index.schema)
    rows = corpus.iloc[sorted(oracle.score(node))]
    want = sorted(
        ((r, t, c) for (r, t), c in
         rows.dropna(subset=["tool"]).groupby(["role", "tool"]).size()
         .items()),
    )
    got, after = [], None
    for _ in range(100):
        body = {"sources": [{"r": {"terms": {"field": "role"}}},
                            {"t": {"terms": {"field": "tool"}}}],
                "size": 2}
        if after:
            body["after"] = after
        res = index.query_json({"query": {"term": {"text": "hello"}},
                                "limit": 0,
                                "aggs": {"c": {"composite": body}}})
        page = res["aggs"]["c"]
        got += [(b["key"]["r"], b["key"]["t"], b["doc_count"])
                for b in page["buckets"]]
        after = page.get("after_key")
        if not after:
            break
    assert got == [(r, t, int(c)) for r, t, c in want]


def test_composite_metric_sub_agg(index, corpus, oracle):
    node = A.parse_json({"term": {"text": "hello"}}, index.schema)
    rows = corpus.iloc[sorted(oracle.score(node))]
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "c": {"composite": {
            "sources": [{"r": {"terms": {"field": "role"}}}],
            "size": 10,
            "aggs": {"mean_idx": {"avg": {"field": "turn_idx"}}}}}}})
    buckets = res["aggs"]["c"]["buckets"]
    truth = rows.groupby("role")["turn_idx"].agg(["size", "mean"])
    assert [b["key"]["r"] for b in buckets] == sorted(truth.index)
    for b in buckets:
        assert b["doc_count"] == int(truth.loc[b["key"]["r"], "size"])
        assert b["mean_idx"]["value"] == pytest.approx(
            float(truth.loc[b["key"]["r"], "mean"]))


def test_pipeline_validation_errors(index):
    with pytest.raises(A.QueryError):  # pipes need a bucket parent
        index.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
            "g": {"global": {"aggs": {
                "cs": {"cumulative_sum": {"buckets_path": "doc_count"}}}}}}})
    with pytest.raises(A.QueryError):  # bad moving_fn fn
        index.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
            "h": {"histogram": {"field": "turn_idx", "interval": 2,
                                "aggs": {"m": {"moving_fn": {
                                    "buckets_path": "doc_count",
                                    "fn": "median"}}}}}}})
    with pytest.raises(A.QueryError):  # sibling without a parent
        index.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
            "m": {"max_bucket": {"buckets_path": "nope>doc_count"}}}})
    with pytest.raises(A.QueryError):  # sibling parent must be a bucket agg
        index.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
            "s": {"stats": {"field": "turn_idx"}},
            "m": {"max_bucket": {"buckets_path": "s>avg"}}}})
    with pytest.raises(A.QueryError):  # composite needs sources
        index.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
            "c": {"composite": {"size": 2}}}})
    with pytest.raises(A.QueryError):  # after must name every source
        index.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
            "c": {"composite": {
                "sources": [{"r": {"terms": {"field": "role"}}},
                            {"t": {"terms": {"field": "tool"}}}],
                "after": {"r": "user"}}}}})


# ----------------------------------------------------- ES agg knobs (r5)
def test_terms_order_by_metric_and_key(index, corpus, oracle):
    node = A.parse_json({"term": {"text": "hello"}}, index.schema)
    rows = corpus.iloc[sorted(oracle.score(node))]
    res = index.query_json({"query": {"term": {"text": "hello"}},
                            "limit": 0, "aggs": {
        "by_metric": {"terms": {"field": "role", "size": 10,
                                "order": {"mean_idx": "desc"},
                                "aggs": {"mean_idx":
                                         {"avg": {"field": "turn_idx"}}}}},
        "by_key": {"terms": {"field": "role", "size": 10,
                             "order": {"_key": "asc"}}}}})
    truth = rows.groupby("role")["turn_idx"].mean()
    want = sorted(truth.index, key=lambda k: (-truth[k], k))
    assert [b["key"] for b in res["aggs"]["by_metric"]["buckets"]] == want
    assert [b["key"] for b in res["aggs"]["by_key"]["buckets"]] == \
        sorted(truth.index)


def test_terms_min_doc_count(index, corpus, oracle):
    node = A.parse_json({"term": {"text": "the"}}, index.schema)
    rows = corpus.iloc[sorted(oracle.score(node))]
    vc = rows["role"].value_counts()
    assert len(vc) > 1  # the hot term spans roles — a real floor test
    floor = int(vc.max())  # keeps only the biggest bucket(s)
    res = index.query_json({"query": {"term": {"text": "the"}},
                            "limit": 0, "aggs": {
        "r": {"terms": {"field": "role", "size": 10,
                        "min_doc_count": floor}}}})
    got = {b["key"]: b["doc_count"] for b in res["aggs"]["r"]["buckets"]}
    assert got == {k: int(c) for k, c in vc.items() if c >= floor}
    assert len(got) < len(vc)  # the floor actually cut buckets


def test_histogram_min_doc_count_zero_fills_gaps(index, corpus, oracle):
    # interval 1 over turn_idx guarantees interior gaps are possible;
    # compare against the full dense range of the matched values
    node = A.parse_json({"term": {"text": "mundo"}}, index.schema)
    rows = corpus.iloc[sorted(oracle.score(node))]
    res = index.query_json({"query": {"term": {"text": "mundo"}},
                            "limit": 0, "aggs": {
        "h": {"histogram": {"field": "turn_idx", "interval": 1,
                            "min_doc_count": 0, "aggs": {
            "dv": {"derivative": {"buckets_path": "doc_count"}}}}}}})
    buckets = res["aggs"]["h"]["buckets"]
    vc = rows["turn_idx"].value_counts()
    lo, hi = int(rows["turn_idx"].min()), int(rows["turn_idx"].max())
    assert [b["key"] for b in buckets] == [float(k) for k in
                                           range(lo, hi + 1)]
    for b in buckets:
        assert b["doc_count"] == int(vc.get(int(b["key"]), 0))
    # derivative sees the evenly spaced (gap-filled) sequence
    for i in range(1, len(buckets)):
        assert buckets[i]["dv"]["value"] == pytest.approx(
            buckets[i]["doc_count"] - buckets[i - 1]["doc_count"])


def test_agg_knob_validation_errors(index):
    with pytest.raises(A.QueryError):  # unknown order key
        index.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
            "r": {"terms": {"field": "role",
                            "order": {"nope": "desc"}}}}})
    with pytest.raises(A.QueryError):  # stats is not single-valued
        index.query_json({"query": {"all": {}}, "limit": 0, "aggs": {
            "r": {"terms": {"field": "role", "order": {"s": "desc"},
                            "aggs": {"s": {"stats":
                                           {"field": "turn_idx"}}}}}}})
