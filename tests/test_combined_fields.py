"""combined_fields query (ES CombinedFieldsQuery / Lucene
CombinedFieldQuery — BM25F with a shared k1/b) — BEYOND-REFERENCE
(toshi's DSL exposes no multi-field blending; semantics follow Lucene
with the engine's pinned deviations: exact any-field df, quantized
per-field norms in the blend — plans/ast.py CombinedFieldsQ).

Verified by: JSON-DSL grammar + rejection pins, rank+score parity
against the pure-Python oracle replica on a two-field corpus (or / and
/ minimum_should_match / asymmetric weights), degeneration identity
(single field, weight 1 ≈ the per-field match query scores), and
pruned-vs-exact agreement (block-max WAND with the blended bound)."""

import random

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from tests.oracle import OracleIndex

VOCAB = ["alpha", "bravo", "delta", "echo", "fox", "golf", "hotel",
         "india", "kilo", "lima", "mike", "nova", "oscar", "papa",
         "quebec", "romeo", "sierra", "tango", "uniform", "victor"]

SCHEMA = [
    {"name": "title", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "tag", "type": "text",
     "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                 "stored": True}},
    {"name": "n", "type": "i64", "options": {"stored": True}},
]

N_DOCS = 400


def _corpus() -> list[dict]:
    rng = random.Random(1234)
    docs = []
    for i in range(N_DOCS):
        # Zipf-ish skew: low-index words are hot in both fields, so
        # query terms genuinely occur in title AND body
        title = " ".join(
            rng.choices(VOCAB, weights=[1 / (r + 1) for r in
                                        range(len(VOCAB))],
                        k=rng.randint(2, 5)))
        body = " ".join(
            rng.choices(VOCAB, weights=[1 / (r + 1) for r in
                                        range(len(VOCAB))],
                        k=rng.randint(8, 40)))
        # a slice of docs misses one field entirely (None) — the norm
        # blend must skip fields the doc has no tokens in
        if i % 17 == 0:
            title = None
        if i % 23 == 0:
            body = None
        docs.append({"title": title, "body": body,
                     "tag": rng.choice(["a", "b"]), "n": i})
    return docs


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus, {"title": "en_stem", "body": "en_stem",
                                "tag": "raw"})


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idxcf"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("cfcorpus", SCHEMA)
    sdf = spark.createDataFrame(
        [(d["title"], d["body"], d["tag"], d["n"]) for d in corpus],
        "title string, body string, tag string, n long")
    idx.add_df(sdf.selectExpr("*", "n as __ord"),
               order_cols=["__ord"], num_segments=3)
    return idx


def _engine_topk(index, node, k=10):
    s = index.searcher()
    rows = s.top_k_pruned(node, limit=k).collect()
    return [(int(r["docid_g"]), float(r["score"])) for r in rows]


def _oracle_topk(oracle, node, k=10):
    sc = oracle.score(node)
    rows = sorted(sc.items(), key=lambda kv: (-round(kv[1], 7), kv[0]))
    return [(d, s) for d, s in rows[:k]]


def _assert_parity(index, oracle, body, k=10):
    node = A.parse_json(body, index.schema)
    eng = _engine_topk(index, node, k)
    orc = _oracle_topk(oracle, node, k)
    assert [d for d, _ in eng] == [d for d, _ in orc]
    for (_, a), (_, b) in zip(eng, orc):
        assert a == pytest.approx(b, rel=1e-9, abs=1e-12)


# -------------------------------------------------------------- grammar
def test_parse_shapes(index):
    schema = index.schema
    n = A.parse_json({"combined_fields": {
        "query": "alpha bravo", "fields": ["title^2", "body"]}}, schema)
    assert isinstance(n, A.CombinedFieldsQ)
    assert n.fields == [("title", 2.0), ("body", 1.0)]
    assert n.terms == ["alpha", "bravo"]
    assert n.operator == "or" and n.min_should == 0
    n = A.parse_json({"combined_fields": {
        "query": "alpha", "fields": ["body"], "operator": "and",
        "minimum_should_match": 2}}, schema)
    assert n.operator == "and" and n.min_should == 2
    # analyzed duplicates dedupe
    n = A.parse_json({"combined_fields": {
        "query": "alpha alpha bravo", "fields": ["title", "body"]}},
        schema)
    assert n.terms == ["alpha", "bravo"]


def test_parse_rejections(index):
    schema = index.schema
    with pytest.raises(A.QueryError):  # empty fields
        A.parse_json({"combined_fields": {"query": "alpha",
                                          "fields": []}}, schema)
    with pytest.raises(A.QueryError):  # unknown field
        A.parse_json({"combined_fields": {"query": "alpha",
                                          "fields": ["nope"]}}, schema)
    with pytest.raises(A.QueryError):  # non-text field
        A.parse_json({"combined_fields": {"query": "alpha",
                                          "fields": ["n"]}}, schema)
    with pytest.raises(A.QueryError):  # mixed analyzers
        A.parse_json({"combined_fields": {
            "query": "alpha", "fields": ["title", "tag"]}}, schema)
    with pytest.raises(A.QueryError):  # non-positive weight
        A.parse_json({"combined_fields": {
            "query": "alpha", "fields": ["title^0"]}}, schema)
    with pytest.raises(A.QueryError):  # duplicate field
        A.parse_json({"combined_fields": {
            "query": "alpha", "fields": ["title", "title^2"]}}, schema)
    with pytest.raises(A.QueryError):  # bad operator
        A.parse_json({"combined_fields": {
            "query": "alpha", "fields": ["title"],
            "operator": "xor"}}, schema)


def test_multi_match_cross_fields_rewrites(index):
    """multi_match type=cross_fields compiles to the combined_fields
    node (the pinned BlendedTermQuery→BM25F deviation) with the same
    field weights / operator / msm."""
    n = A.parse_json({"multi_match": {
        "query": "alpha bravo", "fields": ["title^2", "body"],
        "type": "cross_fields", "operator": "and"}}, index.schema)
    assert isinstance(n, A.CombinedFieldsQ)
    assert n.fields == [("title", 2.0), ("body", 1.0)]
    assert n.terms == ["alpha", "bravo"] and n.operator == "and"
    with pytest.raises(A.QueryError):  # mixed analyzers still rejected
        A.parse_json({"multi_match": {
            "query": "alpha", "fields": ["title", "tag"],
            "type": "cross_fields"}}, index.schema)


# --------------------------------------------------------------- parity
def test_parity_or(index, oracle):
    _assert_parity(index, oracle, {"combined_fields": {
        "query": "alpha tango", "fields": ["title", "body"]}})


def test_parity_weights(index, oracle):
    _assert_parity(index, oracle, {"combined_fields": {
        "query": "bravo echo", "fields": ["title^2.5", "body^0.5"]}})


def test_parity_and(index, oracle):
    _assert_parity(index, oracle, {"combined_fields": {
        "query": "alpha bravo delta", "fields": ["title^2", "body"],
        "operator": "and"}})


def test_parity_msm(index, oracle):
    _assert_parity(index, oracle, {"combined_fields": {
        "query": "alpha bravo delta echo", "fields": ["title", "body"],
        "minimum_should_match": 3}})


def test_parity_rare_term(index, oracle):
    # victor is the coldest vocab word — exercises sparse blends
    _assert_parity(index, oracle, {"combined_fields": {
        "query": "victor alpha", "fields": ["title^3", "body"]}})


def test_match_sets_agree(index, oracle):
    # beyond top-k: the FULL match set (count) agrees for and/or/msm
    for body in [
        {"combined_fields": {"query": "alpha bravo",
                             "fields": ["title", "body"]}},
        {"combined_fields": {"query": "alpha bravo",
                             "fields": ["title", "body"],
                             "operator": "and"}},
        {"combined_fields": {"query": "alpha bravo delta",
                             "fields": ["title", "body"],
                             "minimum_should_match": 2}},
    ]:
        node = A.parse_json(body, index.schema)
        assert index.count(body) == len(oracle.score(node))


# --------------------------------------------------------- degeneration
def test_single_field_degenerates_to_match(index, oracle):
    """combined_fields over ONE field at weight 1 must equal the
    per-field match query: blended tf = tf, blended dl = the quantized
    norm, blended avgdl = avgdl, any-field df = field df."""
    cf = A.parse_json({"combined_fields": {
        "query": "alpha bravo", "fields": ["body"]}}, index.schema)
    m = A.parse_json({"match": {"body": "alpha bravo"}}, index.schema)
    sc_cf = oracle.score(cf)
    sc_m = oracle.score(m)
    assert set(sc_cf) == set(sc_m)
    for d in sc_cf:
        assert sc_cf[d] == pytest.approx(sc_m[d], rel=1e-9)
    eng_cf = _engine_topk(index, cf)
    eng_m = _engine_topk(index, m)
    assert [d for d, _ in eng_cf] == [d for d, _ in eng_m]
    for (_, a), (_, b) in zip(eng_cf, eng_m):
        assert a == pytest.approx(b, rel=1e-9)


def test_missing_field_docs_still_score(index, oracle):
    """Docs lacking one of the queried fields blend only the fields
    they have (the MultiNormsLeafSimScorer rule) — present in both
    engine and oracle outputs with equal scores."""
    node = A.parse_json({"combined_fields": {
        "query": "alpha", "fields": ["title", "body"]}}, index.schema)
    sc = oracle.score(node)
    missing_title = [d for d in sc if oracle.docs[d]["title"] is None]
    assert missing_title, "corpus must include title-less matches"
    _assert_parity(index, oracle, {"combined_fields": {
        "query": "alpha", "fields": ["title", "body"]}}, k=25)


# -------------------------------------------------------------- pruning
def test_pruned_equals_exact(index):
    s = index.searcher()
    node = A.parse_json({"combined_fields": {
        "query": "victor alpha", "fields": ["title^2", "body"]}},
        index.schema)
    exact = [(int(r["docid_g"]), round(float(r["score"]), 9))
             for r in s.top_k(node, limit=10).collect()]
    pruned = [(int(r["docid_g"]), round(float(r["score"]), 9))
              for r in s.top_k_pruned(node, limit=10).collect()]
    assert exact == pruned


# ---------------------------------------------------- planted-skew pruning
def test_combined_fields_segment_skips_on_skew(spark, tmp_path_factory):
    """The blended WAND bound must actually WIN, not just stay exact:
    a query term confined to the first quarter of the build order
    (segments built in n order) yields absence proofs in the cold
    segments — top_k_pruned skips them and stays bit-identical to the
    exhaustive plan."""
    base = str(tmp_path_factory.mktemp("idxcfskew"))
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("cfskew", SCHEMA)
    rows = []
    for i in range(400):
        hot = "victor victor" if i < 100 else "alpha"
        rows.append((f"{hot} bravo", f"delta echo {hot}", "a", i))
    sdf = spark.createDataFrame(
        rows, "title string, body string, tag string, n long")
    idx.add_df(sdf.selectExpr("*", "n as __ord"),
               order_cols=["__ord"], num_segments=4)
    node = A.parse_json({"combined_fields": {
        "query": "victor", "fields": ["title^2", "body"]}}, idx.schema)
    s = idx.searcher()
    pruned = [(int(r["docid_g"]), round(float(r["score"]), 9))
              for r in s.top_k_pruned(node, limit=10).collect()]
    st = dict(s.last_prune)
    assert st["segments_skipped"] >= 2, st  # ~3 cold segments of 4
    exact = [(int(r["docid_g"]), round(float(r["score"]), 9))
             for r in s.top_k(node, limit=10).collect()]
    assert pruned == exact
