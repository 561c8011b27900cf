"""ES 8 knn search over a dense_vector field — exact-cosine top-k via
JVM column math off the doc store, optional RRF hybrid with a BM25
query.  BEYOND-REFERENCE; parity target is the ES 8 request/response
shape with the engine's documented exactness pin (num_candidates is an
HNSW dial and is accepted-but-ignored)."""

import math

import numpy as np
import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans.ast import QueryError
from sonar_tantivy_spark.plans.schema import IndexSchema

DIMS = 8
N_DOCS = 60

SCHEMA = [
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "emb", "type": "dense_vector", "options": {"dims": DIMS}},
    {"name": "tag", "type": "text", "options": {"indexing": None,
                                                "stored": True}},
]

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _mk_docs():
    rng = np.random.default_rng(7)
    docs = []
    for i in range(N_DOCS):
        v = rng.normal(size=DIMS)
        body = " ".join(WORDS[j] for j in rng.integers(0, len(WORDS), 6))
        docs.append({"body": body, "emb": [float(x) for x in v],
                     "tag": f"d{i:03d}"})
    # edge rows: null vector and zero vector
    docs.append({"body": "alpha null vector", "emb": None, "tag": "dnull"})
    docs.append({"body": "alpha zero vector", "emb": [0.0] * DIMS,
                 "tag": "dzero"})
    return docs


@pytest.fixture(scope="module")
def docs():
    return _mk_docs()


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("knn")))
    idx = cat.create_index("v", SCHEMA)
    idx.add(docs)
    return idx


def _brute(docs, qv, k):
    """(docid, es_score) by (score DESC, docid ASC) — numpy truth."""
    qv = np.asarray(qv, dtype=np.float64)
    qn = np.linalg.norm(qv)
    out = []
    for d, doc in enumerate(docs):
        if doc["emb"] is None:
            continue
        v = np.asarray(doc["emb"], dtype=np.float32).astype(np.float64)
        dn = np.linalg.norm(v)
        score = 0.0 if dn == 0 else (1.0 + float(v @ qv) / (dn * qn)) / 2.0
        out.append((d, score))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_knn_exact_topk(index, docs):
    qv = [float(x) for x in np.random.default_rng(9).normal(size=DIMS)]
    res = index.query_json({"knn": {"field": "emb", "query_vector": qv,
                                    "k": 10, "num_candidates": 50}})
    got = [(h["docid"], round(h["score"], 6)) for h in res["docs"]]
    want = [(d, round(s, 6)) for d, s in _brute(docs, qv, 10)]
    assert got == want
    # stored fields ride along like any hit
    assert res["docs"][0]["doc"]["tag"][0].startswith("d")


def test_knn_null_and_zero_vectors(index, docs):
    # query ~aligned with nothing special; null-vector doc can never
    # appear, zero-vector doc scores 0 and only appears if k reaches it
    qv = [1.0] * DIMS
    res = index.query_json({"knn": {"field": "emb", "query_vector": qv,
                                    "k": N_DOCS + 2}})
    tags = [h["doc"]["tag"][0] for h in res["docs"]]
    assert "dnull" not in tags
    assert tags[-1] == "dzero"  # score 0 sorts last


def test_knn_validation(index):
    with pytest.raises(QueryError, match="dense_vector"):
        index.query_json({"knn": {"field": "body",
                                  "query_vector": [1.0] * DIMS}})
    with pytest.raises(QueryError, match="dims"):
        index.query_json({"knn": {"field": "emb",
                                  "query_vector": [1.0] * (DIMS - 1)}})
    with pytest.raises(QueryError, match="norm"):
        index.query_json({"knn": {"field": "emb",
                                  "query_vector": [0.0] * DIMS}})
    with pytest.raises(QueryError, match="query_vector"):
        index.query_json({"knn": {"field": "emb"}})


def test_knn_ingest_dims_check(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path))
    idx = cat.create_index("v", SCHEMA)
    with pytest.raises(QueryError, match="dims"):
        idx.add([{"body": "x", "emb": [1.0] * (DIMS + 1), "tag": "t"}])


def test_knn_hybrid_rrf(index, docs):
    """knn + query fuse by RRF: verify against a hand-computed fusion
    of the two independent rankings."""
    qv = [float(x) for x in np.random.default_rng(11).normal(size=DIMS)]
    body_q = {"term": {"body": "alpha"}}
    window, rc, k = 20, 60, 10
    res = index.query_json({
        "query": body_q,
        "knn": {"field": "emb", "query_vector": qv, "k": k},
        "rank": {"rrf": {"rank_window_size": window,
                         "rank_constant": rc}},
        "limit": k})
    # truth legs
    bm = [h["docid"] for h in index.query_json(
        {"query": body_q, "limit": window})["docs"]]
    kn = [d for d, _ in _brute(docs, qv, window)]
    rrf: dict[int, float] = {}
    for leg in (bm, kn):
        for i, d in enumerate(leg):
            rrf[d] = rrf.get(d, 0.0) + 1.0 / (rc + i + 1)
    want = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got = [(h["docid"], round(h["score"], 9)) for h in res["docs"]]
    assert got == [(d, round(s, 9)) for d, s in want]


def test_knn_respects_deletes(spark, docs, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path))
    idx = cat.create_index("v", SCHEMA)
    idx.add(docs)
    qv = [float(x) for x in np.random.default_rng(9).normal(size=DIMS)]
    top = idx.query_json({"knn": {"field": "emb", "query_vector": qv,
                                  "k": 3}})["docs"]
    idx.delete_docs([top[0]["docid"]])
    after = idx.query_json({"knn": {"field": "emb", "query_vector": qv,
                                    "k": 3}})["docs"]
    assert after[0]["docid"] == top[1]["docid"]
    assert all(h["docid"] != top[0]["docid"] for h in after)


def test_dense_vector_schema_roundtrip():
    s = IndexSchema.from_json(
        '[{"name": "emb", "type": "dense_vector", "options": {"dims": 4}}]')
    f = s.field("emb")
    assert f.dims == 4 and f.stored and not f.indexed
    s2 = IndexSchema.from_json(s.to_json())
    assert s2.field("emb").dims == 4
