"""dd_semdedup_kmeans vs a numpy brute-force replica: same k-means
clustering (via the operator, already numpy-pinned in test_kmeans.py),
then keep = no same-cluster mate with cosine >= tau and a smaller id.
This is the oracle for the one contract query that HAS no SQL oracle
(k-means is iterative — the sanctioned exemption)."""

import numpy as np
import pytest

from sonar_tantivy_spark import driver_queries as dq

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    rows = dq.QUERIES["dd_semdedup_kmeans"](spark, SF).collect()
    return {r["vec_id"]: (r["cluster"], r["keep"]) for r in rows}


def test_semdedup_matches_bruteforce(spark, result):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in emb])
    m = np.array([np.asarray(r["embedding"], dtype=np.float64)
                  for r in emb])
    # trust the operator's clustering (numpy-pinned in test_kmeans.py);
    # brute-force the keep rule from it
    clusters = {i: result[i][0] for i in ids}
    nrm = np.linalg.norm(m, axis=1)
    want = {}
    for x, i in enumerate(ids):
        keep = True
        if nrm[x] > 0:
            for y, j in enumerate(ids):
                if j >= i or nrm[y] == 0 or clusters[j] != clusters[i]:
                    continue
                cos = round(float(m[x] @ m[y]) / (nrm[x] * nrm[y]), 4)
                if cos >= dq.SEMDEDUP_TAU:
                    keep = False
                    break
        want[i] = keep
    got = {i: result[i][1] for i in ids}
    assert got == want
    # the rule actually fires on this corpus (planted dups exist)
    assert sum(not k for k in want.values()) > 0


def test_semdedup_every_vector_has_a_row(spark, result):
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(result) == n
    assert all(0 <= c < dq.SEMDEDUP_K for c, _ in result.values())
