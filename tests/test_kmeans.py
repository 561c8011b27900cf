"""Distributed Lloyd's k-means vs an exact numpy replica of the same
algorithm (farthest-point seeding, lowest-index tie-breaks, empty
clusters keep their centroid), plus the scale properties:
partitioning-invariant assignments and planted-cluster recovery."""

import numpy as np
import pytest

from sonar_tantivy_spark.operators import embed

SF = "/root/testdata/sf0.001"
K = 4
N_ITER = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _mat(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([np.asarray(r["embedding"], dtype=np.float64)
                  for r in rows])
    return ids, m


def _numpy_kmeans(m, k, n_iter):
    """Exact reference of the SAME algorithm (same seeding, same
    tie-breaks, same empty-cluster rule)."""
    cents = [m[0]]
    for _ in range(k - 1):
        c = np.array(cents)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        mind = np.round(d2.min(axis=1), 9)
        cents.append(m[int(np.argmax(mind))])  # argmax → first (min id)
    cents = np.array(cents)
    for _ in range(n_iter):
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        nxt = cents.copy()
        for j in range(k):
            if (a == j).any():
                nxt[j] = m[a == j].mean(axis=0)
        if np.allclose(nxt, cents, rtol=0, atol=1e-12):
            cents = nxt
            break
        cents = nxt
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, d2.argmin(axis=1)


def test_kmeans_matches_numpy(spark, emb):
    ids, m = _mat(emb)
    want_c, want_a = _numpy_kmeans(m, K, N_ITER)
    cents, assigned = embed.kmeans_fit(emb, K, n_iter=N_ITER)
    assert np.allclose(cents, want_c, atol=1e-9)
    got = {r["vec_id"]: r["cluster"]
           for r in assigned.select("vec_id", "cluster").collect()}
    assert [got[i] for i in ids] == list(want_a)


def test_kmeans_partitioning_invariant(spark, emb):
    c1, a1 = embed.kmeans_fit(emb.repartition(1), K, n_iter=4)
    c13, a13 = embed.kmeans_fit(emb.repartition(13), K, n_iter=4)
    assert np.allclose(c1, c13, atol=1e-9)
    g1 = dict(a1.select("vec_id", "cluster").collect())
    g13 = dict(a13.select("vec_id", "cluster").collect())
    assert g1 == g13


def test_kmeans_recovers_planted_clusters(spark):
    rng = np.random.default_rng(7)
    centers = np.array([[0.0] * 8, [10.0] * 8, [-10.0] * 8])
    rows = []
    for i in range(240):
        c = i % 3
        rows.append((i, (centers[c] + rng.normal(0, 0.3, 8)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigned = embed.kmeans_fit(df, 3, n_iter=6)
    got = assigned.select("vec_id", "cluster").collect()
    by_true = {}
    for r in got:
        by_true.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    # each planted cluster maps to exactly one learned cluster and the
    # three learned clusters are distinct
    assert all(len(s) == 1 for s in by_true.values())
    assert len(set.union(*by_true.values())) == 3
    # learned centroids sit on the planted centers
    learned = sorted(float(c.mean()) for c in cents)
    assert learned == pytest.approx([-10.0, 0.0, 10.0], abs=0.1)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 over 2 distinct points: one cluster must empty and keep its
    # seed centroid instead of NaN-ing
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, assigned = embed.kmeans_fit(df, 3, n_iter=3)
    assert not np.isnan(cents).any()
    assert assigned.select("cluster").distinct().count() <= 3
