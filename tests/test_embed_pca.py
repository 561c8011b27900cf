"""Distributed PCA/whitening vs exact numpy ground truth, plus the
properties that matter at scale: partitioning-invariance and a map-only
projection plan."""

import numpy as np
import pytest

from sonar_tantivy_spark.operators import embed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _numpy_truth(emb):
    m = np.array([np.asarray(r["embedding"], dtype=np.float64)
                  for r in emb.select("embedding").collect()])
    mean = m.mean(axis=0)
    cov = (m - mean).T @ (m - mean) / len(m)
    return m, mean, cov


def test_covariance_matches_numpy(spark, emb):
    mean, cov, n = embed.covariance_stats(emb)
    m, mean_np, cov_np = _numpy_truth(emb)
    assert n == len(m)
    assert np.allclose(mean, mean_np, atol=1e-9)
    assert np.allclose(cov, cov_np, atol=1e-9)


def test_covariance_partitioning_invariant(spark, emb):
    a = embed.covariance_stats(emb.repartition(1))
    b = embed.covariance_stats(emb.repartition(13))
    assert np.allclose(a[0], b[0], atol=1e-12)
    assert np.allclose(a[1], b[1], atol=1e-12)


def test_projection_matches_numpy_and_whitens(spark, emb):
    k = 8
    mean, comps, vals = embed.pca_fit(emb, k=k)
    m, mean_np, cov_np = _numpy_truth(emb)
    # eigenvalues: top-k of the numpy covariance, descending
    vals_np = np.sort(np.linalg.eigvalsh(cov_np))[::-1][:k]
    assert np.allclose(vals, vals_np, atol=1e-9)
    out = embed.pca_project(emb, mean, comps, vals, whiten=False)
    proj = np.array(
        [np.asarray(r["pca"]) for r in
         out.orderBy("vec_id").select("pca").collect()])
    ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").collect()]
    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    m_sorted = np.array([rows[i] for i in ids])
    want = (m_sorted - mean_np) @ np.asarray(comps).T
    assert np.allclose(proj, want, atol=1e-8)
    # captured variance per component = eigenvalue
    assert np.allclose(proj.var(axis=0), vals, atol=1e-8)
    # whitened: identity covariance over the projected dims
    wout = embed.pca_project(emb, mean, comps, vals, whiten=True)
    wproj = np.array([np.asarray(r["pca"]) for r in
                      wout.orderBy("vec_id").select("pca").collect()])
    wcov = np.cov(wproj, rowvar=False, bias=True)
    assert np.allclose(wcov, np.eye(k), atol=1e-6)


def test_projection_plan_map_only(spark, emb):
    mean, comps, vals = embed.pca_fit(emb, k=4)
    plan = (embed.pca_project(emb, mean, comps, vals)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan
