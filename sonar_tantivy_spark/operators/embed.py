"""Embedding preprocessing — distributed PCA / whitening.

Training-data pipelines whiten or reduce embeddings before near-dup
detection and ANN (decorrelated dimensions make cosine thresholds and
LSH planes behave; SemDeDup-style pipelines PCA-reduce before
clustering).  At 100 TB the only viable shape is the classic two-phase
one implemented here:

  phase 1 (distributed, ONE pass): each partition accumulates
      (n, Σx, Σx·xᵀ) over its vectors inside an Arrow batch iterator —
      per-task state is O(d²) floats (d=64 → 32 KB), independent of
      partition size; the per-partition rows (a few hundred for any
      realistic partition count) collect to the driver;
  phase 2 (driver, trivial): combine the partial sums exactly,
      mean/covariance → eigendecomposition (d×d, microseconds);
  phase 3 (distributed, map-only): project/whiten each vector with the
      broadcast (closured) numpy matrices in a vectorized pandas UDF.

Sign convention: each component's largest-|loading| coordinate is made
positive, so re-runs and different partitionings produce IDENTICAL
projections (eigenvectors are otherwise sign-ambiguous).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def covariance_stats(df: DataFrame, col: str = "embedding"):
    """Exact (mean, covariance, n) of the vector column in one
    distributed pass of partial sums."""
    first = df.select(col).first()
    if first is None:
        raise ValueError("empty embedding table")
    d = len(first[0])
    out_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("ss", T.ArrayType(T.DoubleType())),
    ])

    def partials(batches):
        n = 0
        s = np.zeros(d)
        ss = np.zeros((d, d))
        for pdf in batches:
            m = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[col]])
            if len(m):
                n += len(m)
                s += m.sum(axis=0)
                ss += m.T @ m
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "ss": [ss.reshape(-1).tolist()]})

    rows = df.select(col).mapInPandas(partials, out_schema).collect()
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return mean, cov, n


def pca_fit(df: DataFrame, col: str = "embedding", k: int | None = None):
    """(mean, components[k, d], eigenvalues[k]) — components sorted by
    descending eigenvalue, sign-fixed (see module docstring)."""
    mean, cov, _ = covariance_stats(df, col)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order].T  # rows = components
    if k is not None:
        vals, vecs = vals[:k], vecs[:k]
    # deterministic sign: the largest-|loading| coordinate is positive
    for i in range(len(vecs)):
        j = int(np.argmax(np.abs(vecs[i])))
        if vecs[i][j] < 0:
            vecs[i] = -vecs[i]
    return mean, vecs, vals


def pca_project(df: DataFrame, mean, components, eigenvalues=None,
                col: str = "embedding", out_col: str = "pca",
                whiten: bool = False, eps: float = 1e-9) -> DataFrame:
    """Map-only projection: out = (x - mean) @ componentsᵀ, optionally
    scaled by 1/√eigenvalue (whitening).  The matrices ride into the
    executors as closured numpy constants (a few KB), Arrow-batched."""
    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64).T  # (d, k)
    if whiten:
        if eigenvalues is None:
            raise ValueError("whitening needs eigenvalues")
        w = w / np.sqrt(np.asarray(eigenvalues, dtype=np.float64) + eps)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(vs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        out = (m - mu) @ w
        return pd.Series(list(out))

    return df.withColumn(out_col, _proj(F.col(col)))
