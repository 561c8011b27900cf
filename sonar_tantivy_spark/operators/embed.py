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


# ------------------------------------------------------------------ k-means
# Distributed Lloyd's k-means — the clustering stage SemDeDup-style
# pipelines run between PCA and within-cluster dedup, and the retrain
# path for the IVF index (operators/ann.py trains its own cells the
# same way; this is the standalone, reusable form).
#
# 100 TB shape per iteration: ONE map-only pass (assign: argmin over a
# broadcast (k, d) centroid matrix inside an Arrow batch) + per-
# partition partial sums (k·(d+1) floats per task, independent of
# partition size) collected and combined on the driver — the identical
# two-phase pattern as covariance_stats above.  Nothing shuffles; the
# per-iteration driver traffic is k·#partitions small rows.
#
# Determinism: farthest-point (k-center) seeding from the minimum-id
# vector, ties broken by id; assignment ties broken by lowest centroid
# index — so a fixed (input, k, n_iter) always yields the same
# clustering regardless of partitioning (float-sum ordering across
# partitions can differ at the ulp level, but assignments are integer
# argmins and the planted-cluster test pins them exactly).


def kmeans_init(df: DataFrame, k: int, col: str = "embedding",
                id_col: str = "vec_id") -> np.ndarray:
    """Deterministic farthest-point seeding: start from the minimum-id
    vector, then k−1 rounds of "the vector farthest from its nearest
    chosen centroid" (tie → minimum id).  Each round is one distributed
    pass; for large k, sample first and seed on the sample."""
    row = df.select(id_col, col).orderBy(F.asc(id_col)).first()
    if row is None:
        raise ValueError("empty embedding table")
    cents = [np.asarray(row[col], dtype=np.float64)]
    for _ in range(k - 1):
        c = np.array(cents)

        @F.pandas_udf(T.DoubleType())
        def _mind(vs: pd.Series) -> pd.Series:
            m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d2.min(axis=1))

        far = (df.select(id_col, col)
               .withColumn("__d", _mind(F.col(col)))
               .orderBy(F.desc(F.round(F.col("__d"), 9)), F.asc(id_col))
               .first())
        cents.append(np.asarray(far[col], dtype=np.float64))
    return np.array(cents)


def kmeans_assign(df: DataFrame, centroids, col: str = "embedding",
                  out_col: str = "cluster") -> DataFrame:
    """Map-only assignment: nearest centroid by squared euclidean
    distance (ties → lowest centroid index, numpy argmin's rule); the
    (k, d) centroid matrix rides into executors as a closured
    constant."""
    c = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def _assign(vs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return df.withColumn(out_col, _assign(F.col(col)))


def kmeans_fit(df: DataFrame, k: int, n_iter: int = 10,
               col: str = "embedding", id_col: str = "vec_id"):
    """Lloyd's iterations with exact per-cluster means via the
    two-phase partial-sum pattern.  Returns (centroids, assigned_df)
    where assigned_df carries the FINAL assignment under the returned
    centroids.  A cluster that empties keeps its previous centroid
    (the standard convention)."""
    first = df.select(col).first()
    if first is None:
        raise ValueError("empty embedding table")
    d = len(first[0])
    cents = kmeans_init(df, k, col=col, id_col=id_col)
    part_schema = T.StructType([
        T.StructField("c", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
    ])
    for _ in range(n_iter):
        a = kmeans_assign(df.select(col), cents, col=col)

        def partials(batches):
            n = np.zeros(k, dtype=np.int64)
            s = np.zeros((k, d))
            for pdf in batches:
                m = np.array([np.asarray(v, dtype=np.float64)
                              for v in pdf[col]])
                cl = pdf["cluster"].to_numpy()
                if len(m):
                    np.add.at(n, cl, 1)
                    np.add.at(s, cl, m)
            live = np.nonzero(n)[0]
            if len(live):
                yield pd.DataFrame({"c": live.astype("int32"),
                                    "n": n[live],
                                    "s": [s[i].tolist() for i in live]})

        rows = a.mapInPandas(partials, part_schema).collect()
        n = np.zeros(k, dtype=np.int64)
        s = np.zeros((k, d))
        for r in rows:
            n[r["c"]] += r["n"]
            s[r["c"]] += np.asarray(r["s"])
        nxt = cents.copy()
        live = n > 0
        nxt[live] = s[live] / n[live, None]
        if np.allclose(nxt, cents, rtol=0, atol=1e-12):
            cents = nxt
            break
        cents = nxt
    return cents, kmeans_assign(df, cents, col=col)
