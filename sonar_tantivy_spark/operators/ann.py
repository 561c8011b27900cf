"""Approximate nearest neighbour over an embedding column.

Two paths, both pure Catalyst column math (fold-based dot products, no
Python in the scan):

* ``exact_topk``   — brute-force cosine top-k: the correctness baseline;
  a distributed scan + TakeOrderedAndProject, acceptable as the exact
  path at any scale because it never materializes pairs.
* ``lsh_topk``     — random-hyperplane LSH: T tables x P sign-bit
  buckets (planes drawn deterministically from the corpus itself),
  Hamming<=1 multiprobe per table.  Candidates are a bucket FILTER (the
  query's probe set is a driver-side literal), never a join; at scale
  the bucket columns are precomputed/partitioned and the filter prunes
  the scan.

Default config 4 tables x 5 planes, multiprobe 1: measured recall@5 =
0.85 against the exact baseline on the (adversarially uniform) synthetic
embeddings at sf0.1 — real-world clustered embeddings concentrate
cosine mass, which raises per-plane agreement and shrinks the candidate
fraction at the same recall.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_TABLES = 4
N_PLANES = 5  # per table; plane vectors = corpus vec_ids 1..20
MULTIPROBE = 1  # Hamming radius of the query's probe set per table

# IVF-flat: K sampled centroids (no Lloyd training — deterministic,
# reproducible, and the scale story is the cell-pruned scan, not the
# training); centroid c is corpus vector CENTROID_BASE + c.  Cell sizes
# are balanced (100-159 per cell over 2000 vectors at sf0.1).  Measured
# recall@5 vs exact on the adversarially-uniform synthetic embeddings:
# nprobe 4 -> 0.50 @ 25% scanned, 6 -> 0.60 @ 37%, 8 -> 0.78 @ 50%
# (uniform vectors are IVF's worst case — real clustered embeddings
# concentrate neighbors in fewer cells, shifting the curve up).
N_CELLS = 16
NPROBE = 4
CENTROID_BASE = 100


def dot_lit(col, vec) -> F.Column:
    """<col, literal-vector> as a fold — JVM-side, no UDF."""
    lit = F.array(*[F.lit(float(x)) for x in vec])
    prod = F.zip_with(F.transform(col, lambda x: x.cast("double")), lit,
                      lambda a, b: a * b)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_col(col) -> F.Column:
    return F.sqrt(F.aggregate(
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def plane_tables(emb_df: DataFrame, n_tables: int = N_TABLES,
                 n_planes: int = N_PLANES) -> list[list]:
    """Deterministic plane vectors: corpus rows 1..n_tables*n_planes."""
    need = n_tables * n_planes
    rows = {r["vec_id"]: r["embedding"] for r in
            emb_df.filter(F.col("vec_id").between(1, need)).collect()}
    return [[rows[t * n_planes + i + 1] for i in range(n_planes)]
            for t in range(n_tables)]


def bucket_col(emb_col, planes) -> F.Column:
    bits = [F.when(dot_lit(emb_col, p) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for p in planes]
    return F.concat(*bits)


def bucket_of(vec, planes) -> str:
    return "".join(
        "1" if sum(float(a) * float(b) for a, b in zip(vec, p)) >= 0 else "0"
        for p in planes)


def probe_set(bucket: str, radius: int = MULTIPROBE) -> list[str]:
    """All buckets within Hamming ``radius`` of ``bucket``."""
    out = {bucket}
    frontier = {bucket}
    for _ in range(radius):
        nxt = set()
        for b in frontier:
            for i in range(len(b)):
                nxt.add(b[:i] + ("0" if b[i] == "1" else "1") + b[i + 1:])
        out |= nxt
        frontier = nxt
    return sorted(out)


def with_buckets(emb_df: DataFrame, tables: list[list]) -> DataFrame:
    out = emb_df
    for t, planes in enumerate(tables):
        out = out.withColumn(f"b{t}", bucket_col(F.col("embedding"), planes))
    return out


def _cosine_to(df: DataFrame, qvec) -> DataFrame:
    qn = math.sqrt(sum(float(x) * float(x) for x in qvec))
    cos = dot_lit(F.col("embedding"), qvec) / (norm_col(F.col("embedding"))
                                               * F.lit(qn))
    return df.select("vec_id", cos.alias("cos"))


def _topk(df: DataFrame, k: int) -> DataFrame:
    return (df.orderBy(F.desc(F.round("cos", 7)), F.asc("vec_id")).limit(k)
            .withColumn("cos", F.round("cos", 4)))


def exact_topk(emb_df: DataFrame, qvec_id: int, k: int = 5,
               qvec=None) -> DataFrame:
    if qvec is None:
        qvec = emb_df.filter(F.col("vec_id") == qvec_id) \
            .select("embedding").head()[0]
    return _topk(_cosine_to(emb_df.filter(F.col("vec_id") != qvec_id), qvec), k)


def lsh_topk(emb_df: DataFrame, qvec_id: int, k: int = 5,
             tables: list[list] | None = None,
             multiprobe: int = MULTIPROBE, qvec=None) -> DataFrame:
    """Bucketed ANN: filter to the query's multiprobe buckets (OR over
    tables — a literal filter on the scan, no join), exact cosine inside.
    Pass a pre-bucketed df (with_buckets) to amortize bucket columns."""
    if tables is None:
        tables = plane_tables(emb_df)
    q = qvec if qvec is not None else \
        emb_df.filter(F.col("vec_id") == qvec_id).select("embedding").head()[0]
    bucketed = emb_df if f"b{len(tables) - 1}" in emb_df.columns \
        else with_buckets(emb_df, tables)
    cond = None
    for t, planes in enumerate(tables):
        probes = probe_set(bucket_of(q, planes), multiprobe)
        c = F.col(f"b{t}").isin(probes)
        cond = c if cond is None else (cond | c)
    cand = bucketed.filter(cond & (F.col("vec_id") != qvec_id))
    return _topk(_cosine_to(cand, q), k)


def centroid_vecs(emb_df: DataFrame, n_cells: int = N_CELLS,
                  base: int = CENTROID_BASE) -> list:
    """Deterministic IVF centroids: corpus vectors base..base+n_cells-1."""
    rows = {r["vec_id"]: r["embedding"] for r in emb_df.filter(
        F.col("vec_id").between(base, base + n_cells - 1)).collect()}
    return [rows[base + c] for c in range(n_cells)]


def _cos_lit(col, vec) -> F.Column:
    n = math.sqrt(sum(float(x) * float(x) for x in vec))
    return dot_lit(col, vec) / (norm_col(col) * F.lit(n))


def cell_col(emb_col, cents) -> F.Column:
    """IVF cell = argmax cosine over the centroid list (ties -> lowest
    cell id, via array_position's first-match rule).  Pure column math;
    cosines rounded to 7 so the argmax is reproducible across engines."""
    scores = F.array(*[F.round(_cos_lit(emb_col, cv), 7) for cv in cents])
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_assign(emb_df: DataFrame, cents: list | None = None) -> DataFrame:
    """Adds the ``cell`` column.  At scale this runs once at ingest and
    the table is written partitioned by ``cell`` so probe filters prune
    files; here it is computed on the fly."""
    if cents is None:
        cents = centroid_vecs(emb_df)
    return emb_df.withColumn("cell", cell_col(F.col("embedding"), cents))


def _probe_cells(qvec, cents, nprobe: int) -> list[int]:
    qn = math.sqrt(sum(float(x) * float(x) for x in qvec))
    scored = []
    for cid, cv in enumerate(cents):
        cn = math.sqrt(sum(float(x) * float(x) for x in cv))
        cos = sum(float(a) * float(b) for a, b in zip(qvec, cv)) / (qn * cn)
        scored.append((round(cos, 7), cid))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return sorted(cid for _, cid in scored[:nprobe])


def ivf_topk(emb_df: DataFrame, qvec_id: int, k: int = 5,
             nprobe: int = NPROBE, cents: list | None = None,
             qvec=None) -> DataFrame:
    """IVF-flat ANN: restrict the exact-cosine scan to the ``nprobe``
    cells nearest the query.  The probe set is a driver-side literal
    ``cell IN (...)`` filter — with a cell-partitioned table that is
    partition pruning, scanning nprobe/K of the data; never a join.
    Pass a pre-assigned df (ivf_assign) to amortize the cell column."""
    if cents is None:
        cents = centroid_vecs(emb_df)
    q = qvec if qvec is not None else \
        emb_df.filter(F.col("vec_id") == qvec_id).select("embedding").head()[0]
    assigned = emb_df if "cell" in emb_df.columns else ivf_assign(emb_df, cents)
    probes = _probe_cells(q, cents, nprobe)
    cand = assigned.filter(F.col("cell").isin(probes)
                           & (F.col("vec_id") != qvec_id))
    return _topk(_cosine_to(cand, q), k)


def measure_recall_ivf(spark: SparkSession, sf_dir: str,
                       n_queries: int = 20, k: int = 5) -> dict:
    """recall@k of the IVF path vs the exact baseline, plus the mean
    scanned-candidate fraction (= probed-cell population share)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = centroid_vecs(emb)
    assigned = ivf_assign(emb, cents).persist()
    n = assigned.count()
    cell_pop = {r["cell"]: r["c"] for r in
                assigned.groupBy("cell").agg(F.count("*").alias("c")).collect()}
    qvecs = {r["vec_id"]: r["embedding"] for r in
             assigned.filter(F.col("vec_id") < n_queries).collect()}
    hits = cands = 0
    for qid in range(n_queries):
        exact = {r["vec_id"] for r in
                 exact_topk(assigned, qid, k, qvec=qvecs[qid]).collect()}
        approx = {r["vec_id"] for r in
                  ivf_topk(assigned, qid, k, cents=cents,
                           qvec=qvecs[qid]).collect()}
        hits += len(exact & approx)
        # scanned candidates = probed-cell population minus the query row
        probes = _probe_cells(qvecs[qid], cents, NPROBE)
        cands += sum(cell_pop.get(c, 0) for c in probes) - 1
    assigned.unpersist()
    return {
        "recall_at_k": round(hits / (n_queries * k), 4),
        "k": k,
        "n_queries": n_queries,
        "cand_frac": round(cands / (n_queries * n), 4),
        "config": f"ivf {N_CELLS} cells nprobe {NPROBE}",
        "recall_curve": "nprobe4 0.50@25% scan, 6 0.60@37%, 8 0.78@50% "
                        "(sf0.1; uniform vectors = IVF worst case)",
    }


def measure_recall(spark: SparkSession, sf_dir: str, n_queries: int = 20,
                   k: int = 5) -> dict:
    """recall@k of the LSH path vs the exact baseline over the first
    ``n_queries`` vectors, plus the mean candidate fraction."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tables = plane_tables(emb)
    bucketed = with_buckets(emb, tables).persist()
    n = bucketed.count()
    qvecs = {r["vec_id"]: r["embedding"] for r in
             bucketed.filter(F.col("vec_id") < n_queries).collect()}
    hits = cands = 0
    for qid in range(n_queries):
        exact = {r["vec_id"] for r in
                 exact_topk(bucketed, qid, k, qvec=qvecs[qid]).collect()}
        approx_df = lsh_topk(bucketed, qid, k, tables=tables,
                             qvec=qvecs[qid])
        approx = {r["vec_id"] for r in approx_df.collect()}
        hits += len(exact & approx)
        cond = None
        for t, planes in enumerate(tables):
            probes = probe_set(bucket_of(qvecs[qid], planes))
            c = F.col(f"b{t}").isin(probes)
            cond = c if cond is None else (cond | c)
        cands += bucketed.filter(cond).count()
    bucketed.unpersist()
    return {
        "recall_at_k": round(hits / (n_queries * k), 4),
        "k": k,
        "n_queries": n_queries,
        "cand_frac": round(cands / (n_queries * n), 4),
        "config": f"{N_TABLES}x{N_PLANES} multiprobe{MULTIPROBE}",
    }
