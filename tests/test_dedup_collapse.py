"""Exact-duplicate collapse in the pair generators (round-3 verdict's
"hot-bucket quadratic" fix): a planted k-member identical-text cluster
must emit O(k) candidate pairs — star edges to one representative —
instead of the k(k-1)/2 all-pairs a shared LSH/band/hash bucket would
otherwise produce (the 100 TB boilerplate failure mode), while
dd_dup_clusters' output stays exactly what all-pairs would compute."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from sonar_tantivy_spark import driver_queries as dq

K_DUP = 1000  # planted identical-text cluster size


def _write_corpus(spark, path):
    """40 distinct docs + one text duplicated K_DUP times + one 2-member
    near-dup pair + a pair of short (<3-token) identical docs (whose
    group must NOT emit star edges — no shingles, matching the old
    all-pairs behaviour)."""
    rng = random.Random(7)
    vocab = ["spark", "query", "join", "filter", "scan", "merge", "sort",
             "hash", "group", "table", "column", "row", "batch", "stream"]
    rows = []
    for i in range(40):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(12)),
                     "en", "web", 0))
    boiler = ("the boilerplate footer text repeated on every page of the "
              "site with contact details terms of service privacy policy "
              "cookie notice copyright line navigation links and a long "
              "subscription banner asking readers to join the newsletter")
    for i in range(K_DUP):
        rows.append((100 + i, boiler, "en", "web", 0))
    near = "spark query join filter scan merge sort hash group table"
    rows.append((5000, near, "en", "web", 0))
    rows.append((5001, near + " extra", "en", "web", 0))
    rows.append((6000, "tiny doc", "en", "web", 0))
    rows.append((6001, "tiny doc", "en", "web", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df = df.withColumn("n_chars", F.length("text"))
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("collapse"))
    _write_corpus(spark, path)
    yield path
    dq.clear_cache()


def _brute_force_clusters(spark, sf_dir):
    """All-pairs ground truth (only feasible because reps are few):
    exact shingle-Jaccard >= 0.5 over every doc pair, connected
    components by label propagation in Python."""
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    sh = {}
    for d, t in docs.items():
        w = t.split(" ")
        sh[d] = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
    edges = []
    for a, b in itertools.combinations(sorted(docs), 2):
        if not sh[a] or not sh[b]:
            continue
        j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if round(j, 4) >= 0.5:
            edges.append((a, b))
    lab = {}
    for a, b in edges:
        lab.setdefault(a, a)
        lab.setdefault(b, b)
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(lab[a], lab[b])
            if lab[a] != m or lab[b] != m:
                lab[a] = lab[b] = m
                changed = True
    return lab


def test_pair_count_is_linear_in_cluster_size(spark, corpus):
    """The planted K_DUP-member cluster must contribute exactly K_DUP-1
    star edges (rep=100 to each member), never the ~500k all-pairs."""
    bands = dq.QUERIES["dd_minhash_bands"](spark, corpus).collect()
    in_cluster = [r for r in bands if 100 <= r["d1"] < 100 + K_DUP
                  and 100 <= r["d2"] < 100 + K_DUP]
    assert len(in_cluster) == K_DUP - 1
    assert all(r["d1"] == 100 and r["n_bands"] == dq.N_BANDS
               for r in in_cluster)
    # total candidate volume stays linear overall
    assert len(bands) < K_DUP + 100


def test_winnow_pairs_linear(spark, corpus):
    pairs = dq.QUERIES["dd_winnow_pairs"](spark, corpus).collect()
    in_cluster = [r for r in pairs if 100 <= r["d1"] < 100 + K_DUP
                  and 100 <= r["d2"] < 100 + K_DUP]
    assert len(in_cluster) == K_DUP - 1
    assert all(r["d1"] == 100 for r in in_cluster)
    assert len(pairs) < K_DUP + 100


def test_short_dup_group_emits_no_stars(spark, corpus):
    """The 2-token identical pair (6000, 6001) has no shingles: the old
    all-pairs plan emitted nothing for it, so the collapsed plan's star
    gate must drop it too."""
    bands = dq.QUERIES["dd_minhash_bands"](spark, corpus).collect()
    assert not any(r["d1"] >= 6000 or r["d2"] >= 6000 for r in bands)
    pairs = dq.QUERIES["dd_jaccard_pairs"](spark, corpus).collect()
    assert not any(r["d1"] >= 6000 or r["d2"] >= 6000 for r in pairs)


def test_clusters_match_all_pairs_ground_truth(spark, corpus):
    """dd_dup_clusters over the collapsed (star) edge set must equal the
    brute-force all-pairs connected components — the losslessness claim
    of the collapse."""
    got = {r["doc_id"]: r["cluster"]
           for r in dq.QUERIES["dd_dup_clusters"](spark, corpus).collect()}
    want = _brute_force_clusters(spark, corpus)
    assert got == want
    # sanity on the planted structure: one K_DUP cluster rooted at 100
    assert sum(1 for c in got.values() if c == 100) == K_DUP
    assert got.get(5001) == 5000


def test_jaccard_star_edges_are_exact_ones(spark, corpus):
    rows = dq.QUERIES["dd_jaccard_pairs"](spark, corpus).collect()
    stars = [r for r in rows if r["d1"] == 100]
    assert len(stars) == K_DUP - 1 and all(r["jaccard"] == 1.0 for r in stars)


def test_embed_pair_count_linear(spark, corpus, tmp_path):
    """Planted identical-embedding cluster: k=200 copies of one vector
    must emit 199 star edges with cos=1.0, plus a zero-vector dup group
    that must emit nothing (undefined cosine never paired before)."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        rows.append((i, [float(x) for x in rng.normal(size=8)], 0))
    dup = [float(x) for x in rng.normal(size=8)]
    for i in range(200):
        rows.append((1000 + i, dup, 0))
    rows.append((9000, [0.0] * 8, 0))
    rows.append((9001, [0.0] * 8, 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    pairs = dq.QUERIES["dd_embed_cosine_pairs"](spark, path).collect()
    in_cluster = [r for r in pairs if r["v1"] >= 1000 and r["v2"] >= 1000]
    assert len(in_cluster) == 199
    assert all(r["v1"] == 1000 and r["cos"] == 1.0 for r in in_cluster)
    assert not any(r["v1"] >= 9000 or r["v2"] >= 9000 for r in pairs)
    assert len(pairs) < 500
