"""Randomized query fuzz: arbitrary bool/term/phrase/fuzzy/range trees
generated from a fixed seed must score rank- and value-identically
(1e-9) between the Spark engine (default pruned path included) and the
independent pure-Python oracle."""

import random

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tests.oracle import OracleIndex

N = 700
TERMS = ["hello", "world", "the", "stem", "needl", "mundo", "wbakoba0",
         "wkobari1", "nosuchterm"]


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(N)


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("fuzz")))
    i = cat.create_index("fuzz", TRANSCRIPT_SCHEMA)
    i.add_df(spark.createDataFrame(corpus),
             order_cols=["conv_id", "turn_idx"], num_segments=3)
    return i


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus.to_dict("records"),
                       {"text": "en_stem", "role": "raw", "tool": "raw"})


def gen_node(rng: random.Random, depth: int = 0) -> A.Node:
    kinds = ["term", "term", "term", "phrase", "fuzzy", "range", "bool",
             "prefix", "slop", "terms_set", "dismax", "phrase_prefix",
             "exists", "wildcard", "const_score", "function_score",
             "boosting", "ids", "span_near", "span_first", "span_not",
             "span_contain", "rank_feature", "distance_feature",
             "pinned", "script_score", "combined_fields"]
    if depth >= 2:
        kinds = ["term", "term", "phrase", "range", "prefix",
                 "terms_set", "exists", "wildcard", "ids"]
    kind = rng.choice(kinds)
    if kind == "ids":
        # mix in-range, segment-straddling, and out-of-range ids; the
        # engine resolves globally, the oracle clamps to [0, N)
        pool = [0, 1, 5, N // 3, N // 2, 2 * N // 3, N - 1, N, N + 50]
        return A.IdsQ(sorted(rng.sample(pool, rng.randint(1, 4))))
    if kind == "wildcard":
        # the term-dictionary regexes a wildcard pattern translates to
        # (ast._wildcard_node): 'h?llo', 'w*d', 'he*o', dead pattern
        return A.RegexQ("text", rng.choice(
            ["h.llo", "w.*d", "he.*o", "zz.*q"]))
    if kind == "const_score":
        return A.ConstScoreQ(gen_node(rng, depth + 1),
                             rng.choice([1.0, 0.5, 2.5]))
    if kind == "boosting":
        return A.BoostingQ(gen_node(rng, depth + 1),
                           gen_node(rng, depth + 1),
                           rng.choice([0.0, 0.2, 0.5, 1.0]))
    if kind == "function_score":
        fns = [{"kind": "field_value_factor", "field": "turn_idx",
                "factor": rng.choice([0.5, 1.0]),
                "modifier": rng.choice(["none", "log1p", "sqrt"]),
                "missing": 1.0},
               {"kind": "gauss", "field": "turn_idx", "is_date": False,
                "origin": rng.choice([0, 3]), "scale": 2.0,
                "decay": 0.5, "offset": 0.0},
               {"kind": "random_score", "field": "turn_idx",
                "seed": rng.choice([0, 7, 42])}]
        rng.shuffle(fns)
        return A.FunctionScoreQ(
            gen_node(rng, depth + 1), fns[:rng.randint(1, 2)],
            rng.choice(["multiply", "sum"]),
            rng.choice(["multiply", "sum", "replace"]))
    if kind == "terms_set":
        k = rng.randint(1, 3)
        return A.TermSetQ("text", rng.sample(TERMS, k))
    if kind == "exists":
        return A.ExistsQ(rng.choice(["text", "tool", "role"]))
    if kind == "dismax":
        subs = [gen_node(rng, depth + 1)
                for _ in range(rng.randint(1, 3))]
        return A.DisMaxQ(subs, rng.choice([0.0, 0.3, 1.0]))
    if kind == "phrase_prefix":
        return A.PhrasePrefixQ("text", ["hello"],
                               rng.choice(["wor", "wba", "zzz"]))
    if kind == "span_near":
        n_cl = rng.randint(1, 3)
        clauses = [tuple(rng.sample(TERMS, rng.randint(1, 2)))
                   for _ in range(n_cl)]
        return A.SpanNearQ("text", clauses, slop=rng.choice([0, 1, 3]),
                           in_order=rng.random() < 0.7)
    if kind == "span_first":
        return A.SpanFirstQ(
            A.SpanNearQ("text", [tuple(rng.sample(TERMS, 1)),
                                 tuple(rng.sample(TERMS, 1))][:rng.randint(1, 2)],
                        slop=rng.choice([0, 2])),
            end=rng.choice([2, 4, 8]))
    if kind == "span_not":
        return A.SpanNotQ(
            "text", tuple(rng.sample(TERMS, rng.randint(1, 2))),
            tuple(rng.sample(TERMS, rng.randint(1, 2))),
            pre=rng.choice([0, 1, 2]), post=rng.choice([0, 1, 3]))
    if kind == "rank_feature":
        fn = rng.choice(["saturation", "log", "sigmoid", "linear"])
        return A.RankFeatureQ(
            "turn_idx", fn, boost=rng.choice([1.0, 2.0]),
            pivot=rng.choice([2.0, 5.0]),
            scaling_factor=rng.choice([1.0, 3.0]),
            exponent=rng.choice([0.5, 1.0]))
    if kind == "distance_feature":
        return A.DistanceFeatureQ(
            "turn_idx", origin=rng.choice([0, 4, 8]),
            pivot=rng.choice([1.0, 3.0]),
            boost=rng.choice([1.0, 2.5]))
    if kind == "pinned":
        # mix live, dead, and duplicate-with-organic ids (dead ids drop;
        # a pinned organic hit must not show twice)
        pool = [0, 2, 7, N // 2, N - 1, N + 9]
        return A.PinnedQ(rng.sample(pool, rng.randint(1, 3)),
                         gen_node(rng, depth + 1))
    if kind == "script_score":
        script = rng.choice(
            ["_score * 2 + turn_idx / 10", "_score + 1.5",
             "turn_idx % 3 + _score", "-_score + turn_idx ** 0.5",
             "1 / turn_idx"])  # div-by-zero → 0.0, both sides
        fields = ["turn_idx"] if "turn_idx" in script else []
        return A.ScriptScoreQ(gen_node(rng, depth + 1), script, fields)
    if kind == "combined_fields":
        # the transcript schema has one en_stem field and two raw
        # fields: exercise both the single-field degeneration and the
        # genuine two-field (raw) blend, with asymmetric weights
        shape = rng.choice([
            ([("text", 1.0)], rng.sample(TERMS, rng.randint(1, 3))),
            ([("role", rng.choice([1.0, 2.0])),
              ("tool", rng.choice([0.5, 1.0]))],
             rng.sample(["user", "assistant", "search", "python",
                         "bash", "tool"], rng.randint(1, 3))),
        ])
        fields, terms = shape
        op = rng.choice(["or", "or", "and"])
        msm = rng.choice([0, 0, 2]) if op == "or" else 0
        return A.CombinedFieldsQ(fields, terms, op, msm)
    if kind == "span_contain":
        # RIGID big (slop 0, ordered — the parse-time pin) of 1-2
        # clauses with 1-2 alternatives each; single-clause little
        big = A.SpanNearQ("text",
                          [tuple(rng.sample(TERMS, rng.randint(1, 2)))
                           for _ in range(rng.randint(1, 2))],
                          slop=0, in_order=True)
        return A.SpanContainQ(
            "text", big, tuple(rng.sample(TERMS, rng.randint(1, 2))),
            rng.choice(["containing", "within"]))
    if kind == "term":
        if rng.random() < 0.15:
            return A.TermQ("role", rng.choice(["tool", "user", "assistant"]))
        return A.TermQ("text", rng.choice(TERMS))
    if kind == "phrase":
        return A.PhraseQ("text", ["hello", "world"])
    if kind == "slop":
        return A.PhraseQ("text", ["hello", "world"],
                         slop=rng.choice([1, 2, 4]),
                         in_order=rng.random() < 0.5)
    if kind == "prefix":
        return A.PrefixQ("text", rng.choice(["hel", "wor", "wba", "zzz"]))
    if kind == "fuzzy":
        return A.FuzzyQ("text", "helo", 1, rng.random() < 0.5,
                        prefix_length=rng.choice([0, 0, 1, 2]))
    if kind == "range":
        return A.RangeQ("turn_idx", gte=0, lte=rng.choice([1, 3, 6]))
    node = A.BoolQ()
    for _ in range(rng.randint(1, 3)):
        node.should.append(gen_node(rng, depth + 1))
    for _ in range(rng.randint(0, 2)):
        node.must.append(gen_node(rng, depth + 1))
    for _ in range(rng.randint(0, 1)):
        node.must_not.append(gen_node(rng, depth + 1))
    if rng.random() < 0.3:
        node.min_should = rng.randint(1, len(node.should))
    if rng.random() < 0.25:
        node.filter.append(gen_node(rng, depth + 1))
    if rng.random() < 0.25:
        return A.BoostQ(node, rng.choice([0.5, 2.0]))
    return node


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_engine_matches_oracle(idx, oracle, seed):
    rng = random.Random(1000 + seed)
    node = gen_node(rng)
    s = idx.searcher()
    for df in (s.top_k(node, limit=10), s.top_k_pruned(node, limit=10)):
        got = [(r["docid_g"], r["score"]) for r in df.collect()]
        want = oracle.top_k(node, 10)
        assert [d for d, _ in got] == [d for d, _ in want], (seed, node)
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9, abs=1e-12), (seed, node)


@pytest.mark.parametrize("seed", range(12))
def test_sorted_pruning_fuzz(spark, idx, seed):
    """Randomized query trees under the SORTED collector: the zone-map
    pruned path must match the unpruned sorted plan exactly (hits,
    sort values, docid tie-breaks) for every generated shape, including
    under-filled results and non-fast sort fields."""
    rng = random.Random(1000 + seed)
    node = gen_node(rng)
    sort_by = rng.choice(["ts", "turn_idx", "text"])  # text -> fallback
    limit = rng.choice([3, 10, 50])
    s = idx.searcher()
    exact = [(r["docid_g"], r["score"]) for r in
             s.top_k(node, limit=limit, sort_by=sort_by).collect()]
    pruned = [(r["docid_g"], r["score"]) for r in
              s.top_k_sorted_pruned(node, limit=limit,
                                    sort_by=sort_by).collect()]
    assert exact == pruned, (seed, sort_by, limit)
