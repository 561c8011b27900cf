"""Query AST — the engine's logical IR.

Mirrors the toshi-types query DSL the reference deserializes
(/root/reference/src-rust/query.rs:14-28) and dispatches
(src-rust/search.rs:44-61): Term, Boolean(must/must_not/should), Phrase,
Fuzzy, Regex, Range, Raw(string grammar), All.  Plus the tantivy string
grammar the ``query`` RPC parses (src-rust/index.rs:259): bare terms OR'd
across default fields, ``+t`` must, ``-t`` must_not, ``"a b"`` phrase,
``field:t``, ``[a TO b]`` ranges.

The AST is plain dataclasses; compilation to DataFrames lives in
operators/search.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from sonar_tantivy_spark.analyzer import analyze_terms
from sonar_tantivy_spark.plans.schema import IndexSchema


class QueryError(ValueError):
    pass


@dataclass
class Node:
    pass


@dataclass
class TermQ(Node):
    field: str
    term: str  # already analyzed (stemmed) form


@dataclass
class PhraseQ(Node):
    field: str
    terms: list[str]
    # BEYOND-REFERENCE extension (the reference's toshi DSL exposes no
    # slop).  Two pinned slop semantics, selected by ``in_order``:
    #
    # in_order=True (default, the string grammar's ``"a b"~N``):
    #   ordered within-window — each successive term must appear at a
    #   position p_prev < q <= p_prev + 1 + slop.
    # in_order=False (JSON/API only): Lucene-style transposing slop —
    #   each successive term within |q - (p_prev + 1)| <= slop and
    #   q != p_prev.  For two terms this is EXACTLY Lucene's
    #   SloppyPhraseScorer matchLength rule: "b a" matches "a b"~2
    #   (a transposition costs 2) but never "a b"~1.  For k > 2 the
    #   per-adjacent-pair window is this engine's documented
    #   generalization (Lucene's k-term greedy repositioning is not
    #   reproduced).
    #
    # slop=0 is the exact adjacent phrase under either mode.
    slop: int = 0
    in_order: bool = True


@dataclass
class PrefixQ(Node):
    """``foo*`` — constant-score prefix match over the term dictionary.
    BEYOND-REFERENCE extension (tantivy's QueryParser has no prefix
    syntax; its API-level automaton queries are the analog).  The
    prefix is lowercased but NOT stemmed (analyzing a fragment would
    corrupt it — the Lucene wildcard rule)."""

    field: str
    prefix: str


@dataclass
class TermSetQ(Node):
    """ES ``terms`` query / tantivy TermSetQuery: a doc matches when it
    contains ANY of the given terms in ``field``; constant score 1.0
    (the engine rule shared with prefix/fuzzy/regex: multi-term
    expansion queries are constant-score, like Lucene's default
    ConstantScore rewrite for ``terms``).  Values are matched VERBATIM
    against the dictionary — not analyzed — per ES ``terms`` semantics;
    callers searching a stemmed field pass stemmed terms (the
    ``match``-style analyzed OR is the existing BoolQ-of-TermQ)."""

    field: str
    terms: list[str]


@dataclass
class ExistsQ(Node):
    """ES ``exists`` query: docs that have ANY indexed token in
    ``field`` (for indexed fields — one postings-presence scan), or any
    non-null stored value (stored-only fields — one doc-store scan).
    Constant score 1.0.  BEYOND-REFERENCE extension; the first filter
    an ES user reaches for on sparse fields like transcript ``tool``."""

    field: str


@dataclass
class IdsQ(Node):
    """ES ``ids`` query: match documents by GLOBAL docid (the ``docid``
    field of query hits — manifest base + local id, the engine's stable
    external identifier).  Constant score 1.0, ES semantics: unknown /
    out-of-range ids are silently ignored, never an error.  Compiles to
    a literal candidate frame — ZERO index scan (the only query node
    that touches neither postings nor termdict); tombstone filtering
    still applies, so a deleted doc cannot be resurrected by id.
    BEYOND-REFERENCE extension (ES Ids query / Lucene TermInSetQuery
    over _id)."""

    values: list[int]


@dataclass
class DisMaxQ(Node):
    """ES/Lucene ``dis_max``: matches the union of ``queries``; score =
    max(clause scores) + tie_breaker * (sum - max).  tie_breaker=0 is
    pure best-field, 1.0 degrades to the bool-should sum."""

    queries: list[Node]
    tie_breaker: float = 0.0


@dataclass
class PhrasePrefixQ(Node):
    """ES ``match_phrase_prefix``: exact adjacency for ``terms`` with a
    final slot matched by ANY dictionary term starting with ``prefix``
    (type-ahead).  Constant score 1.0 (expansion-query rule — ES also
    rewrites the final slot to a constant-ish multi-term union).
    ``terms`` are analyzed; ``prefix`` is case-folded but never stemmed
    (the Lucene wildcard rule, same as PrefixQ)."""

    field: str
    terms: list[str]
    prefix: str


@dataclass(frozen=True)
class SpanExpand:
    """Unresolved ``span_multi`` clause (Lucene
    SpanMultiTermQueryWrapper): a prefix or term-dictionary regex that
    expands index-side (catalog.py's pre-execution rewrite pass, the
    MltQ/TermsLookupQ pattern) into the clause's alternatives tuple.
    Expansion is capped and raises past the cap — the Lucene
    TooManyClauses contract, never a silent truncation; an empty
    expansion makes the whole span match nothing.  Fuzzy sources are
    rejected at parse (the percolator's OSA pin).  NOT a query node:
    executors must never see one (guarded in _cand_span)."""

    kind: str   # "prefix" | "regex"
    value: str


@dataclass
class SpanNearQ(Node):
    """Lucene/ES ``span_near`` over ``span_term`` / ``span_or`` leaf
    clauses (BEYOND-REFERENCE; toshi's DSL exposes no spans).  Each
    clause is a tuple of alternative analyzed terms — length 1 is a
    plain ``span_term``, length > 1 is a ``span_or`` of span_terms.
    A single clause degenerates to that term/union on its own.

    Window semantics are the SAME documented pin as PhraseQ slop
    (per-adjacent-pair windows, selected by ``in_order``); Lucene's
    k-clause greedy repositioning is not reproduced.  Nested
    ``span_near`` clauses are rejected at parse with a clear error
    rather than silently approximated."""

    field: str
    clauses: list[tuple[str, ...]]
    slop: int = 0
    in_order: bool = True


@dataclass
class SpanNotQ(Node):
    """Lucene/ES ``span_not`` over SINGLE-CLAUSE include/exclude spans
    (span_term / span_or): an include position p survives iff no
    exclude position q lies in [p - pre, p + post] — exact Lucene
    semantics for single-term spans.  Multi-clause (span_near) includes
    are rejected at parse: the engine's chains track only final-clause
    positions, not span extents, and approximating overlap would be a
    silent semantic lie (same philosophy as the nested-span_near
    rejection)."""

    field: str
    include: tuple[str, ...]
    exclude: tuple[str, ...]
    pre: int = 0
    post: int = 0


@dataclass
class SpanFirstQ(Node):
    """Lucene/ES ``span_first``: matches of ``child`` whose span END
    position is <= ``end`` (Lucene SpanFirstQuery rule; for a chain
    ending at token position p the span end is p + 1)."""

    child: SpanNearQ
    end: int


PINNED_BASE = 1.7014124e38  # the ES PinnedQueryBuilder pin score base


@dataclass
class PinnedQ(Node):
    """ES ``pinned`` query: the listed GLOBAL docids rank FIRST, in
    list order, above every organic hit; organic results follow with
    their normal scores, minus any doc already pinned (never shown
    twice).  Pinned docs score ``PINNED_BASE / (1 + rank)`` — the ES
    PinnedQueryBuilder constant magnitude, astronomically above any
    BM25 score, so the ordinary top-k sort produces the pin-first
    layout with no special-case collector.  (ES subtracts the rank,
    which is a float no-op at 1.7e38; the divide keeps every rank
    distinct and representable.)  Unknown/deleted ids silently drop (the
    ids-query rule); pinned docs surface even when they do not match
    the organic query (the ES contract — pins are curated overrides)."""

    ids: list[int]
    organic: Node


@dataclass
class ScriptScoreQ(Node):
    """ES ``script_score``: the child's match set re-scored by an
    arithmetic expression over ``_score`` (the child's BM25 score) and
    NUMERIC STORED field names — the same safe Painless subset the
    bucket_script agg accepts (numbers, names, + − × ÷ % **, unary
    minus; parsed via the ``ast`` module, so no calls/attributes can
    reach eval), here translated to JVM column math instead of being
    evaluated driver-side.  Null field values read as 0.0; division by
    zero yields null and the hit keeps score 0.0 (the engine's pinned
    gap rule — ES Painless would throw).  Unboundable in general, so
    WAND keeps the exact plan (the function_score rule)."""

    child: Node
    script: str
    fields: list[str] = dc_field(default_factory=list)


def _script_score_fields(script: str, schema: IndexSchema) -> list[str]:
    """Validate a script_score expression and return the stored numeric
    fields it references (every Name that is not ``_score``)."""
    import ast as pyast
    try:
        tree = pyast.parse(script, mode="eval")
    except SyntaxError as e:
        raise QueryError(f"script_score script {script!r}: {e.msg}")
    _BIN = (pyast.Add, pyast.Sub, pyast.Mult, pyast.Div, pyast.Mod,
            pyast.Pow)
    fields: list[str] = []

    def walk(n):
        if isinstance(n, pyast.Expression):
            walk(n.body)
        elif isinstance(n, pyast.Constant) \
                and isinstance(n.value, (int, float)):
            pass
        elif isinstance(n, pyast.Name):
            if n.id != "_score" and n.id not in fields:
                fields.append(n.id)
        elif isinstance(n, pyast.UnaryOp) \
                and isinstance(n.op, pyast.USub):
            walk(n.operand)
        elif isinstance(n, pyast.BinOp) and isinstance(n.op, _BIN):
            walk(n.left)
            walk(n.right)
        else:
            raise QueryError(
                f"script_score script {script!r}: unsupported syntax "
                f"(arithmetic over _score and numeric field names only)")
    walk(tree)
    for f in fields:
        fdef = schema.field(f)
        if fdef is None or not fdef.stored:
            raise QueryError(
                f"script_score references {f!r}, which is not a "
                f"stored field (or _score)")
        if fdef.type not in ("i64", "u64", "f64"):
            raise QueryError(
                f"script_score needs numeric fields, {f!r} is "
                f"{fdef.type}")
    return fields


@dataclass
class CombinedFieldsQ(Node):
    """ES ``combined_fields`` (Lucene CombinedFieldQuery — BM25F with a
    shared k1/b): the analyzed query terms scored against a
    PSEUDO-FIELD blending several same-analyzer text fields.  Per term,
    the blended tf is Σ_f w_f·tf_f; the blended doc length is
    Σ_f w_f·dl_f over ALL queried fields the doc has tokens in —
    Lucene's MultiNormsLeafSimScorer rule: the norm sum is independent
    of which field holds the term (dl_f is the QUANTIZED per-field
    norm, same table the per-field BM25 path decodes, so degeneration
    to a single field is bit-identical); the blended avgdl is
    Σ_f w_f·avgdl_f; and df is the EXACT any-field doc frequency (docs
    holding the term in ≥1 queried field — Lucene approximates with
    blended pseudo-collection stats; an exact distinct count is one
    cheap aggregation in a distributed engine, so this implementation
    is exact and pins the deviation here).  Terms combine as a bool:
    operator=or sums matching-term scores subject to
    minimum_should_match; operator=and requires every term (in any
    queried field).  Per the ES rule every field must be an indexed
    text field and all must share one analyzer; per-field weights
    (``"f^2"``) must be positive (ES requires ≥ 1 — relaxed to > 0:
    the math is well-defined and a down-weight is useful)."""

    fields: list[tuple[str, float]]  # (name, weight)
    terms: list[str]
    operator: str = "or"
    min_should: int = 0


@dataclass
class RankFeatureQ(Node):
    """ES ``rank_feature`` over a NUMERIC STORED field (ES stores
    features in a dedicated rank_feature field type; this engine maps
    the query onto its numeric stored fields — same contract: matches
    every doc with a value, scores by a saturating function of it,
    composes in bool should-clauses as a cheap relevance signal).

    score = boost · S(v), v clamped to >= 0 (ES features are
    non-negative by definition):
      saturation: v / (v + pivot)          — pivot REQUIRED (the ES
        auto-pivot from index feature stats is not supported; an
        explicit pivot is deterministic and oracle-matchable)
      log:        ln(scaling_factor + v)
      sigmoid:    v^exp / (v^exp + pivot^exp)
      linear:     v
    Scores have no a-priori ceiling in general (log/linear), so WAND
    keeps the exact plan (same rule as FunctionScoreQ)."""

    field: str
    fn: str = "saturation"
    boost: float = 1.0
    pivot: float = 1.0
    scaling_factor: float = 1.0
    exponent: float = 1.0


@dataclass
class DistanceFeatureQ(Node):
    """ES ``distance_feature`` over a numeric or date stored field:
    matches every doc with a value, score = boost · pivot /
    (pivot + |v − origin|) — closer to origin scores higher, the
    recency/proximity boost shape.  For date fields ``origin`` is an
    ISO timestamp string and ``pivot`` is in SECONDS (the same unit
    pin as the gauss decay function)."""

    field: str
    origin: object = 0
    pivot: float = 1.0
    boost: float = 1.0
    is_date: bool = False


@dataclass
class SpanContainQ(Node):
    """Lucene/ES ``span_containing`` / ``span_within`` over a BIG
    rigid span chain and a LITTLE single-clause span (BEYOND-REFERENCE;
    toshi's DSL exposes no spans).

    Supported shape — documented pin, same philosophy as the
    nested-span_near rejection: the engine's chains track only
    final-clause positions, so span EXTENTS are exact only for RIGID
    chains (slop = 0, in_order) where a chain of k clauses ending at
    position q spans exactly [q − (k−1), q].  Therefore ``big`` must
    be a slop-0 in-order span_near (or a single span_term/span_or,
    k = 1) and ``little`` a single clause; anything else is rejected
    at parse rather than silently approximated.

    Semantics (Lucene SpanContainingQuery / SpanWithinQuery):
    containing keeps big spans that enclose >= 1 little position;
    within keeps little positions enclosed by >= 1 big span.  Scoring
    side follows Lucene: containing scores from BIG (tf = surviving
    big spans, idf = Σ over big's live alternatives), within scores
    from LITTLE."""

    field: str
    big: SpanNearQ
    little: tuple[str, ...]
    mode: str  # "containing" | "within"


@dataclass
class MltQ(Node):
    """ES ``more_like_this`` as a QUERY NODE (the Index.more_like_this
    method's semantics made composable): resolved by the Index BEFORE
    compilation into BoolQ(should=[seed tf·idf top terms],
    must_not=[IdsQ([like docid])]) — ES include=false default.
    Resolution needs the index (seed read + dfs), so a bare
    ``parse_json`` leaves this node in place and ``Searcher`` refuses
    it; every Index entry point resolves it first."""

    field: str
    like_docid: int
    top_terms: int = 5
    min_df: int = 2


@dataclass
class FuzzyQ(Node):
    field: str
    term: str
    distance: int = 1
    transposition: bool = False
    # ES/Lucene prefix_length: candidates must share the term's first P
    # characters EXACTLY (edits only beyond them).  Besides the recall
    # trade ES documents, P >= 1 turns the dictionary expansion into a
    # pushdown-able StartsWith range scan.
    prefix_length: int = 0


@dataclass
class RegexQ(Node):
    field: str
    pattern: str


@dataclass
class RangeQ(Node):
    field: str
    gte: Any = None
    gt: Any = None
    lte: Any = None
    lt: Any = None


@dataclass
class AllQ(Node):
    pass


@dataclass
class BoolQ(Node):
    must: list[Node] = dc_field(default_factory=list)
    must_not: list[Node] = dc_field(default_factory=list)
    should: list[Node] = dc_field(default_factory=list)
    # filter clauses (ES filter context; the toshi DSL reserves the
    # key): mandatory like must but contribute NOTHING to the score.
    # In the Spark plans they compile to left-semi joins — the filter
    # candidates never enter the scoring aggregation at all, which is
    # exactly why a user reaches for filter over must at scale.
    filter: list[Node] = dc_field(default_factory=list)
    # minimum_should_match (toshi BoolQuery carries the field in its
    # DSL; semantics here are the ES/Lucene contract): a doc matches
    # only if >= min_should SHOULD clauses match.  0 = default Lucene
    # behavior (shoulds optional when musts exist, >=1 required when
    # they don't).  Ignored when there are no should clauses (ES rule).
    # Scoring is unchanged — every matching clause contributes.
    min_should: int = 0


@dataclass
class BoostQ(Node):
    """``child^boost`` — multiplies the child's score (tantivy BoostQuery,
    produced by the QueryParser's ``^N`` suffix)."""

    child: Node
    boost: float = 1.0


@dataclass
class ConstScoreQ(Node):
    """ES ``constant_score`` / Lucene ConstantScoreQuery: matches exactly
    the wrapped query's doc set with every hit scored ``boost`` — the
    child's own scores are discarded, not multiplied (that's BoostQ).
    The canonical "I want this filter's matches ranked equal" wrapper;
    in the Spark plan the child's scoring columns never survive the
    projection, so the child may compile to its cheapest (filter-only)
    shape."""

    child: Node
    boost: float = 1.0


@dataclass
class BoostingQ(Node):
    """ES ``boosting`` query: the match set is exactly ``positive``'s;
    docs that ALSO match ``negative`` keep their hit but have their
    score multiplied by ``negative_boost`` (∈ [0, 1], the ES rule) —
    demotion, not exclusion (``must_not``'s softer sibling).  Because
    the multiplier never exceeds 1, the positive child's block-max
    bound stays a valid upper bound for WAND pruning."""

    positive: Node
    negative: Node
    negative_boost: float = 0.5


def _analyze_one(schema: IndexSchema, field: str, value: str) -> list[str]:
    return analyze_terms(str(value), schema.tokenizer_for(field))


def _term_or_bool(schema: IndexSchema, field: str, value: str) -> Node:
    """A query string on one field may analyze to several terms → OR them
    (tantivy QueryParser behavior for multi-token terms)."""
    terms = _analyze_one(schema, field, value)
    if not terms:
        return BoolQ()  # matches nothing
    if len(terms) == 1:
        return TermQ(field, terms[0])
    return BoolQ(should=[TermQ(field, t) for t in terms])


def _prefix_node(schema: IndexSchema, field: str, value: str) -> Node:
    """Prefix fragments are case-folded to match the dictionary's
    lowercased terms but never stemmed (the Lucene wildcard rule: an
    analyzer would rewrite the fragment).  Raw-tokenized fields keep
    the fragment verbatim."""
    if not value:
        raise QueryError("empty prefix")
    tok = schema.tokenizer_for(field)
    return PrefixQ(field, value if tok == "raw" else value.lower())


@dataclass
class TermsLookupQ(Node):
    """ES terms lookup: the term set is read from another document's
    stored field at query time.  An index-dependent node like MltQ —
    the parser emits it, catalog.py resolves it into a plain TermSetQ
    (constant-score, the terms-query contract) before execution; a
    missing/deleted source doc or an empty path value matches nothing
    (the ES rule)."""

    field: str
    docid: int
    path: str


@dataclass
class FunctionScoreQ(Node):
    """ES ``function_score``: the child's match set, re-scored by
    document-value functions.  ``functions`` are validated specs, each
    ``{"field_value_factor": {...}}`` or ``{"gauss": {field: {...}}}``;
    function values combine across functions by ``score_mode``
    (multiply | sum) and with the child's score by ``boost_mode``
    (multiply | sum | replace).  A real query NODE (not an envelope
    key), so it composes — inside bool clauses, under collapse, as a
    rescore secondary.  The match set is exactly the child's (functions
    only rescale; missing field values use the function's ``missing``
    default), and the transformed score is unboundable in general, so
    WAND pruning correctly falls back to the exact plan."""

    child: Node
    functions: list[dict] = dc_field(default_factory=list)
    score_mode: str = "multiply"
    boost_mode: str = "multiply"


_FVF_MODIFIERS = ("none", "log1p", "sqrt")


def _validate_function(schema: IndexSchema, fn: dict) -> dict:
    if not isinstance(fn, dict) or len(fn) != 1:
        raise QueryError("each function must be exactly one of "
                         "field_value_factor / gauss / random_score")
    kind, body = next(iter(fn.items()))
    if kind == "random_score":
        # ES random_score: deterministic per (seed, field value) —
        # value in [0, 1).  ES hashes _seq_no by default; this engine
        # has no hidden per-doc counter, so the field is REQUIRED (the
        # ES consistent-scoring recommendation anyway).  Pinned mix:
        # v' = v mod 2^31, s' = seed mod 2^31,
        # r = ((v'·2654435761 mod 2^32 + s'·2246822519 mod 2^32)
        #      mod 2^32) / 2^32 — Knuth multiplicative hashing with
        # every intermediate below 2^63 (ANSI-safe for epoch-millis
        # magnitudes), exact in int64/NUMERIC in Spark, DuckDB, and
        # Python alike (oracle-matchable), unlike ES's internal murmur
        # which is not a public contract.
        f = body.get("field")
        fdef = schema.field(f) if f else None
        if fdef is None or not fdef.stored:
            raise QueryError(f"random_score field {f!r} not stored "
                             f"(a numeric field is required)")
        if fdef.type not in ("i64", "u64", "f64"):
            raise QueryError(f"random_score needs a numeric field, "
                             f"{f!r} is {fdef.type}")
        return {"kind": kind, "field": f,
                "seed": int(body.get("seed", 0))}
    if kind == "field_value_factor":
        f = body.get("field")
        fdef = schema.field(f) if f else None
        if fdef is None or not fdef.stored:
            raise QueryError(f"field_value_factor field {f!r} not stored")
        if fdef.type not in ("i64", "u64", "f64"):
            raise QueryError(f"field_value_factor needs a numeric field, "
                             f"{f!r} is {fdef.type}")
        mod = str(body.get("modifier", "none"))
        if mod not in _FVF_MODIFIERS:
            raise QueryError(f"unknown modifier {mod!r}")
        return {"kind": kind, "field": f,
                "factor": float(body.get("factor", 1.0)), "modifier": mod,
                "missing": float(body.get("missing", 1.0))}
    if kind == "gauss":
        (f, spec), = body.items()
        fdef = schema.field(f)
        if fdef is None or not fdef.stored:
            raise QueryError(f"gauss field {f!r} not stored")
        if fdef.type not in ("i64", "u64", "f64", "date"):
            raise QueryError(f"gauss needs a numeric or date field, "
                             f"{f!r} is {fdef.type}")
        if "origin" not in spec or "scale" not in spec:
            raise QueryError("gauss needs origin and scale")
        decay = float(spec.get("decay", 0.5))
        if not 0.0 < decay < 1.0:
            raise QueryError("gauss decay must be in (0, 1)")
        scale = float(spec["scale"])  # numeric; for dates: SECONDS
        if scale <= 0:
            raise QueryError("gauss scale must be > 0")
        return {"kind": kind, "field": f, "is_date": fdef.type == "date",
                "origin": spec["origin"], "scale": scale, "decay": decay,
                "offset": float(spec.get("offset", 0.0))}
    raise QueryError(f"unknown score function {kind!r}")


def _match_node(schema: IndexSchema, field: str, text: str,
                op: str = "or", msm: int = 0) -> Node:
    """ES ``match`` semantics for one field: analyze the text, compile
    operator=or → bool-should (+ minimum_should_match), operator=and →
    bool-must; a single analyzed token degenerates to a plain scored
    TermQ, zero tokens to a match-nothing BoolQ."""
    if op not in ("or", "and"):
        raise QueryError(f"match operator must be and/or, got {op!r}")
    terms = _analyze_one(schema, field, text)
    if not terms:
        return BoolQ()  # matches nothing (all tokens analyzed away)
    if len(terms) == 1:
        return TermQ(field, terms[0])
    clauses: list[Node] = [TermQ(field, t) for t in terms]
    if op == "and":
        return BoolQ(must=clauses)
    node = BoolQ(should=clauses)
    node.min_should = max(0, msm)
    return node


_RE_META = set(".^$+{}[]()|\\")


def _wildcard_node(schema: IndexSchema, field: str, pattern: str) -> Node:
    """ES/Lucene ``wildcard``: ``?`` = one character, ``*`` = any run
    (no escape syntax — a literal ``*``/``?`` in a term is untokenizable
    here anyway).  The pattern is case-folded but never stemmed (the
    Lucene wildcard rule, shared with PrefixQ).  Rewrites to the
    CHEAPEST existing node rather than carrying a new execution path:

      * no wildcard chars  → verbatim single-term TermSetQ (Lucene's
        constant-score multi-term rewrite of a degenerate wildcard —
        NOT a scored TermQ);
      * ``lit*``           → PrefixQ (StartsWith pushed into the
        postings scan, no dictionary join);
      * anything else      → RegexQ over the term dictionary with the
        literal runs regex-escaped.
    """
    if not pattern:
        raise QueryError("empty wildcard pattern")
    tok = schema.tokenizer_for(field)
    pat = pattern if tok == "raw" else pattern.lower()
    if "*" not in pat and "?" not in pat:
        return TermSetQ(field, [pat])
    if pat.endswith("*") and "?" not in pat and "*" not in pat[:-1]:
        return _prefix_node(schema, field, pat[:-1])
    out: list[str] = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch in _RE_META:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return RegexQ(field, "".join(out))


# ---------------------------------------------------------------- JSON DSL


def _span_leaf(kind: str, body: dict,
               schema: IndexSchema) -> tuple[str, tuple[str, ...]]:
    """span_term / span_or → (field, alternative-terms clause).  Each
    span_term value must analyze to EXACTLY one token (a multi-token
    value inside a span is ambiguous — Lucene rejects it too)."""
    if kind == "span_term":
        (field, value), = body.items()
        value = value["value"] if isinstance(value, dict) else str(value)
        fdef = schema.field(field)
        if fdef is None or not fdef.has_positions:
            raise QueryError(f"field {field!r} does not record positions")
        toks = _analyze_one(schema, field, value)
        if len(toks) != 1:
            raise QueryError(
                f"span_term value {value!r} analyzes to {len(toks)} tokens"
                " (exactly 1 required)")
        return field, (toks[0],)
    if kind == "span_multi":
        # Lucene SpanMultiTermQueryWrapper: {"span_multi": {"match":
        # {"prefix"/"wildcard"/"regexp": {field: value}}}}.  Reuses the
        # wildcard rewrite: a no-wildcard pattern is a verbatim term
        # clause; trailing-star → prefix marker; anything else → regex
        # marker.  Fuzzy sources rejected (OSA expansion has no bounded
        # dictionary pushdown — the percolator pin).
        match = body.get("match")
        if not (isinstance(match, dict) and len(match) == 1):
            raise QueryError("span_multi needs a single query in 'match'")
        mkind, mbody = next(iter(match.items()))
        if mkind == "fuzzy":
            raise QueryError(
                "span_multi does not support fuzzy sources (prefix/"
                "wildcard/regexp only)")
        if mkind not in ("prefix", "wildcard", "regexp", "regex"):
            raise QueryError(
                f"span_multi supports prefix/wildcard/regexp, "
                f"got {mkind!r}")
        (field, value), = mbody.items()
        fdef = schema.field(field)
        if fdef is None or not fdef.has_positions:
            raise QueryError(f"field {field!r} does not record positions")
        if isinstance(value, dict):
            value = value.get("value")
        value = str(value or "")
        if not value:
            raise QueryError("span_multi needs a non-empty pattern")
        if mkind == "prefix":
            inner: Node = _prefix_node(schema, field, value)
        elif mkind in ("regexp", "regex"):
            inner = RegexQ(field, value)
        else:
            inner = _wildcard_node(schema, field, value)
        if isinstance(inner, TermSetQ):  # degenerate wildcard, no metas
            return field, tuple(inner.terms)
        if isinstance(inner, PrefixQ):
            return field, SpanExpand("prefix", inner.prefix)
        return field, SpanExpand("regex", inner.pattern)
    if kind == "span_or":
        clauses = body.get("clauses") or []
        if not clauses:
            raise QueryError("span_or needs a non-empty clauses list")
        field, alts = None, []
        for sub in clauses:
            if not (isinstance(sub, dict) and len(sub) == 1):
                raise QueryError("span_or clause must be a single span query")
            skind, sbody = next(iter(sub.items()))
            if skind not in ("span_term", "span_or"):
                raise QueryError(
                    f"span_or supports span_term/span_or clauses, got {skind!r}")
            f, terms = _span_leaf(skind, sbody, schema)
            if field is not None and f != field:
                raise QueryError("span_or clauses must share one field")
            field = f
            alts.extend(terms)
        return field, tuple(dict.fromkeys(alts))
    raise QueryError(f"unsupported span clause {kind!r}")


def _intervals_node(schema: IndexSchema, field: str,
                    spec: dict) -> SpanNearQ:
    """ES ``intervals`` query → the span machinery (a REWRITE layer:
    Lucene executes both families over position iterators; this engine
    already has the one-scan positions plan in SpanNearQ, so intervals
    compile onto it instead of growing a second executor).

    Supported subset, rejected-at-parse otherwise (the span-family
    philosophy — no silent approximation):

      match:  {"query": text, "max_gaps": g, "ordered": bool} — the
        analyzed tokens become the chain's clauses.  ``max_gaps`` is
        REQUIRED (>= 0) for multi-token sources: the ES default of -1
        (unlimited) has no bounded plan; an explicit budget keeps the
        window predicate and WAND bounds finite.  Single-token matches
        have no gaps and need none.
      any_of: {"intervals": [...]} of SINGLE-CLAUSE members — merges
        into one alternatives clause (span_or semantics).
      all_of: {"intervals": [...], "max_gaps": g, "ordered": b} of
        single-clause members — each member is one chain clause.

    Pin shared with the span family (SpanNearQ docstring): max_gaps
    maps to the per-adjacent-pair window slop.  For two-term sources
    this is exactly ES's total-gap budget; for k > 2 ES budgets the
    TOTAL gaps across the interval, which is stricter — documented
    here, not silently widened."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise QueryError("intervals needs exactly one rule "
                         "(match / any_of / all_of)")
    rule, rbody = next(iter(spec.items()))
    rbody = rbody or {}
    if rule == "match":
        text = rbody.get("query")
        if not text:
            raise QueryError("intervals match needs a query string")
        toks = _analyze_one(schema, field, str(text))
        if not toks:
            raise QueryError(
                "intervals match query analyzed to zero tokens")
        fdef = schema.field(field)
        if fdef is None or not fdef.has_positions:
            raise QueryError(f"field {field!r} does not record positions")
        if len(toks) == 1:
            return SpanNearQ(field, [(toks[0],)])
        if "max_gaps" not in rbody:
            raise QueryError(
                "intervals match with multiple tokens needs an "
                "explicit max_gaps >= 0 (the ES unlimited default has "
                "no bounded plan)")
        g = int(rbody["max_gaps"])
        if g < 0:
            raise QueryError("intervals max_gaps must be >= 0")
        return SpanNearQ(field, [(t,) for t in toks], slop=g,
                         in_order=bool(rbody.get("ordered", False)))
    if rule == "any_of":
        members = rbody.get("intervals") or []
        if not members:
            raise QueryError("intervals any_of needs an intervals list")
        alts: list[str] = []
        for m in members:
            if not (isinstance(m, dict) and len(m) == 1):
                raise QueryError(
                    "each any_of member is a single intervals rule")
            sub = _intervals_node(schema, field, m)
            if len(sub.clauses) != 1:
                raise QueryError(
                    "intervals any_of members must be single-token "
                    "(multi-clause members need full interval algebra "
                    "— unsupported)")
            alts.extend(sub.clauses[0])
        return SpanNearQ(field, [tuple(dict.fromkeys(alts))])
    if rule == "all_of":
        members = rbody.get("intervals") or []
        if not members:
            raise QueryError("intervals all_of needs an intervals list")
        clauses: list[tuple[str, ...]] = []
        for m in members:
            if not (isinstance(m, dict) and len(m) == 1):
                raise QueryError(
                    "each all_of member is a single intervals rule")
            sub = _intervals_node(schema, field, m)
            if len(sub.clauses) != 1:
                raise QueryError(
                    "intervals all_of members must reduce to one "
                    "clause each (nested multi-token chains need full "
                    "interval algebra — unsupported)")
            clauses.append(sub.clauses[0])
        if len(clauses) > 1 and "max_gaps" not in rbody:
            raise QueryError(
                "intervals all_of with multiple members needs an "
                "explicit max_gaps >= 0")
        g = int(rbody.get("max_gaps", 0))
        if g < 0:
            raise QueryError("intervals max_gaps must be >= 0")
        return SpanNearQ(field, clauses, slop=g,
                         in_order=bool(rbody.get("ordered", False)))
    raise QueryError(
        f"unsupported intervals rule {rule!r} "
        f"(match / any_of / all_of; prefix / wildcard / fuzzy "
        f"interval sources are unsupported)")


def _parse_span(kind: str, body: dict, schema: IndexSchema) -> SpanNearQ:
    if kind in ("span_term", "span_or", "span_multi"):
        field, clause = _span_leaf(kind, body, schema)
        return SpanNearQ(field, [clause])
    if kind == "span_near":
        clauses = body.get("clauses") or []
        if len(clauses) < 1:
            raise QueryError("span_near needs a non-empty clauses list")
        slop = int(body.get("slop", 0))
        if slop < 0:
            raise QueryError("span_near slop must be >= 0")
        in_order = bool(body.get("in_order", True))
        field, parsed = None, []
        for sub in clauses:
            if not (isinstance(sub, dict) and len(sub) == 1):
                raise QueryError("span_near clause must be a single span query")
            skind, sbody = next(iter(sub.items()))
            if skind == "span_near":
                raise QueryError(
                    "nested span_near is not supported (flatten the clauses)")
            f, clause = _span_leaf(skind, sbody, schema)
            if field is not None and f != field:
                raise QueryError("span_near clauses must share one field")
            field = f
            parsed.append(clause)
        return SpanNearQ(field, parsed, slop=slop, in_order=in_order)
    raise QueryError(f"unsupported span query {kind!r}")


def parse_json(q: dict, schema: IndexSchema) -> Node:
    """toshi JSON query → AST.  Shapes per the reference tests
    (test/basic.js:70-77) and search.rs:44-61."""
    if not isinstance(q, dict) or not q:
        raise QueryError("Empty Query Provided")
    if len(q) != 1:
        raise QueryError(f"expected single query variant, got {sorted(q)}")
    kind, body = next(iter(q.items()))
    if kind == "term":
        (field, value), = body.items()
        return _term_or_bool(schema, field, value)
    if kind == "phrase":
        (field, spec), = body.items()
        terms = spec["terms"] if isinstance(spec, dict) else list(spec)
        slop = int(spec.get("slop", 0)) if isinstance(spec, dict) else 0
        in_order = bool(spec.get("in_order", True)) \
            if isinstance(spec, dict) else True
        if slop < 0:
            raise QueryError("phrase slop must be >= 0")
        fdef = schema.field(field)
        if fdef is None or not fdef.has_positions:
            raise QueryError(f"field {field!r} does not record positions")
        analyzed: list[str] = []
        for t in terms:
            analyzed.extend(_analyze_one(schema, field, t))
        return PhraseQ(field, analyzed, slop=slop, in_order=in_order)
    if kind in ("span_term", "span_or", "span_near", "span_multi"):
        return _parse_span(kind, body, schema)
    if kind == "intervals":
        (field, spec), = body.items()
        return _intervals_node(schema, field, spec)
    if kind == "script_score":
        sub = body.get("query")
        if not (isinstance(sub, dict) and sub):
            raise QueryError("script_score needs a query")
        script = (body.get("script") or {}).get("source") \
            if isinstance(body.get("script"), dict) \
            else body.get("script")
        if not script:
            raise QueryError(
                "script_score needs a script (string or "
                "{'source': ...})")
        fields = _script_score_fields(str(script), schema)
        return ScriptScoreQ(parse_json(sub, schema), str(script), fields)
    if kind == "wrapper":
        # ES wrapper query: a base64-encoded JSON query, decoded and
        # parsed like any other node (the escape hatch ES clients use
        # to smuggle raw DSL through typed builders) — pure parse-time
        # sugar, zero execution surface of its own
        import base64
        import json as _json
        enc = body.get("query") if isinstance(body, dict) else body
        if not isinstance(enc, str) or not enc:
            raise QueryError("wrapper needs a base64 query string")
        try:
            inner = _json.loads(base64.b64decode(enc, validate=True))
        except Exception:
            raise QueryError("wrapper query is not valid base64 JSON")
        if not isinstance(inner, dict):
            raise QueryError("wrapper query must decode to a JSON object")
        return parse_json(inner, schema)
    if kind == "pinned":
        ids = body.get("ids")
        organic = body.get("organic")
        if not isinstance(ids, list) or not ids:
            raise QueryError("pinned needs a non-empty ids list")
        if not (isinstance(organic, dict) and organic):
            raise QueryError("pinned needs an organic query")
        try:
            ids = [int(d) for d in ids]
        except (TypeError, ValueError):
            raise QueryError("pinned ids must be integers (global docids)")
        return PinnedQ(list(dict.fromkeys(ids)),
                       parse_json(organic, schema))
    if kind == "rank_feature":
        f = body.get("field")
        fdef = schema.field(f) if f else None
        if fdef is None or not fdef.stored:
            raise QueryError(f"rank_feature field {f!r} not stored")
        if fdef.type not in ("i64", "u64", "f64"):
            raise QueryError(f"rank_feature needs a numeric field, "
                             f"{f!r} is {fdef.type}")
        boost = float(body.get("boost", 1.0))
        fns = [k for k in ("saturation", "log", "sigmoid", "linear")
               if k in body]
        if len(fns) > 1:
            raise QueryError("rank_feature takes at most one of "
                             "saturation/log/sigmoid/linear")
        fn = fns[0] if fns else "saturation"
        spec = body.get(fn) or {}
        node = RankFeatureQ(f, fn, boost)
        if fn == "saturation":
            if "pivot" not in spec:
                raise QueryError(
                    "rank_feature saturation needs an explicit pivot "
                    "(the ES auto-pivot from index feature statistics "
                    "is not supported — pass one)")
            node.pivot = float(spec["pivot"])
            if node.pivot <= 0:
                raise QueryError("saturation pivot must be > 0")
        elif fn == "log":
            node.scaling_factor = float(spec.get("scaling_factor", 1.0))
            if node.scaling_factor <= 0:
                raise QueryError("log scaling_factor must be > 0")
        elif fn == "sigmoid":
            if "pivot" not in spec or "exponent" not in spec:
                raise QueryError(
                    "rank_feature sigmoid needs pivot and exponent")
            node.pivot = float(spec["pivot"])
            node.exponent = float(spec["exponent"])
            if node.pivot <= 0 or node.exponent <= 0:
                raise QueryError(
                    "sigmoid pivot and exponent must be > 0")
        return node
    if kind == "distance_feature":
        f = body.get("field")
        fdef = schema.field(f) if f else None
        if fdef is None or not fdef.stored:
            raise QueryError(f"distance_feature field {f!r} not stored")
        if fdef.type not in ("i64", "u64", "f64", "date"):
            raise QueryError(
                f"distance_feature needs a numeric or date field, "
                f"{f!r} is {fdef.type}")
        if "origin" not in body or "pivot" not in body:
            raise QueryError("distance_feature needs origin and pivot")
        pivot = float(body["pivot"])
        if pivot <= 0:
            raise QueryError("distance_feature pivot must be > 0")
        return DistanceFeatureQ(f, body["origin"], pivot,
                                float(body.get("boost", 1.0)),
                                is_date=fdef.type == "date")
    if kind in ("span_containing", "span_within"):
        big_spec, little_spec = body.get("big"), body.get("little")
        for key, spec in (("big", big_spec), ("little", little_spec)):
            if not (isinstance(spec, dict) and len(spec) == 1):
                raise QueryError(
                    f"{kind} needs a single span query in {key!r}")
        bkind, bbody = next(iter(big_spec.items()))
        if bkind not in ("span_term", "span_or", "span_near"):
            raise QueryError(
                f"{kind} big supports span_term/span_or/span_near, "
                f"got {bkind!r}")
        big = _parse_span(bkind, bbody, schema)
        if big.slop != 0 or not big.in_order:
            raise QueryError(
                f"{kind} supports RIGID big spans only (slop=0, "
                f"in_order) — the engine tracks exact span extents "
                f"only for rigid chains (SpanContainQ docstring)")
        if any(isinstance(c, SpanExpand) for c in big.clauses):
            # the contain executor and the index-side resolution pass
            # only handle expansion markers inside plain SpanNearQ —
            # reject loudly rather than crash downstream
            raise QueryError(
                f"{kind} does not support span_multi clauses in big")
        lkind, lbody = next(iter(little_spec.items()))
        if lkind not in ("span_term", "span_or"):
            raise QueryError(
                f"{kind} little supports single-clause span_term/"
                f"span_or, got {lkind!r}")
        lf, little = _span_leaf(lkind, lbody, schema)
        if lf != big.field:
            raise QueryError(f"{kind} big and little must share one field")
        return SpanContainQ(big.field, big, little,
                            "containing" if kind == "span_containing"
                            else "within")
    if kind == "span_first":
        match = body.get("match")
        if not (isinstance(match, dict) and len(match) == 1):
            raise QueryError("span_first needs a single span query in 'match'")
        end = int(body.get("end", 0))
        if end <= 0:
            raise QueryError("span_first end must be >= 1")
        mkind, mbody = next(iter(match.items()))
        return SpanFirstQ(_parse_span(mkind, mbody, schema), end)
    if kind == "span_not":
        def leaf(key: str) -> tuple[str, tuple[str, ...]]:
            sub = body.get(key)
            if not (isinstance(sub, dict) and len(sub) == 1):
                raise QueryError(f"span_not needs a single span query "
                                 f"in {key!r}")
            skind, sbody = next(iter(sub.items()))
            if skind not in ("span_term", "span_or"):
                raise QueryError(
                    "span_not supports single-clause include/exclude "
                    f"(span_term/span_or), got {skind!r} — chain extents "
                    "are not tracked (SpanNotQ docstring)")
            return _span_leaf(skind, sbody, schema)
        fi, inc = leaf("include")
        fe, exc = leaf("exclude")
        if fi != fe:
            raise QueryError("span_not include/exclude must share one field")
        dist = body.get("dist")
        pre = int(body.get("pre", dist if dist is not None else 0))
        post = int(body.get("post", dist if dist is not None else 0))
        if pre < 0 or post < 0:
            raise QueryError("span_not pre/post must be >= 0")
        return SpanNotQ(fi, inc, exc, pre=pre, post=post)
    if kind == "match_bool_prefix":
        # ES match_bool_prefix: analyzed tokens as bool-should TermQs,
        # the LAST whitespace token as a prefix clause (constant-score
        # expansion, the engine's documented expansion rule — ES scores
        # the prefix clause too, this pin is the divergence).  Single
        # token degenerates to the bare prefix.
        (field, spec), = body.items()
        text = str(spec.get("query", "")) if isinstance(spec, dict) \
            else str(spec)
        parts = text.split()
        if not parts:
            raise QueryError("Empty Query Provided")
        head, last = parts[:-1], parts[-1]
        analyzed: list[str] = []
        for t in head:
            analyzed.extend(_analyze_one(schema, field, t))
        pfx = _prefix_node(schema, field, last)
        if not analyzed:
            return pfx
        return BoolQ(should=[TermQ(field, t) for t in analyzed] + [pfx])
    if kind == "prefix":
        (field, value), = body.items()
        value = value["value"] if isinstance(value, dict) else str(value)
        return _prefix_node(schema, field, value)
    if kind == "bool":
        node = BoolQ()
        for key, dst in (("must", node.must), ("must_not", node.must_not),
                         ("should", node.should), ("filter", node.filter)):
            for sub in body.get(key, []) or []:
                dst.append(parse_json(sub, schema))
        msm = int(body.get("minimum_should_match", 0))
        if msm < 0:
            raise QueryError("minimum_should_match must be >= 0")
        node.min_should = msm if node.should else 0  # ES: no shoulds → ignored
        return node
    if kind == "terms":
        # ES terms set: {"terms": {field: ["a", "b", ...]}} — values
        # matched verbatim (raw fields) / case-folded (analyzed fields),
        # never stemmed, per the ES rule that `terms` skips analysis.
        # Terms LOOKUP form: {"terms": {field: {"id": gid, "path":
        # stored_field}}} — the value list is read from another doc's
        # stored field at query time (resolved index-side, catalog.py
        # _resolve_index_nodes; ES's cross-index lookup collapses to
        # same-index here — one catalog, one schema per index).
        (field, values), = body.items()
        if isinstance(values, dict):
            if "id" not in values or "path" not in values:
                raise QueryError(
                    "terms lookup needs {'id': docid, 'path': field}")
            if schema.field(field) is None:
                raise QueryError(f"unknown field {field!r}")
            path = str(values["path"])
            pdef = schema.field(path)
            if pdef is None or not pdef.stored:
                raise QueryError(
                    f"terms lookup path {path!r} is not a stored field")
            return TermsLookupQ(field, int(values["id"]), path)
        if not isinstance(values, (list, tuple)) or not values:
            raise QueryError("terms query needs a non-empty value list")
        tok = schema.tokenizer_for(field)
        vals = [str(v) if tok == "raw" else str(v).lower() for v in values]
        return TermSetQ(field, list(dict.fromkeys(vals)))
    if kind == "exists":
        field = body["field"] if isinstance(body, dict) else str(body)
        if schema.field(field) is None:
            raise QueryError(f"unknown field {field!r}")
        return ExistsQ(field)
    if kind == "ids":
        # ES shape: {"ids": {"values": [0, 17, ...]}} (bare-list sugar
        # accepted).  Values are GLOBAL docids; floats with integral
        # values pass (JSON numbers), anything else is a parse error.
        vals = body.get("values") if isinstance(body, dict) else body
        if not isinstance(vals, (list, tuple)) or not vals:
            raise QueryError("ids query needs a non-empty values list")
        out: list[int] = []
        for v in vals:
            if isinstance(v, bool) or not isinstance(v, (int, float)) \
                    or int(v) != v or v < 0:
                raise QueryError(f"ids values must be docids, got {v!r}")
            out.append(int(v))
        return IdsQ(list(dict.fromkeys(out)))
    if kind == "dis_max":
        subs = [parse_json(sub, schema) for sub in body.get("queries", [])]
        if not subs:
            raise QueryError("dis_max needs at least one sub-query")
        tie = float(body.get("tie_breaker", 0.0))
        if not 0.0 <= tie <= 1.0:
            raise QueryError("tie_breaker must be in [0, 1]")
        return DisMaxQ(subs, tie)
    if kind == "match_phrase_prefix":
        # {"match_phrase_prefix": {field: "slow ha"}} — ES shape; the
        # final whitespace token is the prefix, the rest are analyzed
        # phrase terms.  Single-token input degenerates to PrefixQ.
        (field, spec), = body.items()
        text = spec["value"] if isinstance(spec, dict) else str(spec)
        parts = text.split()
        if not parts:
            raise QueryError("Empty Query Provided")
        head, last = parts[:-1], parts[-1]
        if not head:
            return _prefix_node(schema, field, last)
        fdef = schema.field(field)
        if fdef is None or not fdef.has_positions:
            raise QueryError(f"field {field!r} does not record positions")
        analyzed: list[str] = []
        for t in head:
            analyzed.extend(_analyze_one(schema, field, t))
        if not analyzed:
            return _prefix_node(schema, field, last)
        tok = schema.tokenizer_for(field)
        return PhrasePrefixQ(field, analyzed,
                             last if tok == "raw" else last.lower())
    if kind == "wildcard":
        # ES shape: {"wildcard": {field: "h?ll*"}} or {field: {"value": p}}
        (field, spec), = body.items()
        pat = spec["value"] if isinstance(spec, dict) else str(spec)
        if schema.field(field) is None:
            raise QueryError(f"unknown field {field!r}")
        return _wildcard_node(schema, field, pat)
    if kind == "constant_score":
        # {"constant_score": {"filter": {...}, "boost": b}} — ES shape
        filt = body.get("filter")
        if not filt:
            raise QueryError("constant_score needs a filter")
        boost = float(body.get("boost", 1.0))
        return ConstScoreQ(parse_json(filt, schema), boost)
    if kind == "match":
        # ES match: analyzed text → bool of term queries.
        # {"match": {field: "a b"}} or
        # {"match": {field: {"query": "a b", "operator": "and"|"or",
        #                    "minimum_should_match": m,
        #                    "fuzziness": "AUTO"|0|1|2,
        #                    "prefix_length": p}}}
        # fuzziness rewrites each analyzed token to a FuzzyQ (OSA,
        # transpositions on — the ES default) with the ES AUTO ladder:
        # < 3 chars exact, 3-5 one edit, > 5 two; tokens whose ladder
        # distance is 0 stay plain scored TermQs.
        (field, spec), = body.items()
        fuzz = None
        plen = 0
        if isinstance(spec, dict):
            text = str(spec.get("query", ""))
            op = str(spec.get("operator", "or")).lower()
            msm = int(spec.get("minimum_should_match", 0))
            fuzz = spec.get("fuzziness")
            plen = int(spec.get("prefix_length", 0))
        else:
            text, op, msm = str(spec), "or", 0
        if fuzz is None:
            return _match_node(schema, field, text, op, msm)
        if op not in ("or", "and"):
            raise QueryError(f"match operator must be and/or, got {op!r}")
        fs = str(fuzz).upper()
        auto = fs.startswith("AUTO")
        fz = 0
        lo, hi = 3, 6  # the ES AUTO default: <3 exact, 3-5 one, >=6 two
        if auto:
            if fs != "AUTO":
                # the ES AUTO:low,high form
                import re as _re
                m2 = _re.fullmatch(r"AUTO:(\d+),(\d+)", fs)
                if not m2:
                    raise QueryError(
                        f"match fuzziness must be 0..2, AUTO, or "
                        f"AUTO:low,high — got {fuzz!r}")
                lo, hi = int(m2.group(1)), int(m2.group(2))
                if not 0 <= lo <= hi:
                    raise QueryError(
                        "match fuzziness AUTO:low,high needs "
                        "0 <= low <= high")
        else:
            try:
                fz = int(fuzz)
            except (TypeError, ValueError):
                raise QueryError(
                    f"match fuzziness must be 0..2, AUTO, or "
                    f"AUTO:low,high — got {fuzz!r}")
            if not 0 <= fz <= 2:
                raise QueryError("match fuzziness must be 0..2 or AUTO")
        terms = _analyze_one(schema, field, text)
        if not terms:
            return BoolQ()
        clauses: list[Node] = []
        for t in terms:
            d = (0 if len(t) < lo else 1 if len(t) < hi else 2) \
                if auto else fz
            clauses.append(TermQ(field, t) if d == 0 else
                           FuzzyQ(field, t, d, transposition=True,
                                  prefix_length=plen))
        if len(clauses) == 1:
            return clauses[0]
        if op == "and":
            return BoolQ(must=clauses)
        node = BoolQ(should=clauses)
        node.min_should = max(0, msm)
        return node
    if kind == "multi_match":
        # ES multi_match: one analyzed text against several fields.
        # {"multi_match": {"query": "a b", "fields": ["text^2", "role"],
        #                  "type": "best_fields"|"most_fields",
        #                  "tie_breaker": t, "operator": ..,
        #                  "minimum_should_match": m}}
        # best_fields (default) → dis_max over the per-field match
        # nodes (Lucene's rewrite); most_fields → bool-should sum;
        # cross_fields → the combined_fields node (pinned deviation:
        # ES blends per-term df across fields inside a dis_max of
        # BlendedTermQueries — BM25F over the same blended statistics
        # is the modern replacement ES itself recommends, and this
        # engine has exactly that machinery; the rewrite shares its
        # analyzer/weight validation).
        text = str(body.get("query", ""))
        fields = body.get("fields") or []
        if not fields:
            raise QueryError("multi_match needs a non-empty fields list")
        mtype = str(body.get("type", "best_fields"))
        if mtype not in ("best_fields", "most_fields", "cross_fields"):
            raise QueryError(f"unsupported multi_match type {mtype!r}")
        op = str(body.get("operator", "or")).lower()
        msm = int(body.get("minimum_should_match", 0))
        if mtype == "cross_fields":
            if "tie_breaker" in body:
                # ES cross_fields honors tie_breaker across per-term
                # groups; the BM25F rewrite SUMS term scores and has no
                # tie knob — reject loudly rather than silently ignore
                raise QueryError(
                    "multi_match cross_fields ignores tie_breaker under "
                    "the combined_fields rewrite — remove it or use "
                    "best_fields")
            return parse_json({"combined_fields": {
                "query": text, "fields": fields, "operator": op,
                "minimum_should_match": msm}}, schema)
        subs: list[Node] = []
        for fspec in fields:
            name, _, suffix = str(fspec).partition("^")
            if schema.field(name) is None:
                raise QueryError(f"unknown field {name!r}")
            sub = _match_node(schema, name, text, op, msm)
            if suffix:
                sub = BoostQ(sub, float(suffix))
            subs.append(sub)
        if len(subs) == 1:
            return subs[0]
        if mtype == "most_fields":
            return BoolQ(should=subs)
        tie = float(body.get("tie_breaker", 0.0))
        if not 0.0 <= tie <= 1.0:
            raise QueryError("tie_breaker must be in [0, 1]")
        return DisMaxQ(subs, tie)
    if kind == "combined_fields":
        # {"combined_fields": {"query": "a b", "fields": ["title^2",
        #  "body"], "operator": "or"|"and", "minimum_should_match": m}}
        text = str(body.get("query", ""))
        fspecs = body.get("fields") or []
        if not isinstance(fspecs, list) or not fspecs:
            raise QueryError("combined_fields needs a non-empty "
                             "fields list")
        fields: list[tuple[str, float]] = []
        toks: set[str] = set()
        for fspec in fspecs:
            name, _, suffix = str(fspec).partition("^")
            fdef = schema.field(name)
            if fdef is None or not fdef.indexed \
                    or fdef.type not in ("text", "string"):
                raise QueryError(
                    f"combined_fields needs indexed text fields, "
                    f"{name!r} is not one")
            try:
                w = float(suffix) if suffix else 1.0
            except ValueError:
                raise QueryError(f"bad field boost in {fspec!r}")
            if w <= 0.0:
                raise QueryError(
                    f"combined_fields weight for {name!r} must be > 0")
            if any(name == n for n, _ in fields):
                raise QueryError(
                    f"combined_fields lists {name!r} twice")
            fields.append((name, w))
            toks.add(schema.tokenizer_for(name))
        if len(toks) != 1:
            raise QueryError(
                "combined_fields requires one shared analyzer across "
                f"fields (got {sorted(toks)}) — the ES rule: blended "
                "statistics are meaningless across analyzers")
        op = str(body.get("operator", "or")).lower()
        if op not in ("or", "and"):
            raise QueryError(f"combined_fields operator must be "
                             f"and/or, got {op!r}")
        msm = int(body.get("minimum_should_match", 0))
        terms = _analyze_one(schema, fields[0][0], text)
        # duplicate analyzed tokens dedupe (the bag-blend already
        # counts repeats via tf; Lucene rewrites duplicate terms away)
        return CombinedFieldsQ(fields, list(dict.fromkeys(terms)),
                               op, max(0, msm))
    if kind == "function_score":
        # {"function_score": {"query": {...}, "functions": [fn, ...] |
        #  <single-fn sugar: "field_value_factor"/"gauss" inline>,
        #  "score_mode": "multiply"|"sum", "boost_mode":
        #  "multiply"|"sum"|"replace"}}
        child_body = body.get("query")
        if not child_body:
            raise QueryError("function_score needs a query")
        fns = body.get("functions")
        if fns is None:
            fns = [{k: body[k]} for k in ("field_value_factor", "gauss")
                   if k in body]
        if not fns:
            raise QueryError("function_score needs at least one function")
        score_mode = str(body.get("score_mode", "multiply"))
        boost_mode = str(body.get("boost_mode", "multiply"))
        if score_mode not in ("multiply", "sum"):
            raise QueryError(f"unsupported score_mode {score_mode!r}")
        if boost_mode not in ("multiply", "sum", "replace"):
            raise QueryError(f"unsupported boost_mode {boost_mode!r}")
        return FunctionScoreQ(parse_json(child_body, schema),
                              [_validate_function(schema, fn) for fn in fns],
                              score_mode, boost_mode)
    if kind == "more_like_this":
        # ES shape: {"more_like_this": {"fields": ["text"],
        #   "like": [{"_id": 3}], "max_query_terms": 5,
        #   "min_doc_freq": 2}} — one field, one _id like (v1 pins;
        #   text-likes and multi-like blending are rejected clearly)
        fields = body.get("fields") or []
        if len(fields) != 1:
            raise QueryError("more_like_this needs exactly one field")
        like = body.get("like")
        if isinstance(like, dict):
            like = [like]
        if not (isinstance(like, list) and len(like) == 1
                and isinstance(like[0], dict) and "_id" in like[0]):
            raise QueryError(
                "more_like_this supports exactly one {'_id': docid} like")
        fdef = schema.field(fields[0])
        if fdef is None or not fdef.indexed:
            raise QueryError(f"field {fields[0]!r} is not indexed")
        return MltQ(fields[0], int(like[0]["_id"]),
                    top_terms=int(body.get("max_query_terms", 5)),
                    min_df=int(body.get("min_doc_freq", 2)))
    if kind == "fuzzy":
        (field, spec), = body.items()
        plen = int(spec.get("prefix_length", 0))
        if plen < 0:
            raise QueryError("fuzzy prefix_length must be >= 0")
        return FuzzyQ(field, str(spec["value"]).lower(),
                      int(spec.get("distance", 1)),
                      bool(spec.get("transposition", False)),
                      prefix_length=plen)
    if kind == "regex":
        (field, pattern), = body.items()
        return RegexQ(field, pattern)
    if kind == "range":
        (field, bounds), = body.items()
        return RangeQ(field, gte=bounds.get("gte"), gt=bounds.get("gt"),
                      lte=bounds.get("lte"), lt=bounds.get("lt"))
    if kind == "all":
        return AllQ()
    if kind == "boosting":
        # ES shape: {"boosting": {"positive": {...}, "negative": {...},
        #                         "negative_boost": 0.5}}
        pos, neg = body.get("positive"), body.get("negative")
        if not pos or not neg:
            raise QueryError("boosting needs positive and negative queries")
        nb = float(body.get("negative_boost", 0.5))
        if not 0.0 <= nb <= 1.0:
            raise QueryError("negative_boost must be in [0, 1]")
        return BoostingQ(parse_json(pos, schema), parse_json(neg, schema), nb)
    if kind == "query_string":
        # ES query_string: the full string grammar (parens, ^boost,
        # NOT, quoted phrases, field:term, prefix/fuzzy) behind the
        # JSON DSL.  default_field scopes bare terms to one field;
        # without it they search every indexed field (the Query::Raw
        # behavior, search.rs:52-59).
        if isinstance(body, dict):
            qs = body.get("query")
            dflt = body.get("default_field")
        else:
            qs, dflt = body, None
        if not qs or not isinstance(qs, str):
            raise QueryError("query_string needs a query string")
        if dflt is not None:
            fdef = schema.field(str(dflt))
            if fdef is None or not fdef.indexed:
                raise QueryError(
                    f"default_field {dflt!r} is not an indexed field")
            fields = [str(dflt)]
        else:
            fields = [f.name for f in schema.indexed_fields]
        return parse_string(qs, schema, default_fields=fields)
    if kind == "raw":
        # Query::Raw builds its parser over ALL schema fields
        # (search.rs:52-59), unlike the string-RPC path which stops at the
        # first non-indexed field (index.rs:230-239).  Non-indexed fields
        # can never match postings, so "all indexed fields regardless of
        # position" is the observable equivalent.
        return parse_string(
            body if isinstance(body, str) else body["query"], schema,
            default_fields=[f.name for f in schema.indexed_fields],
        )
    raise QueryError(f"unknown query variant {kind!r}")


# ------------------------------------------------------------ string grammar
#
# Recursive-descent parser for the tantivy QueryParser grammar (the
# reference inherits it wholesale at index.rs:259).  Covered shapes:
#
#     bare terms (OR'd across default fields)     hello world
#     occur prefixes                              +must -not NOT x
#     field scoping                               title:foo
#     phrases                                     "a b"  title:"a b"
#     ranges                                      ts:[a TO b]  n:{a TO b}
#     grouping                                    (a OR b) AND c
#     boost                                       foo^2  "a b"^0.5  (x y)^3
#     escaping                                    foo\:bar  \+term
#     connectors                                  a AND b / a OR b / AND NOT
#
# Connector semantics match the engine's prior rewrite (and tantivy's
# clause-occur model): ``AND`` upgrades both neighbors to must; ``OR``
# leaves neighbors as should; explicit +/-/NOT win over connectors.


_WORD_BREAK = set('()^"[{')


def _lex_query(q: str) -> list[tuple]:
    """Scan a query string into tokens.

    Token shapes: ('lparen',) ('rparen',) ('plus',) ('minus',)
    ('and',) ('or',) ('not',) ('boost', float) ('field', name)
    ('phrase', text) ('range', lo, hi, lo_incl, hi_incl) ('term', text)
    """
    toks: list[tuple] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            toks.append(("lparen",))
            i += 1
            continue
        if c == ")":
            toks.append(("rparen",))
            i += 1
            continue
        if c == "+" :
            toks.append(("plus",))
            i += 1
            continue
        if c == "-":
            toks.append(("minus",))
            i += 1
            continue
        if c == "^":
            j = i + 1
            while j < n and (q[j].isdigit() or q[j] == "."):
                j += 1
            try:
                boost_val = float(q[i + 1:j])
            except ValueError:
                raise QueryError(f"expected number after '^' at {i}") from None
            toks.append(("boost", boost_val))
            i = j
            continue
        if c == '"':
            j = i + 1
            buf: list[str] = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    j += 1
                buf.append(q[j])
                j += 1
            if j >= n:
                raise QueryError("unterminated phrase quote")
            i = j + 1
            slop = 0
            if i < n and q[i] == "~":  # "a b"~2 — sloppy phrase
                k = i + 1
                while k < n and q[k].isdigit():
                    k += 1
                if k == i + 1:
                    raise QueryError(f"expected number after '~' at {i}")
                slop = int(q[i + 1:k])
                i = k
            toks.append(("phrase", "".join(buf), slop))
            continue
        if c in "[{":
            close = "]" if c == "[" else "}"
            # exclusive at either end: tantivy allows mixed [a TO b}
            j = i + 1
            while j < n and q[j] not in "]}":
                j += 1
            if j >= n:
                raise QueryError("unterminated range")
            body = q[i + 1:j].split()
            if len(body) != 3 or body[1] != "TO":
                raise QueryError(f"malformed range {q[i:j + 1]!r}")
            toks.append(("range", body[0], body[2], c == "[", q[j] == "]"))
            i = j + 1
            continue
        # bare word: term / field-prefix / AND / OR / NOT, with \ escapes
        buf = []
        saw_escape = False
        last_escaped = False
        j = i
        while j < n and not q[j].isspace() and q[j] not in _WORD_BREAK:
            if q[j] == "\\" and j + 1 < n:
                saw_escape = True
                last_escaped = True
                j += 1
                buf.append(q[j])
                j += 1
                continue
            if q[j] == ":":
                toks.append(("field", "".join(buf)))
                buf = []
                last_escaped = False
                j += 1
                # the value may be a phrase/range → restart outer loop
                if j < n and (q[j] in '"[{' or q[j].isspace()):
                    break
                continue
            buf.append(q[j])
            last_escaped = False
            j += 1
        word = "".join(buf)
        i = j
        if not word:
            continue
        if not saw_escape and word in ("AND", "OR", "NOT"):
            toks.append((word.lower(),))
        elif word.endswith("*") and not last_escaped and len(word) > 1:
            # trailing unescaped '*' → prefix query; '\*' stays literal
            toks.append(("prefix", word[:-1]))
        else:
            toks.append(("term", word))
    return toks


def _clause_node(schema: IndexSchema, fields: list[str], tok: tuple) -> Node | None:
    """One primary (term / phrase / range) over one-or-more fields."""
    kind = tok[0]
    if kind == "phrase":
        slop = tok[2] if len(tok) > 2 else 0
        parts: list[Node] = []
        for f in fields:
            terms = _analyze_one(schema, f, tok[1])
            if len(terms) >= 2:
                fdef = schema.field(f)
                if fdef is None or not fdef.has_positions:
                    raise QueryError(f"field {f!r} does not record positions")
                parts.append(PhraseQ(f, terms, slop=slop))
            elif len(terms) == 1:
                parts.append(TermQ(f, terms[0]))
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else BoolQ(should=parts)
    if kind == "prefix":
        parts = [_prefix_node(schema, f, tok[1]) for f in fields]
        return parts[0] if len(parts) == 1 else BoolQ(should=parts)
    if kind == "range":
        lo, hi, lo_incl, hi_incl = tok[1], tok[2], tok[3], tok[4]
        kw: dict = {}
        if lo != "*":
            kw["gte" if lo_incl else "gt"] = lo
        if hi != "*":
            kw["lte" if hi_incl else "lt"] = hi
        return RangeQ(fields[0], **kw)
    # term
    parts = [_term_or_bool(schema, f, tok[1]) for f in fields]
    parts = [p for p in parts
             if not (isinstance(p, BoolQ) and not p.should
                     and not p.must and not p.must_not)]
    if not parts:
        return None
    return parts[0] if len(parts) == 1 else BoolQ(should=parts)


def _parse_clauses(toks: list[tuple], pos: int, schema: IndexSchema,
                   default_fields: list[str], depth: int) -> tuple[Node, int]:
    """Parse a clause sequence until end-of-input or a closing paren.

    Returns (node, next_pos); ``next_pos`` is AFTER the consumed ')'.
    """
    clauses: list[list] = []  # [occur:str|None, node:Node]
    pending_occur: str | None = None
    conj_next = False  # an AND upgrades the following unmarked clause

    def push(node: Node | None) -> None:
        nonlocal pending_occur, conj_next
        occur = pending_occur
        if occur is None and conj_next:
            occur = "+"
        if node is not None:
            clauses.append([occur, node])
        pending_occur = None
        conj_next = False

    i = pos
    closed = False
    while i < len(toks):
        t = toks[i]
        kind = t[0]
        if kind == "rparen":
            if depth == 0:
                raise QueryError("unbalanced ')'")
            i += 1
            closed = True
            break
        if kind == "plus":
            pending_occur = "+"
            i += 1
            continue
        if kind in ("minus", "not"):
            pending_occur = "-"
            i += 1
            continue
        if kind == "and":
            if clauses and clauses[-1][0] is None:
                clauses[-1][0] = "+"
            conj_next = True
            i += 1
            continue
        if kind == "or":
            i += 1
            continue
        if kind == "boost":
            if not clauses:
                raise QueryError("dangling '^boost'")
            clauses[-1][1] = BoostQ(clauses[-1][1], t[1])
            i += 1
            continue
        if kind == "lparen":
            sub, i = _parse_clauses(toks, i + 1, schema, default_fields,
                                    depth + 1)
            push(sub)
            continue
        if kind == "field":
            fname = t[1]
            if i + 1 < len(toks) and toks[i + 1][0] == "lparen":
                # tantivy field grouping — ``title:(a b)``: the field
                # distributes over the whole group, i.e. the group is
                # parsed with [fname] as its default fields
                sub, i = _parse_clauses(toks, i + 2, schema, [fname],
                                        depth + 1)
                push(sub)
                continue
            if i + 1 >= len(toks) or toks[i + 1][0] not in (
                    "term", "phrase", "range", "prefix"):
                raise QueryError(f"field {fname!r} has no value")
            push(_clause_node(schema, [fname], toks[i + 1]))
            i += 2
            continue
        # term / phrase / range on the default fields
        push(_clause_node(schema, default_fields, t))
        i += 1

    if depth > 0 and not closed:
        raise QueryError("unbalanced '('")
    node = BoolQ()
    for occur, sub in clauses:
        (node.must if occur == "+" else
         node.must_not if occur == "-" else node.should).append(sub)
    if len(node.should) == 1 and not node.must and not node.must_not:
        return node.should[0], i
    return node, i


def parse_string(query: str, schema: IndexSchema,
                 default_fields: list[str] | None = None) -> Node:
    """tantivy string grammar → AST (see the grammar block above)."""
    if default_fields is None:
        default_fields = schema.default_search_fields()
    toks = _lex_query(query)
    node, pos = _parse_clauses(toks, 0, schema, default_fields, depth=0)
    if pos < len(toks):
        raise QueryError("unbalanced ')'")
    if isinstance(node, BoolQ) and not node.must and not node.must_not \
            and not node.should:
        raise QueryError("Empty Query Provided")
    return node
