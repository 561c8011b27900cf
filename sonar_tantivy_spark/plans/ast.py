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

import re
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


@dataclass
class FuzzyQ(Node):
    field: str
    term: str
    distance: int = 1
    transposition: bool = False


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


# ---------------------------------------------------------------- JSON DSL


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
        fdef = schema.field(field)
        if fdef is None or not fdef.has_positions:
            raise QueryError(f"field {field!r} does not record positions")
        analyzed: list[str] = []
        for t in terms:
            analyzed.extend(_analyze_one(schema, field, t))
        return PhraseQ(field, analyzed)
    if kind == "bool":
        node = BoolQ()
        for key, dst in (("must", node.must), ("must_not", node.must_not),
                         ("should", node.should)):
            for sub in body.get(key, []) or []:
                dst.append(parse_json(sub, schema))
        return node
    if kind == "fuzzy":
        (field, spec), = body.items()
        return FuzzyQ(field, str(spec["value"]).lower(),
                      int(spec.get("distance", 1)),
                      bool(spec.get("transposition", False)))
    if kind == "regex":
        (field, pattern), = body.items()
        return RegexQ(field, pattern)
    if kind == "range":
        (field, bounds), = body.items()
        return RangeQ(field, gte=bounds.get("gte"), gt=bounds.get("gt"),
                      lte=bounds.get("lte"), lt=bounds.get("lt"))
    if kind == "all":
        return AllQ()
    if kind == "raw":
        return parse_string(body if isinstance(body, str) else body["query"], schema)
    raise QueryError(f"unknown query variant {kind!r}")


# ------------------------------------------------------------ string grammar

_TOKEN_SPLIT_RE = re.compile(
    r"""
    \s*(?:
        (?P<occur>[+-])?
        (?:(?P<field>[\w.]+):)?
        (?:
            "(?P<phrase>[^"]*)"
          | \[(?P<range_lo>\S+)\s+TO\s+(?P<range_hi>\S+)\]
          | (?P<term>[^\s]+)
        )
    )
    """,
    re.VERBOSE,
)


def parse_string(query: str, schema: IndexSchema,
                 default_fields: list[str] | None = None) -> Node:
    """tantivy string grammar (subset the reference exercises).

    Bare clauses are OR'd (``should``) across the default fields;
    ``+``/``-`` mark must/must_not; ``field:term`` targets one field;
    quoted strings are phrases; ``[a TO b]`` is an inclusive range.
    ``AND``/``OR`` connectors are honored by rewriting: ``a AND b`` →
    ``+a +b`` (tantivy parses conjunctions the same way).
    """
    if default_fields is None:
        default_fields = schema.default_search_fields()
    # Rewrite infix AND: mark both neighbors as must.
    toks = query.split()
    rewritten: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "AND" and rewritten and i + 1 < len(toks):
            prev = rewritten.pop()
            if not prev.startswith(("+", "-")):
                prev = "+" + prev
            nxt = toks[i + 1]
            if not nxt.startswith(("+", "-")):
                nxt = "+" + nxt
            rewritten.extend([prev, nxt])
            i += 2
        elif t == "OR":
            i += 1
        else:
            rewritten.append(t)
            i += 1
    query = " ".join(rewritten)

    node = BoolQ()
    for m in _TOKEN_SPLIT_RE.finditer(query):
        if not m.group(0).strip():
            continue
        occur = m.group("occur")
        fields = [m.group("field")] if m.group("field") else default_fields
        sub: Node
        if m.group("phrase") is not None:
            parts = []
            for f in fields:
                terms = _analyze_one(schema, f, m.group("phrase"))
                if len(terms) >= 2:
                    parts.append(PhraseQ(f, terms))
                elif len(terms) == 1:
                    parts.append(TermQ(f, terms[0]))
            sub = parts[0] if len(parts) == 1 else BoolQ(should=parts)
        elif m.group("range_lo") is not None:
            lo, hi = m.group("range_lo"), m.group("range_hi")
            sub = RangeQ(fields[0], gte=None if lo == "*" else lo,
                         lte=None if hi == "*" else hi)
        else:
            parts = [_term_or_bool(schema, f, m.group("term")) for f in fields]
            parts = [p for p in parts if not (isinstance(p, BoolQ) and not p.should
                                              and not p.must and not p.must_not)]
            if not parts:
                continue
            sub = parts[0] if len(parts) == 1 else BoolQ(should=parts)
        if occur == "+":
            node.must.append(sub)
        elif occur == "-":
            node.must_not.append(sub)
        else:
            node.should.append(sub)
    if not node.must and not node.must_not and not node.should:
        raise QueryError("Empty Query Provided")
    # Simplify single-should bool.
    if len(node.should) == 1 and not node.must and not node.must_not:
        return node.should[0]
    return node
