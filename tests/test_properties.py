"""Hypothesis property tests for the pure-Python kernels (analyzer,
stemmer, snippet, grammar parser) — the pieces whose behavior every
Spark plan inherits.  These complement the seeded rank-parity fuzz in
test_query_fuzz.py with adversarial minimized inputs."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from sonar_tantivy_spark.analyzer import (MAX_TOKEN_BYTES, analyze_terms,
                                          tokenize)
from sonar_tantivy_spark.functions.porter2 import stem
from sonar_tantivy_spark.operators.snippet import generate_snippet
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.plans.schema import IndexSchema

TEXTISH = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=300)

SCHEMA = IndexSchema.from_json([
    {"name": "body", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "role", "type": "text",
     "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                 "stored": True}},
])


@given(TEXTISH)
@settings(max_examples=300, deadline=None)
def test_tokenize_invariants(text):
    toks = tokenize(text, "en_stem")
    positions = [p for _, p in toks]
    assert positions == sorted(positions)          # monotone positions
    assert len(set(positions)) == len(positions)   # no duplicate slot
    for term, _ in toks:
        assert term == term.lower()
        assert len(term.encode("utf-8")) < MAX_TOKEN_BYTES + 10
        assert term != ""
        # no split character survives inside a term
        assert not re.search(r"[\W_]", term, re.UNICODE) or any(
            c.isalnum() for c in term)


@given(TEXTISH)
@settings(max_examples=300, deadline=None)
def test_default_vs_stem_alignment(text):
    """en_stem and default must agree on token boundaries/positions —
    stemming only rewrites the term text."""
    a = tokenize(text, "default")
    b = tokenize(text, "en_stem")
    assert [p for _, p in a] == [p for _, p in b]
    for (raw, _), (stemmed, _) in zip(a, b):
        assert stemmed == stem(raw)


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
               max_size=30))
@settings(max_examples=500, deadline=None)
def test_stem_total_and_ascii_stable(word):
    out = stem(word)
    assert isinstance(out, str) and out != "" or word == ""
    assert out == out.lower()
    assert len(out) <= len(word) + 2  # Porter2 never grows much


@given(TEXTISH, st.sets(st.text(alphabet="abcdefghij", min_size=1,
                                max_size=8), max_size=4))
@settings(max_examples=300, deadline=None)
def test_snippet_well_formed(text, terms):
    snip = generate_snippet(text, terms)
    if snip is None:
        return
    assert snip.count("<b>") == snip.count("</b>")
    # strip highlight tags -> must be an HTML-escape of a substring
    # (entity-encoded), so unescaping reproduces source characters
    inner = snip.replace("<b>", "").replace("</b>", "")
    import html
    assert html.unescape(inner) in text


@given(st.text(alphabet=' abct:"()^+-[]{}\\2.5AZORND', max_size=60))
@settings(max_examples=1000, deadline=None)
def test_parser_total(q):
    """Every input either parses to a plan node or raises QueryError —
    no other exception type may escape (crash-totality)."""
    try:
        node = A.parse_string(q, SCHEMA)
        assert node is not None
    except A.QueryError:
        pass
