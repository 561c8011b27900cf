"""String-grammar parser corpus — tantivy QueryParser shapes the
reference inherits at /root/reference/src-rust/index.rs:259: parens
grouping, unary NOT, ^boost, escaping, exclusive ranges; plus end-to-end
execution parity (engine vs pure-Python oracle) for the new shapes."""

import pytest

from sonar_tantivy_spark import IndexCatalog
from sonar_tantivy_spark.plans import ast as A
from sonar_tantivy_spark.plans.schema import IndexSchema
from tests.conftest import FIXTURE_SCHEMA
from tests.oracle import OracleIndex

SCHEMA = IndexSchema.from_json(FIXTURE_SCHEMA)  # title, body indexed; id not


def parse(q):
    return A.parse_string(q, SCHEMA)


def test_parens_grouping():
    node = parse("(a OR b) AND c")
    assert isinstance(node, A.BoolQ)
    assert len(node.must) == 2 and not node.should and not node.must_not
    group = node.must[0]
    # (a OR b): a bool of shoulds
    assert isinstance(group, A.BoolQ) and len(group.should) == 2


def test_nested_parens():
    node = parse("((a b) c)")
    assert isinstance(node, A.BoolQ) and len(node.should) == 2


def test_not_keyword_equals_minus():
    assert parse("NOT foo bar") == parse("-foo bar")


def test_and_not():
    node = parse("a AND NOT b")
    assert len(node.must) == 1 and len(node.must_not) == 1


def test_boost_term_field():
    node = parse("title:foo^2")
    assert isinstance(node, A.BoostQ) and node.boost == 2.0
    assert node.child == A.TermQ("title", "foo")


def test_boost_phrase_and_group():
    p = parse('body:"hello world"^0.5')
    assert isinstance(p, A.BoostQ) and p.boost == 0.5
    assert isinstance(p.child, A.PhraseQ)
    g = parse("(a b)^3")
    assert isinstance(g, A.BoostQ) and g.boost == 3.0


def test_escaped_colon_is_not_field():
    # \: prevents field-prefix interpretation; the analyzer then splits
    # the token on the non-alphanumeric ':' into two terms
    node = parse(r"body:foo\:bar")
    assert isinstance(node, A.BoolQ)
    assert {t.term for t in node.should} == {"foo", "bar"}
    assert all(t.field == "body" for t in node.should)


def test_escaped_keyword_is_term():
    node = parse(r"\AND")
    # escaped, so not a connector: parses as a term over default fields
    terms = node.should if isinstance(node, A.BoolQ) else [node]
    assert any(isinstance(t, A.TermQ) for t in terms)


def test_exclusive_range():
    node = parse("title:{a TO c}")
    assert node == A.RangeQ("title", gt="a", lt="c")
    node = parse("title:[a TO c}")
    assert node == A.RangeQ("title", gte="a", lt="c")
    node = parse("title:[* TO c]")
    assert node == A.RangeQ("title", lte="c")


def test_negated_phrase():
    node = parse('-"exact phrase" x')
    assert len(node.must_not) == 1 and len(node.should) == 1


@pytest.mark.parametrize("bad", ["(a OR b", "a)", "  ", "a^", 'x:"unterm',
                                 "ts:[a TO]", "title:"])
def test_errors(bad):
    with pytest.raises(A.QueryError):
        parse(bad)


# ---------------------------------------------------------------- execution
DOCS = [
    {"id": "d0", "title": "alpha beta", "body": "gamma delta common"},
    {"id": "d1", "title": "alpha", "body": "delta exact phrase common"},
    {"id": "d2", "title": "beta", "body": "gamma common epsilon"},
    {"id": "d3", "title": "zeta", "body": "common alpha beta gamma"},
]


@pytest.fixture(scope="module")
def exec_idx(spark, tmp_path_factory):
    cat = IndexCatalog(spark, str(tmp_path_factory.mktemp("grammar")))
    idx = cat.create_index("g", FIXTURE_SCHEMA)
    idx.add(DOCS)
    return idx


@pytest.fixture(scope="module")
def exec_oracle():
    return OracleIndex(DOCS, {"title": "en_stem", "body": "en_stem"})


@pytest.mark.parametrize("q", [
    "(alpha OR beta) AND common",
    '-"exact phrase" common',
    "title:alpha^2 body:gamma",
    "NOT epsilon common",
    "(alpha AND beta) OR zeta",
    "common^0.5 title:beta^4",
])
def test_execution_parity(exec_idx, exec_oracle, q):
    node = A.parse_string(q, exec_idx.schema)
    s = exec_idx.searcher()
    got = [(r["docid_g"], round(r["score"], 9))
           for r in s.top_k(node, limit=10).collect()]
    want = [(d, round(sc, 9)) for d, sc in exec_oracle.top_k(node, 10)]
    assert got == want, (q, got, want)


def test_field_grouping_distributes():
    """tantivy field grouping: ``title:(a b)`` scopes the whole group
    to the field (ADVICE r2)."""
    assert parse("title:(alpha beta)") == parse("title:alpha title:beta")
    assert parse("title:(+alpha -beta)") == \
        parse("+title:alpha -title:beta")
    grouped = parse('title:("a b" OR c)')
    assert isinstance(grouped, A.BoolQ) and len(grouped.should) == 2
    assert all(getattr(s, "field", None) == "title"
               for s in grouped.should)


def test_field_space_value():
    assert parse("title: alpha") == parse("title:alpha")


def test_field_grouping_unbalanced_raises():
    with pytest.raises(A.QueryError):
        parse("title:(alpha")


def test_parser_never_crashes_on_random_input():
    """Robustness: arbitrary garbage must either parse or raise
    QueryError — never any other exception type."""
    import random

    rng = random.Random(99)
    chars = 'ab c:()"^+-[]{}\\*AND OR NOT 0.5\t~|'
    parsed = errors = 0
    for _ in range(3000):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 24)))
        try:
            A.parse_string(s, SCHEMA)
            parsed += 1
        except A.QueryError:
            errors += 1
    assert parsed + errors == 3000
    assert parsed > 0 and errors > 0
