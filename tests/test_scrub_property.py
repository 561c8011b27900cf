"""Property tier for the PII patterns: for arbitrary benign filler with
planted PII tokens, applying the replacement chain leaves NO residual
match of any pattern, and every planted token is gone.  Runs the same
regexes through Python ``re`` (the patterns restrict themselves to the
Java/RE2/`re`-common subset), so thousands of examples cost no Spark
session — the Spark-side behavior is pinned by tests/test_scrub.py."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from sonar_tantivy_spark.functions.scrub import PII_PATTERNS

WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8)

PLANTS = [
    "jane.doe+x@example.co.uk",
    "https://ex.com/a?b=1&c=jane@ex.com",
    "www.host.io/path",
    "4111 1111 1111 1111",
    "4111-1111-1111-1111",
    "078-05-1120",
    "(555) 867-5309",
    "+1 555.867.5309",
    "555-867-5309",
    "192.168.10.254",
]


def scrub_py(text: str) -> str:
    for _, pat, repl in PII_PATTERNS:
        text = re.sub(pat, repl, text)
    return text


@settings(max_examples=300, deadline=None)
@given(words=st.lists(WORD, min_size=0, max_size=8),
       plants=st.lists(st.sampled_from(PLANTS), min_size=1, max_size=4),
       seed=st.integers(0, 2**31))
def test_no_residual_pii_after_scrub(words, plants, seed):
    import random
    rng = random.Random(seed)
    toks = list(words) + list(plants)
    rng.shuffle(toks)
    text = " ".join(toks)
    out = scrub_py(text)
    # every planted PII literal is gone
    for p in plants:
        assert p not in out, (p, out)
    # no pattern matches anything in the scrubbed text (the replacement
    # tokens themselves are letter/angle-bracket only, so a residual
    # match would mean a pattern leaked through precedence)
    for name, pat, _ in PII_PATTERNS:
        assert not re.search(pat, out), (name, out)


@settings(max_examples=200, deadline=None)
@given(words=st.lists(WORD, min_size=1, max_size=12))
def test_benign_text_is_fixed_point(words):
    text = " ".join(words)
    assert scrub_py(text) == text
