"""Analyzer chains with tantivy-0.18 parity.

The reference binds tokenizers per field in the index schema
(/root/reference/test/lib/fixtures.js:17-47, README.md:27-51):

- ``en_stem``  = SimpleTokenizer → RemoveLongFilter(40) → LowerCaser
                 → Stemmer(English)   ⟨tantivy 0.18 en_stem chain⟩
- ``default``  = SimpleTokenizer → RemoveLongFilter(40) → LowerCaser
- ``raw``      = whole value is one token, untouched (keyword fields)

SimpleTokenizer splits on any non-alphanumeric character (Unicode
``char::is_alphanumeric`` — this excludes underscore, so the regex is
``[^\\W_]+`` rather than ``\\w+``).  RemoveLongFilter drops tokens whose
UTF-8 byte length is >= 40.  Token *positions* are assigned by the
tokenizer before filtering, so a dropped long token leaves a position
gap — this matters for phrase queries.

Everything is exposed both as plain Python (for query-term analysis on
the driver and for the pure-Python test oracle) and as a vectorized
pandas transform used from Arrow-batched UDFs — no per-row Python UDFs
in the Spark hot path (BASELINE.json:15).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

from sonar_tantivy_spark.functions.porter2 import stem

# Unicode alphanumeric runs, excluding underscore (Rust char::is_alphanumeric).
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

MAX_TOKEN_BYTES = 40

TOKENIZERS = ("en_stem", "default", "raw")


def tokenize(text: str, tokenizer: str = "en_stem") -> list[tuple[str, int]]:
    """Analyze one string → list of (term, position).

    Positions are indices in the pre-filter token stream (gaps where the
    RemoveLongFilter dropped a token), matching tantivy semantics.
    """
    if text is None:
        return []
    if tokenizer == "raw":
        return [(text, 0)] if text != "" else []
    out: list[tuple[str, int]] = []
    do_stem = tokenizer == "en_stem"
    for pos, m in enumerate(_TOKEN_RE.finditer(text)):
        tok = m.group(0)
        if len(tok.encode("utf-8")) >= MAX_TOKEN_BYTES:
            continue
        tok = tok.lower()
        if do_stem:
            tok = stem(tok)
        out.append((tok, pos))
    return out


def analyze_terms(text: str, tokenizer: str = "en_stem") -> list[str]:
    """Terms only (used to analyze query strings)."""
    return [t for t, _ in tokenize(text, tokenizer)]


def tokenize_batch(
    texts: Iterable[str | None], tokenizer: str = "en_stem"
) -> Iterator[list[tuple[str, int]]]:
    """Vectorized batch form used inside Arrow/pandas UDFs.

    ``porter2.stem`` is lru_cached, so per-batch cost is ~one dict hit per
    token occurrence; the distinct-term working set dominates.
    """
    for text in texts:
        yield tokenize(text, tokenizer)
