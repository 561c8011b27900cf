"""String edit distances for fuzzy-query term expansion.

The reference's FuzzyQuery carries a ``transposition`` flag (toshi
FuzzyQuery, bound at /root/reference/src-rust/search.rs:48): with
``transposition=true`` tantivy's Levenshtein automaton counts an
adjacent-character swap as ONE edit (Damerau); with ``false`` it is
plain Levenshtein (a swap costs two).

``osa`` implements the optimal-string-alignment (restricted Damerau)
distance — the automaton's semantics, and equal to DuckDB's
``damerau_levenshtein`` for the small distances fuzzy queries use
(they only diverge on pathological cases needing edits *inside* a
transposed pair, impossible at distance <= 2).

Scale shape: exact OSA runs as an Arrow-batched pandas UDF over the
*termdict* (distinct terms, not postings), behind a JVM prefilter
``levenshtein(term, q) <= 2*d AND |len(term)-len(q)| <= d`` — valid
because every transposition can be simulated by two substitutions, so
``lev <= 2*osa``; the Python hop therefore touches only a handful of
near-miss terms even on a large dictionary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def osa(a: str, b: str) -> int:
    """Optimal string alignment (restricted Damerau-Levenshtein)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    d = [list(range(lb + 1))] + [[i] + [0] * lb for i in range(1, la + 1)]
    for i in range(1, la + 1):
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cb = b[j - 1]
            cost = ca != cb
            v = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and ca == b[j - 2] and a[i - 2] == cb:
                v = min(v, d[i - 2][j - 2] + 1)
            d[i][j] = v
    return d[la][lb]


def make_osa_udf(query: str):
    """Arrow-batched ``term -> osa(term, query)`` column function."""

    @F.pandas_udf(T.IntegerType())
    def _udf(terms: pd.Series) -> pd.Series:
        return terms.map(lambda t: osa(t, query) if t is not None else 99)

    return _udf


def jvm_prefilter(term_col, query: str, distance: int):
    """JVM-side superset filter for OSA <= distance (see module doc)."""
    return (
        (F.abs(F.length(term_col) - F.lit(len(query))) <= distance)
        & (F.levenshtein(term_col, F.lit(query)) <= 2 * distance)
    )
