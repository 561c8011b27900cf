"""PII scrubbing for training corpora — shape-based redaction as pure
column math.

Real pipelines scrub personally identifiable information before text
reaches a training mix.  This module implements the standard
shape-based pass (the recall-first choice: no checksum validation, so
card-shaped test numbers redact too) as chained ``regexp_replace``
JVM-side expressions — map-only, no UDF, no shuffle; at 100 TB the
pass costs one projection over the corpus scan.

Pattern order is PINNED and matters:

  1. URLs first — an email or IP inside a URL must redact as part of
     the URL token, not split it in half;
  2. emails before phones — the digits of ``a1-555-0100@x.com`` must
     not be half-eaten by the phone pattern;
  3. cards before phones — 16-digit runs would otherwise match the
     phone pattern's tail first;
  4. SSN/phone/IP last (most specific digit shapes).

The patterns deliberately use only the regex subset Java and RE2
interpret identically (no lookbehind), so an external auditor can
re-run them in most engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (category, java-regex, replacement) — order is the contract (above).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"(?:https?://|www\.)[^\s<>\"']+", "<URL>"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",
     "<EMAIL>"),
    ("card", r"\b(?:\d[ -]?){15}\d\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # NOTE: no \b before '(' or '+' — a word boundary never exists
    # between a space and a non-word char, so the boundary goes only in
    # front of the bare-digit branch
    ("phone",
     r"(?:\+\d{1,2}[ .-]?)?(?:\(\d{3}\)|\b\d{3})[ .-]?\d{3}[ .-]?\d{4}\b",
     "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def scrub_expr(col: Column | str) -> Column:
    """The scrubbed text expression: every category replaced by its
    placeholder token, applied in the pinned order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column | str) -> list[Column]:
    """Per-category match-count columns (``n_pii_<category>``), counted
    on the PROGRESSIVELY scrubbed text so categories never double-count
    the same span (an email inside a URL counts as url, not email) —
    the same precedence the replacement applies."""
    cur = F.col(col) if isinstance(col, str) else col
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long")
            .alias(f"n_pii_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return counts


def scrub_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``docs`` + scrubbed text + per-category counts + a total.  The
    original column is REPLACED (scrubbing that keeps the original
    defeats the purpose); callers wanting an audit trail should write
    the counts, not the raw spans."""
    counts = pii_counts(text_col)
    out = docs.select(
        *[c for c in docs.columns if c != text_col],
        scrub_expr(text_col).alias(text_col),
        *counts,
    )
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_pii_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii_total", total.cast("long"))
