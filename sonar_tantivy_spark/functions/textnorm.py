"""Unicode text normalization for corpus cleaning: NFC canonical form,
control-character strip, whitespace squash + trim.

The standard first stage of a web-corpus cleaning pipeline (every
public pipeline — CCNet, Gopher, RefinedWeb — normalizes before any
hashing or filtering, because NFC-distinct byte strings that render
identically would otherwise defeat exact dedup).  Implemented as a
vectorized Arrow/pandas UDF: ``pandas.Series.str.normalize`` runs the
ICU-equivalent CPython ``unicodedata`` normalization over the whole
Arrow batch without a per-row Python call, and the two regex passes
stay inside pandas' vectorized str engine.  Map-only — no shuffle at
any scale; at 100 TB the operator's cost is one pass over the text
column and the plan stays a single mapInPandas stage fused with the
parquet scan.

Semantics are pinned so a SQL oracle can reproduce them exactly on
ASCII + BMP input: NFC (not NFKC — DuckDB's ``nfc_normalize`` is the
cross-engine anchor), then strip C0/C1-ish controls except ``\\t \\n
\\r`` (which the whitespace squash folds), then collapse every
whitespace run to one space and trim.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# C0 controls minus \t\n\r (those are whitespace, handled by the
# squash), plus DEL.  Kept to a byte-class regex both pandas and
# DuckDB interpret identically.
CONTROL_CLASS = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS = r"\s+"


def normalize_str(s: str) -> str:
    """Pure-Python reference semantics (used by tests as the oracle for
    the vectorized path)."""
    import re

    out = unicodedata.normalize("NFC", s)
    out = re.sub(CONTROL_CLASS, "", out)
    return re.sub(_WS, " ", out).strip()


def _normalize_series(s: pd.Series) -> pd.Series:
    out = s.str.normalize("NFC")
    out = out.str.replace(CONTROL_CLASS, "", regex=True)
    return out.str.replace(_WS, " ", regex=True).str.strip()


def normalize_text(col: Column) -> Column:
    """NFC + control-strip + whitespace-squash of a string column."""
    # Built lazily: pandas_udf parses its return type through the
    # active SparkContext, so a module-level decorator would require a
    # session at import time.
    from pyspark.sql.types import StringType

    return pandas_udf(_normalize_series, StringType())(col)
