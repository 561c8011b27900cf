"""Sweep the rare-term broadcast skew-guard threshold (_SKEW_SPREAD).

VERDICT r3 #6: the phrase path fired the rare-term broadcast semi-join
at an 8x df spread, the scored-bool path at 32x — same guard, two
constants, no measurement.  This tool plants a corpus with one rare
needle term (df ~1%) co-occurring adjacently with hot terms at
controlled df spreads (4x..64x), then times the phrase and bool-must
query at every spread with the guard FORCED ON vs FORCED OFF
(monkeypatching search._SKEW_SPREAD / _SKEW_MIN_SAVED_BYTES).  The
crossover — where guard-on first beats guard-off — is the evidence for
the shared rule in operators/search.py.  Measured result (160k + 640k
doc corpora, local[16]): the crossover tracks the hot side's ABSOLUTE
exchange bytes, not the df ratio — phrase wins from hot df ~1e5
(positions rows), bool needs ~4x more rows (narrow rows) — hence the
byte-based _SKEW_MIN_SAVED_BYTES floor with per-shape row widths.

Run: python tools/sweep_skew_guard.py [n_docs]
Prints one JSON line per (shape, spread): {on, off, win}.
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from sonar_tantivy_spark import IndexCatalog  # noqa: E402
from sonar_tantivy_spark.operators import search as S  # noqa: E402
from sonar_tantivy_spark.plans import ast as A  # noqa: E402
from sonar_tantivy_spark.sources.transcripts import TRANSCRIPT_SCHEMA  # noqa: E402

SPREADS = [4, 8, 16, 32, 64]
REPS = 3


def corpus(n: int) -> pd.DataFrame:
    rare_every = 100  # df = n/100 (1%)
    rows = []
    for i in range(n):
        words = [f"fill{(i * 7 + j) % 29}" for j in range(12)]
        if i % rare_every == 0:
            for sp in SPREADS:
                words += ["needlerare", f"hot{sp}"]
        else:
            for sp in SPREADS:
                if i % max(1, rare_every // sp) == 0:
                    words.append(f"hot{sp}")
        rows.append({"conv_id": f"conv-{i:08d}", "turn_idx": 0,
                     "role": "user", "text": " ".join(words),
                     "tool": "bash",
                     "ts": pd.Timestamp("2026-01-01")
                     + pd.Timedelta(seconds=i)})
    return pd.DataFrame(rows)


def time_query(searcher, node, reps=REPS):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        searcher.top_k(node, limit=10).collect()
        out.append(time.perf_counter() - t0)
    return statistics.median(out)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
    spark = (SparkSession.builder.master("local[16]")
             .appName("sweep-skew-guard")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    base = tempfile.mkdtemp(prefix="stspark-sweep-")
    cat = IndexCatalog(spark, base)
    idx = cat.create_index("sweep", TRANSCRIPT_SCHEMA)
    idx.add_df(spark.createDataFrame(corpus(n)),
               order_cols=["conv_id", "turn_idx"], num_segments=8)
    s = idx.searcher()
    results = []
    for sp in SPREADS:
        for shape, q in (
            ("phrase", {"phrase": {"text": ["needlerare", f"hot{sp}"]}}),
            ("bool", {"bool": {"must": [{"term": {"text": "needlerare"}},
                                        {"term": {"text": f"hot{sp}"}}]}}),
        ):
            node = A.parse_json(q, idx.schema)
            S._SKEW_SPREAD, S._SKEW_MIN_SAVED_BYTES = 1, 0  # force ON
            on = time_query(s, node)
            S._SKEW_SPREAD = 1 << 40                        # force OFF
            off = time_query(s, node)
            rec = {"shape": shape, "spread": sp,
                   "on_s": round(on, 4), "off_s": round(off, 4),
                   "win": round(off / on, 3)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    best = {}
    for r in results:
        best.setdefault(r["shape"], []).append((r["spread"], r["win"]))
    cross = {sh: next((sp for sp, w in sorted(v) if w > 1.0), None)
             for sh, v in best.items()}
    print(json.dumps({"crossover_spread": cross, "n_docs": n}))
    spark.stop()


if __name__ == "__main__":
    main()
