"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names/types, and order-insensitive
values.  Usage: python tools/verify_contract.py [sf_dir] [name ...]

A FULL run (no name filter) also writes ``CORRECTNESS_LOCAL.json`` at
the repo root: per-query pass/fail plus the registered-query manifest,
git HEAD, and timestamp.  The driver's CORRECTNESS_r{N}.json went stale
two rounds running (r3 == r4 byte-identical while the registry grew);
this artifact makes staleness detectable at a glance — compare its
``registered`` list against the driver file's keys."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"ok": False, "err": f"spark: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(srows)} rows, no oracle)")
            results[name] = {"ok": True, "rows": len(srows),
                             "mode": "rows-only"}
            n_pass += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"ok": False, "err": f"duckdb: {e}"}
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        ok = True
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            ok = False
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
            ok = False
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diffs}")
            ok = False
        if ok:
            print(f"pass {name}: {len(sr)} rows in {time.time()-t0:.1f}s")
            n_pass += 1
        else:
            n_fail += 1
        results[name] = {"ok": ok, "rows": len(sr),
                         "wall_s": round(time.time() - t0, 1)}
    print(f"\n{n_pass} pass, {n_fail} fail")
    if not only:
        import json
        import subprocess

        try:
            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))).stdout.strip()
        except OSError:
            head = "unknown"
        art = {
            "sf_dir": sf_dir,
            "git_head": head,
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "registered": sorted(qs),
            "n_pass": n_pass,
            "n_fail": n_fail,
            "results": results,
        }
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_LOCAL.json")
        with open(out, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
        print(f"wrote {out} ({len(results)} queries)")
    from sonar_tantivy_spark import driver_queries
    driver_queries.clear_cache()
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
