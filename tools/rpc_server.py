"""NDJSON-stdio RPC server — the reference binary's process shape
(/root/reference/src-rust/main.rs: `sonar-tantivy <base_path>` then a
stdin/stdout request loop).

    python tools/rpc_server.py <base_path> [cpus]

One SparkSession serves the loop; responses are one JSON object per
line.  Spark's own logging goes to stderr, keeping stdout a clean
response channel (the reference does the same with eprintln)."""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Spark PYTHON WORKERS inherit PYTHONPATH from the driver env, not the
# driver's sys.path — without this, any pandas-UDF stage (the tokenizer)
# dies with ModuleNotFoundError when the server is launched from
# outside the repo
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    if len(sys.argv) < 2:
        sys.stderr.write("usage: rpc_server.py <base_path> [cpus]\n")
        sys.exit(1)
    base = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "8"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sonar_tantivy_spark import IndexCatalog
    from sonar_tantivy_spark.rpc import Rpc

    Rpc(IndexCatalog(spark, base)).stdio_loop()


if __name__ == "__main__":
    main()
