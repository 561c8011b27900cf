"""Package the engine as a --py-files zip for spark-submit.

    python tools/make_pyfiles.py      # -> dist/sonar_tantivy_spark.zip
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "sonar_tantivy_spark")
OUT = os.path.join(REPO, "dist", "sonar_tantivy_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    print(OUT)


if __name__ == "__main__":
    main()
