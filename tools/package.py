"""Build the --py-files zip for spark-submit deployment.

Usage: python tools/package.py [out_zip]
Produces dist/elasticsearch_spark.zip containing the package, suitable
for:  spark-submit --py-files dist/elasticsearch_spark.zip \
        jobs/build_index_job.py --input ... --output ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "elasticsearch_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "elasticsearch_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".pyc"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    path = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
