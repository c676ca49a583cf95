#!/usr/bin/env python3
"""Build the --py-files artifact for cluster submission.

Zips the ``benthos_spark`` package (sources only, no __pycache__) into
``dist/benthos_spark.zip``. Cluster usage (the north-rule deployment
shape):

    spark-submit --master <cluster> \\
        --py-files dist/benthos_spark.zip \\
        scripts/submit_flagship.py --rows 1000000000

Executors import the package straight from the zip; no install step.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "benthos_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "benthos_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
