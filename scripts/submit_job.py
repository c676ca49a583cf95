#!/usr/bin/env python3
"""spark-submit entrypoint (the north rule's deployment surface).

Packages benthos_spark into a zip and runs a YAML pipeline spec on any
cluster master:

    python scripts/submit_job.py --spec job.yaml            # package + submit
    spark-submit --py-files benthos_spark.zip scripts/submit_job.py \
        --spec job.yaml --no-submit                         # on-cluster entry

In-sandbox this degrades to local[...]; on a real cluster pass
--master/--conf through to spark-submit unchanged.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    pkg_root = os.path.join(REPO, "benthos_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_root):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


def run_spec_main(spec_path: str) -> None:
    from benthos_spark.session import get_spark
    from benthos_spark.engine.spec import run_spec

    spark = get_spark(app_name=f"benthos_spark:{os.path.basename(spec_path)}")
    with open(spec_path) as f:
        result = run_spec(spark, f.read())
    if result is not None:
        result.show(20, truncate=False)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--no-submit", action="store_true", help="run in-process (on-cluster entry)")
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    if args.no_submit:
        run_spec_main(args.spec)
        return

    zip_path = build_zip(os.path.join(REPO, "benthos_spark.zip"))
    cmd = ["spark-submit"]
    if args.master:
        cmd += ["--master", args.master]
    for c in args.conf:
        cmd += ["--conf", c]
    cmd += ["--py-files", zip_path, os.path.abspath(__file__), "--spec", args.spec, "--no-submit"]
    sys.exit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
