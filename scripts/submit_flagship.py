#!/usr/bin/env python3
"""spark-submit entry point for the flagship pipeline (north-rule shape).

Designed to run with the package shipped via --py-files (see
package_pyfiles.py) — it imports ``benthos_spark`` only AFTER the
SparkSession exists, the way a cluster submission resolves zip imports.

    spark-submit --master local[4] --py-files dist/benthos_spark.zip \\
        scripts/submit_flagship.py --rows 200000

Prints one JSON line: {"rows": <agg rows>, "input_rows": N}.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("benthos-spark-flagship")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    # imported after session start: on a cluster these resolve from the
    # --py-files zip on both driver and executors
    from benthos_spark.fixtures import pages
    from benthos_spark.pipelines import pages_windowed_dedupe_agg

    df = pages(spark, args.rows, n_partitions=max(8, args.shuffle_partitions))
    out = pages_windowed_dedupe_agg(df)
    n = out.count()
    print(json.dumps({"rows": n, "input_rows": args.rows}))
    spark.stop()


if __name__ == "__main__":
    main()
