#!/usr/bin/env python3
"""r6 flagship stage-by-stage profile (guide §1): time each prefix of the
batch flagship at a given row count with the bench force() methodology, so
the expensive stage is identified empirically before touching anything.

Usage: python scripts/flagship_profile_r6.py [n_rows] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import force  # noqa: E402
from benthos_spark.fixtures import pages  # noqa: E402
from benthos_spark.pipelines import pages_windowed_dedupe_agg  # noqa: E402
from benthos_spark.session import get_spark  # noqa: E402

_TS_BITS = 34


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="flagship_profile_r6")

    def src():
        return pages(spark, n_rows, n_hosts=1000, rows_per_sec=100)

    def slim():
        df = src()
        return (
            df.withColumn("text_len", F.length("text"))
            .filter(F.col("text_len") >= 40)
            .select("url", "warc_ts", "seq", "text_len")
        )

    def dedupe_only():
        sl = slim().withColumn("url_host", F.split("url", "/")[2])
        packed = F.shiftleft(F.col("seq"), _TS_BITS) + F.unix_timestamp("warc_ts")
        g = sl.groupBy(F.xxhash64("url").alias("__uh"), "url_host").agg(
            F.min(packed).alias("__p"), F.min("text_len").alias("text_len")
        )
        return g.select(
            "url_host",
            F.timestamp_seconds(
                F.col("__p").bitwiseAND(F.lit((1 << _TS_BITS) - 1))
            ).alias("warc_ts"),
            "text_len",
        )

    def full():
        return pages_windowed_dedupe_agg(
            src(), window_size="10 minutes", hash_key=True
        )

    stages = {
        "raw_range_count": lambda: spark.range(0, n_rows).selectExpr(
            "sum(id) as s"
        ).collect(),
        "slim_source": lambda: force(slim()),
        "dedupe_stage": lambda: force(dedupe_only()),
        "full_pipeline": lambda: force(full()),
    }
    # warm codegen
    force(full().limit(0).sparkSession.range(1).selectExpr("id"))
    force(pages_windowed_dedupe_agg(pages(spark, 10_000), hash_key=True))
    for name, fn in stages.items():
        best = float("inf")
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"r6prof:{name}")
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
