#!/usr/bin/env python3
"""r6: which fixture expression costs what (guide §1 empirical loop).
Times force() of single-column variants of the flagship slim frame at a
given row count, plus the full slim with/without the length filter."""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import force  # noqa: E402
from benthos_spark.fixtures import pages  # noqa: E402
from benthos_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="flagship_expr_probe")

    def src():
        return pages(spark, n, n_hosts=1000, rows_per_sec=100)

    variants = {
        "url_only": lambda: src().select("url"),
        "warc_ts_only": lambda: src().select("warc_ts"),
        "text_len_only": lambda: src().select(F.length("text").alias("tl")),
        "seq_only": lambda: src().select("seq"),
        "slim_nofilter": lambda: src().select(
            "url", "warc_ts", "seq", F.length("text").alias("text_len")
        ),
        "slim_filtered": lambda: (
            src()
            .withColumn("text_len", F.length("text"))
            .filter(F.col("text_len") >= 40)
            .select("url", "warc_ts", "seq", "text_len")
        ),
    }
    force(variants["slim_filtered"]().limit(1000))  # warm codegen
    for name, fn in variants.items():
        best = float("inf")
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            force(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
