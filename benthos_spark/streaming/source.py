"""Streaming sources.

The reference's connector zoo (lib/input/constructor.go:65-98) collapses to
two canonical Spark sources (SURVEY.md §2.1): a table/file stream (the
Iceberg-style path — here a parquet directory stream, format-swappable) and
a deterministic generated stream for tests/bench. Offsets live in the
checkpoint (the analogue of commit-after-ack, lib/input/reader/kafka.go).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..fixtures import pages

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string, seq long"


def pages_file_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream a directory of pages parquet files (the micro-batch admission
    knob maxFilesPerTrigger is the analogue of the input batcher/rate limit)."""
    r = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def read_until(query, condition_fn, poll_s: float = 0.5, timeout_s: float = 300.0) -> None:
    """read_until (lib/input/read_until.go behavior): stop a running
    streaming query once ``condition_fn()`` is true — e.g. a sink row-count
    or metrics threshold. The Spark-native form of condition-gated input."""
    import time

    deadline = time.monotonic() + timeout_s
    while query.isActive and time.monotonic() < deadline:
        if condition_fn():
            query.stop()
            break
        time.sleep(poll_s)
    query.awaitTermination(timeout=timeout_s)


def fan_in(*dfs) -> "DataFrame":
    """input broker fan-in (lib/broker/fan_in.go) = unionByName."""
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def write_pages_input(
    spark: SparkSession,
    path: str,
    n_rows: int,
    n_chunks: int = 4,
    **pages_kw,
) -> None:
    """Materialize the deterministic pages fixture as n_chunks parquet files
    so a file stream sees multiple micro-batches deterministically."""
    os.makedirs(path, exist_ok=True)
    per = n_rows // n_chunks
    full = pages(spark, n_rows, **pages_kw)
    for c in range(n_chunks):
        lo, hi = c * per, (c + 1) * per if c < n_chunks - 1 else n_rows
        full.filter(f"seq >= {lo} AND seq < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(path)
