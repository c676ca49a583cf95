"""Distributed global row numbering (no single-task global sort).

A plain ``row_number().over(Window.orderBy(k))`` funnels the whole table
through ONE task — correct at sf0.1, dead at 100 TB. This is the classic
scalable alternative (zipWithIndex re-expressed on DataFrames):

1. range-partition by the order key (K partitions, deterministic sampled
   boundaries; equal keys land in one partition),
2. count rows per partition (a K-row collect — partition counts, not data),
3. cumulative offsets per partition, broadcast-joined back,
4. per-partition row_number + offset.

The heavy data moves through exactly one range exchange; the only global
coordination is the K-row count collect.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F


def global_row_number(
    df: DataFrame,
    order_cols: List[str],
    col_name: str = "rn",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Append a 0-based dense global row index ordered by ``order_cols``.

    Deterministic when the order key is unique (ties within a key resolve
    arbitrarily but stably within a run, like any row_number).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # two consumers: the K-row count and the final plan. localCheckpoint,
        # not persist(): persist pins the plan in the CacheManager until an
        # unpersist no caller of a lazy-result helper can place (leaks
        # across calls in a long session); checkpoint blocks are
        # ContextCleaner-freed on GC, and freezing the materialized rows
        # also pins _pid against any recompute.
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["_pid"], r["_n"])
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(col_name, F.row_number().over(w) - 1 + F.col("_off"))
        .drop("_pid", "_off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: List[str],
    value_col,
    col_name: str = "cum",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Append an inclusive running sum of ``value_col`` ordered by
    ``order_cols`` — same two-phase shape as :func:`global_row_number`
    (range exchange + K-row offset collect), used for byte-size batch
    bucketing (lib/message/batch/policy.go:86-251 size policy re-expressed
    as running-sum bucketing, SURVEY.md §2.5)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_v", val.cast("long"))
        # same localCheckpoint-not-persist rationale as global_row_number
        .localCheckpoint(eager=True)
    )
    sums = sorted(
        (r["_pid"], r["_s"])
        for r in ranged.groupBy("_pid").agg(F.sum("_v").alias("_s")).collect()
    )
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += int(s or 0)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(col_name, F.sum("_v").over(w) + F.col("_off"))
        .drop("_pid", "_off", "_v")
    )
