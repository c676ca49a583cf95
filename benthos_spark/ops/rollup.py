"""Hypertable-style rollup cascade — multi-resolution time aggregation.

The continuous-aggregate pattern from time-series stores: aggregate raw
events ONCE at the finest grain, then derive every coarser grain by
re-aggregating the previous level instead of rescanning raw data. At
100 TB the raw->minute pass is the only full scan; minute->hour->day
cascades run over data thousands of times smaller, so backfills and
late-data repair stay cheap. Only algebraic aggregates are cascaded
(count/sum/min/max — avg is sum/n at read time); a holistic aggregate
(median, distinct) would need a sketch instead.

Each level is one hash aggregation: map-side partial aggregation absorbs
hot keys before the (small) shuffle, same as any keyed agg here.

Oracle story: the cascade is value-checked against a DIRECT group-by at
the coarse grain from raw — an algebraically independent evaluation path,
so an error in the re-aggregation step cannot self-confirm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rollup_cascade(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple = ("event_type",),
    value_col: str = "value",
    grains: tuple = ("minute", "hour"),
) -> DataFrame:
    """(g_start, *keys, n, sum_v, min_v, max_v) at the COARSEST grain in
    ``grains``, computed hierarchically: raw -> grains[0] by direct
    aggregation, then each later grain by re-aggregating the previous
    level's partials (sum of n/sum_v, min of min_v, max of max_v)."""
    cur = (
        df.groupBy(
            F.date_trunc(grains[0], F.col(ts_col)).alias("g_start"), *keys
        ).agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )
    for g in grains[1:]:
        cur = (
            cur.groupBy(
                F.date_trunc(g, F.col("g_start")).alias("g_start"), *keys
            ).agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
    return cur
