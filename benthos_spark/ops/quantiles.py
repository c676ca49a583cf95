"""Grouped quantiles — exact (sort-based) with an approximate scale path.

Latency/size/quality percentiles per key are the standard analytics ask.
Two paths:

- :func:`group_quantiles` — EXACT linear-interpolated quantiles via
  Spark's ``percentile`` aggregate. Exact quantiles are holistic: each
  group's values are gathered to its reducer (one keyed shuffle; memory
  bounded by the largest group). Right up to millions of values per
  group; parity-checkable because DuckDB's ``quantile_cont`` implements
  the identical index = q*(n-1) interpolation.
- :func:`group_quantiles_approx` — ``percentile_approx`` (a mergeable
  KLL-style sketch with map-side partial aggregation, bounded memory at
  any group size). The 100 TB default; no exact cross-engine oracle by
  construction (accuracy asserted against the exact path in tests
  instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _alias(q: float) -> str:
    return "p" + str(q).replace("0.", "").ljust(2, "0")


def group_quantiles(
    df: DataFrame,
    keys: tuple,
    value_col: str,
    qs: tuple = (0.5, 0.95, 0.99),
) -> DataFrame:
    """(keys..., n, p50, p95, ... per ``qs``): exact interpolated
    quantiles of ``value_col`` per group."""
    aggs = [F.count(value_col).cast("long").alias("n")] + [
        F.percentile(value_col, q).alias(_alias(q)) for q in qs
    ]
    return df.groupBy(*keys).agg(*aggs)


def group_quantiles_approx(
    df: DataFrame,
    keys: tuple,
    value_col: str,
    qs: tuple = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based variant: same shape, bounded memory per group."""
    aggs = [F.count(value_col).cast("long").alias("n")] + [
        F.percentile_approx(value_col, q, accuracy).alias(_alias(q))
        for q in qs
    ]
    return df.groupBy(*keys).agg(*aggs)


def sql_group_quantiles(
    value_expr: str, group_by: str, qs: tuple = (0.5, 0.95, 0.99)
) -> str:
    """DuckDB select-list twin of :func:`group_quantiles` (same
    interpolation); embed after ``select <group_by>,``."""
    parts = [f"count({value_expr})::BIGINT as n"]
    for q in qs:
        parts.append(f"quantile_cont({value_expr}, {q}) as {_alias(q)}")
    return ",\n               ".join(parts)
