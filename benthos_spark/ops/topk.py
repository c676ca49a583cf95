"""Exact per-group heavy hitters (top-k) — two-phase aggregation + ranked
window limit.

Corpus curation constantly asks "what are the most frequent X per Y" (top
tokens per language, top domains per snapshot, top error strings per
source). The scalable exact shape is: hash-aggregate counts (map-side
partial aggregation collapses the heavy keys before the shuffle — the
heavier the hitter, the cheaper it ships), then a per-group ranked limit.
Spark's WindowGroupLimit rewrite turns the ``row_number() <= k`` filter
into a streaming top-k per partition instead of a full per-group sort —
the same optimization `select_parts` relies on (test_plans asserts it
there).

Ties break deterministically by item ascending, which keeps results (and
the DuckDB oracle) stable run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: tuple,
    item_col: str,
    k: int = 5,
    count_col: str = "n",
    rank_col: str = "rank",
) -> DataFrame:
    """(group_cols..., item_col, n, rank): the k most frequent items per
    group, rank 1-based, ties broken by item ascending."""
    counts = df.groupBy(*group_cols, item_col).agg(
        F.count("*").alias(count_col)
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(count_col).desc(), F.col(item_col).asc()
    )
    return counts.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= int(k)
    )
