"""Deterministic stratified sampling — exactly n rows per group.

Balanced training mixes need "n documents per language/domain/source", not
the probabilistic row counts Bernoulli sampling (`hash_sample`, the
reference's `sample` processor analog) gives. The scalable exact shape:
rank rows inside each group by a salted md5 of their id — a uniform,
reproducible permutation — and keep the first n via ``row_number() <= n``,
which Spark's WindowGroupLimit rewrite executes as a streaming per-group
top-k, not a full sort. One keyed shuffle, no driver-side state; changing
the salt redraws the sample, same salt reproduces it anywhere (md5 is
engine-portable, so the DuckDB oracle replays the identical draw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stratified_sample(
    df: DataFrame,
    group_cols: tuple,
    n_per_group: int,
    id_col: str,
    salt: str = "",
    rank_col: str = "rk",
) -> DataFrame:
    """All input columns plus ``rank_col`` (1..n within each group): at
    most ``n_per_group`` rows per group, drawn by salted-md5 order of
    ``id_col`` (deterministic for a given salt), md5 ties broken by id."""
    key = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(key.asc(), F.col(id_col).asc())
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= int(n_per_group)
    )


def sql_stratified_rank(id_expr: str, group_by: str, salt: str = "") -> str:
    """DuckDB window expression mirroring the salted-md5 draw; embed as
    ``row_number() over (...)`` with the same partition columns."""
    key = f"md5('{salt}' || '|' || {id_expr}::VARCHAR)"
    return (
        f"row_number() over (partition by {group_by} "
        f"order by {key} asc, {id_expr} asc)"
    )
