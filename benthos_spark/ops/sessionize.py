"""Sessionization: label every event with its session ordinal.

Session WINDOW aggregation (streaming/windows.py) produces one row per
session; pipelines also need the row-level form — each event tagged with
the session it belongs to, so per-session features can be joined back to
events. The classic two-window formula: a session starts where the gap to
the previous event of the same key exceeds ``gap_s``; the session ordinal
is the running count of such starts.

One keyed shuffle + per-key sort (the same cost as any keyed window);
both window functions share the single sort. The gap compare runs on
integer micros, not float epochs, so the engine twin in DuckDB
(``sql_sessionize_ctes``) is value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """All input columns plus ``session_ord`` (1-based per key): a new
    session starts when the gap to the key's previous event exceeds
    ``gap_s`` seconds. ``ts_col`` must be TIMESTAMP (not NTZ)."""
    w = Window.partitionBy(key).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
           > int(gap_s) * 1_000_000)
    ).cast("long")
    run = Window.partitionBy(key).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_ord", F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """(key, session_ord, n_events, start_us, end_us, duration_s): one row
    per detected session."""
    s = sessionize(df, key=key, ts_col=ts_col, gap_s=gap_s)
    um = F.unix_micros(F.col(ts_col))
    return s.groupBy(key, "session_ord").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min(um).alias("start_us"),
        F.max(um).alias("end_us"),
        F.floor((F.max(um) - F.min(um)) / F.lit(1_000_000))
        .cast("long")
        .alias("duration_s"),
    )


def sql_session_stats(
    src: str, key: str = "user_id", ts_col: str = "ts", gap_s: int = 1800
) -> str:
    """DuckDB twin of :func:`session_stats` (same lag + running-sum
    formula on epoch micros); emits a full SELECT statement."""
    gap_us = int(gap_s) * 1_000_000
    return f"""
        with lagged as (
          select {key}, {ts_col},
                 lag({ts_col}) over (partition by {key} order by {ts_col})
                   as prev_ts
          from {src}),
        marked as (
          select {key}, {ts_col},
                 (case when prev_ts is null
                        or epoch_us({ts_col}) - epoch_us(prev_ts) > {gap_us}
                       then 1 else 0 end)::BIGINT as new_sess
          from lagged),
        labeled as (
          select {key}, {ts_col},
                 sum(new_sess) over (partition by {key} order by {ts_col}
                                     rows unbounded preceding)::BIGINT
                   as session_ord
          from marked)
        select {key}, session_ord,
               count(*)::BIGINT as n_events,
               min(epoch_us({ts_col}))::BIGINT as start_us,
               max(epoch_us({ts_col}))::BIGINT as end_us,
               ((max(epoch_us({ts_col})) - min(epoch_us({ts_col})))
                // 1000000)::BIGINT as duration_s
        from labeled
        group by {key}, session_ord
    """
