"""Ordered-sequence (funnel) detection — the CEP pattern-matching ask,
composed relationally.

"Did this key do A, then B, then C — and how far did each key get?" is
the canonical complex-event-processing query (MATCH_RECOGNIZE in SQL
engines, pattern operators in stream processors). The naive per-key
approach collects every key's events into one list and walks it in Python
— unbounded memory on hot keys, no codegen. The relational composition
instead computes, per step i, the EARLIEST event of type i that is
strictly after the key's step-(i-1) time:

    step1:  min(ts) over events of type s1, per key
    step i: events of type s_i  ⋈  step(i-1) on key, ts > t_{i-1}
            -> min(ts) per key

Each step is one hash aggregation plus one equi-join against an
aggregate that has at most one row per key — and only keys that reached
step i-1 survive, so the joined side SHRINKS monotonically down the
funnel. Earliest-first greedy matching is the standard funnel semantics
(an earlier A can only widen the window for B).

Output per key that started the funnel: t_1..t_k (NULL once the key
falls out), ``reached`` (number of completed steps), ``completed``, and
``duration_s`` (t_k - t_1, seconds) — with an optional ``within_s``
budget that voids completions slower than the budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    df: DataFrame,
    steps: tuple,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: float | None = None,
) -> DataFrame:
    """(key, t1..tk, reached, completed, duration_s) for every key with at
    least one step-1 event. Timestamps compare with strict ``>`` between
    consecutive steps."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    cur = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(key)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            df.where(F.col(type_col) == step)
            .select(key, F.col(ts_col).alias("_ts"))
            .join(cur.select(key, F.col(f"t{i-1}").alias("_prev")), on=key)
            .where(F.col("_ts") > F.col("_prev"))
            .groupBy(key)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, on=key, how="left")
    k = len(steps)
    tcols = [f"t{i}" for i in range(1, k + 1)]
    reached = sum(
        (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in tcols),
        F.lit(0),
    ).cast("long")
    # whole-second duration via micros floor-div: Spark's double->long cast
    # truncates while DuckDB's ::BIGINT rounds, so avoid casting epoch
    # doubles — micros difference is exact in both engines (ts_col must be
    # TIMESTAMP, not NTZ — cast upstream)
    dur = F.floor(
        (F.unix_micros(F.col(f"t{k}")) - F.unix_micros(F.col("t1")))
        / F.lit(1_000_000)
    ).cast("long")
    out = cur.select(key, *tcols, reached.alias("reached"))
    completed = F.col("reached") == k
    if within_s is not None:
        completed = completed & (dur <= int(within_s))
    return out.withColumn("completed", completed).withColumn(
        "duration_s", F.when(F.col(f"t{k}").isNotNull(), dur)
    )
