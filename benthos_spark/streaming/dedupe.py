"""Stateful dedupe — the engine's core stateful operator.

Re-implements the semantics of the reference's dedupe processor backed by a
TTL cache (/root/reference/lib/processor/dedupe.go:82-99,126-140 +
lib/cache/memory.go:42-68): a key is admitted if absent or if its cache
entry has expired (entry age >= ttl at admission time); failed Add attempts
do NOT refresh the TTL. Here TTL is measured in *event time* so replays are
deterministic (the reference uses wall-clock; documented deviation that
makes exactly-once possible).

Three strategies, one semantic:
- ``dedupe_exact``        batch, keep first by ``order_col``      (no TTL)
- ``dedupe_within_watermark``  streaming, built-in state store    (TTL ~= watermark)
- ``dedupe_ttl_stateful``  streaming, applyInPandasWithState with explicit
                           event-time TTL (the full cache semantics)
"""

from __future__ import annotations

from typing import Iterable, List

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


_FIXED_WIDTH = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "date", "timestamp", "timestamp_ntz", "boolean",
)


def dedupe_exact(df: DataFrame, keys: List[str], order_col: str = "seq") -> DataFrame:
    """Batch dedupe keeping the first-seen row per key (dedupe.go drop-batch
    semantics -> keep winner).

    Plan shape: with a fixed-width ``order_col`` this is a pure HASH path —
    ``min(order_col)`` per key (map-side partial combine, fixed-width agg
    buffer) plus one equi-join back to the winning rows. ``min_by(struct)``
    would silently become a SortAggregate (var-length buffers are not
    hash-aggregatable): at 100 TB that is a full sort of the table vs a
    hash agg. A var-length order column falls back to min_by.

    ``order_col`` should be unique per key (seq / event ids are); tied
    winners would each survive the join. NULL dedupe keys form one group
    (the min_by path keeps them too): the join-back uses null-safe
    equality — a plain equi-join would silently drop NULL-key rows."""
    if order_col in df.columns:
        if dict(df.dtypes).get(order_col) in _FIXED_WIDTH:
            winners = df.groupBy(*keys).agg(F.min(order_col).alias("__w"))
            w = winners.select(
                *[F.col(k).alias(f"__k_{k}") for k in keys], "__w"
            )
            cond = None
            for k in keys:
                c = df[k].eqNullSafe(w[f"__k_{k}"])
                cond = c if cond is None else (cond & c)
            return (
                df.join(w, cond)
                .where(F.col(order_col) == F.col("__w"))
                .select(*df.columns)
            )
        rest = [c for c in df.columns if c not in keys]
        agg = df.groupBy(*keys).agg(
            F.min_by(F.struct(*rest), F.col(order_col)).alias("__first")
        )
        return agg.select(*keys, *[F.col(f"__first.{c}").alias(c) for c in rest]).select(
            *df.columns
        )
    return df.dropDuplicates(keys)


def dedupe_within_watermark(df: DataFrame, keys: List[str], watermark: str = "30 minutes", ts_col: str = "warc_ts") -> DataFrame:
    """Streaming dedupe with state expiry tied to the watermark — the fast
    path when cache TTL ~= allowed lateness. Built-in state store, no Python."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


_STATE_SCHEMA = T.StructType([T.StructField("last_admit_ts", T.DoubleType())])


def _make_dedupe_fn(ttl_seconds: float, ts_field: str):
    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (last_admit,) = state.get if state.exists else (None,)
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_field)
            keep = []
            for ts in pdf[ts_field]:
                t = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
                if last_admit is None or t - last_admit >= ttl_seconds:
                    keep.append(True)
                    last_admit = t
                else:
                    keep.append(False)
            out.append(pdf[pd.Series(keep, index=pdf.index)])
        if last_admit is not None:
            state.update((float(last_admit),))
            # GC the key once it can no longer dedupe anything
            state.setTimeoutTimestamp(int((last_admit + ttl_seconds) * 1000))
        for o in out:
            if len(o):
                yield o

    return fn


def dedupe_ttl_stateful(
    df: DataFrame,
    key_cols: List[str],
    ttl_seconds: float,
    ts_col: str = "warc_ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time TTL dedupe via ``applyInPandasWithState`` (SURVEY.md §4
    custom op #1). State per key = last admission event-time; admits a row
    iff no admission in the last ``ttl_seconds`` of event time. State is
    garbage-collected by event-time timeout after the TTL passes the
    watermark — bounded state at any scale.
    """
    out_schema = df.schema
    df = df.withWatermark(ts_col, watermark)
    return df.groupBy(*key_cols).applyInPandasWithState(
        _make_dedupe_fn(ttl_seconds, ts_col),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedupe_ttl_reference(rows, key_fn, ts_fn, ttl_seconds: float):
    """Pure-Python oracle for TTL-dedupe semantics (used by tests): rows in
    event-time order per key; admit if >= ttl since last admission."""
    last: dict = {}
    out = []
    for row in sorted(rows, key=lambda r: (key_fn(r), ts_fn(r))):
        k, t = key_fn(row), ts_fn(row)
        if k not in last or t - last[k] >= ttl_seconds:
            last[k] = t
            out.append(row)
    return out
