"""Streaming CEP: per-key ordered-sequence (funnel) detection with
``applyInPandasWithState`` — the stateful pattern-matching operator the
north rule's "CEP engine" names, as a first-class streaming op.

Semantics (MATCH_RECOGNIZE terms): greedy earliest-first matching with
AFTER MATCH SKIP PAST LAST ROW — each key advances a step counter when the
next expected event type arrives (strictly later events only); on reaching
the last step a completion row is emitted and the machine resets, so
non-overlapping repeat sequences each emit. The FIRST completion per key
is identical to the batch :func:`benthos_spark.ops.funnel.funnel` result
(same greedy recurrence; asserted by tests on ordered input).

State per key is O(len(steps)) doubles — bounded at any key cardinality —
and garbage-collected by event-time timeout once a key has been idle past
``gc_idle_s`` of event time behind the watermark. Rows are processed in
event-time order WITHIN each micro-batch (sorted); disorder ACROSS
micro-batches within the watermark is the documented approximation vs the
batch operator (a buffering implementation would trade state size for it).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.IntegerType()),
        T.StructField("times", T.ArrayType(T.DoubleType())),
    ]
)


def _out_schema(key_field, k: int) -> T.StructType:
    return T.StructType(
        [
            key_field,
            *[T.StructField(f"t{i}", T.TimestampType()) for i in range(1, k + 1)],
            T.StructField("duration_s", T.LongType()),
        ]
    )


def _make_fn(steps: tuple, ts_col: str, type_col: str, key_name: str, gc_idle_s: float):
    k = len(steps)

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        stage, times = (state.get if state.exists else (0, []))
        stage = int(stage)
        times = list(times or [])
        completions = []
        last_t = times[-1] if times else None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col)
            for ts, typ in zip(pdf[ts_col], pdf[type_col]):
                t = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
                last_t = t if last_t is None else max(last_t, t)
                if typ == steps[stage] and (stage == 0 or t > times[stage - 1]):
                    times.append(t)
                    stage += 1
                    if stage == k:
                        completions.append(list(times))
                        stage, times = 0, []
        state.update((stage, [float(x) for x in times]))
        if last_t is not None:
            state.setTimeoutTimestamp(int((last_t + gc_idle_s) * 1000))
        if completions:
            yield pd.DataFrame(
                [
                    {
                        key_name: key[0],
                        # round float epoch seconds back to exact integer
                        # micros: naive unit="s" yields ns-precision values
                        # with float noise that fails Arrow's safe ns->us
                        # cast (float64 eps at current epochs is ~0.25us,
                        # so round() recovers the original microseconds)
                        **{
                            f"t{i + 1}": pd.to_datetime(
                                int(round(c[i] * 1_000_000)), unit="us"
                            )
                            for i in range(k)
                        },
                        # derive duration from the same rounded integer
                        # micros as t1..tk — int(c[k-1]-c[0]) on float
                        # seconds can truncate one low at exact-second
                        # boundaries (float64 noise ~0.25us)
                        "duration_s": (
                            int(round(c[k - 1] * 1_000_000))
                            - int(round(c[0] * 1_000_000))
                        )
                        // 1_000_000,
                    }
                    for c in completions
                ]
            )

    return fn


def streaming_funnel(
    df: DataFrame,
    steps: tuple,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str | None = "30 minutes",
    gc_idle_s: float = 86400.0,
) -> DataFrame:
    """Append-mode stream of completion rows (key, t1..tk, duration_s);
    one row per non-overlapping completed sequence per key.

    ``watermark=None`` means an upstream stage already defined the stream's
    watermark — Spark disallows redefining it below a stateful operator, so
    in that case the input is used as-is."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    key_field = df.schema[key]
    return df.groupBy(key).applyInPandasWithState(
        _make_fn(tuple(steps), ts_col, type_col, key, gc_idle_s),
        outputStructType=_out_schema(key_field, len(steps)),
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
