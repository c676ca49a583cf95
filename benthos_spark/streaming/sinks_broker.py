"""Output broker patterns (fan_out / switch / try / drop_on_error) over
``foreachBatch`` — the Spark landing of the reference's output brokers
(/root/reference/lib/output/broker.go:92,210-228, lib/output/switch.go,
lib/output/retry.go, drop_on_error.go — behavior only).

Each helper returns a ``foreachBatch``-compatible callable. The batch is
persisted once and every child sink writes from the cached plan, so fan-out
costs one upstream execution regardless of sink count (the ack-level
guarantees the reference builds per-output are subsumed by the idempotent
per-(sink, batch_id) commit)."""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Column

from .sink import IdempotentSink


def fan_out(sinks: Sequence[IdempotentSink]) -> Callable:
    """fan_out(_sequential): write every batch to every sink."""

    def fn(df: DataFrame, batch_id: int) -> None:
        cached = df.persist()
        try:
            for s in sinks:
                s.write_batch(cached, batch_id)
        finally:
            cached.unpersist()

    return fn


def switch_out(cases: Sequence[Tuple[Column, IdempotentSink]], fallthrough: bool = False) -> Callable:
    """output switch: route rows to the first (or, with fallthrough, every)
    sink whose condition passes."""

    def fn(df: DataFrame, batch_id: int) -> None:
        cached = df.persist()
        try:
            remaining = cached
            for cond, s in cases:
                s.write_batch(cached.filter(cond) if fallthrough else remaining.filter(cond), batch_id)
                if not fallthrough:
                    from pyspark.sql import functions as F

                    remaining = remaining.filter(~F.coalesce(cond, F.lit(False)))
        finally:
            cached.unpersist()

    return fn


def try_out(sinks: Sequence[IdempotentSink]) -> Callable:
    """try broker: attempt sinks in order, falling back on failure."""

    def fn(df: DataFrame, batch_id: int) -> None:
        cached = df.persist()
        try:
            last_exc: Optional[Exception] = None
            for s in sinks:
                try:
                    s.write_batch(cached, batch_id)
                    return
                except Exception as exc:  # noqa: BLE001 — fallback semantics
                    last_exc = exc
            if last_exc is not None:
                raise last_exc
        finally:
            cached.unpersist()

    return fn


def drop_on_error(sink: IdempotentSink, error_col: str = "error") -> Callable:
    """drop_on_error: failed rows (error shadow column set) are discarded."""

    def fn(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        clean = df.filter(F.col(error_col).isNull()) if error_col in df.columns else df
        sink.write_batch(clean, batch_id)

    return fn
