"""Enrichment joins — the Spark-native landing of process_map / process_dag /
workflow (/root/reference/lib/processor/process_map.go:21-80,
process_dag.go:21-88, workflow.go — behavior: premap fields -> child lookup
-> postmap back into the doc, DAG-parallel).

Three join shapes, all declarative (Catalyst picks broadcast vs shuffle;
independent enrichment branches parallelize for free — the reference's DAG
topo-sort is what Catalyst does to independent column subtrees):

- ``enrich_static``:   stream/batch x small dim  -> broadcast hash join
- ``enrich_stream``:   stream x stream within watermark -> state-store join
- ``enrich_dag``:      several enrichments declared as (key, dim, cols)
                       applied as a chain of left joins
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F


def enrich_static(
    df: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static (or batch-batch) enrichment; dims broadcast by default —
    a 1000-executor shuffle of the fact side is never needed for a
    host-metadata table."""
    d = F.broadcast(dim) if broadcast else dim
    return df.join(d, on, how)


def enrich_stream(
    fact: DataFrame,
    enrichment: DataFrame,
    on: str,
    fact_ts: str,
    enrich_ts: str,
    watermark: str = "30 minutes",
    join_window: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within a watermark (the north rule's enrichment
    join): both sides watermarked, time-bounded condition so state is
    GC-able. Emits fact rows with enrichment columns where the enrichment
    event arrived within ``join_window`` before the fact event."""
    f = fact.withWatermark(fact_ts, watermark).alias("f")
    e = enrichment.withWatermark(enrich_ts, watermark).alias("e")
    cond = (
        (F.col(f"f.{on}") == F.col(f"e.{on}"))
        & (F.col(f"e.{enrich_ts}") <= F.col(f"f.{fact_ts}"))
        & (
            F.col(f"e.{enrich_ts}")
            >= F.col(f"f.{fact_ts}") - F.expr(f"INTERVAL {join_window}")
        )
    )
    out = f.join(e, cond, how)
    return out.select(
        "f.*", *[F.col(f"e.{c}").alias(f"e_{c}") for c in enrichment.columns if c != on]
    )


def enrich_dag(
    df: DataFrame,
    stages: Sequence[Tuple[str, DataFrame, Optional[List[str]]]],
) -> DataFrame:
    """Apply a DAG of enrichments [(join_key, dim_df, wanted_cols), ...]
    as successive broadcast left joins (process_dag semantics: independent
    premaps -> parallel lookups -> postmap merge; Catalyst fuses the chain)."""
    out = df
    for on, dim, cols in stages:
        d = dim.select(on, *cols) if cols else dim
        out = out.join(F.broadcast(d), on, "left")
    return out
