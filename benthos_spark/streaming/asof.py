"""Streaming as-of enrichment: stream × static-dimension point-in-time join.

The batch as-of join (``ops/asof.py``) is a carry-forward window over the
union of both sides — but non-time window functions are not allowed on
streaming DataFrames, so a stream needs a different physical shape. For
the common case (the right side is a DIMENSION: rate tables, config
snapshots, model-version histories — small enough to broadcast), the
stream-side operator is an Arrow-batched ``mapInPandas`` kernel holding
the sorted right table and running ``pandas.merge_asof`` per batch:
each executor keeps one in-memory copy, every Arrow batch binary-searches
it, nothing shuffles, and the same code runs identically on batch frames
(tests assert equivalence with ``ops.asof.asof_join``).

``pd.merge_asof(direction="backward")`` matches the latest right row with
``right.on <= left.on`` per key — the same inclusive semantics as the
batch operator. Right side must be unique per (key, on); pre-deduplicate
when that matters.

Scale: O(|right|) memory per executor (dimension-scale by contract —
raise when it is not), zero shuffle on the stream side, state-free (the
dimension is immutable for the query's lifetime; re-plan to pick up a new
snapshot, or use the batch op on micro-batch sinks for mutable dims).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, types as T


def asof_enrich_static(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple = ("value",),
    prefix: str = "r_",
    max_right_rows: int = 5_000_000,
    max_right_bytes: int = 2 << 30,
) -> DataFrame:
    """All left columns plus ``prefix+c`` for each ``right_cols`` entry and
    ``prefix+on`` (the matched right key), NULL where nothing precedes.
    ``right`` must be a batch DataFrame (the static dimension).

    The dimension materializes on the driver, so BOTH budgets are enforced
    and the row budget is checked BEFORE collecting (a limit(n+1).count()
    job — an over-sized dimension fails with a clear error instead of
    OOMing the driver mid-toPandas). Over budget => use the batch
    ``ops.asof.asof_join`` (one keyed shuffle, no driver materialization)
    on a micro-batch sink instead."""
    if right.isStreaming:
        raise ValueError("right side must be a static (batch) DataFrame")
    rsel = right.select(by, on, *right_cols)
    probed = rsel.limit(max_right_rows + 1).count()
    if probed > max_right_rows:
        raise ValueError(
            f"right side exceeds max_right_rows={max_right_rows}; "
            "not dimension-scale — use the batch asof_join "
            "(benthos_spark.ops.asof) instead"
        )
    rpdf = rsel.toPandas()
    nbytes = int(rpdf.memory_usage(deep=True).sum())
    if nbytes > max_right_bytes:
        raise ValueError(
            f"right side is ~{nbytes} bytes in memory "
            f"(> max_right_bytes={max_right_bytes}); not dimension-scale — "
            "use the batch asof_join (benthos_spark.ops.asof) instead"
        )
    rpdf = rpdf.sort_values([on]).reset_index(drop=True)
    rpdf = rpdf.rename(columns={c: prefix + c for c in [*right_cols, on]})
    r_on = prefix + on
    # explicit broadcast: one copy per executor, not one per task closure
    bc = left.sparkSession.sparkContext.broadcast(rpdf)

    carried = [prefix + c for c in [*right_cols, on]]
    rdt = dict(rsel.dtypes)
    int_carried = [
        prefix + c
        for c in [*right_cols, on]
        if rdt[c] in ("tinyint", "smallint", "int", "bigint")
    ]
    rschema = {f.name: f.dataType for f in rsel.schema.fields}
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(prefix + c, rschema[c]) for c in [*right_cols, on]]
    )
    lcols = left.columns

    def kernel(batches):
        rtab = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ordered = pdf.sort_values([on]).reset_index(drop=True)
            merged = pd.merge_asof(
                ordered,
                rtab,
                left_on=on,
                right_on=r_on,
                left_by=by,
                right_by=by,
                direction="backward",
                allow_exact_matches=True,
            )
            # unmatched integral carried columns become float64+NaN in
            # pandas; Arrow needs nullable Int64 to reach LongType
            for c in int_carried:
                merged[c] = merged[c].astype("Int64")
            yield merged[[*lcols, *carried]]

    return left.mapInPandas(kernel, out_schema)
