"""Observability: per-operator metrics + per-query progress, the analogue of
the reference's metrics/tracing stack (lib/metrics/constructor.go:44-51
counter types count/sent/dropped/error, per-processor increments e.g.
lib/processor/dedupe.go:194-201; /stats endpoint lib/api/api.go:129-183).

- ``observed(df, name)``: attach an ``observe`` node emitting rows/bytes
  counters for that plan point; works on batch and streaming.
- ``MetricsListener``: StreamingQueryListener recording every micro-batch's
  progress (rows in/out, per-operator observed metrics, state-store size)
  as JSON lines — the ``_metrics`` table analogue of a metrics backend.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed(df: DataFrame, name: str, size_col: Optional[str] = None) -> DataFrame:
    """Attach counter metrics at this plan point (shows up in batch
    ``df.collect()`` observations and in streaming progress events)."""
    metrics = [F.count(F.lit(1)).alias("rows")]
    if size_col and size_col in df.columns:
        metrics.append(F.sum(F.length(F.col(size_col))).alias("bytes"))
    return df.observe(name, *metrics)


class MetricsListener(StreamingQueryListener):
    """Writes one JSON line per micro-batch progress event."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event):
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event):
        try:
            p = event.progress
            observed_metrics = {}
            for k, v in (p.observedMetrics or {}).items():
                observed_metrics[k] = v.asDict() if hasattr(v, "asDict") else dict(v)
            row = {
                "event": "progress",
                "id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "observed": observed_metrics,
                "state": [
                    {
                        "rows": s.numRowsTotal,
                        "updated": s.numRowsUpdated,
                        "mem_bytes": s.memoryUsedBytes,
                    }
                    for s in (p.stateOperators or [])
                ],
            }
        except Exception as exc:  # listener exceptions are silently swallowed
            row = {"event": "progress_error", "error": repr(exc)}
        self._write(row)

    def onQueryTerminated(self, event):
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event):
        pass

    def _write(self, obj) -> None:
        def default(o):
            try:
                return dict(o)
            except Exception:
                return str(o)

        with open(self.path, "a") as f:
            f.write(json.dumps(obj, default=default) + "\n")

    def read(self) -> list:
        out = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    out.append(json.loads(line))
        return out
