"""Kafka output frame preparation — the partitioner mapping of
lib/output/writer/kafka.go:189-205 expressed as columns Spark's kafka sink
understands (``key``/``value``/optional ``partition``).

Spark's kafka sink delegates partition choice to the Java producer
(murmur2 on key — Kafka's default) unless an explicit ``partition``
column is present. The reference's four sarama partitioners map as:

- ``murmur2_hash``: key column only — the Java client's default IS
  murmur2, byte-identical placement with the reference's custom-murmur2
  config. Exact, no partition column needed.
- ``fnv1a_hash`` (sarama default): partition computed explicitly —
  FNV-1a 32-bit of the key bytes, int32 two's complement, modulo
  partition count, then negated if negative (sarama hashPartitioner
  order: mod first, then abs). Needs ``partition_count`` (the reference
  asks the broker; we cannot without a connection).
- ``round_robin``: row-index modulo partition count (per-batch
  approximation of sarama's per-producer counter). Streaming plans reject
  ``monotonically_increasing_id`` (UnsupportedOperationChecker), so a
  streaming frame must name an existing monotone column (``row_index_col``
  — the message-frame ``seq`` is always available) and a streaming call
  without one fails at build time, before ``start()``.
- ``random``: uniform random partition.

The transform is pure DataFrame -> DataFrame so it is testable without a
broker or the connector jar (the ``.format("kafka")`` start is the only
jar-gated step).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PARTITIONERS = ("fnv1a_hash", "murmur2_hash", "random", "round_robin")


def fnv1a32(data: bytes) -> int:
    """FNV-1a 32-bit (public spec; what sarama's default partitioner
    hashes keys with)."""
    h = 2166136261
    for b in data:
        h ^= b
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def fnv1a_partition(key: bytes, n: int) -> int:
    """sarama hashPartitioner placement: int32(hash) % n (Go's %, which
    keeps the dividend's sign), then abs."""
    h = fnv1a32(key)
    signed = h - (1 << 32) if h >= (1 << 31) else h
    p = signed % n if signed >= 0 else -((-signed) % n)
    return -p if p < 0 else p


def kafka_output_frame(
    df: DataFrame,
    key: str | None = None,
    value_column: str = "content",
    partitioner: str | None = None,
    partition_count: int | None = None,
    row_index_col: str | None = None,
) -> DataFrame:
    """(key, value[, partition]) frame ready for ``.format("kafka")``."""
    cols = [
        (F.col(key) if key else F.lit(None)).cast("string").alias("key"),
        F.col(value_column).cast("string").alias("value"),
    ]
    if partitioner is None or partitioner == "murmur2_hash":
        # producer-side murmur2 on key — Kafka's (and therefore Spark's)
        # default placement; exact for murmur2_hash configs
        return df.select(*cols)
    if partitioner not in PARTITIONERS:
        raise ValueError(f"partitioner not recognised: {partitioner}")
    if partitioner == "random":
        if not partition_count:
            raise ValueError("random partitioner needs partition_count")
        part = F.floor(F.rand() * partition_count).cast("int")
        return df.select(*cols, part.alias("partition"))
    if not partition_count:
        raise ValueError(f"{partitioner} needs partition_count (the "
                         "reference reads it from the broker)")
    if partitioner == "round_robin":
        if row_index_col is not None and row_index_col in df.columns:
            idx = F.col(row_index_col).cast("long")
        elif df.isStreaming:
            raise ValueError(
                "round_robin on a streaming frame needs row_index_col (an "
                "existing monotone column such as the frame's 'seq'): "
                "monotonically_increasing_id is not supported in streaming "
                "plans"
            )
        else:
            idx = F.monotonically_increasing_id()
        part = F.pmod(idx, F.lit(partition_count))
        return df.select(*cols, part.cast("int").alias("partition"))

    # fnv1a_hash via an Arrow-batched kernel (byte loop over the key)
    from pyspark.sql.functions import pandas_udf

    n = int(partition_count)

    @pandas_udf("int")
    def _fnv_part(s: pd.Series) -> pd.Series:
        return s.map(
            lambda k: fnv1a_partition((k or "").encode(), n)
        ).astype("int32")

    return df.select(*cols).withColumn("partition", _fnv_part(F.col("key")))
