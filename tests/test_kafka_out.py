"""Kafka output partitioner mapping (lib/output/writer/kafka.go:189-205) —
the placement columns are computed Spark-side, so they are testable
without a broker or connector jar."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.streaming.kafka_out import (
    fnv1a32,
    fnv1a_partition,
    kafka_output_frame,
)


class TestFnv1a:
    def test_fnv1a32_public_vectors(self):
        # public FNV test vectors (draft-eastlake-fnv / fnv reference)
        assert fnv1a32(b"") == 0x811C9DC5
        assert fnv1a32(b"a") == 0xE40C292C
        assert fnv1a32(b"foobar") == 0xBF9CF968

    def test_partition_mod_then_abs(self):
        # int32("a" hash) is negative: Go's % keeps the sign, then abs
        n = 7
        signed = fnv1a32(b"a") - (1 << 32)
        assert signed < 0
        assert fnv1a_partition(b"a", n) == (-signed) % n
        # a hash under 2^31 stays plain mod
        assert fnv1a32(b"hello") < (1 << 31)
        assert fnv1a_partition(b"hello", 12) == fnv1a32(b"hello") % 12


class TestOutputFrame:
    def _df(self, spark):
        return spark.createDataFrame(
            [(f"k{i}", f"v{i}") for i in range(100)], "k string, content string"
        )

    def test_murmur2_mode_has_no_partition_column(self, spark):
        out = kafka_output_frame(self._df(spark), key="k")
        assert out.columns == ["key", "value"]
        out2 = kafka_output_frame(self._df(spark), key="k", partitioner="murmur2_hash")
        assert out2.columns == ["key", "value"]

    def test_fnv1a_partitions_match_reference_formula(self, spark):
        out = kafka_output_frame(
            self._df(spark), key="k", partitioner="fnv1a_hash", partition_count=7
        ).collect()
        for r in out:
            assert r["partition"] == fnv1a_partition(r["key"].encode(), 7)
        assert len({r["partition"] for r in out}) > 1

    def test_round_robin_covers_partitions(self, spark):
        out = kafka_output_frame(
            self._df(spark).coalesce(1), key="k",
            partitioner="round_robin", partition_count=4,
        ).collect()
        counts = {}
        for r in out:
            counts[r["partition"]] = counts.get(r["partition"], 0) + 1
        assert set(counts) == {0, 1, 2, 3}
        assert max(counts.values()) - min(counts.values()) <= 1

    def test_random_in_range(self, spark):
        out = kafka_output_frame(
            self._df(spark), key="k", partitioner="random", partition_count=5
        ).collect()
        assert all(0 <= r["partition"] < 5 for r in out)

    def test_unknown_partitioner_rejected(self, spark):
        with pytest.raises(ValueError, match="not recognised"):
            kafka_output_frame(self._df(spark), partitioner="modulo")

    def test_hash_partitioners_need_count(self, spark):
        with pytest.raises(ValueError, match="partition_count"):
            kafka_output_frame(self._df(spark), key="k", partitioner="fnv1a_hash")
