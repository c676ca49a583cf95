"""Streaming as-of enrichment (benthos_spark/streaming/asof.py): batch-mode
equivalence with the batch asof_join op, streaming run through the
exactly-once sink, integral-column null handling, and the no-shuffle plan."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.asof import asof_join
from benthos_spark.streaming.asof import asof_enrich_static
from benthos_spark.streaming.sink import IdempotentSink, run_to_sink

LEFT = [(1, 10, 100), (2, 10, 205), (3, 10, 50), (4, 20, 300), (5, 30, 40)]
RIGHT = [(10, 90, 1.5), (10, 200, 2.5), (20, 250, 7.5)]


@pytest.fixture(scope="module")
def frames(spark):
    l = spark.createDataFrame(LEFT, "event_id long, user_id long, ts long")
    r = spark.createDataFrame(RIGHT, "user_id long, ts long, value double")
    return l, r


@pytest.mark.spark
class TestAsofEnrichStatic:
    def test_batch_equivalent_to_asof_join(self, spark, frames):
        l, r = frames
        a = {x["event_id"]: (x["r_value"], x["r_ts"])
             for x in asof_enrich_static(l, r).collect()}
        b = {x["event_id"]: (x["r_value"], x["r_ts"])
             for x in asof_join(l, r).collect()}
        assert a == b and len(a) == len(LEFT)

    def test_integral_carried_column_nullable(self, spark, frames):
        l, r = frames
        out = {x["event_id"]: x for x in asof_enrich_static(l, r).collect()}
        assert out[3]["r_ts"] is None and out[5]["r_value"] is None
        assert out[2]["r_ts"] == 200  # long survives the Int64 round-trip

    def test_rejects_streaming_right(self, spark, frames, tmp_path):
        l, r = frames
        d = str(tmp_path / "r")
        r.write.parquet(d)
        stream_r = spark.readStream.schema(r.schema).parquet(d)
        with pytest.raises(ValueError, match="static"):
            asof_enrich_static(l, stream_r)

    def test_plan_no_shuffle_on_left(self, spark, frames):
        l, r = frames
        plan = asof_enrich_static(l, r)._jdf.queryExecution() \
            .executedPlan().toString().split("== Initial Plan ==")[0]
        assert "Exchange" not in plan  # the dimension rides the broadcast

    def test_streaming_left_through_sink(self, spark, frames, tmp_path):
        l, r = frames
        in_dir = str(tmp_path / "in")
        l.coalesce(1).write.parquet(in_dir)
        stream = spark.readStream.schema(l.schema).parquet(in_dir)
        enriched = asof_enrich_static(stream, r)
        sink = IdempotentSink(str(tmp_path / "out"))
        run_to_sink(enriched, sink, str(tmp_path / "ckpt"))
        got = {x["event_id"]: (x["r_value"], x["r_ts"])
               for x in sink.read(spark).collect()}
        want = {x["event_id"]: (x["r_value"], x["r_ts"])
                for x in asof_join(l, r).collect()}
        assert got == want


class TestDimensionBudget:
    """r3 verdict #4: the dimension must fail fast with a clear error
    BEFORE driver materialization when over budget."""

    def test_over_row_budget_raises(self, spark):
        from benthos_spark.streaming.asof import asof_enrich_static

        left = spark.createDataFrame([(1, 1)], "user_id int, ts int")
        right = spark.range(0, 100).selectExpr(
            "cast(id % 5 as int) user_id", "cast(id as int) ts", "id value"
        )
        with pytest.raises(ValueError, match="max_right_rows"):
            asof_enrich_static(left, right, max_right_rows=50)

    def test_over_byte_budget_raises(self, spark):
        from benthos_spark.streaming.asof import asof_enrich_static

        left = spark.createDataFrame([(1, 1)], "user_id int, ts int")
        right = spark.range(0, 1000).selectExpr(
            "cast(id % 5 as int) user_id", "cast(id as int) ts",
            "repeat('x', 1000) value",
        )
        with pytest.raises(ValueError, match="max_right_bytes"):
            asof_enrich_static(left, right, max_right_bytes=10_000)

    def test_under_budget_passes(self, spark):
        from benthos_spark.streaming.asof import asof_enrich_static

        left = spark.createDataFrame([(1, 10)], "user_id int, ts int")
        right = spark.createDataFrame([(1, 5, 7)], "user_id int, ts int, value int")
        out = asof_enrich_static(left, right).collect()
        assert out[0]["r_value"] == 7
