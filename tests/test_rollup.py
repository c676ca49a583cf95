"""Rollup cascade op (benthos_spark/ops/rollup.py): cascade-equals-direct on
crafted events, three-level cascade, and the partial-aggregation plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.rollup import rollup_cascade


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 10 + m // 60, m % 60, s)


EVENTS = [
    # (ts, event_type, v) — two types straddling minute and hour boundaries
    (_ts(0, 10), "a", 5), (_ts(0, 40), "a", 7), (_ts(1, 5), "a", 1),
    (_ts(59, 59), "a", 100), (_ts(60, 0), "a", 9),   # 10:59:59 vs 11:00:00
    (_ts(2, 30), "b", -4), (_ts(61, 1), "b", 2),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(EVENTS, "ts timestamp, event_type string, v long")


@pytest.mark.spark
class TestRollupCascade:
    def test_cascade_equals_direct(self, spark, events):
        cascade = rollup_cascade(
            events, ts_col="ts", keys=("event_type",), value_col="v",
            grains=("minute", "hour"),
        )
        direct = events.groupBy(
            F.date_trunc("hour", "ts").alias("g_start"), "event_type"
        ).agg(
            F.count("*").alias("n"), F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"), F.max("v").alias("max_v"),
        )
        key = lambda r: (r["g_start"], r["event_type"])
        a = {key(r): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
             for r in cascade.collect()}
        b = {key(r): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
             for r in direct.collect()}
        assert a == b and len(a) == 4  # (10h,a),(11h,a),(10h,b),(11h,b)

    def test_hour_boundary_not_leaked(self, spark, events):
        out = {(r["g_start"].hour, r["event_type"]): r
               for r in rollup_cascade(events, value_col="v").collect()}
        assert out[(10, "a")]["n"] == 4 and out[(10, "a")]["max_v"] == 100
        assert out[(11, "a")]["n"] == 1 and out[(11, "a")]["sum_v"] == 9

    def test_three_level_cascade(self, spark, events):
        day = rollup_cascade(
            events, value_col="v", grains=("minute", "hour", "day")
        ).collect()
        out = {r["event_type"]: r for r in day}
        assert out["a"]["n"] == 5 and out["a"]["sum_v"] == 122
        assert out["b"]["min_v"] == -4 and out["b"]["max_v"] == 2

    def test_plan_has_partial_aggregation(self, spark, events):
        plan = rollup_cascade(events, value_col="v")._jdf.queryExecution() \
            .executedPlan().toString().split("== Initial Plan ==")[0]
        # two levels -> two final HashAggregates, each fed by a partial one:
        # 4 HashAggregate nodes, 2 exchanges, no SortAggregate
        assert plan.count("HashAggregate") == 4
        assert plan.count("Exchange hashpartitioning") == 2
        assert "SortAggregate" not in plan
