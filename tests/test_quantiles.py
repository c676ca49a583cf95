"""Grouped quantiles op (benthos_spark/ops/quantiles.py): exact values on
crafted data, approx-vs-exact accuracy, and the approx path's mergeable
(partial-aggregation) plan shape."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.quantiles import (
    group_quantiles,
    group_quantiles_approx,
)

ROWS = [("a", float(v)) for v in [1, 2, 4, 8, 16.5]] + [
    ("b", float(v)) for v in range(1, 101)
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "k string, v double")


@pytest.mark.spark
class TestGroupQuantiles:
    def test_exact_interpolation(self, spark, df):
        out = {r["k"]: r for r in group_quantiles(df, ("k",), "v").collect()}
        # index = q*(n-1): p50 of {1,2,4,8,16.5} -> 4; p95 -> 8+0.8*8.5
        assert out["a"]["n"] == 5 and out["a"]["p50"] == 4.0
        assert abs(out["a"]["p95"] - 14.8) < 1e-12
        # 1..100: p50 = 50.5, p99 = 1 + 0.99*99
        assert out["b"]["p50"] == 50.5
        assert abs(out["b"]["p99"] - 99.01) < 1e-9

    def test_approx_close_to_exact(self, spark, df):
        exact = {r["k"]: r for r in group_quantiles(df, ("k",), "v").collect()}
        approx = {r["k"]: r for r in
                  group_quantiles_approx(df, ("k",), "v").collect()}
        for k in exact:
            # percentile_approx returns an actual data value; at these
            # sizes it must land within one data point of the exact rank
            assert abs(approx[k]["p50"] - exact[k]["p50"]) <= 1.0

    def test_approx_plan_has_partial_aggregation(self, spark, df):
        plan = group_quantiles_approx(df, ("k",), "v")._jdf.queryExecution() \
            .executedPlan().toString().split("== Initial Plan ==")[0]
        # mergeable sketch: partial_ aggregate before the exchange
        assert "partial_" in plan and "Exchange hashpartitioning" in plan
