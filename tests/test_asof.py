"""As-of join op (benthos_spark/ops/asof.py): crafted-sequence semantics plus
the plan invariant (single keyed shuffle, no nested-loop / cartesian)."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.asof import asof_join

# (event_id, user_id, ts)
LEFT = [
    (1, 10, 100),
    (2, 10, 205),   # after r@200
    (3, 10, 200),   # EQUAL to r@200 -> inclusive match
    (4, 10, 50),    # before any right row -> NULL
    (5, 20, 300),   # other key, right exists
    (6, 30, 300),   # key with no right rows at all -> NULL
]
# (user_id, ts, value)
RIGHT = [
    (10, 90, 1.0),
    (10, 200, 2.0),
    (20, 250, 7.0),
]


@pytest.fixture(scope="module")
def joined(spark):
    l = spark.createDataFrame(LEFT, "event_id long, user_id long, ts long")
    r = spark.createDataFrame(RIGHT, "user_id long, ts long, value double")
    df = asof_join(l, r, on="ts", by="user_id", right_cols=("value",))
    return df, {x["event_id"]: x for x in df.collect()}


@pytest.mark.spark
class TestAsofJoin:
    def test_latest_prior_match(self, joined):
        _, rows = joined
        assert rows[1]["r_value"] == 1.0 and rows[1]["r_ts"] == 90
        assert rows[2]["r_value"] == 2.0 and rows[2]["r_ts"] == 200

    def test_equal_ts_is_inclusive(self, joined):
        _, rows = joined
        assert rows[3]["r_value"] == 2.0 and rows[3]["r_ts"] == 200

    def test_no_prior_row_is_null(self, joined):
        _, rows = joined
        assert rows[4]["r_value"] is None and rows[4]["r_ts"] is None
        assert rows[6]["r_value"] is None and rows[6]["r_ts"] is None

    def test_keys_do_not_leak(self, joined):
        _, rows = joined
        assert rows[5]["r_value"] == 7.0  # user 20 sees only user 20's rows

    def test_left_rowcount_preserved(self, joined):
        df, _ = joined
        assert df.count() == len(LEFT)

    def test_plan_one_keyed_shuffle_no_nested_loop(self, joined):
        df, _ = joined
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the adaptive plan string repeats itself under '== Initial Plan =='
        plan = plan.split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the window's hash partition on the key is the only exchange
        assert plan.count("Exchange hashpartitioning") == 1
