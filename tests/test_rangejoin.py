"""Range join op (benthos_spark/ops/rangejoin.py): crafted-interval
semantics (inclusive ends, bucket-boundary straddles, exactly-once pairs)
plus the plan invariant (equi-join, no nested loop / cartesian)."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.rangejoin import range_join

# (click_id, t) — bucket width 100 in the tests
POINTS = [(1, 50), (2, 100), (3, 199), (4, 250), (5, 1000)]
# (session_id, t_start, t_end)
INTERVALS = [
    (10, 40, 60),      # contains t=50
    (11, 50, 50),      # degenerate single-instant, contains t=50 exactly
    (12, 90, 210),     # straddles two bucket boundaries: 100 and 200
    (13, 260, 300),    # contains nothing
    (14, 0, 995),      # long interval, many buckets, ends JUST before 1000
]


@pytest.fixture(scope="module")
def joined(spark):
    p = spark.createDataFrame(POINTS, "click_id long, t long")
    i = spark.createDataFrame(INTERVALS, "session_id long, t_start long, t_end long")
    df = range_join(p, i, bucket_width=100)
    return df, sorted((r["click_id"], r["session_id"]) for r in df.collect())


@pytest.mark.spark
class TestRangeJoin:
    def test_pairs_exact(self, joined):
        _, pairs = joined
        assert pairs == [
            (1, 10), (1, 11), (1, 14),   # t=50
            (2, 12), (2, 14),            # t=100 (inclusive start of bucket 1)
            (3, 12), (3, 14),            # t=199
            (4, 14),                     # t=250
            # t=1000: interval 14 ends at 995 -> excluded
        ]

    def test_straddling_interval_matches_once_per_point(self, joined):
        _, pairs = joined
        # interval 12 spans buckets 0,1,2 — but each point pairs exactly once
        assert pairs.count((2, 12)) == 1 and pairs.count((3, 12)) == 1

    def test_inclusive_both_ends(self, spark):
        p = spark.createDataFrame([(1, 10), (2, 20)], "click_id long, t long")
        i = spark.createDataFrame([(9, 10, 20)], "session_id long, t_start long, t_end long")
        got = sorted(
            (r["click_id"], r["session_id"])
            for r in range_join(p, i, bucket_width=7).collect()
        )
        assert got == [(1, 9), (2, 9)]

    def test_extra_equi_keys_partition_matches(self, spark):
        p = spark.createDataFrame(
            [(1, "x", 50), (2, "y", 50)], "click_id long, k string, t long"
        )
        i = spark.createDataFrame(
            [(10, "x", 0, 100)], "session_id long, k string, t_start long, t_end long"
        )
        got = sorted(
            (r["click_id"], r["session_id"])
            for r in range_join(p, i, bucket_width=100, keys=("k",)).collect()
        )
        assert got == [(1, 10)]  # same interval, wrong key -> no match

    def test_bad_width_raises(self, spark):
        p = spark.createDataFrame([(1, 10)], "click_id long, t long")
        with pytest.raises(ValueError):
            range_join(p, p, bucket_width=0)

    def test_plan_equi_join_no_nested_loop(self, joined):
        df, _ = joined
        plan = df._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
                or "BroadcastHashJoin" in plan)
