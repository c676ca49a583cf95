"""Sessionization op (benthos_spark/ops/sessionize.py): gap-boundary
semantics, per-key independence, stats aggregation, and the single-sort
plan shape."""

import datetime as dt

import pytest

from benthos_spark.ops.sessionize import session_stats, sessionize


def _t(m, s=0):
    return dt.datetime(2024, 1, 1, 10 + m // 60, m % 60, s)


EVENTS = [
    # user 1: events at 0,10,20 min (one session, gap 30m), then 60 (new)
    (1, _t(0)), (1, _t(10)), (1, _t(20)), (1, _t(60)),
    # user 2: single event
    (2, _t(5)),
    # user 3: exactly-at-gap boundary: 30m gap with gap_s=1800 is NOT > gap
    (3, _t(0)), (3, _t(30)), (3, _t(61)),   # 31m gap -> new session
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(EVENTS, "user_id long, ts timestamp")


@pytest.mark.spark
class TestSessionize:
    def test_labels(self, spark, ev):
        out = sessionize(ev, gap_s=1800).collect()
        got = sorted((r["user_id"], r["ts"].minute + 60 * (r["ts"].hour - 10),
                      r["session_ord"]) for r in out)
        assert got == [
            (1, 0, 1), (1, 10, 1), (1, 20, 1), (1, 60, 2),
            (2, 5, 1),
            (3, 0, 1), (3, 30, 1), (3, 61, 2),   # 30m == gap -> same session
        ]

    def test_stats(self, spark, ev):
        out = {(r["user_id"], r["session_ord"]): r
               for r in session_stats(ev, gap_s=1800).collect()}
        assert out[(1, 1)]["n_events"] == 3
        assert out[(1, 1)]["duration_s"] == 20 * 60
        assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["duration_s"] == 0
        assert out[(3, 1)]["n_events"] == 2

    def test_plan_single_sort_per_key(self, spark, ev):
        plan = sessionize(ev, gap_s=1800)._jdf.queryExecution() \
            .executedPlan().toString().split("== Initial Plan ==")[0]
        # both window functions share one keyed exchange + one sort
        assert plan.count("Exchange hashpartitioning") == 1
        assert plan.count("Sort ") <= 2  # lag window + running-sum reuse
