"""Funnel/CEP op (benthos_spark/ops/funnel.py): crafted-sequence semantics
(ordering strictness, partial progress, within-budget, greedy matching)
plus the no-per-key-collection plan invariant."""

import datetime as dt

import pytest

from benthos_spark.ops.funnel import funnel


def _t(m):
    return dt.datetime(2024, 1, 1, 10, m)


# (user, ts, type)
EVENTS = [
    # user 1: full funnel in order
    (1, _t(0), "A"), (1, _t(5), "B"), (1, _t(9), "C"),
    # user 2: B before A -> that B must NOT count; no B after A
    (2, _t(0), "B"), (2, _t(3), "A"), (2, _t(2), "C"),
    # user 3: A only
    (3, _t(1), "A"),
    # user 4: never starts (B, C only) -> absent from output
    (4, _t(0), "B"), (4, _t(1), "C"),
    # user 5: two As; earliest A wins, B between them still matches
    (5, _t(0), "A"), (5, _t(2), "B"), (5, _t(4), "A"), (5, _t(6), "C"),
    # user 6: same-timestamp A and B -> strict > rejects the B
    (6, _t(0), "A"), (6, _t(0), "B"),
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(EVENTS, "user_id long, ts timestamp, event_type string")


@pytest.mark.spark
class TestFunnel:
    def test_progress_and_completion(self, spark, ev):
        out = {r["user_id"]: r for r in
               funnel(ev, steps=("A", "B", "C")).collect()}
        assert set(out) == {1, 2, 3, 5, 6}     # user 4 never started
        assert out[1]["reached"] == 3 and out[1]["completed"]
        assert out[1]["duration_s"] == 9 * 60
        assert out[2]["reached"] == 1          # pre-A B ignored
        assert out[3]["reached"] == 1
        assert out[5]["reached"] == 3          # greedy earliest A
        assert out[5]["duration_s"] == 6 * 60
        assert out[6]["reached"] == 1          # strict > on equal ts

    def test_within_budget(self, spark, ev):
        out = {r["user_id"]: r for r in
               funnel(ev, steps=("A", "B", "C"), within_s=7 * 60).collect()}
        assert not out[1]["completed"]         # 9 min > 7 min budget
        assert out[5]["completed"]             # 6 min fits

    def test_two_step(self, spark, ev):
        out = {r["user_id"]: r for r in funnel(ev, steps=("A", "C")).collect()}
        assert out[1]["completed"] and out[2]["reached"] == 1

    def test_rejects_single_step(self, spark, ev):
        with pytest.raises(ValueError):
            funnel(ev, steps=("A",))

    def test_plan_no_per_key_collection(self, spark, ev):
        plan = funnel(ev, steps=("A", "B", "C"))._jdf.queryExecution() \
            .executedPlan().toString().split("== Initial Plan ==")[0]
        assert "collect_list" not in plan and "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
