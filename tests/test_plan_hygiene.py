"""Global plan-hygiene sweep: EVERY batch oracle query's executed plan is
checked for the scale anti-patterns (cartesian products, nested-loop
joins, sort aggregates, single-partition exchanges). Exceptions are an
explicit allowlist of named exact baselines — anything new that picks up
one of these shapes fails here before it ships."""

import pytest

import __spark_entry__ as entry_mod

STREAMING = {
    "streaming_dedupe_window", "streaming_join", "streaming_funnel",
    "streaming_neardup", "streaming_asof",
}

RULES = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SortAggregate",
    "Exchange SinglePartition",
    # row-at-a-time Python UDFs are banned everywhere — Python is allowed
    # only in Arrow-batched form (ArrowEvalPython / MapInPandas)
    "BatchEvalPython",
)

# named exact baselines whose whole point is the quadratic/broadcast plan
ALLOW = {
    # merged r5 queries carry their members' named-baseline allowances:
    # ann_methods' brute-force leg, exact_baselines' exact-cosine half
    "ann_methods": {"BroadcastNestedLoopJoin"},
    "exact_baselines": {"BroadcastNestedLoopJoin"},
}

BATCH_QUERIES = [n for n in entry_mod.queries() if n not in STREAMING]


@pytest.mark.spark
@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_scale_antipatterns(spark, name):
    df = entry_mod.queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = {r for r in RULES if r in plan} - ALLOW.get(name, set())
    assert not hits, f"{name}: {sorted(hits)}\n{plan[:4000]}"
