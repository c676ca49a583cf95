"""Token-budget source mixer (ops/mixer.py — Dolma/Pile-style data
mixing): deterministic per-source admission in md5-priority order until
the source's weight share of the token budget is reached."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.mixer import mix_sources

# two sources, 4 docs each, 10 tokens per doc -> 80 corpus tokens
DOCS = [
    (i, "a" if i < 4 else "b", " ".join(f"w{j}" for j in range(10)))
    for i in range(8)
]


@pytest.fixture(scope="module")
def mixed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    # weights 3:1, budget = half the corpus = 40 tokens
    # quota_a = 40*3/4 = 30 -> 3 docs; quota_b = 40*1/4 = 10 -> 1 doc
    out = mix_sources(df, frac=0.5, weights={"a": 3.0, "b": 1.0})
    return out.collect()


class TestMixer:
    def test_quota_shares(self, mixed):
        by_group = {}
        for r in mixed:
            by_group.setdefault(r["group"], []).append(r)
        assert {r["quota"] for r in by_group["a"]} == {30.0}
        assert {r["quota"] for r in by_group["b"]} == {10.0}
        assert sum(r["kept"] for r in by_group["a"]) == 3
        assert sum(r["kept"] for r in by_group["b"]) == 1

    def test_admission_is_priority_order(self, mixed):
        for rows in (
            [r for r in mixed if r["group"] == "a"],
            [r for r in mixed if r["group"] == "b"],
        ):
            rows.sort(key=lambda r: (r["priority"], r["doc_id"]))
            kept_flags = [r["kept"] for r in rows]
            # kept is a prefix of the priority order
            assert kept_flags == sorted(kept_flags, reverse=True)
            # running sum is consistent
            cum = 0
            for r in rows:
                cum += r["n_tokens"]
                assert r["cum_tokens"] == cum

    def test_boundary_doc_admitted(self, spark):
        # one source, docs of 7 tokens, budget 10 -> doc starting at 7 (<10)
        # is admitted even though it overshoots; the next (14 >= 10) is not
        df = spark.createDataFrame(
            [(i, "s", " ".join(f"w{j}" for j in range(7))) for i in range(4)],
            "doc_id long, source string, text string",
        )
        out = mix_sources(df, frac=10 / 28, weights={"s": 1.0}).collect()
        assert sum(r["kept"] for r in out) == 2

    def test_unlisted_source_dropped(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
        out = mix_sources(df, frac=0.5, weights={"a": 1.0}).collect()
        assert all(not r["kept"] for r in out if r["group"] == "b")
        assert any(r["kept"] for r in out if r["group"] == "a")

    def test_default_weights_deterministic(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
        a = mix_sources(df, frac=0.5).collect()
        b = mix_sources(df.repartition(7), frac=0.5).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_null_group_coalesced_not_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, None, "x y z"), (2, "s", "x y z")],
            "doc_id long, source string, text string",
        )
        out = mix_sources(df, frac=1.0).collect()
        assert len(out) == 2  # NULL source becomes the '' group, kept row
