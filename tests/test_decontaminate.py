"""Benchmark n-gram decontamination (ops/decontaminate.py)."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.decontaminate import decontaminate


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [
            # shares the full benchmark sentence -> every 3-gram hits
            (1, "the quick brown fox jumps over the lazy dog"),
            # shares a 3-token prefix only -> exactly one 3-gram hits
            (2, "the quick brown cat sleeps all day long"),
            # no overlap
            (3, "completely unrelated text about spark plans"),
            # too short for any 3-gram
            (4, "two words"),
            # punctuation/case must normalize away before matching
            (5, "THE, quick... BROWN fox!"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    return docs, bench


def test_flags_and_counts(frames):
    docs, bench = frames
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(docs, bench, n=3).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_hit"] == out[1]["n_ngrams"] == 7
    assert out[1]["hit_ratio"] == 1.0
    assert out[2]["contaminated"] and out[2]["n_hit"] == 1
    assert out[2]["n_ngrams"] == 6
    assert not out[3]["contaminated"] and out[3]["n_hit"] == 0
    assert out[4] == {
        "doc_id": 4, "n_ngrams": 0, "n_hit": 0,
        "hit_ratio": 0.0, "contaminated": False,
    }
    # "the quick brown" and "quick brown fox" survive normalization
    assert out[5]["contaminated"] and out[5]["n_hit"] == 2
    assert not out[6]["contaminated"] and out[6]["n_ngrams"] == 0


def test_every_doc_has_a_row(frames):
    docs, bench = frames
    assert decontaminate(docs, bench, n=3).count() == docs.count()


def test_repeated_ngram_counts_once(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c")], "bench_id long, text string")
    row = decontaminate(docs, bench, n=3).collect()[0]
    # 7 positional 3-grams but only 3 distinct ones; 'a b c' hits once
    assert row["n_ngrams"] == 3 and row["n_hit"] == 1


def test_broadcast_in_plan(frames):
    docs, bench = frames
    plan = decontaminate(docs, bench, n=3)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower()
