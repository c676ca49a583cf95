"""Corpus-LM perplexity scoring (ops/lmscore.py).

Hand-computed oracle: docs [1:"a b a b", 2:"A b, c!", 3:"x", 4:""] give
bigram counts (a,b)=3 (b,a)=1 (b,c)=1, head counts a=3 b=2, vocab
V={a,b,c -> as second tokens}={b,a,c}=3; with alpha=0.4 the smoothed
bits are exactly reproducible with math.log2.
"""

import math

import pytest
from pyspark.sql import functions as F

from benthos_spark.engine.spec import lint_spec, run_spec
from benthos_spark.ops.lmscore import bigram_lm_score


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "A b, c!"), (3, "x"), (4, "")],
        "doc_id long, text string",
    )


def _expected():
    ab = -math.log2((3 + 0.4) / (3 + 0.4 * 3))
    ba = -math.log2((1 + 0.4) / (2 + 0.4 * 3))
    bc = -math.log2((1 + 0.4) / (2 + 0.4 * 3))
    return {
        1: (3, round((ab + ba + ab) / 3, 4)),
        2: (2, round((ab + bc) / 2, 4)),
        3: (0, None),
        4: (0, None),
    }


def test_hand_computed(docs):
    out = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_bigram"])
        for r in bigram_lm_score(docs).collect()
    }
    assert out == _expected()


def test_fluent_scores_below_gibberish(spark):
    # 20 copies of the same sentence + 1 unique-token doc: the common
    # bigrams dominate the model, so the outlier's bits must be higher
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((99, "zq xv kj wp mn bg"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bits_per_bigram"] for r in bigram_lm_score(df).collect()}
    assert out[99] > out[0] + 1.0


def test_spec_stage_annotate_and_drop(spark):
    spec = {
        "input": {"parquet": {"path": "/root/testdata/sf0.001/documents.parquet"}},
        "pipeline": {"processors": [{"lm_score": {}}]},
        "output": {"memory": {}},
    }
    out = run_spec(spark, spec)
    assert {"n_bigrams", "bits_per_bigram"} <= set(out.columns)
    assert "text" in out.columns  # original cols kept
    n_all = out.count()
    assert n_all > 0

    med = out.approxQuantile("bits_per_bigram", [0.5], 0.01)[0]
    spec["pipeline"]["processors"] = [{"lm_score": {"max_bits": med}}]
    kept = run_spec(spark, spec)
    n_kept = kept.count()
    assert 0 < n_kept < n_all
    assert kept.filter(F.col("bits_per_bigram") > med).count() == 0


def test_lint_accepts_lm_score():
    assert lint_spec({
        "input": {"inline": {"rows": [[1, "a"]], "schema": "doc_id long, text string"}},
        "pipeline": {"processors": [{"lm_score": {"alpha": 0.4}}]},
        "output": {"memory": {}},
    }) == []


class TestFrozenModel:
    """save_lm_model artifact + lm_score_transform (batch & streaming)."""

    def test_transform_matches_batch_op(self, spark, tmp_path):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        mp = str(tmp_path / "lm_model")
        from benthos_spark.ops.lmscore import lm_score_transform, save_lm_model

        save_lm_model(docs, mp)
        got = {
            r["doc_id"]: (r["n_bigrams"], r["bits_per_bigram"])
            for r in lm_score_transform(spark, mp)(docs)
            .select("doc_id", "n_bigrams", "bits_per_bigram")
            .collect()
        }
        want = {
            r["doc_id"]: (r["n_bigrams"], r["bits_per_bigram"])
            for r in bigram_lm_score(docs).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            if want[k][1] is None:
                assert got[k][1] is None
            else:
                assert abs(got[k][1] - want[k][1]) <= 1e-4

    def test_streaming_score_through_sink(self, spark, tmp_path):
        from benthos_spark.ops.lmscore import lm_score_transform, save_lm_model
        from benthos_spark.streaming.sink import IdempotentSink, run_to_sink

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(100)
        mp = str(tmp_path / "lm_model")
        save_lm_model(docs, mp)
        in_dir = str(tmp_path / "in")
        docs.coalesce(1).write.parquet(in_dir)
        stream = spark.readStream.schema(docs.schema).parquet(in_dir)
        scored = lm_score_transform(spark, mp)(stream).select(
            "doc_id", "n_bigrams", "bits_per_bigram"
        )
        sink = IdempotentSink(str(tmp_path / "out"))
        run_to_sink(scored, sink, str(tmp_path / "ckpt"))
        got = {
            r["doc_id"]: r["n_bigrams"] for r in sink.read(spark).collect()
        }
        want = {
            r["doc_id"]: r["n_bigrams"]
            for r in lm_score_transform(spark, mp)(docs)
            .select("doc_id", "n_bigrams")
            .collect()
        }
        assert got == want

    def test_model_row_budget(self, spark, tmp_path):
        from benthos_spark.ops.lmscore import lm_score_transform, save_lm_model

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        mp = str(tmp_path / "lm_model")
        save_lm_model(docs, mp)
        with pytest.raises(ValueError, match="max_model_rows"):
            lm_score_transform(spark, mp, max_model_rows=10)

    def test_spec_stage_streaming_with_model(self, spark, tmp_path):
        from benthos_spark.ops.lmscore import save_lm_model

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(50)
        mp = str(tmp_path / "lm_model")
        save_lm_model(docs, mp)
        in_dir = str(tmp_path / "in")
        docs.coalesce(1).write.parquet(in_dir)
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
        )
        from benthos_spark.streaming.sink import IdempotentSink

        run_spec(spark, {
            "input": {"stream": {"format": "parquet", "path": in_dir,
                                 "schema": ddl}},
            "pipeline": {"processors": [{"lm_score": {"model_path": mp}}]},
            "output": {"sink": {"path": str(tmp_path / "out"),
                                "checkpoint": str(tmp_path / "ckpt")}},
        })
        got = IdempotentSink(str(tmp_path / "out")).read(spark)
        assert got.count() == 50
        assert "bits_per_bigram" in got.columns
