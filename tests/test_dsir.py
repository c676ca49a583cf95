"""DSIR importance weighting (ops/dsir.py) vs an independent pure-Python
twin (hashlib md5, same 60-bit polynomial bucket hash)."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from benthos_spark.engine.spec import lint_spec, run_spec
from benthos_spark.ops.dsir import dsir_weights

ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "spark plans shuffle data across executors"),
    (4, "zq xv kj wp"),
    (5, "the cat"),
    (6, ""),
    (7, None),
]
TARGET_IDS = {1, 2}  # "cat sentences" are the target distribution


def _feats(text, n_buckets):
    norm = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()
    toks = norm.split(" ") if norm else []
    fs = list(toks) + [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
    return [int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % n_buckets for f in fs]


def _py_dsir(rows, target_ids, n_buckets=64, alpha=1.0):
    tc, rc = {}, {}
    for did, text in rows:
        for b in _feats(text, n_buckets):
            rc[b] = rc.get(b, 0) + 1
            if did in target_ids:
                tc[b] = tc.get(b, 0) + 1
    n_t, n_r = sum(tc.values()), sum(rc.values())
    k = math.log(n_r + alpha * n_buckets) - math.log(n_t + alpha * n_buckets)
    out = {}
    for did, text in rows:
        bs = _feats(text, n_buckets)
        if not bs:
            out[did] = (0, None)
            continue
        w = sum(
            math.log(tc.get(b, 0) + alpha) - math.log(rc.get(b, 0) + alpha)
            for b in bs
        ) + len(bs) * k
        out[did] = (len(bs), round(w, 4))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_matches_python_twin(docs):
    # n_buckets=64 forces hash collisions through the same code path the
    # default 4096 uses at corpus scale
    target = docs.filter(F.col("doc_id").isin(*TARGET_IDS))
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_weight"])
        for r in dsir_weights(docs, target, n_buckets=64).collect()
    }
    assert got == _py_dsir(ROWS, TARGET_IDS)


def test_target_like_docs_score_higher(docs):
    target = docs.filter(F.col("doc_id").isin(*TARGET_IDS))
    w = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(docs, target, n_buckets=64).collect()
    }
    # target members and the near-target doc 5 beat the off-distribution docs
    assert min(w[1], w[2], w[5]) > max(w[3], w[4])
    assert w[6] is None and w[7] is None


def test_spec_stage_annotate_and_filter(spark):
    spec = {
        "input": {"parquet": {"path": "/root/testdata/sf0.001/documents.parquet"}},
        "pipeline": {"processors": [
            {"dsir": {"target_filter": "doc_id % 53 = 0"}},
        ]},
        "output": {"memory": {}},
    }
    out = run_spec(spark, spec)
    assert {"n_feats", "dsir_weight"} <= set(out.columns)
    n_all = out.count()
    assert n_all > 0
    med = out.approxQuantile("dsir_weight", [0.5], 0.01)[0]
    spec["pipeline"]["processors"] = [
        {"dsir": {"target_filter": "doc_id % 53 = 0", "min_weight": med}},
    ]
    kept = run_spec(spark, spec)
    assert 0 < kept.count() < n_all
    assert kept.filter(F.col("dsir_weight") < med).count() == 0


def test_compile_rejects_ambiguous_target():
    # lint can't see processor bodies for native-only stages, but the
    # native compile must reject a dsir with zero or two target sources
    from benthos_spark.engine.spark_exec import CompileError, NativePipeline

    for body in ({}, {"target_path": "/x", "target_filter": "1=1"}):
        with pytest.raises(CompileError, match="target"):
            NativePipeline([{"dsir": body}], {"doc_id": "bigint", "text": "string"})

    assert lint_spec({
        "input": {"inline": {"rows": [[1, "a"]], "schema": "doc_id long, text string"}},
        "pipeline": {"processors": [{"dsir": {"target_filter": "doc_id = 1"}}]},
        "output": {"memory": {}},
    }) == []


class TestFrozenModel:
    """save_dsir_model artifact + dsir_score_transform: the model is one
    in-plan array literal, the score a stateless zero-shuffle projection
    that must equal the batch join formula exactly."""

    def test_transform_matches_batch_op(self, spark, tmp_path):
        from benthos_spark.ops.dsir import (
            dsir_score_transform, dsir_weights, load_dsir_model,
            save_dsir_model,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.filter(F.col("doc_id") % 53 == 0)
        mp = str(tmp_path / "dsir_model")
        save_dsir_model(docs, target, mp)
        lr, k_const, nb = load_dsir_model(spark, mp)
        assert nb == 4096 and len(lr) == 4096
        got = {
            r["doc_id"]: (r["n_feats"], r["dsir_weight"])
            for r in dsir_score_transform(lr, k_const)(docs)
            .select("doc_id", "n_feats", "dsir_weight")
            .collect()
        }
        want = {
            r["doc_id"]: (r["n_feats"], r["dsir_weight"])
            for r in dsir_weights(docs, target).collect()
        }
        assert got == want

    def test_transform_plan_stateless(self, spark, tmp_path):
        from benthos_spark.ops.dsir import (
            dsir_score_transform, load_dsir_model, save_dsir_model,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        mp = str(tmp_path / "dsir_model")
        save_dsir_model(docs, docs.filter(F.col("doc_id") % 53 == 0), mp)
        lr, k_const, _ = load_dsir_model(spark, mp)
        plan = dsir_score_transform(lr, k_const)(docs)._jdf.queryExecution() \
            .executedPlan().toString().split("== Initial Plan ==")[0]
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan

    def test_streaming_spec_with_model(self, spark, tmp_path):
        from benthos_spark.ops.dsir import save_dsir_model
        from benthos_spark.streaming.sink import IdempotentSink

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(60)
        mp = str(tmp_path / "dsir_model")
        save_dsir_model(docs, docs.filter(F.col("doc_id") % 7 == 0), mp)
        in_dir = str(tmp_path / "in")
        docs.coalesce(1).write.parquet(in_dir)
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
        )
        run_spec(spark, {
            "input": {"stream": {"format": "parquet", "path": in_dir,
                                 "schema": ddl}},
            "pipeline": {"processors": [{"dsir": {"model_path": mp}}]},
            "output": {"sink": {"path": str(tmp_path / "out"),
                                "checkpoint": str(tmp_path / "ckpt")}},
        })
        got = IdempotentSink(str(tmp_path / "out")).read(spark)
        assert got.count() == 60
        assert {"n_feats", "dsir_weight"} <= set(got.columns)
