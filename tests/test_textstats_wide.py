"""textstats_wide: the one-scan wide projection must equal the six
individual ops column-for-column on real documents (registry consolidation
r5 — the merged driver query inherits each op's evidence only if this holds).
"""

import os

import pytest

from benthos_spark.ops.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    repetition_score,
    textstats_wide,
    token_count,
    token_count_bpe,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.spark
def test_wide_equals_individual_ops(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    wide = {r["doc_id"]: r.asDict() for r in textstats_wide(docs).collect()}
    assert wide

    parts = {
        "token_count": (token_count(docs), ["n_tokens"]),
        "token_count_bpe": (token_count_bpe(docs), ["n_bpe_tokens"]),
        "lang_id": (lang_id(docs), ["lang_guess", "n_hits"]),
        "quality_score": (
            quality_score(docs),
            ["has_text", "n_chars", "alpha_ratio", "quality"],
        ),
        "fingerprint": (fingerprint(docs), ["fp"]),
        "repetition_score": (repetition_score(docs, n=2), ["n_ngrams", "repetition"]),
    }
    for op_name, (df, cols) in parts.items():
        for r in df.collect():
            w = wide[r["doc_id"]]
            for c in cols:
                assert w[c] == r[c], (op_name, r["doc_id"], c, w[c], r[c])


@pytest.mark.spark
def test_wide_plan_is_single_scan_projection(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = textstats_wide(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1
