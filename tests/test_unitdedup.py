"""Cross-doc unit-level exact dedup (ops/unitdedup.py — RefinedWeb/Dolma
paragraph dedup): first occurrence by (doc_id, pos) survives, later exact
duplicates are removed from the REASSEMBLED text; short units never
participate. Cross-engine sweep runs the harness's _SQL_UNIT_DEDUP twin
over crafted multi-paragraph docs (the synthetic corpus is single-line)."""

import duckdb
import pandas as pd
import pytest

from benthos_spark.ops.unitdedup import unit_dedup

PARA_DOCS = [
    (1, "alpha beta\n\ngamma delta\n\nalpha beta"),   # 3rd dups 1st
    (2, "gamma delta\n\nnew stuff"),                  # 1st dups doc1 pos1
    (3, ""),
    (4, None),
    (5, "  alpha beta  "),                            # trim-identity dup
    (6, "solo only here"),
]


@pytest.fixture(scope="module")
def para(spark):
    df = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in unit_dedup(df, unit="paragraph").collect()}


class TestParagraphDedup:
    def test_within_doc_duplicate_dropped(self, para):
        r = para[1]
        assert r["n_units"] == 3 and r["n_kept"] == 2
        assert r["cleaned_text"] == "alpha beta\n\ngamma delta"

    def test_cross_doc_duplicate_dropped(self, para):
        r = para[2]
        assert r["n_units"] == 2 and r["n_kept"] == 1
        assert r["cleaned_text"] == "new stuff"

    def test_empty_and_null(self, para):
        for d in (3, 4):
            # split('') is [''] — one non-participating unit, always kept
            assert para[d]["n_units"] == 1 and para[d]["n_kept"] == 1
            assert para[d]["cleaned_text"] == ""

    def test_trim_identity_but_raw_reassembly(self, para):
        # doc 5's only unit trims to doc 1's first paragraph -> dropped
        assert para[5]["n_kept"] == 0 and para[5]["cleaned_text"] == ""

    def test_unique_doc_untouched(self, para):
        assert para[6]["n_kept"] == 1
        assert para[6]["cleaned_text"] == "solo only here"


def test_min_len_gate_keeps_short_units(spark):
    df = spark.createDataFrame(
        [(1, "ab\nab\nlong enough line\nlong enough line")],
        "doc_id long, text string",
    )
    r = unit_dedup(df, unit="line", min_len=3).collect()[0]
    # both "ab" lines kept (below min_len); 2nd long line dropped
    assert r["n_units"] == 4 and r["n_kept"] == 3
    assert r["cleaned_text"] == "ab\nab\nlong enough line"


def test_sentence_unit_roundtrips_when_nothing_dropped(spark):
    text = "first sentence here. second sentence there. tail"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = unit_dedup(df, unit="sentence", min_len=11).collect()[0]
    assert r["cleaned_text"] == text  # byte-identical reassembly


def test_cross_engine_on_crafted_docs(spark):
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    docs = PARA_DOCS + [
        (7, "alpha beta\nab\n\n\ngamma delta"),   # \n{3} canonicalized
        (8, "x. first sentence here. x"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = (
        unit_dedup(df, unit="sentence", min_len=11)
        .select("doc_id", "n_units", "n_kept", F.md5("cleaned_text").alias("kept_md5"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    oracle = (
        con.execute(e._SQL_UNIT_DEDUP)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(oracle.columns)
    for c in got.columns:
        for x, y in zip(got[c], oracle[c]):
            assert x == y, (c, x, y)
