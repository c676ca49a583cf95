"""Gopher quality-filter rules (ops/gopher.py, Rae et al. 2021 A1.1).

Each rule is exercised by a crafted doc that fails EXACTLY that rule
while a companion doc passes everything; a cross-engine sweep then runs
the harness's _SQL_GOPHER oracle in DuckDB over the same crafted docs
(the synthetic corpus has no bullets/ellipses, so the driver's parity
row alone would leave those branches untested).
"""

import duckdb
import pandas as pd
import pytest

from benthos_spark.ops.gopher import gopher_flags

# 60 plain words incl. several stop words, mean length in [3, 10]
GOOD = " ".join(
    ["the cat sat with the dog and that was fine to see have fun"] * 5
)

DOCS = [
    (1, GOOD),
    (2, "the cat sat with that dog"),                     # < 50 words
    (3, "\n".join(["- " + GOOD[:40]] * 10)),              # all lines bullets
    (4, "\n".join([GOOD[:40] + " ..."] * 10)),            # all lines ellipsis
    (5, GOOD + " " + "# " * 20),                          # symbol-heavy
    (6, " ".join(["12345"] * 60)),                        # no alpha words
    (7, ""),                                              # empty
    (8, None),                                            # NULL
    (9, " ".join(["zebra"] * 60)),                        # no stop words
    (10, "supercalifragilisticexpialidocious " * 60),     # mean len > 10
    (11, GOOD + " … and " + GOOD),                        # unicode ellipsis char
]


@pytest.fixture(scope="module")
def flags(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_flags(df).collect()}


class TestRules:
    def test_good_doc_passes(self, flags):
        f = flags[1]
        assert f["gopher_pass"] is True
        assert f["n_words"] == 70
        assert 3 <= f["mean_word_len"] <= 10
        assert f["n_stop_hits"] >= 2

    def test_word_count_gate(self, flags):
        assert flags[2]["gopher_pass"] is False and flags[2]["n_words"] < 50

    def test_bullet_gate(self, flags):
        assert flags[3]["bullet_frac"] == 1.0
        assert flags[3]["gopher_pass"] is False

    def test_ellipsis_gate(self, flags):
        assert flags[4]["ellipsis_frac"] == 1.0
        assert flags[4]["gopher_pass"] is False

    def test_symbol_gate(self, flags):
        assert flags[5]["symbol_ratio"] > 0.1
        assert flags[5]["gopher_pass"] is False

    def test_alpha_gate(self, flags):
        assert flags[6]["alpha_frac"] == 0.0
        assert flags[6]["gopher_pass"] is False

    def test_empty_and_null(self, flags):
        for d in (7, 8):
            assert flags[d]["n_words"] == 0
            assert flags[d]["mean_word_len"] is None
            assert flags[d]["gopher_pass"] is False

    def test_stopword_gate(self, flags):
        assert flags[9]["n_stop_hits"] == 0
        assert flags[9]["gopher_pass"] is False

    def test_mean_length_gate(self, flags):
        assert flags[10]["mean_word_len"] > 10
        assert flags[10]["gopher_pass"] is False


def test_cross_engine_on_crafted_docs(spark):
    import __spark_entry__ as e

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = gopher_flags(df).toPandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )
    oracle = (
        con.execute(e._SQL_GOPHER).fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got.columns) == list(oracle.columns)
    for c in got.columns:
        a, b = got[c], oracle[c]
        for x, y in zip(a, b):
            both_null = pd.isna(x) and pd.isna(y)
            assert both_null or x == y, (c, x, y)
