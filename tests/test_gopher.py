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
    (12, " ".join(["zebra"] * 59) + " the"),              # exactly 1 stop hit
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

    def test_min_stop_hits_paper_default_is_two(self, flags, spark):
        # doc 12 has exactly one stop hit: fails the paper default but
        # passes the registry's relaxed min_stop_hits=1 gate
        assert flags[12]["n_stop_hits"] == 1
        assert flags[12]["gopher_pass"] is False
        from benthos_spark.ops.gopher import gopher_flags as gf

        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        relaxed = {
            r["doc_id"]: r["gopher_pass"]
            for r in gf(df, min_stop_hits=1).collect()
        }
        assert relaxed[12] is True


REP_DOCS = [
    # 21: 4 lines, one repeated once -> dup_line_frac = 1/4; paragraphs
    # (split on blank line) distinct
    (21, "alpha beta\ngamma delta\nalpha beta\n\nepsilon zeta"),
    # 22: heavy bigram repetition -> top_2gram_char_frac high
    (22, " ".join(["ping pong"] * 30)),
    # 23: a repeated 10-gram (whole doc repeated) -> dup_{5..10}gram fracs 1.0
    (23, " ".join(["one two three four five six seven eight nine ten"] * 3)),
    # 24: all-distinct words, nothing repeats
    (24, "q w e r t y u i o p zz xx cc vv bb nn mm kk jj hh"),
    (25, ""),          # empty -> all NULL, pass
    (26, None),        # NULL  -> all NULL, pass
]


@pytest.fixture(scope="module")
def rep(spark):
    from benthos_spark.ops.gopher import gopher_repetition

    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}


class TestRepetition:
    def test_dup_line_fraction(self, rep):
        r = rep[21]
        assert r["dup_line_frac"] == 0.25          # 1 extra of 4 lines
        assert r["dup_para_frac"] == 0.0           # both paragraphs distinct
        # repeated line "alpha beta" = 10 extra chars of 43 total line chars
        assert r["dup_line_char_frac"] == 0.2326

    def test_top_bigram_fraction(self, rep):
        r = rep[22]
        # bigrams: "ping pong" x30, "pong ping" x29 -> top share by chars
        # = 30*8 / (59*8) = 0.5085
        assert r["top_2gram_char_frac"] == 0.5085
        assert r["gopher_rep_pass"] is False

    def test_dup_ngram_fractions(self, rep):
        r = rep[23]
        for n in (5, 6, 7, 8, 9, 10):
            # every n-gram occurs in each of the 3 copies or spans a seam
            # shared by 2 copies -> all chars are in duplicated n-grams
            assert r[f"dup_{n}gram_char_frac"] == 1.0
        assert r["gopher_rep_pass"] is False

    def test_clean_doc_passes(self, rep):
        r = rep[24]
        assert r["dup_line_frac"] == 0.0
        assert r["dup_5gram_char_frac"] == 0.0
        assert r["gopher_rep_pass"] is True

    def test_empty_and_null_pass_with_null_metrics(self, rep):
        for d in (25, 26):
            assert rep[d]["dup_line_frac"] is None
            assert rep[d]["top_2gram_char_frac"] is None
            assert rep[d]["gopher_rep_pass"] is True


def test_repetition_cross_engine_on_crafted_docs(spark):
    """_SQL_GOPHER_REP vs gopher_repetition on crafted docs — the synthetic
    corpus is single-line text, so the line/paragraph branches of the
    driver row's oracle only get exercised here."""
    import __spark_entry__ as e
    from benthos_spark.ops.gopher import gopher_repetition

    docs = REP_DOCS + DOCS  # repetition-crafted + rule-crafted docs
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = (
        gopher_repetition(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    oracle = (
        con.execute(e._SQL_GOPHER_REP)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(oracle.columns)
    for c in got.columns:
        for x, y in zip(got[c], oracle[c]):
            both_null = pd.isna(x) and pd.isna(y)
            assert both_null or x == y, (c, x, y)


def test_cross_engine_on_crafted_docs(spark):
    import __spark_entry__ as e

    # min_stop_hits=1 mirrors the registry's textstats_wide row (and the
    # _SQL_GOPHER oracle, which hard-codes the same relaxed gate)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        gopher_flags(df, min_stop_hits=1)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

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
