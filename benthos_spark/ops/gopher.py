"""Gopher quality-filter rules for web text (Rae et al. 2021, A1.1).

The published rule set every large-scale web corpus pipeline applies in
some form — implemented as ONE pure-Catalyst projection with an exact
DuckDB oracle (no UDF, no shuffle; the 100 TB shape is a single scan):

- word count in [min_words, max_words]          (default 50 .. 100,000)
- mean word length in [3, 10] characters
- symbol-to-word ratio ("#", "..." and the one-char ellipsis) <= 0.1
- <= 90% of lines start with a bullet ("-", "*", or the bullet char)
- <= 30% of lines end with an ellipsis
- >= 80% of words contain at least one alphabetic character
- at least 2 distinct hits from the 8-word stop list
  (the, be, to, of, and, that, have, with)

Outputs the per-rule measurements (rounded to 4 dp — comparisons run on
the ROUNDED values so both engines gate identically) plus the combined
``gopher_pass`` flag; empty/NULL text yields n_words = 0, NULL metrics
and pass = false. "Words" here are whitespace-split runs of the RAW text
(symbols intact — the alpha and symbol rules need them), unlike the
normalized ``textprep.tokens`` stream the stop-word rule reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textprep import tokens

# the paper's required stop words ("must contain at least two of")
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# explicit class instead of \s: Java regex \s includes \x0B, RE2 (DuckDB)
# \s does not — the explicit class keeps both engines byte-identical
_WS = "[ \\t\\n\\r\\f]+"


def gopher_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col),
        F.filter(F.split(t, _WS), lambda x: x != "").alias("__w"),
        F.filter(
            F.transform(F.split(t, "\n"), lambda l: F.trim(l)), lambda l: l != ""
        ).alias("__lines"),
        (
            (F.length(t) - F.length(F.translate(t, "#", "")))
            + ((F.length(t) - F.length(F.regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
            + (F.length(t) - F.length(F.translate(t, "…", "")))
        ).alias("__syms"),
        tokens(t).alias("__toks"),
    )
    w, lines, toks = F.col("__w"), F.col("__lines"), F.col("__toks")
    nw = F.size(w)
    nl = F.size(lines)
    sum_len = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    mean_wl = F.when(nw > 0, F.round(sum_len.cast("double") / nw, 4))
    sym_ratio = F.when(nw > 0, F.round(F.col("__syms").cast("double") / nw, 4))
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"),
        )
    )
    n_ellip = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    bullet_frac = F.when(nl > 0, F.round(n_bullet.cast("double") / nl, 4))
    ellipsis_frac = F.when(nl > 0, F.round(n_ellip.cast("double") / nl, 4))
    alpha_frac = F.when(
        nw > 0,
        F.round(
            F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double") / nw, 4
        ),
    )
    stop_hits = sum(
        F.array_contains(toks, sw).cast("int") for sw in GOPHER_STOPWORDS
    ).cast("long")

    out = base.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("n_stop_hits"),
    )
    passed = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("n_stop_hits") >= min_stop_hits)
    )
    return out.withColumn(
        "gopher_pass",
        F.when(F.col("n_words") == 0, F.lit(False)).otherwise(passed),
    )
