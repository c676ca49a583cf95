"""C4-style boilerplate line removal — pure Catalyst, no UDF.

The C4 cleaning recipe (Raffel et al. 2020, public) filters web text line by
line: keep a line only if it ends in terminal punctuation, has at least
``min_words`` words, and mentions neither "javascript" nor a curly brace
(code/markup tell); pages containing "lorem ipsum" are flagged for
page-level drop. This op applies that recipe distributively: split on
newline, filter with collection lambdas, re-join — one projection, no
shuffle, whole-stage codegen over the scan.

Every formula sticks to the Java/RE2-common regex subset and collection
functions with DuckDB twins (``sql_boilerplate_ctes``), so the op is
value-level oracle-checkable like the rest of the suite. DuckDB's
``array_to_string([])`` is NULL where Spark's ``array_join`` is '' — the
SQL twin coalesces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TERMINAL_RE = r'[.!?"]$'


def _keep_line(min_words: int):
    def pred(x: Column) -> Column:
        words = F.size(F.filter(F.split(x, " "), lambda w: w != ""))
        return (
            x.rlike(TERMINAL_RE)
            & (words >= min_words)
            & ~F.lower(x).contains("javascript")
            & ~x.contains("{")
        )

    return pred


def boilerplate_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
) -> DataFrame:
    """(id, n_lines, n_kept, kept_ratio, cleaned, has_lorem): per-document
    line filtering by the C4 recipe plus the page-level lorem-ipsum flag."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _keep_line(min_words))
    n_lines = F.size(lines).cast("long")
    n_kept = F.size(kept).cast("long")
    return docs.select(
        F.col(id_col).alias("id"),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept"),
        (n_kept.cast("double") / n_lines.cast("double")).alias("kept_ratio"),
        F.array_join(kept, "\n").alias("cleaned"),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("has_lorem"),
    )


def sql_boilerplate_ctes(
    text_expr: str, src: str, id_expr: str = "doc_id", min_words: int = 5
) -> str:
    """DuckDB CTE chain mirroring :func:`boilerplate_stats`; emits relation
    ``c`` with columns (id, n_lines, n_kept, kept_ratio, cleaned,
    has_lorem)."""
    keep = (
        "regexp_matches(x, '{term}') "
        "and len(list_filter(string_split(x, ' '), w -> w <> '')) >= {mw} "
        "and not contains(lower(x), 'javascript') "
        "and not contains(x, '{{')".format(term=TERMINAL_RE, mw=min_words)
    )
    return f"""
p as (select {id_expr} as id,
  string_split({text_expr}, chr(10)) as lines,
  contains(lower({text_expr}), 'lorem ipsum') as has_lorem
  from {src}),
p2 as (select id, lines, has_lorem,
  list_filter(lines, x -> {keep}) as kept
  from p),
c as (select id,
  len(lines)::BIGINT as n_lines,
  len(kept)::BIGINT as n_kept,
  len(kept)::DOUBLE / len(lines)::DOUBLE as kept_ratio,
  coalesce(array_to_string(kept, chr(10)), '') as cleaned,
  has_lorem
  from p2)"""
