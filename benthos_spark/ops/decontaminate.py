"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard LLM training-data hygiene step (GPT-3 appendix C / PaLM-style
"13-gram overlap" decontamination): a document is contaminated if any of
its word n-grams appears in the benchmark corpus. Output is per-document —
total distinct n-grams, how many hit the benchmark, the hit ratio, and the
boolean flag — so downstream policy (drop the doc, excise the span, weight
it down) stays a cheap filter.

100 TB shape
------------
- The benchmark side is SMALL by construction (eval sets are thousands of
  documents, not billions): its distinct n-gram set is built once and
  broadcast. The corpus side therefore NEVER shuffles its exploded
  n-grams — the containment probe is a broadcast hash join, and the
  per-doc hit count partial-aggregates map-side before the only shuffle
  (doc_id, a count per contaminated doc).
- Totals are a pure projection (``size(shingles)``), no explode needed.
- The final attach of hit counts to totals is a left join whose right side
  holds one row per *contaminated* doc — in real corpora a sliver, which
  AQE converts to a broadcast at runtime; worst case it is a plain
  doc_id-keyed shuffle of narrow rows.

Cross-engine parity: the join key is the n-gram STRING itself (same
normalization as every other text op — :mod:`benthos_spark.ops.textprep`),
so the DuckDB oracle composes from ``SQL_TOKENS`` + ``array_to_string``
slicing with no hash to disagree on.

Reference parity note: the reference engine has no decontamination
processor — this op extends the corpus-hygiene family (C4 duplicate-line
stats, MinHash/SimHash dedup) that the graft adds for LLM-pipeline use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textprep import shingles_of, tokens


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document benchmark n-gram overlap.

    Returns ``(id_col, n_ngrams, n_hit, hit_ratio, contaminated)`` where
    ``n_ngrams`` counts the doc's DISTINCT word n-grams, ``n_hit`` how many
    of them occur anywhere in ``benchmark``, ``hit_ratio`` their quotient
    (0.0 for docs too short to have an n-gram) and ``contaminated`` is
    ``n_hit > 0``. Docs with fewer than ``n`` tokens have no n-grams and
    are never contaminated.
    """
    bench_text_col = bench_text_col or text_col

    bench_toks = benchmark.select(tokens(F.col(bench_text_col)).alias("__bt"))
    bench_ngrams = (
        bench_toks.select(F.explode(shingles_of(F.col("__bt"), n)).alias("ng"))
        .distinct()
    )

    doc_toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    totals = doc_toks.select(
        F.col(id_col),
        F.size(shingles_of(F.col("__toks"), n)).cast("long").alias("n_ngrams"),
    )
    doc_ngrams = doc_toks.select(
        F.col(id_col), F.explode(shingles_of(F.col("__toks"), n)).alias("ng")
    )
    # shingles_of is distinct-per-doc and bench_ngrams is globally distinct,
    # so count(*) after the containment join == distinct hit n-grams.
    hits = (
        doc_ngrams.join(F.broadcast(bench_ngrams), "ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    out = totals.join(hits, id_col, "left")
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0)).cast("long")
    return out.select(
        F.col(id_col),
        F.col("n_ngrams"),
        n_hit.alias("n_hit"),
        F.when(
            F.col("n_ngrams") > 0, F.round(n_hit / F.col("n_ngrams"), 4)
        ).otherwise(F.lit(0.0)).alias("hit_ratio"),
        (n_hit > 0).alias("contaminated"),
    )
