"""Corpus-LM perplexity scoring for quality filtering (CCNet-style).

The public recipe (Wenzek et al. 2020, "CCNet: Extracting high quality
monolingual datasets from web crawl data"): score every document by a
language model's perplexity and filter/partition on it — fluent text
scores low, gibberish and boilerplate-mangled text scores high. The LM
here is self-contained: an add-alpha-smoothed BIGRAM model trained on the
corpus itself (no external model files in this sandbox), which preserves
the pipeline shape — train pass, then score pass — while keeping every
number exactly reproducible by the SQL oracle.

Per-doc output is ``bits_per_bigram`` = avg over the doc's token bigrams
of -log2 p(w2 | w1), the log-domain perplexity (perplexity = 2^bits).

100 TB shape
------------
- Training is ONE hash aggregation over exploded bigrams (map-side
  combine; the result is bounded by observed-vocab^2, in practice a tiny
  fraction of corpus size) plus a unigram rollup REUSING the bigram
  counts (sum over w1) — the corpus is scanned once, not twice.
- Scoring joins doc bigrams to the count table on (w1, w2): an equi-join
  whose right side is the model, then a per-doc partial aggregation.
  Unseen bigrams hit the smoothing floor via a LEFT join + coalesce — no
  row is lost, matching the closed-vocabulary convention.
- Nothing collects to the driver; the model stays distributed (contrast
  ops/kmeans.py, where k x dim IS legitimately driver-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textprep import tokens


def bigram_lm_score(
    docs: DataFrame,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, n_bigrams, bits_per_bigram)`` per document.

    p(w2|w1) = (C(w1,w2) + alpha) / (C(w1.) + alpha * V) with V = the
    global distinct second-token vocabulary size (the add-alpha event
    space). Docs with fewer than 2 tokens have no bigrams: n_bigrams = 0,
    score NULL.
    """
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    idx = F.when(
        F.size("__t") >= 2, F.sequence(F.lit(1), F.size("__t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    big = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("__t", i).alias("w1"),
                    F.element_at("__t", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    # TRAIN: materialize the model once. The vocab scalar V is an eager
    # 1-value action, so without the persist the bigram aggregation (a full
    # corpus scan) would run twice — with it, the corpus is scanned once at
    # train time and the cached model table (vocab^2-bounded, tiny relative
    # to the corpus) feeds the V count, the unigram rollup AND the scoring
    # joins. This mirrors the real train/score pipeline shape, where the
    # model is a materialized artifact between the two passes.
    counts = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).persist()
    heads = counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = counts.select("w2").distinct().count()

    scored = (
        big.join(counts, ["w1", "w2"], "left")
        .join(heads.withColumnRenamed("c1", "c1h"), "w1", "left")
        .select(
            F.col(id_col),
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c1h"), F.lit(0)) + F.lit(alpha * vocab))
                )
            ).alias("bits"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("bits"), 4).alias("bits_per_bigram"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("bits_per_bigram"),
        )
    )
