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

from pyspark.sql import DataFrame, functions as F, types as T

from .textprep import tokens


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) rows — one per token bigram occurrence."""
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    idx = F.when(
        F.size("__t") >= 2, F.sequence(F.lit(1), F.size("__t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return toks.select(
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
    big = _doc_bigrams(docs, text_col, id_col)

    # TRAIN: materialize the model once. The vocab scalar V is an eager
    # 1-value action, so without materialization the bigram aggregation (a
    # full corpus scan) would run twice — with it, the corpus is scanned
    # once at train time and the model table (vocab^2-bounded, tiny
    # relative to the corpus) feeds the V count, the unigram rollup AND
    # the scoring joins. localCheckpoint, not persist(): persist pins the
    # plan in the SQL CacheManager until an unpersist that no caller of a
    # lazy-result function can place, leaking storage across repeated
    # calls in a long-lived session; checkpoint blocks are freed by the
    # ContextCleaner once the result is garbage-collected.
    counts = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
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


def save_lm_model(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """TRAIN only: materialize the bigram count table ``(w1, w2, c12)``
    as a parquet artifact. Head counts and the smoothing vocabulary are
    derived from it at load/score time, so the artifact is self-contained
    and alpha stays a score-time parameter. Fit once on a corpus
    snapshot, score any batch OR STREAM against the frozen artifact."""
    big = _doc_bigrams(docs, text_col, id_col).drop(id_col)
    big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).write.mode(
        "overwrite"
    ).parquet(path)


def lm_score_transform(
    spark,
    model_path: str,
    alpha: float = 0.4,
    text_col: str = "text",
    out_n: str = "n_bigrams",
    out_bits: str = "bits_per_bigram",
    max_model_rows: int = 5_000_000,
    max_model_bytes: int = 2 << 30,
):
    """STREAMING-SAFE scorer: df -> df with (n_bigrams, bits_per_bigram)
    added, scoring against a frozen :func:`save_lm_model` artifact.

    Unlike the 4096-double DSIR model (an in-plan array literal), the LM
    model is bigram-vocabulary-sized, so it rides as a BROADCAST dict
    into an Arrow-batched ``mapInPandas`` kernel — the streaming twin of
    the asof dimension pattern (streaming/asof.py), with the same
    row/byte budgets probed BEFORE driver materialization. Stateless,
    zero shuffle: each micro-batch is a pure map. Over budget => score
    in batch with :func:`bigram_lm_score`'s distributed join instead."""
    import math as _math

    from decimal import ROUND_HALF_UP, Decimal

    def _round4(x: float) -> float:
        # Match the batch op's F.round(..., 4): Spark rounds doubles via
        # BigDecimal(Double.toString(x)).setScale(4, HALF_UP) — i.e.
        # HALF_UP over the shortest decimal repr. Python round() is
        # half-even over the binary double and diverges on ...5 ties, so
        # batch and frozen-model scores for the same doc would differ.
        return float(
            Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )

    counts = spark.read.parquet(model_path)
    probed = counts.limit(max_model_rows + 1).count()
    if probed > max_model_rows:
        raise ValueError(
            f"LM model exceeds max_model_rows={max_model_rows}; "
            "not broadcast-scale — score in batch with bigram_lm_score"
        )
    pdf = counts.toPandas()
    nbytes = int(pdf.memory_usage(deep=True).sum())
    if nbytes > max_model_bytes:
        raise ValueError(
            f"LM model is ~{nbytes} bytes (> max_model_bytes="
            f"{max_model_bytes}); score in batch with bigram_lm_score"
        )
    c12 = {}
    c1 = {}
    vocab_set = set()
    for w1, w2, c in pdf.itertuples(index=False):
        c12[(w1, w2)] = int(c)
        c1[w1] = c1.get(w1, 0) + int(c)
        vocab_set.add(w2)
    vocab = len(vocab_set)

    def t(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        # one copy per executor, not one per task closure
        bc = sc.broadcast((c12, c1, vocab))
        out_schema = T.StructType(
            list(df.schema)
            + [
                T.StructField(out_n, T.LongType()),
                T.StructField(out_bits, T.DoubleType()),
            ]
        )

        def kernel(batches):
            import re as _re

            m12, m1, v = bc.value
            av = alpha * v
            for pb in batches:
                ns, bits = [], []
                for text in pb[text_col]:
                    norm = _re.sub(
                        r"[^a-z0-9]+", " ", (text or "").lower()
                    ).strip()
                    tk = norm.split(" ") if norm else []
                    if len(tk) < 2:
                        ns.append(0)
                        bits.append(None)
                        continue
                    s = 0.0
                    n = len(tk) - 1
                    for i in range(n):
                        w1, w2 = tk[i], tk[i + 1]
                        s -= _math.log2(
                            (m12.get((w1, w2), 0) + alpha)
                            / (m1.get(w1, 0) + av)
                        )
                    ns.append(n)
                    bits.append(_round4(s / n))
                pb[out_n] = ns
                pb[out_bits] = bits
                yield pb

        return df.mapInPandas(kernel, schema=out_schema)

    return t
