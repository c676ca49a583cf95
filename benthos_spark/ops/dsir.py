"""DSIR-style data selection via hashed n-gram importance weights.

The public recipe (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): represent every document as a bag of hashed
n-gram features, fit multinomial feature distributions p (target corpus)
and q (raw corpus), and score each raw document by the importance
log-ratio  w(doc) = sum_f [ln p(f) - ln q(f)]  over its features; docs
that look like the target distribution score high and are kept /
resampled. Features here are unigrams + bigrams of normalized tokens,
hashed into ``n_buckets`` buckets with the shared oracle-exact 60-bit
md5 hash (textprep.md5_60bit), smoothed with add-alpha.

The weight is decomposed so the model join carries only per-bucket terms:

  w = sum_b [ln(tc_b + a) - ln(rc_b + a)] + n_feats * K
  K = ln(Nr + a*B) - ln(Nt + a*B)

with tc/rc the target/raw bucket counts, Nt/Nr the total feature counts
and B = n_buckets — K is a per-feature constant folded in after the
per-doc aggregation, so buckets unseen in either corpus need no row in
the model table (their bracket term is ln(a) - ln(a) = 0 only when BOTH
are unseen; a LEFT join + coalesce(0) covers the one-sided cases).

100 TB shape
------------
- TRAIN is two hash aggregations down to <= B rows each (B defaults to
  4096): the model is tiny and is explicitly ``broadcast()`` into the
  score join — scoring shuffles nothing but the per-doc aggregation.
- The bucket-count tables are persisted before the Nt/Nr 1-value actions,
  so target and raw are each scanned once at train time; SCORE is the
  second and final raw scan. Total: 2 passes over raw, 1 over target —
  the paper's train/score shape.
- Everything is Catalyst expressions (md5 + conv + explode + joins); no
  Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .textprep import md5_60bit, tokens


def _bucketed_features(
    df: DataFrame, n_buckets: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, b) rows: one row per unigram AND bigram occurrence, hashed to
    its feature bucket. Occurrences, not distinct — DSIR features are
    counts."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    bi_idx = F.when(
        F.size("__t") >= 2, F.sequence(F.lit(1), F.size("__t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    feats = F.concat(
        F.col("__t"),
        F.transform(
            bi_idx,
            lambda i: F.concat_ws(
                " ", F.element_at("__t", i), F.element_at("__t", i + 1)
            ),
        ),
    )
    return toks.select(
        F.col(id_col),
        F.explode(feats).alias("__f"),
    ).select(
        id_col,
        F.pmod(md5_60bit(F.col("__f")), F.lit(n_buckets)).alias("b"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, n_feats, dsir_weight)`` for every raw document.

    Docs with no tokens have no features: n_feats = 0, weight NULL.
    """
    rf = _bucketed_features(raw, n_buckets, text_col, id_col)
    tf = _bucketed_features(target, n_buckets, text_col, id_col)

    # TRAIN: bucket-count model tables (<= n_buckets rows), persisted so
    # the Nt/Nr scalar actions and the score join reuse one scan each
    tc = tf.groupBy("b").agg(F.count(F.lit(1)).alias("tc")).persist()
    rc = rf.groupBy("b").agg(F.count(F.lit(1)).alias("rc")).persist()
    n_t = tc.agg(F.sum("tc")).first()[0] or 0
    n_r = rc.agg(F.sum("rc")).first()[0] or 0
    k_const = math.log(n_r + alpha * n_buckets) - math.log(n_t + alpha * n_buckets)
    model = tc.join(rc, "b", "full").select(
        "b",
        (
            F.log(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
            - F.log(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(alpha))
        ).alias("lr"),
    )

    # SCORE: broadcast model equi-join, per-doc aggregation, constant fold
    scored = (
        rf.join(F.broadcast(model), "b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum(F.coalesce(F.col("lr"), F.lit(0.0))).alias("__s"),
        )
        .select(
            id_col,
            "n_feats",
            F.round(F.col("__s") + F.col("n_feats") * F.lit(k_const), 4).alias(
                "dsir_weight"
            ),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.col("dsir_weight"),
        )
    )
