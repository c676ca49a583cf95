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


def dsir_model(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """TRAIN: fit the bucket model. Returns ``(model, k_const)`` where
    model is a ``(b, lr)`` DataFrame (<= n_buckets rows, persisted) and
    k_const the per-feature constant; both feed :func:`dsir_weights`'s
    score join or :func:`dsir_score_transform`'s streaming lookup."""
    rf = _bucketed_features(raw, n_buckets, text_col, id_col)
    tf = _bucketed_features(target, n_buckets, text_col, id_col)

    # bucket-count model tables (<= n_buckets rows), materialized so the
    # Nt/Nr scalar actions and the model build reuse one scan each.
    # localCheckpoint + explicit unpersist-equivalent, not persist():
    # persist pins the plans in the CacheManager for the session lifetime
    # (no caller of a lazy-result function can place the unpersist);
    # checkpoint blocks are ContextCleaner-freed once unreferenced.
    tc = tf.groupBy("b").agg(F.count(F.lit(1)).alias("tc")).localCheckpoint(eager=True)
    rc = rf.groupBy("b").agg(F.count(F.lit(1)).alias("rc")).localCheckpoint(eager=True)
    # one action for both totals (r6): each blocking driver action costs a
    # full job launch; the two frames are checkpointed and tiny, so union
    totals = {
        r["k"]: r["s"]
        for r in tc.select(F.lit("t").alias("k"), F.col("tc").alias("v"))
        .unionByName(rc.select(F.lit("r").alias("k"), F.col("rc").alias("v")))
        .groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    n_t = totals.get("t", 0) or 0
    n_r = totals.get("r", 0) or 0
    k_const = math.log(n_r + alpha * n_buckets) - math.log(n_t + alpha * n_buckets)
    model = tc.join(rc, "b", "full").select(
        "b",
        (
            F.log(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(alpha))
            - F.log(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(alpha))
        ).alias("lr"),
    )
    return model, k_const


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
    model, k_const = dsir_model(
        raw, target, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, id_col=id_col,
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


def save_dsir_model(
    raw: DataFrame,
    target: DataFrame,
    path: str,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fit and materialize the model as a parquet artifact: rows
    ``(b, lr)`` plus one metadata row ``(b = -1, lr = k_const)`` — a
    single self-contained file, no sidecar. The train/score split this
    enables is the production shape: fit once on a corpus snapshot,
    score any batch OR STREAM against the frozen artifact."""
    model, k_const = dsir_model(
        raw, target, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, id_col=id_col,
    )
    meta = model.sparkSession.createDataFrame(
        [(-1, float(k_const)), (-2, float(n_buckets))], "b int, lr double"
    )
    model.select(F.col("b").cast("int"), "lr").unionByName(meta).coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_dsir_model(spark, path: str):
    """-> (lr_by_bucket: list[float], k_const, n_buckets). The whole
    artifact is <= n_buckets + 2 rows — a driver-side literal by design
    (contrast the corpus-sized LM model, which stays distributed)."""
    rows = spark.read.parquet(path).collect()
    k_const = n_buckets = None
    by_b = {}
    for r in rows:
        if r["b"] == -1:
            k_const = r["lr"]
        elif r["b"] == -2:
            n_buckets = int(r["lr"])
        else:
            by_b[r["b"]] = r["lr"]
    if k_const is None or n_buckets is None:
        raise ValueError(f"dsir model at {path} is missing metadata rows")
    return [by_b.get(b, 0.0) for b in range(n_buckets)], k_const, n_buckets


def dsir_score_transform(
    lr_by_bucket: list,
    k_const: float,
    text_col: str = "text",
    out_feats: str = "n_feats",
    out_weight: str = "dsir_weight",
):
    """STREAMING-SAFE scorer: df -> df with (n_feats, dsir_weight) added.

    The model rides along as ONE ArrayType literal (n_buckets doubles)
    and the per-doc weight is a higher-order-function fold over the
    row's own feature array — no join, no aggregation, no state, no
    Python: a stateless projection that Structured Streaming runs
    per-micro-batch with zero shuffle, and that at 100 TB scales as a
    pure map over the stream. Exactly the formula of
    :func:`dsir_weights` (equality is test-enforced)."""
    n_buckets = len(lr_by_bucket)
    lr_arr = F.lit([float(x) for x in lr_by_bucket])

    def t(df: DataFrame) -> DataFrame:
        toks = tokens(F.col(text_col))
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
        score = F.aggregate(
            F.col("__f"),
            F.lit(0.0),
            lambda acc, f: acc
            + F.element_at(
                lr_arr, (F.pmod(md5_60bit(f), F.lit(n_buckets)) + 1).cast("int")
            ),
        )
        return (
            df.withColumn("__t", toks)
            .withColumn("__f", feats)
            .withColumn(out_feats, F.size("__f").cast("long"))
            .withColumn(
                out_weight,
                F.when(
                    F.col(out_feats) > 0,
                    F.round(score + F.col(out_feats) * F.lit(k_const), 4),
                ),
            )
            .drop("__t", "__f")
        )

    return t
