"""Token-budget source mixing — the Dolma/Pile-style "mixer" step that
selects documents per source so each source contributes its configured
weight share of a total token budget (data mixing for LLM training runs).

Semantics: every document gets a deterministic priority (md5 of
``salt|id`` — set-semantic, so reruns, repartitions and engines agree);
within each source, documents are admitted in priority order while the
source's running token count stays under its quota
``quota_s = budget * w_s / Σ w``. A document is kept iff it STARTS below
the quota (the classic take-until-budget rule: the boundary doc is
admitted, so every non-empty quota yields at least one doc).

100 TB shape: one tiny per-source rollup (|sources| rows — localCheckpoint
+ two 1-value driver actions for the Σtokens / Σw scalars, the
ops/lmscore.py pattern), then ONE keyed window sort per source partition
for the running sum (the ops/sessionize.py shape) and a broadcast join of
the quota table. Token text never shuffles — only (id, group, n_tokens,
priority) longs. Hot sources are the skew concern: the window sorts one
partition per source, so at extreme skew pre-salt the group (the salted
window-agg pattern in streaming/windows.py) — documented, not silently
applied, because admission order must stay global per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textprep import md5_60bit, tokens


def mix_sources(
    docs: DataFrame,
    frac: float = 0.5,
    weights: dict | None = None,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """(id, group, n_tokens, priority, cum_tokens, quota, kept) per doc.

    ``weights``: explicit {source: weight} (unlisted sources get weight 0 —
    excluded, the Dolma drop rule). Without it, every source gets
    ``1 + md5_60(source) % 5`` — a deterministic, cross-engine-exact
    stand-in used by the driver row. ``frac`` sets the total budget as a
    fraction of corpus tokens."""
    g = F.coalesce(F.col(group_col).cast("string"), F.lit(""))
    d = docs.select(
        F.col(id_col),
        g.alias("group"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        md5_60bit(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))).alias(
            "priority"
        ),
    )
    per_group = (
        d.groupBy("group")
        .agg(F.sum("n_tokens").alias("g_tokens"))
        .localCheckpoint(eager=True)
    )
    if weights is None:
        w = (F.lit(1) + F.pmod(md5_60bit(F.col("group")), F.lit(5))).cast("double")
    else:
        w = F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in weights.items() for x in kv]),
                F.col("group"),
            ).cast("double"),
            F.lit(0.0),
        )
    gw = per_group.select("group", w.alias("w"))
    # two 1-value actions on the tiny checkpointed rollup (lmscore pattern)
    total_tokens = per_group.agg(F.sum("g_tokens")).collect()[0][0] or 0
    sum_w = gw.agg(F.sum("w")).collect()[0][0] or 0.0
    budget = frac * total_tokens
    # quota is rounded to 4 dp BEFORE the admission gate so both engines
    # compare identical values (the gopher rounding convention)
    quotas = gw.select(
        "group",
        F.round(
            F.lit(budget) * F.col("w") / F.lit(sum_w) if sum_w else F.lit(0.0),
            4,
        ).alias("quota"),
    )
    win = Window.partitionBy("group").orderBy("priority", id_col)
    ranked = d.withColumn("cum_tokens", F.sum("n_tokens").over(win))
    return (
        ranked.join(F.broadcast(quotas), "group")
        .select(
            F.col(id_col),
            F.col("group"),
            "n_tokens",
            "priority",
            "cum_tokens",
            "quota",
            ((F.col("cum_tokens") - F.col("n_tokens")) < F.col("quota")).alias(
                "kept"
            ),
        )
    )
