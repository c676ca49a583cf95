"""Cross-document exact dedup at sub-document granularity — the
RefinedWeb / Dolma "paragraph dedup" step that REWRITES documents by
removing every paragraph (or line / sentence) whose text already appeared
at a strictly earlier position in the corpus, keeping only the first
occurrence. Distinct from ops/textstats.duplicate_line_stats, which only
ANNOTATES per-doc shared-line counts.

100 TB shape: posexplode -> one hash aggregation keyed on the unit md5
(winner = min packed (doc_id, pos) — plain ``min`` on a LONG, no
min_by/SortAggregate), one equi-join back on the md5, one per-doc
reassembly aggregation. Only (md5, packed-long) pairs and the unit
strings themselves shuffle; no driver state, no quadratic step.

Determinism: the winner is the minimum (doc_id, pos) — set semantics, not
arrival order, so reruns and different partitionings agree. The packed
LONG gives pos 20 bits (>1M units in ONE document would alias; web pages
are orders of magnitude below that).

Cross-engine exactness: unit identity is md5(trim(unit)) — md5 is the one
digest Spark and DuckDB share bit-for-bit — and reassembly joins the RAW
(untrimmed) kept units with the unit's canonical separator, so a document
with nothing dropped reassembles byte-identically for 'line'/'sentence'
units ('paragraph' canonicalizes any \\n{2,} run to exactly one blank
line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# unit -> (split regex — Java and RE2 compatible, rejoin separator)
UNITS = {
    "paragraph": ("\n{2,}", "\n\n"),
    "line": ("\n", "\n"),
    "sentence": ("\\.", "."),
}

_PACK = 1 << 20  # pos bits in the packed (doc_id, pos) winner key


def unit_dedup(
    docs: DataFrame,
    unit: str = "paragraph",
    min_len: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc result of corpus-wide first-seen unit dedup: (id, n_units,
    n_kept, cleaned_text). Units shorter than ``min_len`` after trimming
    (and empty units) never participate — they are always kept, preserving
    document structure."""
    pat, sep = UNITS[unit]
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(F.col(id_col), F.split(t, pat).alias("__units"))
    ex = base.select(
        F.col(id_col),
        F.posexplode("__units").alias("pos", "unit"),
    ).select(
        F.col(id_col),
        "pos",
        "unit",
        F.trim(F.col("unit")).alias("__tu"),
        (F.col(id_col) * _PACK + F.col("pos")).alias("__packed"),
    )
    ex = ex.withColumn(
        "__h",
        F.when(F.length("__tu") >= min_len, F.md5(F.col("__tu"))),
    )
    winners = (
        ex.filter(F.col("__h").isNotNull())
        .groupBy("__h")
        .agg(F.min("__packed").alias("__wp"))
    )
    kept = ex.join(winners, "__h", "left").filter(
        F.col("__h").isNull() | (F.col("__packed") == F.col("__wp"))
    )
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit"))),
                lambda s: s["unit"],
            ),
            sep,
        ).alias("cleaned_text"),
    )
    return (
        base.select(F.col(id_col), F.size("__units").cast("long").alias("n_units"))
        .join(reassembled, id_col, "left")
        .select(
            F.col(id_col),
            "n_units",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )
