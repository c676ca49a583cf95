"""Iterative graph ops for dedup clustering.

Near-dup detection yields candidate PAIRS; production dedup needs CLUSTERS
(keep one doc per connected component of the near-dup graph). This is the
canonical iterative Spark algorithm: min-label propagation to fixpoint.

Scale shape: each iteration is one shuffle (edges join labels, hash
partitioned on the join key); iterations = graph diameter (near-dup
components are shallow — dozens of hops at worst). ``localCheckpoint``
truncates the lineage every iteration so plans don't grow unboundedly.
No driver-side state beyond the per-iteration convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = min vertex
    id reachable. Deterministic for any edge order."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        e.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # every vertex proposes its component to its neighbours
        msgs = (
            e.join(labels.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(msgs, "id", "left")
            .withColumn("new_comp", F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")))
            .select("id", F.col("new_comp").alias("comp"), (F.col("new_comp") != F.col("comp")).alias("chg"))
        ).localCheckpoint()
        changed = new_labels.filter("chg").count()
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    e.unpersist()
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster near-dup candidate pairs and pick the keeper (min id) per
    cluster: (doc_id, cluster_id, is_keeper). Docs not in any pair are their
    own singleton cluster."""
    comp = connected_components(pairs, src=src, dst=dst)
    out = (
        docs.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .withColumn("cluster_id", F.coalesce("comp", F.col("id")))
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            (F.col("id") == F.col("cluster_id")).alias("is_keeper"),
        )
    )
    return out
