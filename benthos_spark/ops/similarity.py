"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, O(Q x N) — fine when Q is small
  or N fits a broadcast; every arithmetic op is a Catalyst higher-order
  function (zip_with/aggregate), no Python.
- LSH-bucketed (sign-random-projection) variant: the scale path — candidates
  share a hyperplane-sign bucket, exact re-rank within bucket only.

Determinism: projections are seeded hash functions of the dimension index,
not RNG state, so results replay identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b, dim=None):
    if dim:
        # static unroll: element_at with literal indices stays inside
        # whole-stage codegen; zip_with/aggregate lambdas are interpreted
        # per element (measured ~10x slower)
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            out = out + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a, dim=None):
    if dim:
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            v = F.element_at(a, i).cast("double")
            out = out + v * v
        return F.sqrt(out)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a, b, dim=None):
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold (exact; for the oracle-checked
    baseline — the LSH variant bounds candidates at scale)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.round(cosine_col(F.col("va"), F.col("vb"), dim), 4)
    return pairs.withColumn("cos", cos).filter(F.col("cos") >= threshold).select(
        "id_a", "id_b", "cos"
    )


def ann_topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query row. The query side is small
    by construction -> broadcast it; rank key is (rounded cos desc, id asc)
    so ordering is reproducible across engines."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    joined = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
    scored = joined.withColumn("cos", F.round(cosine_col(F.col("qv"), F.col("nv"), dim), 4))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def srp_bucket(vec_col, n_planes: int = 8, seed: int = 42):
    """Sign-random-projection bucket id: plane p's weight for dim d is a
    deterministic hash-derived value in [-1,1); bucket bit p = sign of the
    projection. Pure Catalyst (no RNG, no UDF)."""
    def weight(p, d):
        h = F.xxhash64(F.lit(seed), F.lit(p), d)
        return (F.pmod(h, F.lit(2001)).cast("double") - 1000.0) / 1000.0

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda x, d: x.cast("double") * weight(p, d),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: candidates = rows in the query's SRP bucket, exact
    cosine re-rank within. Recall < 1 by design; the 100 TB plan shape —
    the join is an equi-join on bucket, never a cross product."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        srp_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    c = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("nv"),
        srp_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    joined = c.join(F.broadcast(q), "bucket").filter(F.col("q_id") != F.col("n_id"))
    scored = joined.withColumn("cos", F.round(cosine_col(F.col("qv"), F.col("nv"), dim), 4))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )
