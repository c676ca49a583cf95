"""Spherical k-means over an embedding column + SemDeDup-style semantic
deduplication (cluster first, dedup within clusters).

The public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication"): k-means the corpus
embeddings, then within each cluster flag documents whose cosine
similarity to an earlier document exceeds a threshold. Clustering bounds
the quadratic pair search to cells — the knob that makes embedding dedup
tractable at corpus scale (the paper runs 50k clusters over LAION).

100 TB shape
------------
- Lloyd's iterations keep ONLY k x dim driver-side state (the model, same
  as any ML fit). Per iteration: assignment is a shuffle-free projection
  (``array_max`` over cosine-to-centroid structs, exactly the IVF
  machinery of ops/similarity.py), and the centroid update is ONE
  (cid, pos)-keyed aggregation whose partial (map-side) combine reduces
  the shuffle to k x dim rows per partition, independent of corpus size.
- The dedup pass is an equi-join on the cell id: per-cell cost is
  quadratic in CELL size, and k is chosen so cells stay bounded
  (k ~ n / desired_cell_size). No global pair join ever forms.

Determinism / oracle parity: init is the md5-derived deterministic
codebook (:func:`ops.similarity.ivf_centroids`), assignment scores and
updated centroid coordinates round to 6 decimals, exact-cosine dedup
scores to 4 — the same cross-engine stabilization every embedding oracle
here uses, so DuckDB replays the full fit bit-for-bit.

Reference parity note: the reference engine has no clustering processor;
this extends the graft's LLM-pipeline dedup family (exact, MinHash-LSH,
SimHash, SRP-LSH, spans) with its semantic member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _cos_pd, _ivf_score_structs, ivf_centroids


def assign_cells(
    emb: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cell) with cell = nearest centroid by rounded cosine,
    ties to the lowest cell id — one shuffle-free projection."""
    return emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.array_max(_ivf_score_structs(F.col(vec_col), centroids))
        .getField("cid")
        .alias("cell"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    init: list | None = None,
) -> list:
    """Lloyd's spherical k-means; returns the k x dim centroid list.

    Centroids are NOT re-normalized after the mean update: cosine
    assignment is scale-invariant, so normalization would only add a
    floating-point divergence surface against the SQL oracle. Empty cells
    keep their previous centroid."""
    cents = [list(c) for c in (init or ivf_centroids(dim, k, seed))]
    for _ in range(iters):
        assigned = assign_cells(emb, cents, id_col=id_col, vec_col=vec_col)
        # F.round (HALF_UP) not Python round (half-even): the SQL oracle's
        # round() is half-away-from-zero, so the rounding must happen
        # engine-side to share the rule
        rows = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
            .collect()
        )
        by_cell: dict = {}
        for r in rows:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for cid, coords in by_cell.items():
            cents[cid] = [coords[p] for p in range(dim)]
    return cents


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    centroids: list | None = None,
) -> DataFrame:
    """Per-document semantic-dedup verdicts: ``(id, cell, anchor,
    is_keeper)`` where ``anchor`` is the smallest-id earlier document in
    the same k-means cell with exact cosine >= ``threshold`` (NULL for
    keepers) — the same greedy min-id keeper rule as the MinHash/SimHash
    family, so downstream policy composes uniformly."""
    from .similarity import _bucket_candidate_kernel

    cents = centroids if centroids is not None else kmeans_fit(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim, seed=seed
    )
    cells = assign_cells(emb, cents, id_col=id_col, vec_col=vec_col)
    # r6 optimization (guide §2.3/§4.2): the per-cell quadratic pair space
    # used to materialize through an equi-join on cell (O(sum cell^2) rows,
    # each through an Arrow cosine). It now runs as per-cell BLAS inside
    # the shared bucket-candidate kernel (conservative 1e-3 margin below
    # the threshold); only near-threshold pairs become rows, and the
    # authoritative score is STILL the identical _cos_pd + F.round below —
    # anchors are byte-for-byte the pre-optimization ones (A/B-tested).
    cand = (
        cells.select(
            F.col("cell").alias("band"),  # reuse the kernel's group shape
            F.lit(0).alias("bucket"),
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
        )
        .groupBy("band", "bucket")
        .applyInPandas(
            _bucket_candidate_kernel(threshold - 1e-3), "id_a long, id_b long"
        )
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    partners = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(_cos_pd()(F.col("__va"), F.col("__vb")), 4))
        .filter(F.col("cos") >= threshold)
        .groupBy(F.col("id_b").alias("__ib"))
        .agg(F.min("id_a").alias("anchor"))
    )
    return (
        cells.join(partners, cells[id_col] == partners["__ib"], "left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.col("anchor"),
            F.col("anchor").isNull().alias("is_keeper"),
        )
    )
