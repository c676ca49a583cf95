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

import pandas as pd
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


def _cos_pd():
    """Arrow-batched cosine over two vector columns (numpy, one BLAS pass
    per batch). This is the pair-scoring workhorse: the dim-unrolled
    Catalyst expression is O(dim) plan nodes — at dim 64 it costs tens of
    seconds of driver codegen+JIT per query and sits at janino's method-size
    edge; the HOF form is interpreted per element. The batched numpy kernel
    has a constant-size plan and SIMD throughput at any dim (measured
    fastest of the three at dim>=32)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        A = np.stack([np.asarray(x, dtype=np.float64) for x in a.values])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in b.values])
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return cos


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold (exact; the explicitly-named
    quadratic baseline — neardup_lsh_rerank is the scale-path default).
    Scoring via the Arrow-batched numpy cosine (see _cos_pd)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.round(_cos_pd()(F.col("va"), F.col("vb")), 4)
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
    scored = joined.withColumn("cos", F.round(_cos_pd()(F.col("qv"), F.col("nv")), 4))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def srp_planes(dim: int, n_planes: int, seed: int = 42) -> list:
    """Deterministic sign-random-projection hyperplanes: weight (p, d) is an
    md5-derived constant in [-1, 1). Computed driver-side in plain Python
    (hashlib), embedded as plan literals — which makes the bucketing exactly
    reproducible in ANY engine (the DuckDB oracle embeds the same literals),
    so LSH results are value-hash-checkable, not just rows-only."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            row.append((int(h[:15], 16) % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def srp_bucket(vec_col, dim: int, n_planes: int = 8, seed: int = 42):
    """SRP bucket id over a static-dim vector, pure Catalyst. Fine for ONE
    small bucket (n_planes x dim unrolled terms); for banded bucketing use
    srp_band_buckets — unrolling bands x planes x dim terms into one
    expression breaks whole-stage codegen's method-size limit."""
    planes = srp_planes(dim, n_planes, seed)
    out = F.lit(0)
    for p in range(n_planes):
        proj = F.lit(0.0)
        for d in range(dim):
            w = planes[p][d]
            if w:
                proj = proj + F.element_at(vec_col, d + 1).cast("double") * F.lit(w)
        out = out + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def srp_band_buckets(
    df: DataFrame, vec_col: str, dim: int, bands: int, planes_per_band: int, seed: int = 42
) -> DataFrame:
    """(row..., band, bucket) — one row per band; candidates = equal
    (band, bucket). More bands raise recall, more planes per band raise
    precision (standard banding trade-off).

    All bands*planes projections land in ONE Arrow-vectorized pandas UDF as
    a single numpy matmul (rows x dim) @ (dim x planes) — the batch-level
    BLAS path; no per-row Python, no 4096-term Catalyst expression (which
    fails janino's method-size limit and falls back to interpreted eval,
    measured orders slower)."""
    import numpy as np  # noqa: F401 — checked importable at build time
    from pyspark.sql.functions import pandas_udf

    all_planes = []
    for b in range(bands):
        all_planes.extend(srp_planes(dim, planes_per_band, seed=seed * 1000 + b))
    weights = [list(r) for r in all_planes]  # (bands*planes) x dim, plain lists

    @pandas_udf("array<int>")
    def bucket_vec(v: pd.Series) -> pd.Series:
        import numpy as np

        W = np.asarray(weights, dtype=np.float64)  # (B*P, dim)
        M = np.stack([np.asarray(x, dtype=np.float64) for x in v.values])
        signs = (M @ W.T) >= 0.0  # (n, B*P)
        powers = 1 << np.arange(planes_per_band)
        buckets = signs.reshape(len(M), bands, planes_per_band) @ powers  # (n, B)
        return pd.Series([row.astype("int32").tolist() for row in buckets])

    out = df.withColumn("__buckets", bucket_vec(F.col(vec_col)))
    return (
        out.select("*", F.posexplode("__buckets").alias("band", "bucket"))
        .drop("__buckets")
    )


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bands: int = 32,
    planes_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
    seed: int = 42,
) -> DataFrame:
    """Banded SRP-LSH ANN: candidates = rows sharing any (band, bucket) with
    the query, exact cosine re-rank within the candidate set. Recall < 1 by
    design (tested >= 0.9 at the default parameters against the brute-force
    oracle); the 100 TB plan shape — the join is an equi-join on
    (band, bucket), never a cross product."""
    from pyspark.sql import Window

    q = srp_band_buckets(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")),
        "qv", dim, bands, planes_per_band, seed,
    )
    c = srp_band_buckets(
        emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv")),
        "nv", dim, bands, planes_per_band, seed,
    )
    cand = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "qv", "n_id", "nv")
        .distinct()
    )
    scored = cand.withColumn("cos", F.round(_cos_pd()(F.col("qv"), F.col("nv")), 4))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def ivf_centroids(dim: int, n_centroids: int = 16, seed: int = 7) -> list:
    """Deterministic random codebook for IVF: centroid weight (c, d) is an
    md5-derived constant in [-1, 1) — the same literal-embedding trick as
    :func:`srp_planes`, so the DuckDB oracle reproduces the assignment
    bit-for-bit and IVF results are value-hash-checkable. A k-means-trained
    codebook (tighter cells, better recall per probe) plugs in via
    ``ann_topk_ivf(centroids=...)``; the quantizer is deliberately
    pluggable, the PLAN SHAPE is what this op pins down."""
    import hashlib

    cents = []
    for c in range(n_centroids):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"ivf|{seed}|{c}|{d}".encode()).hexdigest()
            row.append((int(h[:15], 16) % 2001 - 1000) / 1000.0)
        cents.append(row)
    return cents


def _ivf_score_structs_column(vec, cents):
    """Column-tree form of :func:`_ivf_score_structs` (the original
    construction) — kept as the fallback for callers that pass a complex
    Column expression rather than a plain column name."""
    import math

    nv = _norm(vec)
    outs = []
    for i, c in enumerate(cents):
        arr = F.array(*[F.lit(x) for x in c])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nc = math.sqrt(sum(x * x for x in c))
        score = F.round(dot / (nv * F.lit(nc)), 6)
        outs.append(
            F.struct(score.alias("score"), F.lit(-i).alias("mcid"), F.lit(i).alias("cid"))
        )
    return F.array(*outs)


def _ivf_score_structs_sql(vec_name: str, cents) -> str:
    """SQL text of the SAME expression tree _ivf_score_structs_column
    builds: identical HOF fold shapes (zip_with + sequential aggregate,
    transform + aggregate for the norm), identical literals (repr() strings
    round-trip doubles exactly through the SQL parser), identical round-6.
    Emitting one expr string instead of ~2 * k * dim py4j Column calls cuts
    the DataFrame CONSTRUCTION cost of every IVF/k-means query from
    seconds to milliseconds (r6 profile: q_ann_ivf spent 4-6 s per call
    building this tree through py4j before a single task ran — guide §1
    'empirical': the time was driver-side, not in any stage)."""
    import math

    norm_sql = (
        f"sqrt(aggregate(transform({vec_name},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
    )
    parts = []
    for i, c in enumerate(cents):
        arr = ", ".join(f"{w!r}D" for w in c)
        dot = (
            f"aggregate(zip_with({vec_name}, array({arr}),"
            " (x, y) -> CAST(x AS DOUBLE) * y),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        nc = repr(math.sqrt(sum(x * x for x in c)))
        score = f"round({dot} / ({norm_sql} * {nc}D), 6)"
        parts.append(
            f"named_struct('score', {score}, 'mcid', {-i}, 'cid', {i})"
        )
    return "array(" + ", ".join(parts) + ")"


_IDENT_RE = None


def _ivf_score_structs(vec, cents):
    """Array of struct(score, mcid, cid) per centroid: score = cosine to the
    centroid rounded to 6 decimals (both engines round, so ulp-order noise
    cannot flip a comparison), mcid = -cid so struct-max tie-breaks to the
    LOWEST cid exactly like the oracle's ORDER BY score DESC, cid ASC.

    ``vec`` may be a plain column name (str) or a Column; simple named
    columns take the F.expr fast path (one py4j call instead of thousands —
    value-identical, equality test-pinned), anything else falls back to the
    original Column-tree construction."""
    global _IDENT_RE
    if _IDENT_RE is None:
        import re

        _IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    name = None
    if isinstance(vec, str):
        name = vec
    else:
        try:  # unresolved attribute prints as its bare name
            s = str(vec._jc.toString())  # noqa: SLF001
            if _IDENT_RE.match(s):
                name = s
        except Exception:  # noqa: BLE001 — fall back to Column construction
            name = None
    if name is None:
        return _ivf_score_structs_column(vec, cents)
    return F.expr(_ivf_score_structs_sql(name, cents))


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    centroids: list | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: every vector is assigned to its
    nearest-centroid cell in ONE shuffle-free projection (``array_max``
    over (score, -cid) structs — no per-row window), queries probe their
    ``nprobe`` best cells, and candidates = cell-sharing rows get an exact
    cosine re-rank. This is the third scale regime next to brute force
    (small Q) and SRP-LSH (near-dup radii): at 10^12 vectors the cell
    assignment is a pure map, the probe join is an equi-join on cid, and
    the re-rank touches ~nprobe/n_centroids of the data. Recall depends on
    the codebook; the deterministic random codebook keeps the oracle
    replayable (recall floor tested against brute force separately)."""
    from pyspark.sql import Window

    cents = centroids if centroids is not None else ivf_centroids(dim, n_centroids, seed)
    # nprobe > cells would slice(-nprobe) past the array start, which in
    # Spark yields [] — every query would silently get ZERO candidates.
    # Probing every cell (= brute force) is the meaningful reading.
    nprobe = min(int(nprobe), len(cents))
    scores = lambda v: _ivf_score_structs(v, cents)  # noqa: E731

    data = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("nv"),
        F.array_max(scores(F.col(vec_col))).getField("cid").alias("cid"),
    )
    # queries: top-nprobe cells, shuffle-free — ascending struct sort on
    # (score, -cid) then slice from the END: the last nprobe elements are
    # the highest scores, and within a score tie the larger -cid (= lower
    # cid) sits later, so the cut prefers low cids exactly like the
    # oracle's ORDER BY score DESC, cid ASC
    qscored = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        F.slice(
            F.array_sort(scores(F.col(vec_col))), -nprobe, nprobe
        ).alias("probes"),
    )
    q = qscored.select("q_id", "qv", F.explode("probes").alias("p")).select(
        "q_id", "qv", F.col("p.cid").alias("cid")
    )
    cand = (
        data.join(F.broadcast(q), "cid")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "qv", "n_id", "nv")
        .distinct()
    )
    scored = cand.withColumn("cos", F.round(_cos_pd()(F.col("qv"), F.col("nv")), 4))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def derive_banding(
    threshold: float,
    target_recall: float = 0.95,
    max_bands: int = 32,
    max_total_planes: int = 288,
    min_planes: int = 2,
) -> tuple[int, int]:
    """(bands, planes_per_band) derived from the cosine threshold — the
    r4 verdict ask: banding must follow the regime, not ship one tuning
    for every threshold.

    SRP math (Charikar 2002): a pair at angle theta collides on one plane
    with p = 1 - theta/pi, on a band of P planes with p^P, and across B
    bands with recall 1 - (1 - p^P)^B. Pick the LARGEST P (precision:
    random-pair pass rate ~ B * 0.5^P) whose required
    B = ceil(ln(1-target)/ln(1-p^P)) fits max_bands and the compute cap
    B*P <= max_total_planes (bucketing cost is one (rows x dim) @
    (dim x B*P) matmul).

    Derived points: threshold 0.35 (theta ~ 69 deg) -> (20, 4) — loose
    banding, because full recall at that angle IS expensive; threshold
    0.95 (theta ~ 18 deg) -> (15, 16) — hard pruning (random-pair rate
    ~ 15 * 2^-16 ~ 2e-4) at ~0.95 recall."""
    import math

    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1) for derived banding")
    p = 1.0 - math.acos(threshold) / math.pi
    best = None
    P = min_planes
    while True:
        band_p = p**P
        if band_p >= 1.0:  # degenerate (threshold ~ 1)
            P += 1
            continue
        need = math.log(1.0 - target_recall) / math.log(1.0 - band_p)
        B = max(1, math.ceil(need))
        if B > max_bands or B * P > max_total_planes:
            break
        best = (B, P)
        P += 1
    if best is None:
        raise ValueError(
            f"no banding meets recall {target_recall} at threshold "
            f"{threshold} within max_bands={max_bands}"
        )
    return best


def _bucket_candidate_kernel(margin_threshold: float, block: int = 8192):
    """applyInPandas kernel over ONE (band, bucket) group: emit candidate
    id pairs whose normalized-matmul cosine clears ``margin_threshold``
    (the real threshold minus a safety margin). The authoritative score
    and threshold comparison happen OUTSIDE, through the same
    ``_cos_pd`` + ``F.round`` path the pair join always used, so this
    kernel only has to be a SUPERSET filter — a 1e-3 margin is ~10
    orders of magnitude wider than the worst-case float64 summation
    disagreement between the two cosine formulations over 64 terms.

    Why this exists (r6 optimization): the former plan materialized every
    bucket collision as a row through a self-join -> distinct -> two
    vector joins -> per-pair Arrow cosine. At 20k vectors / 32 bands
    that is ~4.1e8 candidate rows through three exchanges for a 4.2e5-row
    result. Here the quadratic part runs as per-bucket BLAS matmuls
    (O(m^2 * dim) flops, no row materialization) and only pairs already
    near the threshold ever become rows. Blocked at ``block`` rows so a
    hot bucket holds at most block^2 doubles of score matrix."""
    import numpy as np
    import pandas as pd  # noqa: F811

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        if n < 2:
            return empty
        ids = pdf["id"].to_numpy(dtype=np.int64)
        M = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"].values])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0.0] = np.nan  # zero vectors never pass (NaN compares false)
        Mn = M / norms[:, None]
        outs_a: list = []
        outs_b: list = []
        for i0 in range(0, n, block):
            A = Mn[i0 : i0 + block]
            for j0 in range(i0, n, block):
                C = A @ Mn[j0 : j0 + block].T
                ii, jj = np.nonzero(C >= margin_threshold)
                gi, gj = ii + i0, jj + j0
                keep = gi < gj  # each unordered pair once (diagonal blocks overlap)
                if not keep.any():
                    continue
                a_ids, b_ids = ids[gi[keep]], ids[gj[keep]]
                outs_a.append(np.minimum(a_ids, b_ids))
                outs_b.append(np.maximum(a_ids, b_ids))
        if not outs_a:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(outs_a), "id_b": np.concatenate(outs_b)}
        )

    return fn


def banded_candidate_pairs(
    emb: DataFrame,
    threshold: float,
    bands: int,
    planes_per_band: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
    seed: int = 42,
    margin: float = 1e-3,
) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs that share >= 1 (band, bucket)
    AND whose cosine is within ``margin`` of ``threshold`` — a provable
    superset of the pairs the exact re-rank keeps, at a fraction of the
    old self-join's row volume. One shuffle (the groupBy on (band,
    bucket) — the LSH bucketing key itself), then per-bucket BLAS."""
    b = srp_band_buckets(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "v", dim, bands, planes_per_band, seed,
    )
    cand = b.groupBy("band", "bucket").applyInPandas(
        _bucket_candidate_kernel(threshold - margin), "id_a long, id_b long"
    )
    return cand.distinct()


def neardup_lsh_rerank(
    emb: DataFrame,
    threshold: float = 0.35,
    bands: int | None = None,
    planes_per_band: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
    seed: int = 42,
) -> DataFrame:
    """The scale-path near-dup default: SRP-banded candidate pairs (equi-join
    on (band, bucket)) -> exact cosine re-rank -> threshold. Output shape
    matches embedding_neardup_pairs (id_a, id_b, cos) but the pair space is
    O(collisions), never O(n^2); the exact all-pairs op remains as the
    explicitly-named baseline.

    SELECTIVITY IS A FUNCTION OF THE THRESHOLD REGIME, so by default
    bands/planes_per_band are DERIVED from the threshold via
    :func:`derive_banding` (Charikar's (1 - theta/pi)^P collision
    probability, recall target 0.95): 0.35 -> (20, 4) — loose banding,
    because full recall at theta ~ 69 deg is inherently expensive (a high
    random-pair candidate rate is what that recall costs); 0.95 ->
    (15, 16) — hard pruning (~2e-4 random-pair rate) at ~full recall for
    true near-dups (tests/test_ops.py selectivity tests cover both
    regimes with the derived values). Explicit bands/planes_per_band
    override the derivation (the harness query pins 32x4 to match its
    DuckDB oracle's embedded plane literals)."""
    if bands is None or planes_per_band is None:
        d_bands, d_planes = derive_banding(threshold)
        bands = bands if bands is not None else d_bands
        planes_per_band = (
            planes_per_band if planes_per_band is not None else d_planes
        )
    # r6 optimization (guide §2.3/§4.2): the quadratic bucket-collision
    # space runs as per-bucket BLAS inside banded_candidate_pairs (a
    # conservative margin below the threshold), instead of materializing
    # every collision through self-join -> distinct -> vector joins ->
    # per-pair Arrow cosine. Only near-threshold pairs become rows; the
    # authoritative score is STILL the identical _cos_pd + F.round below,
    # so emitted values and the pass/fail comparison are byte-for-byte
    # the pre-optimization ones (equality A/B-tested at sf0.1 and sf1.0).
    cand = banded_candidate_pairs(
        emb, threshold, bands, planes_per_band,
        id_col=id_col, vec_col=vec_col, dim=dim, seed=seed,
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cand = cand.join(va, "id_a").join(vb, "id_b")
    cos = F.round(_cos_pd()(F.col("va"), F.col("vb")), 4)
    return (
        cand.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
