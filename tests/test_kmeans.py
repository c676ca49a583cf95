"""Spherical k-means + SemDeDup-style semantic dedup (ops/kmeans.py)."""

import math

import pytest


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _cluster_data(spark, dim=8):
    """Two tight direction-clusters plus one outlier: ids 0-2 point along
    +e0 (with small jitter on e1), ids 10-12 along +e1, id 99 along -e0."""
    def v(main, jitter_axis, jitter):
        base = [0.0] * dim
        base[main] = 1.0
        base[jitter_axis] = jitter
        return base

    rows = (
        [(i, v(0, 1, 0.01 * i)) for i in range(3)]
        + [(10 + i, v(1, 2, 0.01 * i)) for i in range(3)]
        + [(99, [-1.0] + [0.0] * (dim - 1))]
    )
    return _vecs(spark, rows)


@pytest.mark.spark
class TestKmeans:
    def test_fit_is_deterministic(self, spark):
        from benthos_spark.ops.kmeans import kmeans_fit

        emb = _cluster_data(spark)
        c1 = kmeans_fit(emb, k=4, iters=2, dim=8)
        c2 = kmeans_fit(emb, k=4, iters=2, dim=8)
        assert c1 == c2

    def test_assignment_matches_bruteforce(self, spark):
        from benthos_spark.ops.kmeans import assign_cells, kmeans_fit

        emb = _cluster_data(spark)
        cents = kmeans_fit(emb, k=4, iters=2, dim=8)
        got = {
            r["vec_id"]: r["cell"] for r in assign_cells(emb, cents).collect()
        }
        for row in emb.collect():
            v = row["embedding"]
            nv = math.sqrt(sum(x * x for x in v))
            best = max(
                range(len(cents)),
                key=lambda i: (
                    round(
                        sum(a * b for a, b in zip(v, cents[i]))
                        / (nv * math.sqrt(sum(x * x for x in cents[i]))),
                        6,
                    ),
                    -i,
                ),
            )
            assert got[row["vec_id"]] == best

    def test_clusters_separate_directions(self, spark):
        from benthos_spark.ops.kmeans import assign_cells, kmeans_fit

        emb = _cluster_data(spark)
        cents = kmeans_fit(emb, k=4, iters=3, dim=8)
        cells = {
            r["vec_id"]: r["cell"] for r in assign_cells(emb, cents).collect()
        }
        assert len({cells[0], cells[1], cells[2]}) == 1
        assert len({cells[10], cells[11], cells[12]}) == 1
        # opposite-direction outlier never lands with the +e0 cluster
        assert cells[99] != cells[0]

    def test_empty_cells_keep_previous_centroid(self, spark):
        from benthos_spark.ops.kmeans import kmeans_fit
        from benthos_spark.ops.similarity import ivf_centroids

        emb = _vecs(spark, [(0, [1.0, 0.0]), (1, [1.0, 0.01])])
        init = ivf_centroids(2, 4, seed=7)
        cents = kmeans_fit(emb, k=4, iters=1, dim=2, init=init)
        untouched = [i for i in range(4) if cents[i] == list(init[i])]
        assert len(untouched) >= 2  # 2 docs can populate at most 2 cells


@pytest.mark.spark
class TestSemanticDedup:
    def test_within_cluster_min_id_anchor(self, spark):
        from benthos_spark.ops.kmeans import semantic_dedup

        out = {
            r["vec_id"]: r.asDict()
            for r in semantic_dedup(
                _cluster_data(spark), k=4, iters=3, threshold=0.9, dim=8
            ).collect()
        }
        assert out[0]["is_keeper"] and out[0]["anchor"] is None
        assert not out[1]["is_keeper"] and out[1]["anchor"] == 0
        assert not out[2]["is_keeper"] and out[2]["anchor"] == 0
        assert out[10]["is_keeper"]
        assert not out[11]["is_keeper"] and out[11]["anchor"] == 10
        assert out[99]["is_keeper"]  # alone in its cell

    def test_threshold_gates_dedup(self, spark):
        from benthos_spark.ops.kmeans import semantic_dedup

        out = semantic_dedup(
            _cluster_data(spark), k=4, iters=3, threshold=1.1, dim=8
        ).collect()
        assert all(r["is_keeper"] for r in out)
