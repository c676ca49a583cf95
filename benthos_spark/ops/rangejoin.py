"""Range (interval-containment) join — bucketed, no cartesian product.

Join points to the intervals that contain them (``start <= t <= end``,
inclusive). Spark has no interval-join operator; the naive theta-join is a
nested loop over every (point, interval) pair. The scalable composition
buckets the axis:

    point    -> bucket  floor(t / W)
    interval -> explode sequence(floor(start/W), floor(end/W))
    equi-join on bucket (+ any extra keys) -> exact between filter

A point lives in exactly one bucket and an interval appears at most once
per bucket, so each matching pair joins exactly once — no dedup pass.
Cost is |points| + |intervals| * (avg_len/W + 1) shuffled rows on an
equi-key Catalyst can hash-partition; pick ``bucket_width`` near the
typical interval length to keep the expansion factor ~2. Long intervals
fan out proportionally (that's the usual skew lever: widen W or split the
tail). No nested loop at any size.

Works on any integer axis (epoch micros/seconds, sequence numbers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "t",
    start_col: str = "t_start",
    end_col: str = "t_end",
    bucket_width: int = 3600,
    keys: tuple = (),
) -> DataFrame:
    """All columns of both inputs for every (point, interval) pair with
    ``start <= point <= end`` (and equal ``keys``, if given)."""
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn("_b", F.floor(F.col(point_col) / w).cast("long"))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    on = ["_b", *keys]
    out = p.join(i, on=on, how="inner").where(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return out.drop("_b")
