"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks,
composed from existing relational ops so Catalyst still owns the plan.

For each left row, attach the most recent right row with the same key and
``right.on <= left.on`` (inclusive). The classic implementations are a
range join (quadratic blowup per key) or a per-key sort-merge in Python;
this one is the scalable composition:

    union(left tagged 1, right tagged 0)
      -> window PARTITION BY key ORDER BY (on, tag)
           last(struct(right_cols..., on), ignorenulls)
             over rows unbounded preceding
      -> keep tag 1, unpack the struct

The carried columns ride in one struct so they all come from the same
matched right row (per-column windows would back-fill a NULL field from an
older row).

One shuffle total (the window's hash partition on the key — the same
shuffle a join would pay), no nested-loop, no per-key driver state; skewed
keys are handled by AQE the same way any keyed window is. Right rows sort
before left rows at equal timestamps, which is what makes the match
inclusive.

Ties: if the right side has duplicate (key, on) rows the carried value is
whichever lands last in the window order — pre-deduplicate the right side
when that matters (the oracle query does).

Oracle story: DuckDB ships a native ASOF JOIN, so the composed Spark plan
is value-checked against a genuinely independent implementation of the
semantics rather than a re-expression of the same formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: tuple = ("value",),
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: all left columns, plus ``prefix+c`` for each
    ``right_cols`` entry and ``prefix+on`` (the matched right timestamp),
    NULL where no right row precedes the left row."""
    rdt = dict(right.dtypes)
    ldt = dict(left.dtypes)
    lpay = [c for c in left.columns if c not in (by, on)]
    carried = [*right_cols, on]
    # All carried columns travel as ONE struct so they are guaranteed to come
    # from the same matched right row: independent per-column
    # last(ignorenulls) windows would back-fill a NULL field from an OLDER
    # right row, mixing columns across rows (DuckDB's native ASOF JOIN — and
    # any join — carries the matched row's NULL instead).
    struct_ddl = "struct<" + ",".join(
        f"`{prefix + c}`:{rdt[c]}" for c in carried
    ) + ">"
    l2 = left.select(
        by, on, F.lit(1).alias("_tag"), *lpay,
        F.lit(None).cast(struct_ddl).alias("_rstruct"),
    )
    r2 = right.select(
        by, on, F.lit(0).alias("_tag"),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in lpay],
        F.struct(
            *[F.col(c).alias(prefix + c) for c in carried]
        ).alias("_rstruct"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2)
    filled = u.select(
        by, on, "_tag", *lpay,
        F.last("_rstruct", ignorenulls=True).over(w).alias("_rstruct"),
    )
    return (
        filled.where(F.col("_tag") == 1)
        .select(
            by, on, *lpay,
            *[F.col("_rstruct").getField(prefix + c).alias(prefix + c)
              for c in carried],
        )
    )
