"""Foreign-table scan: load an external database query result as a
DataFrame, sized and guarded for use as a broadcast dimension.

This is the Spark-first shape of the reference's ``sql`` processor with
``result_codec: json_array`` (lib/processor/sql.go:74-89,259): instead of
re-running the query per message batch and splicing rows into the stream,
the result set is loaded ONCE and joined — broadcast when small, shuffled
when not. On a real cluster the same role is played by ``spark.read.jdbc``
(predicate-pushdown-capable, partitioned reads); this helper is the
driver-side DBAPI variant for dimension-sized results and for environments
without a JDBC driver jar (this sandbox tests it against stdlib sqlite).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


DEFAULT_MAX_ROWS = 5_000_000  # ~hundreds of MB of broadcast at typical dim width


def _dbapi_connect(driver: str, dsn: str):
    if driver == "sqlite":
        import sqlite3

        return sqlite3.connect(dsn)
    if driver == "mysql":  # pragma: no cover - driver not bundled here
        import MySQLdb  # type: ignore

        return MySQLdb.connect(dsn)
    if driver == "postgres":  # pragma: no cover - driver not bundled here
        import psycopg2  # type: ignore

        return psycopg2.connect(dsn)
    raise ValueError(f"unsupported driver: {driver}")


def foreign_table(
    spark: SparkSession,
    driver: str,
    dsn: str,
    query: str,
    args: Sequence[Any] = (),
    schema: Optional[str] = None,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> DataFrame:
    """Run *query* against the foreign database and return the result as a
    DataFrame.

    The fetch is driver-side by design — a dimension load, not a data
    scan — so it is budget-guarded: more than ``max_rows`` rows raises
    instead of silently materializing a fact table on the driver (the same
    pre-probe discipline as ``streaming.asof``'s dimension loader). For
    genuinely large foreign tables use ``spark.read.jdbc`` with a
    partition column, which keeps the scan on the executors.

    ``schema`` (DDL string) pins column types; without it, types are
    inferred by Spark from the fetched values (sqlite in particular is
    dynamically typed, so pinning is recommended for empty-result
    stability).
    """
    conn = _dbapi_connect(driver, dsn)
    try:
        cur = conn.cursor()
        try:
            cur.execute(query, tuple(args))
            names = [d[0] for d in (cur.description or [])]
            rows = cur.fetchmany(max_rows + 1)
            if len(rows) > max_rows:
                raise ValueError(
                    f"foreign_table: query returned more than max_rows="
                    f"{max_rows} rows; use spark.read.jdbc with a partition "
                    "column for fact-sized scans"
                )
        finally:
            cur.close()
    finally:
        conn.close()
    data = [tuple(r) for r in rows]
    if schema is not None:
        return spark.createDataFrame(data, schema)
    if not data:
        raise ValueError(
            "foreign_table: empty result and no schema given — pass a DDL "
            "schema so the frame has stable types"
        )
    return spark.createDataFrame(data, names)
