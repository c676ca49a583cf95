"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet tables;
compare schema (column names), row count, and order-insensitive values.

Round-2 lesson: the driver canonicalizes through *pandas* frames
(``fetchdf()`` on the DuckDB side), where DuckDB HUGEINT becomes float64 and
stringifies as ``"37.0"`` against Spark's ``"37"`` — an int-vs-float dtype
mismatch our old ``fetchall()`` + ``%.9g`` canon silently collapsed.  This
gate now goes through the same pandas path and asserts dtype-kind
compatibility per column, so an un-cast ``sum()`` oracle fails locally
before the driver ever sees it."""

import decimal
import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_value(v):
    if v is None:
        return "None"
    if not isinstance(v, (list, tuple, dict, set, bytes, bytearray, str)):
        try:
            if pd.isna(v):
                return "None"
        except (TypeError, ValueError):
            pass
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "None"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out)


# numpy dtype kinds normalized so that only genuinely incompatible pairs
# (int vs float — the HUGEINT trap) differ; unsigned folds into signed.
_KIND_NORM = {"u": "i", "b": "i"}


def _dtype_kinds(df: pd.DataFrame) -> dict:
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "O":
            # object column: classify by the first non-null value so a
            # float-object vs int-object mismatch is still caught.
            s = df[c].dropna()
            if len(s):
                v = s.iloc[0]
                if isinstance(v, bool):
                    k = "i"
                elif isinstance(v, int):
                    k = "i"
                elif isinstance(v, (float, decimal.Decimal)):
                    k = "f"
                else:
                    k = "O"
        out[c] = _KIND_NORM.get(k, k)
    return out


def _assert_dtype_compat(name, spark_pd, duck_pd):
    sk, dk = _dtype_kinds(spark_pd), _dtype_kinds(duck_pd)
    for c in spark_pd.columns:
        if c not in dk:
            continue
        a, b = sk[c], dk[c]
        # pandas promotes nullable ints to float64; only flag when BOTH
        # sides are non-null numeric and disagree on int-vs-float.
        if {a, b} == {"i", "f"}:
            sides = []
            for df, kind in ((spark_pd, a), (duck_pd, b)):
                has_null = bool(df[c].isna().any())
                sides.append((kind, has_null))
            if not any(h for _, h in sides):
                raise AssertionError(
                    f"{name}: column {c!r} dtype-kind mismatch "
                    f"spark={spark_pd[c].dtype} vs oracle={duck_pd[c].dtype} "
                    "(int-vs-float — cast the oracle, e.g. ::BIGINT)"
                )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    return con


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_query_has_callable():
    assert len(QUERIES) >= 25
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, duck, name):
    fn = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in ORACLES:
        # rows-only check, same as the driver's weaker gate
        assert len(srows) >= 0
        return
    res = duck.execute(ORACLES[name])
    duck_pd = res.fetchdf()
    dcols = list(duck_pd.columns)
    drows = list(duck_pd.itertuples(index=False, name=None))
    assert sorted(scols) == sorted(dcols), f"{name}: schema mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    spark_pd = pd.DataFrame([[r[c] for c in scols] for r in srows], columns=scols)
    _assert_dtype_compat(name, spark_pd, duck_pd)
    a = _canon_rows(scols, [[r[c] for c in scols] for r in srows])
    b = _canon_rows(dcols, drows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs {mismatches}"


def test_dtype_gate_catches_uncast_hugeint(duck):
    """A deliberately un-cast DuckDB ``sum()`` (HUGEINT -> pandas float64)
    must fail the dtype gate against an int64 Spark-side frame."""
    bad = duck.execute("select sum(x)::HUGEINT as n from (values (37)) t(x)").fetchdf()
    assert bad["n"].dtype.kind == "f"  # the trap: HUGEINT renders as float64
    good = pd.DataFrame({"n": pd.Series([37], dtype="int64")})
    with pytest.raises(AssertionError, match="int-vs-float"):
        _assert_dtype_compat("uncast_sum", good, bad)
    # and the cast version passes
    ok = duck.execute("select sum(x)::BIGINT as n from (values (37)) t(x)").fetchdf()
    _assert_dtype_compat("cast_sum", good, ok)


@pytest.mark.spark
def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(["win_start", "event_type", "n", "sum_value"]) <= set(df.columns)
