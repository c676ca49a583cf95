"""Shared text-preparation expressions (pure Catalyst, no UDF).

Every formula here is deliberately expressible in both Spark SQL and ANSI
SQL (DuckDB) so each operator ships with an exact cross-engine oracle:
- tokens: lowercase, strip non-alnum to space, split on whitespace
- 60-bit token hash: polynomial value of the first 15 hex digits of md5
  (md5 is the one digest both engines share bit-for-bit)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

NORM_RE = "[^a-z0-9]+"


def norm_text(col) -> Column:
    """lower -> collapse every non-alnum run to ONE space -> trim.

    Single regex pass: a run of [^a-z0-9] (spaces included) becomes one
    space, which is exactly what the old two-pass form (strip then collapse
    ' +') produced — one full scan of the text saved per row, measurably the
    dominant cost of exact dedup at scale."""
    return F.trim(F.regexp_replace(F.lower(col), NORM_RE, " "))


def tokens(col) -> Column:
    """Whitespace tokens of normalized text; empty text -> empty array."""
    n = norm_text(col)
    return F.when(n == "", F.array().cast("array<string>")).otherwise(F.split(n, " "))


def shingles_of(toks: Column, n: int) -> Column:
    """n-gram shingles (distinct) over an ALREADY-MATERIALIZED token array
    column. Pass a plain column reference, not the tokens() expression:
    expressions referenced inside higher-order-function lambdas are inlined
    and re-evaluated per element (measured 10x+ blowup), a bound column is
    evaluated once per row."""
    # guard short docs: sequence(1, 0) is DESCENDING [1, 0] in Spark, which
    # would drive element_at out of bounds (ANSI error) for < n tokens
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]),
    )
    return F.array_distinct(sh)


def shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), the MinHash/Jaccard unit.

    NOTE: prefer materializing tokens() into a column and calling
    shingles_of() — see exploded_shingles()."""
    return shingles_of(tokens(col), n)


def exploded_shingles(df, n: int, text_col: str = "text", id_col: str = "doc_id"):
    """(id, s) rows of distinct n-gram shingles, with the token array
    materialized before the shingle HOF (the fast plan)."""
    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    return toks.select("id", F.explode(shingles_of(F.col("__toks"), n)).alias("s"))


MINHASH_LANES = 4  # 28-bit lanes (7 hex digits) per md5 digest


_NORM_PYRE = None  # compiled lazily (keeps import light for executors)

# The 4 hex-digit lanes of minhash_wide, re-read straight from digest()
# bytes (r6 optimization — hexdigest() + string slice + int(x, 16) per
# lane was ~2x the kernel cost): hex digit i of hexdigest() is nibble i
# of digest(), so lane L (hex chars 7L .. 7L+6) is a 28-bit slice of the
# big-endian byte string. Equality with the hexdigest formula is pinned
# by tests/test_ops.py::test_minhash_lane_extraction_equivalence.
_LANE_EXTRACT = (
    lambda d: int.from_bytes(d[0:4], "big") >> 4,          # nibbles 0..6
    lambda d: int.from_bytes(d[3:7], "big") & 0xFFFFFFF,   # nibbles 7..13
    lambda d: int.from_bytes(d[7:11], "big") >> 4,         # nibbles 14..20
    lambda d: int.from_bytes(d[10:14], "big") & 0xFFFFFFF, # nibbles 21..27
)


def py_minhash_signature(text, k: int, n: int) -> list | None:
    """Pure-Python k-lane minhash signature of one document — the EXACT
    formula of :func:`benthos_spark.ops.dedup.minhash_wide` (and its DuckDB
    oracle): hash h = int of 7 hex digits at offset 7*(h%4) of
    md5('(h//4)|shingle'), min over distinct n-gram shingles of whitespace
    tokens of lower/non-alnum-collapsed text. None for docs with < n
    tokens. Used by Arrow kernels (hashlib's C md5 beats interpreted
    collection lambdas ~6x per span)."""
    import hashlib
    import re as _re2

    global _NORM_PYRE
    if _NORM_PYRE is None:
        _NORM_PYRE = _re2.compile(r"[^a-z0-9]+")
    norm = _NORM_PYRE.sub(" ", (text or "").lower()).strip()
    toks = norm.split(" ") if norm else []
    if len(toks) < n:
        return None
    shingle_bytes = {
        " ".join(toks[i : i + n]).encode() for i in range(len(toks) - n + 1)
    }
    n_salts = (k + MINHASH_LANES - 1) // MINHASH_LANES
    md5 = hashlib.md5
    sig = [None] * k
    for salt in range(n_salts):
        pre = b"%d|" % salt
        digests = [md5(pre + sb).digest() for sb in shingle_bytes]
        base = salt * MINHASH_LANES
        for lane in range(min(MINHASH_LANES, k - base)):
            ex = _LANE_EXTRACT[lane]
            sig[base + lane] = min(map(ex, digests))
    return sig


def md5_60bit(col) -> Column:
    """First 15 hex digits of md5 as a 60-bit LONG (identical in DuckDB via
    the same polynomial over hex digits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# the matching DuckDB SQL fragments (formatted with the column expression)
SQL_NORM = "trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'))"
SQL_TOKENS = (
    "CASE WHEN " + SQL_NORM + " = '' THEN [] "
    "ELSE str_split(" + SQL_NORM + ", ' ') END"
)


def sql_md5_60bit(expr: str) -> str:
    """DuckDB: polynomial over the first 15 hex digits of md5({expr})."""
    return (
        "(SELECT sum((strpos('0123456789abcdef', substring(md5("
        + expr
        + "), d, 1)) - 1) * (1::BIGINT << (4 * (15 - d))))::BIGINT "
        "FROM generate_series(1, 15) gs(d))"
    )
