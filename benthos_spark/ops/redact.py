"""PII redaction for training-data pipelines — pure Catalyst, no UDF.

Web-scale corpora are scrubbed of obvious PII before training; the three
high-yield pattern families (emails, IPv4 literals, phone-shaped numbers)
cover the bulk of what regex-level scrubbing can catch. Patterns use only
constructs with identical semantics in Java regex (Spark) and RE2 (DuckDB)
— no lookaround, no backreferences — so the operator ships with an exact
cross-engine oracle like every other op in this suite.

Boundary handling (found by the cross-engine fuzz, test_cross_engine_fuzz):
``\\b`` is NOT portable — Java's word boundary is Unicode-aware while
RE2's is ASCII-only, so ``10.0.0.1Ü`` is an IP to RE2 but not to Java.
The IP/phone patterns therefore use explicit ASCII guard groups
``(^|[^0-9A-Za-z_])`` instead of ``\\b``; replacements re-insert the
guards via group references (``$n`` in Spark, ``\\n`` in DuckDB), and the
replace runs TWO passes per family because a consumed trailing guard can
hide the leading guard of an adjacent match ("1.1.1.1 2.2.2.2" needs the
second pass). Counts use the same guarded single-pass pattern on both
engines, so count parity holds even on adjacent-PII edge cases.

Scale shape: one projection, no shuffle, whole-stage codegen; all the
regexp passes fuse into a single stage over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_G_L = r"(^|[^0-9A-Za-z_])"
_G_R = r"($|[^0-9A-Za-z_])"
IPV4_RE = _G_L + r"(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})" + _G_R
PHONE_RE = _G_L + r"(\d{3}[- ]\d{3,4}[- ]\d{4})" + _G_R

# groups: 1 = leading guard, 2 = the PII, 3 = trailing guard


def redact_col(c: Column) -> Column:
    """Spark redaction expression over ``c`` (typed placeholders)."""
    r = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    for _ in range(2):
        r = F.regexp_replace(r, IPV4_RE, "$1<IP>$3")
    for _ in range(2):
        r = F.regexp_replace(r, PHONE_RE, "$1<PHONE>$3")
    return r


def count_cols(c: Column) -> dict:
    """Spark per-family match-count expressions over the ORIGINAL text."""
    return {
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("long"),
        "n_ips": F.regexp_count(c, F.lit(IPV4_RE)).cast("long"),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)).cast("long"),
    }


def sql_redact(c: str) -> str:
    """DuckDB twin of :func:`redact_col` (RE2 'g' flag, ``\\n`` group
    refs, same two passes per guarded family)."""
    out = "regexp_replace(" + c + ", '" + EMAIL_RE + "', '<EMAIL>', 'g')"
    for _ in range(2):
        out = "regexp_replace(" + out + ", '" + IPV4_RE + "', '\\1<IP>\\3', 'g')"
    for _ in range(2):
        out = "regexp_replace(" + out + ", '" + PHONE_RE + "', '\\1<PHONE>\\3', 'g')"
    return out


def sql_counts(c: str) -> dict:
    return {
        "n_emails": "len(regexp_extract_all(" + c + ", '" + EMAIL_RE + "'))::BIGINT",
        "n_ips": "len(regexp_extract_all(" + c + ", '" + IPV4_RE + "'))::BIGINT",
        "n_phones": "len(regexp_extract_all(" + c + ", '" + PHONE_RE + "'))::BIGINT",
    }


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted, n_emails, n_ips, n_phones): per-family match counts on
    the ORIGINAL text plus the text with every match replaced by a typed
    placeholder (<EMAIL>/<IP>/<PHONE>)."""
    c = F.col(text_col)
    counts = count_cols(c)
    return docs.select(
        F.col(id_col).alias("id"),
        redact_col(c).alias("redacted"),
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        counts["n_phones"].alias("n_phones"),
    )
