"""PII redaction for training-data pipelines — pure Catalyst, no UDF.

Web-scale corpora are scrubbed of obvious PII before training; the three
high-yield pattern families (emails, IPv4 literals, phone-shaped numbers)
cover the bulk of what regex-level scrubbing can catch. Patterns use only
constructs with identical semantics in Java regex (Spark) and RE2 (DuckDB)
— no lookaround, no backreferences — so the operator ships with an exact
cross-engine oracle like every other op in this suite.

Scale shape: one projection, no shuffle, whole-stage codegen; the three
regexp_replace passes fuse into a single stage over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b"

# the matching DuckDB fragments (RE2 'g' flag = global replace); plain
# string concatenation — the regexes contain `{m,n}` braces, so str.format
# templates are off the table


def sql_redact(c: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace(" + c + ", "
        "'" + EMAIL_RE + "', '<EMAIL>', 'g'), "
        "'" + IPV4_RE + "', '<IP>', 'g'), "
        "'" + PHONE_RE + "', '<PHONE>', 'g')"
    )


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
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col).alias("id"),
        redacted.alias("redacted"),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phones"),
    )
