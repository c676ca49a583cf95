"""PII redaction op (benthos_spark/ops/redact.py): crafted-text semantics plus
the plan invariant (single projection, no exchange, no Python UDF)."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.redact import pii_redact

CASES = [
    (0, "contact alice@example.com or bob.smith+tag@sub.domain.org today"),
    (1, "server at 10.1.2.3 talks to 192.168.0.254 nightly"),
    (2, "call 555-010-1234 or 555 0101 9999 now"),
    (3, "no pii here at all, just words"),
    (4, "mixed: x@y.io from 8.8.8.8 tel 123-456-7890"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string")


@pytest.mark.spark
class TestPiiRedact:
    def test_counts(self, spark, docs):
        rows = {r["id"]: r for r in pii_redact(docs).collect()}
        assert (rows[0]["n_emails"], rows[0]["n_ips"], rows[0]["n_phones"]) == (2, 0, 0)
        assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (0, 2, 0)
        assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_phones"]) == (0, 0, 2)
        assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) == (0, 0, 0)
        assert (rows[4]["n_emails"], rows[4]["n_ips"], rows[4]["n_phones"]) == (1, 1, 1)
        assert (rows[5]["n_emails"], rows[5]["n_ips"], rows[5]["n_phones"]) == (0, 0, 0)

    def test_placeholders(self, spark, docs):
        rows = {r["id"]: r["redacted"] for r in pii_redact(docs).collect()}
        assert rows[0] == "contact <EMAIL> or <EMAIL> today"
        assert rows[1] == "server at <IP> talks to <IP> nightly"
        assert rows[4] == "mixed: <EMAIL> from <IP> tel <PHONE>"
        assert rows[3] == CASES[3][1]  # untouched when no match

    def test_word_boundaries(self, spark):
        # digits embedded in longer runs must NOT match ip/phone (\b anchors)
        df = spark.createDataFrame(
            [(0, "version 91.2.3.41234 build 5555-010-12345")],
            "doc_id long, text string",
        )
        r = pii_redact(df).collect()[0]
        assert (r["n_ips"], r["n_phones"]) == (0, 0)
        assert r["redacted"] == "version 91.2.3.41234 build 5555-010-12345"

    def test_plan_is_single_stage(self, spark, docs):
        plan = pii_redact(docs)._jdf.queryExecution().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
