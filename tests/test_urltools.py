"""URL canonicalization op (benthos_spark/ops/urltools.py): crafted-URL
semantics plus the plan invariant (single projection, no exchange, no UDF)."""

import pytest

from benthos_spark.ops.urltools import url_canonicalize

CASES = [
    (0, "HTTP://WWW.Example.COM:80/a/b?b=2&utm_source=x&a=1#frag"),
    (1, "https://news.site.co.uk:443"),
    (2, "http://Host.Org:8080/deep/er/est/"),
    (3, "https://sub.d.example.com/p?utm_campaign=c&fbclid=z&gclid=q"),
    (4, "http://localhost/x"),
    (5, "ftp://Files.Example.net:21/pub"),
    (6, "http://a.com/p?one=1&one=1&two=2"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, url string")


@pytest.mark.spark
class TestUrlCanonicalize:
    def test_norms(self, spark, docs):
        rows = {r["id"]: r for r in url_canonicalize(docs).collect()}
        # default port dropped, host+scheme lowered, tracking param dropped,
        # params sorted, fragment stripped
        assert rows[0]["url_norm"] == "http://www.example.com/a/b?a=1&b=2"
        # empty path -> '/', :443 dropped for https
        assert rows[1]["url_norm"] == "https://news.site.co.uk/"
        # non-default port kept
        assert rows[2]["url_norm"] == "http://host.org:8080/deep/er/est/"
        # all-tracking query -> no '?' at all
        assert rows[3]["url_norm"] == "https://sub.d.example.com/p"
        # :80 is NOT default for ftp -> kept... but 21 isn't http/https default
        assert rows[5]["url_norm"] == "ftp://files.example.net:21/pub"
        # duplicates survive sorting (canonicalization is not dedup)
        assert rows[6]["url_norm"] == "http://a.com/p?one=1&one=1&two=2"

    def test_host_and_regdomain(self, spark, docs):
        rows = {r["id"]: r for r in url_canonicalize(docs).collect()}
        assert rows[0]["host"] == "www.example.com"
        assert rows[0]["registered_domain"] == "example.com"
        # ccTLD second-level: co.uk keeps three labels
        assert rows[1]["registered_domain"] == "site.co.uk"
        # deep subdomains collapse to two labels
        assert rows[3]["registered_domain"] == "example.com"
        # single-label host must not crash under ANSI (F.get, not element_at)
        assert rows[4]["host"] == "localhost"
        assert rows[4]["registered_domain"] == "localhost"

    def test_depth_and_params(self, spark, docs):
        rows = {r["id"]: r for r in url_canonicalize(docs).collect()}
        assert rows[0]["path_depth"] == 2 and rows[0]["n_params"] == 2
        assert rows[1]["path_depth"] == 0 and rows[1]["n_params"] == 0
        assert rows[2]["path_depth"] == 3
        assert rows[3]["n_params"] == 0

    def test_plan_is_single_stage(self, spark, docs):
        plan = url_canonicalize(docs)._jdf.queryExecution().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
