"""WARC reader (formats/warc.py + streaming/source.read_warc): record
framing, per-record gzip members, HTTP payload split + de-chunking,
non-response skipping, malformed inputs, Spark batch + streaming reads,
and the `warc` spec input."""

import datetime
import os

import pytest

from benthos_spark.formats.warc import (
    DECODE_ERRORS,
    encode_warc,
    iter_warc_records,
    parse_http_response,
    warc_pages,
)

HTML_A = b"<html><body>Hello page A</body></html>"
HTML_B = b"<html><p>page B \xc3\xa9</p></html>"


def _fixture(gz=False):
    return encode_warc(
        [
            {"type": "warcinfo", "payload": b"software: fixture\r\n"},
            {
                "type": "request",
                "url": "http://a.example/",
                "payload": b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n",
            },
            {
                "type": "response",
                "url": "http://a.example/",
                "date": "2017-03-02T04:05:06Z",
                "body": HTML_A,
                "http_headers": {"Content-Type": "text/html"},
            },
            {
                "type": "response",
                "url": "http://b.example/x?y=1",
                "date": "2018-11-30T23:59:59Z",
                "body": HTML_B,
                "http_status": 404,
            },
        ],
        gzip_members=gz,
    )


class TestFormat:
    def test_record_framing(self):
        recs = list(iter_warc_records(_fixture()))
        assert [h["warc-type"] for h, _p in recs] == [
            "warcinfo", "request", "response", "response",
        ]
        assert all(int(h["content-length"]) == len(p) for h, p in recs)

    def test_gzip_members_roundtrip(self):
        plain = list(iter_warc_records(_fixture()))
        gz = list(iter_warc_records(_fixture(gz=True)))
        assert [(h["warc-type"], p) for h, p in plain] == [
            (h["warc-type"], p) for h, p in gz
        ]

    def test_pages_extraction(self):
        pages = list(warc_pages(_fixture(gz=True)))
        assert len(pages) == 2  # warcinfo/request skipped
        a, b = pages
        assert a["url"] == "http://a.example/" and a["html"] == HTML_A
        assert a["status"] == 200
        assert a["warc_ts"] == datetime.datetime(2017, 3, 2, 4, 5, 6)
        assert b["status"] == 404 and b["html"] == HTML_B

    def test_chunked_transfer_encoding(self):
        body = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
        payload = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
        )
        status, headers, out = parse_http_response(payload)
        assert (status, out) == (200, b"Wikipedia")

    def test_unparseable_http_payload_kept(self):
        raw = encode_warc(
            [{"type": "response", "url": "http://c.example/",
              "payload": b"not http at all"}]
        )
        pages = list(warc_pages(raw))
        assert len(pages) == 1
        assert pages[0]["status"] is None
        assert pages[0]["html"] == b"not http at all"

    def test_malformed_raise_decode_errors(self):
        good = _fixture()
        cases = [
            b"GZIP\x00but not",  # not WARC, not gzip
            good[: len(good) // 2],  # truncated payload
            good.replace(b"Content-Length", b"X-Length", 1),  # no length
            b"\x1f\x8b" + b"\x00" * 20,  # corrupt gzip
        ]
        for bad in cases:
            with pytest.raises(DECODE_ERRORS):
                list(iter_warc_records(bad))


@pytest.mark.spark
class TestSparkRead:
    def _write(self, tmp_path, gz=False, n_files=2):
        d = tmp_path / "warcs"
        os.makedirs(d, exist_ok=True)
        ext = "warc.gz" if gz else "warc"
        for i in range(n_files):
            (d / f"crawl-{i}.{ext}").write_bytes(_fixture(gz=gz))
        return str(d)

    def test_batch_read(self, spark, tmp_path):
        from benthos_spark.streaming.source import read_warc

        df = read_warc(spark, self._write(tmp_path, gz=True))
        rows = df.collect()
        assert len(rows) == 4  # 2 pages x 2 archives
        assert df.columns[:6] == ["url", "warc_ts", "html", "text", "lang", "seq"]
        by = {(r["warc_path"].rsplit("/", 1)[-1], r["seq"]): r for r in rows}
        assert len(by) == 4  # (archive, ordinal) identity is unique
        r = next(v for k, v in by.items() if k[1] == 0)
        assert bytes(r["html"]) == HTML_A and r["http_status"] == 200
        # schema matches the engine page shape: chain a downstream stage
        from benthos_spark.ops.urltools import url_canonicalize

        assert url_canonicalize(df.selectExpr("url", "seq as doc_id")).count() == 4

    def test_streaming_read_exactly_once(self, spark, tmp_path):
        from benthos_spark.streaming.source import read_warc

        src = self._write(tmp_path, gz=False, n_files=3)
        df = read_warc(spark, src, stream=True, max_files_per_trigger=1)
        assert df.isStreaming
        q = (
            df.writeStream.format("memory")
            .queryName("warc_stream_test")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select count(*) n, count(distinct warc_path) f "
            "from warc_stream_test"
        ).collect()[0]
        assert (got["n"], got["f"]) == (6, 3)

    def test_warc_spec_input(self, spark, tmp_path):
        from benthos_spark.engine.spec import lint_spec, run_spec

        spec = {
            "input": {"warc": {"path": self._write(tmp_path, gz=True)}},
            "pipeline": {"processors": [
                {"bloblang": 'is_a = url.has_prefix("http://a.")'},
            ]},
            "output": {"memory": {}},
        }
        assert lint_spec(spec) == []
        out = run_spec(spark, spec)
        rows = out.collect()
        assert len(rows) == 4
        assert sum(1 for r in rows if r["is_a"]) == 2


class TestSplitRead:
    """r6 (r5 verdict #4): split_bytes explodes one large archive across
    tasks; output must be byte-identical to the whole-file path, including
    (warc_path, seq) identity, for per-record-gzip AND plain archives."""

    def _big_archive(self, tmp_path, gz, n_records=120, body_kb=24):
        import numpy as np

        rng = np.random.default_rng(5)
        recs = [{"type": "warcinfo", "payload": b"software: split-fixture\r\n"}]
        for i in range(n_records):
            t = "response" if i % 4 != 3 else "metadata"
            recs.append({
                "type": t,
                "url": f"http://example.com/p/{i}",
                "date": "2017-03-01T00:00:00Z",
                "http_status": 200 if i % 5 else 404,
                "body": rng.integers(32, 127, size=body_kb * 1024, dtype=np.uint8)
                        .tobytes(),
            })
        d = tmp_path / f"bigwarc_{'gz' if gz else 'plain'}"
        os.makedirs(d, exist_ok=True)
        ext = "warc.gz" if gz else "warc"
        (d / f"big-0.{ext}").write_bytes(encode_warc(recs, gzip_members=gz))
        return str(d)

    @pytest.mark.parametrize("gz", [True, False])
    def test_split_equals_whole(self, spark, tmp_path, gz):
        from pyspark.sql import functions as F

        from benthos_spark.streaming.source import read_warc

        src = self._big_archive(tmp_path, gz)
        whole = read_warc(spark, src)
        split = read_warc(spark, src, split_bytes=256 * 1024)

        def key(rows):
            return sorted(
                (r["warc_path"].rsplit("/", 1)[-1], r["seq"], r["url"],
                 bytes(r["html"]), r["http_status"], r["warc_ts"])
                for r in rows
            )

        w = key(whole.collect())
        s = key(split.collect())
        assert len(w) > 0 and w == s
        # the split path actually uses >1 task
        nparts = (
            split.select(F.spark_partition_id().alias("p")).distinct().count()
        )
        assert nparts > 1

    def test_split_rejected_for_streams(self, spark, tmp_path):
        from benthos_spark.streaming.source import read_warc

        src = self._big_archive(tmp_path, gz=True, n_records=4, body_kb=1)
        with pytest.raises(ValueError, match="split_bytes is a batch option"):
            read_warc(spark, src, stream=True, split_bytes=1024)


class TestNonAlignedMembers:
    def test_split_plan_falls_back_for_block_gzip(self):
        """bgzip-style archives (gzip members NOT record-aligned) are
        readable but not splittable: plan_warc_splits must fall back to
        one whole-file unit instead of failing the read (r6 review fix)."""
        import gzip as _gzip

        from benthos_spark.formats.warc import plan_warc_splits

        plain = _fixture(gz=False)
        # recompress in fixed 256-byte blocks — members cut records apart
        blocks = [
            _gzip.compress(plain[i : i + 256]) for i in range(0, len(plain), 256)
        ]
        blob = b"".join(blocks)
        assert len(list(warc_pages(blob))) == len(list(warc_pages(plain)))
        splits = plan_warc_splits(blob, 512)
        assert splits == [(0, len(blob), 0)]

    def test_read_warc_split_on_block_gzip_dir(self, spark, tmp_path):
        import gzip as _gzip

        from benthos_spark.streaming.source import read_warc

        plain = _fixture(gz=False)
        blob = b"".join(
            _gzip.compress(plain[i : i + 256]) for i in range(0, len(plain), 256)
        )
        d = tmp_path / "blockgz"
        os.makedirs(d, exist_ok=True)
        (d / "b.warc.gz").write_bytes(blob)
        rows = read_warc(spark, str(d), split_bytes=512).collect()
        assert len(rows) == 2  # degrades to whole-file read, not an error
