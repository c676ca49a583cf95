"""Round-5 ADVICE regression tests.

Covers: kafka round_robin on streaming frames (monotonically_increasing_id
is rejected by the streaming checker — the partition column must come from
an existing monotone column), the row-local fallback's globally-unique
order-preserving seq + single-execution guarantee, null-safe key joins in
the dedupe/keep-first hash cascades, and the neardup spec stage's ts_col
normalization.
"""

import json as _json
import os
import sys
import tempfile

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from benthos_spark.streaming.kafka_out import kafka_output_frame


class TestKafkaRoundRobinStreaming:
    def test_batch_round_robin_unchanged(self, spark):
        df = spark.createDataFrame(
            [Row(content=f"m{i}") for i in range(8)]
        )
        out = kafka_output_frame(
            df, value_column="content", partitioner="round_robin",
            partition_count=3,
        )
        parts = [r.partition for r in out.collect()]
        assert sorted(set(parts)) == [0, 1, 2]

    def test_streaming_requires_row_index_col(self, spark, tmpdir_path):
        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .select(F.col("value").cast("string").alias("content"))
        )
        assert stream.isStreaming
        with pytest.raises(ValueError, match="row_index_col"):
            kafka_output_frame(
                stream, value_column="content", partitioner="round_robin",
                partition_count=3,
            )

    def test_streaming_with_seq_builds_and_runs(self, spark, tmpdir_path):
        # rate source stands in for a frame stream; 'value' is the monotone
        # row index exactly like the frame schema's seq.
        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .select(
                F.col("value").alias("seq"),
                F.col("value").cast("string").alias("content"),
            )
        )
        out = kafka_output_frame(
            stream, value_column="content", partitioner="round_robin",
            partition_count=3, row_index_col="seq",
        )
        assert out.isStreaming
        # the old monotonically_increasing_id form failed HERE, at start()
        q = (
            out.writeStream.format("memory")
            .queryName("rr_stream_check")
            .option("checkpointLocation", tempfile.mkdtemp(dir=tmpdir_path))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("select * from rr_stream_check").collect()
        for r in got:
            assert r.partition == int(r.value) % 3

    def test_batch_seq_pmod_values(self, spark):
        df = spark.createDataFrame(
            [Row(seq=i, content=f"m{i}") for i in range(9)]
        )
        out = kafka_output_frame(
            df, value_column="content", partitioner="round_robin",
            partition_count=4, row_index_col="seq",
        )
        got = {r.value: r.partition for r in out.collect()}
        assert got == {f"m{i}": i % 4 for i in range(9)}


class TestRowLocalFallback:
    """White-box tests of _rowlocal_kernel's per-part path: seq must stay
    globally unique and order-preserving when a batch spans Arrow chunks,
    and parts must execute exactly once."""

    def _run_kernel(self, monkeypatch, proc, rows, chunk_size, side_effecting=False):
        from benthos_spark.engine import spark_exec as SE

        monkeypatch.setattr(SE, "_build_procs_cached", lambda conf: [proc])
        kern = SE._rowlocal_kernel("[]", side_effecting=side_effecting)
        pdf = pd.DataFrame(rows, columns=["batch_id", "seq", "content", "meta"])
        chunks = [
            pdf.iloc[i : i + chunk_size]
            for i in range(0, len(pdf), chunk_size)
        ]
        return pd.concat(list(kern(iter(chunks))), ignore_index=True)

    def test_fanout_seq_unique_across_chunks(self, monkeypatch):
        from benthos_spark.engine.processors import Part, Processor

        class FanOut(Processor):
            name = "fanout2"

            def process(self, batch, env):
                out = []
                for p in batch:
                    out.append(Part(p.content + b"/a", dict(p.meta)))
                    out.append(Part(p.content + b"/b", dict(p.meta)))
                return [out]

        rows = [(7, i, b"m%d" % i, {}) for i in range(10)]
        # chunk_size 3: batch 7 spans 4 chunks — the old dense-per-chunk
        # renumbering emitted duplicate (batch_id, out_batch, seq) triples
        out = self._run_kernel(monkeypatch, FanOut(), rows, chunk_size=3)
        triples = list(zip(out["batch_id"], out["out_batch"], out["seq"]))
        assert len(triples) == 20
        assert len(set(triples)) == 20, "seq collided across chunks"
        # order by seq must reproduce input order with /a before /b
        ordered = out.sort_values("seq")["content"].tolist()
        want = []
        for i in range(10):
            want += [b"m%d/a" % i, b"m%d/b" % i]
        assert ordered == want

    def test_drop_keeps_attribution(self, monkeypatch):
        from benthos_spark.engine.processors import Processor

        class DropOdd(Processor):
            name = "dropodd"

            def process(self, batch, env):
                return [[p for p in batch if int(p.content[1:]) % 2 == 0]]

        rows = [(3, i, b"m%d" % i, {}) for i in range(8)]
        out = self._run_kernel(monkeypatch, DropOdd(), rows, chunk_size=3)
        got = out.sort_values("seq")["content"].tolist()
        assert got == [b"m0", b"m2", b"m4", b"m6"]
        assert len(set(out["seq"])) == 4

    def test_side_effecting_runs_each_part_exactly_once(self, monkeypatch):
        from benthos_spark.engine.processors import Part, Processor

        seen = []

        class Recorder(Processor):
            name = "recorder"

            def process(self, batch, env):
                for p in batch:
                    seen.append(bytes(p.content))
                # drop one part so the old code would have re-run everything
                return [[p for p in batch if p.content != b"m1"]]

        rows = [(0, i, b"m%d" % i, {}) for i in range(4)]
        out = self._run_kernel(
            monkeypatch, Recorder(), rows, chunk_size=10, side_effecting=True
        )
        assert seen == [b"m0", b"m1", b"m2", b"m3"], "a part executed twice"
        assert out.sort_values("seq")["content"].tolist() == [b"m0", b"m2", b"m3"]

    def test_pure_one_to_one_keeps_original_seq(self, monkeypatch):
        from benthos_spark.engine.processors import Part, Processor

        class Upper(Processor):
            name = "upper"

            def process(self, batch, env):
                return [[Part(p.content.upper(), dict(p.meta)) for p in batch]]

        rows = [(0, i * 5, b"m%d" % i, {}) for i in range(6)]
        out = self._run_kernel(monkeypatch, Upper(), rows, chunk_size=4)
        assert sorted(out["seq"]) == [0, 5, 10, 15, 20, 25]

    def test_subprocess_chain_routes_per_part(self, spark):
        """End-to-end: a subprocess chain over a frame executes each line
        exactly once even though the chain is row-local (the child records
        every line it sees)."""
        from benthos_spark.engine.spark_exec import (
            frame_from_strings, run_frame_pipeline,
        )

        log = tempfile.mktemp(prefix="bs_subproc_log_")
        prog = (
            "import sys\n"
            f"f = open({log!r}, 'a')\n"
            "for line in sys.stdin:\n"
            "    f.write(line); f.flush()\n"
            "    sys.stdout.write(line.strip().upper() + '\\n')\n"
            "    sys.stdout.flush()\n"
        )
        df = frame_from_strings(spark, [f"doc{i}".encode() for i in range(12)])
        out = run_frame_pipeline(
            df, [{"subprocess": {"name": sys.executable, "args": ["-c", prog]}}]
        )
        got = sorted(bytes(r.content) for r in out.collect())
        assert got == sorted(b"DOC%d" % i for i in range(12))
        with open(log) as fh:
            lines = sorted(l.strip() for l in fh)
        assert lines == sorted(f"doc{i}" for i in range(12)), (
            "child saw a line twice"
        )
        os.unlink(log)


class TestNullSafeKeyJoins:
    def test_dedupe_exact_keeps_null_key_group(self, spark):
        from benthos_spark.streaming.dedupe import dedupe_exact

        df = spark.createDataFrame(
            [
                Row(k="a", seq=2, v="x"),
                Row(k="a", seq=1, v="y"),
                Row(k=None, seq=5, v="n1"),
                Row(k=None, seq=3, v="n2"),
            ]
        )
        got = {(r.k, r.seq) for r in dedupe_exact(df, ["k"], "seq").collect()}
        assert got == {("a", 1), (None, 3)}

    def test_keep_first_agg_keeps_null_key_group(self, spark):
        import datetime as dt

        from benthos_spark.streaming.windows import keep_first_agg

        t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
        df = spark.createDataFrame(
            [
                Row(host="h", ts=t0, url="u1"),
                Row(host="h", ts=t0 + dt.timedelta(minutes=5), url="u2"),
                Row(host=None, ts=t0 + dt.timedelta(minutes=1), url="n1"),
                Row(host=None, ts=t0 + dt.timedelta(minutes=9), url="n2"),
            ]
        )
        out = keep_first_agg(
            df, size="1 hour", keys=["host"], ts_col="ts", payload=["url"]
        )
        got = {(r.host, r.url) for r in out.collect()}
        assert got == {("h", "u1"), (None, "n1")}


class TestNeardupSpecTsCol:
    @pytest.mark.parametrize("impl", ["exact_py", "jvm"])
    def test_streaming_neardup_stage_accepts_custom_ts_col(
        self, spark, tmpdir_path, impl
    ):
        """A neardup spec stage with ts_col != 'ts' must not throw an
        unresolved-column error: band rows normalize the timestamp to 'ts'."""
        from benthos_spark.engine.spark_exec import NativePipeline

        np_ = NativePipeline(
            [
                {
                    "neardup": {
                        "streaming": True,
                        "impl": impl,
                        "ts_col": "event_time",
                        "id_col": "doc_id",
                        "text_col": "text",
                        "watermark": "1 hour",
                    }
                }
            ],
            {"doc_id": "bigint", "event_time": "timestamp", "text": "string"},
        )
        src = tempfile.mkdtemp(dir=tmpdir_path)
        rows = [
            Row(doc_id=1, event_time="2025-01-01 00:00:00",
                text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, event_time="2025-01-01 00:01:00",
                text="the quick brown fox jumps over the lazy dog"),
            # far-future sentinel: flushes the jvm variant's agg windows
            Row(doc_id=999, event_time="2025-03-01 00:00:00",
                text="entirely unrelated sentinel words flush watermark"),
        ]
        spark.createDataFrame(rows).withColumn(
            "event_time", F.col("event_time").cast("timestamp")
        ).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = np_(stream)
        name = f"ndtscol_{impl}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", tempfile.mkdtemp(dir=tmpdir_path))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql(f"select * from {name}").collect()
        partners: dict = {1: [], 2: []}
        for r in got:
            if r.id in partners:
                partners[r.id].append(r.partner)
        assert partners[1] and all(p is None for p in partners[1])
        non_null = [p for p in partners[2] if p is not None]
        assert non_null and all(p == 1 for p in non_null)
