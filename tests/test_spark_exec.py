"""Spark execution tests: frame mode (Arrow-batched kernels) and typed/native
mode (Catalyst compilation) produce the same results as the pure kernels."""

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.engine.spark_exec import (
    NativePipeline,
    compile_or_frame,
    frame_from_strings,
    run_frame_pipeline,
)
from benthos_spark.fixtures import enrich_side, pages


@pytest.mark.spark
class TestFrameMode:
    def test_bloblang_windowed_mapping_distributed(self, spark):
        docs = [
            b'{"doc":{"count":243,"contents":"foobar 1"}}',
            b'{"doc":{"count":71,"contents":"foobar 2"}}',
            b'{"doc":{"count":10,"contents":"foobar 3"}}',
            b'{"doc":{"count":333,"contents":"foobar 4"}}',
            b'{"doc":{"count":164,"contents":"foobar 5"}}',
        ]
        df = frame_from_strings(spark, docs)
        src = (
            "root = this\n"
            'doc.count = json("doc.count").from_all().sum()\n'
            'doc.max = json("doc.count").from_all().fold(0, match {\n'
            "  tally < value => value\n"
            "  _ => tally\n"
            "})\n"
            "root = match {\n"
            "  batch_index() > 0 => deleted()\n"
            "}"
        )
        out = run_frame_pipeline(df, [{"bloblang": src}]).collect()
        assert len(out) == 1
        assert (
            bytes(out[0]["content"])
            == b'{"doc":{"contents":"foobar 1","count":821,"max":333}}'
        )

    def test_multiple_batches_parallel(self, spark):
        rows = []
        for b in range(20):
            for i in range(5):
                rows.append((b, i, json.dumps({"v": b * 10 + i}).encode(), {}))
        df = spark.createDataFrame(
            rows, "batch_id long, seq long, content binary, meta map<string,string>"
        )
        src = 'root.total = json("v").from_all().sum()\nroot = match { batch_index() > 0 => deleted() }'
        out = run_frame_pipeline(df, [{"bloblang": src}]).collect()
        assert len(out) == 20
        got = {r["batch_id"]: json.loads(bytes(r["content"])) for r in out}
        for b in range(20):
            assert got[b]["total"] == sum(b * 10 + i for i in range(5))

    def test_split_and_group_by_value(self, spark):
        docs = [json.dumps({"host": f"h{i % 3}", "i": i}).encode() for i in range(9)]
        df = frame_from_strings(spark, docs)
        out = run_frame_pipeline(
            df, [{"group_by_value": {"value": '${! json("host") }'}}]
        ).collect()
        batches = {}
        for r in out:
            batches.setdefault(r["out_batch"], []).append(json.loads(bytes(r["content"])))
        assert len(batches) == 3
        for parts in batches.values():
            assert len({p["host"] for p in parts}) == 1


@pytest.mark.spark
class TestNativeMode:
    def test_compiled_mapping_matches_interpreter_semantics(self, spark):
        df = pages(spark, 2000, n_hosts=50)
        conf = [
            {
                "bloblang": (
                    'url_host = url.split("/").index(2)\n'
                    "text_len = text.length()\n"
                    'is_en = lang == "en"\n'
                    "root = match {\n"
                    "  text.length() < 10 => deleted()\n"
                    "}"
                )
            },
            {"filter_parts": {"bloblang": "is_en"}},
        ]
        out, mode = compile_or_frame(df, conf)
        assert mode == "native"
        rows = out.limit(10).collect()
        assert rows
        for r in rows:
            assert r["url_host"].startswith("host-")
            assert r["is_en"] is True
            assert r["text_len"] > 0

    def test_generic_window_tracks_actual_output_columns(self, spark):
        # round-2 advice (medium): _c_window used to reset the tracker to the
        # pages defaults even for generic keys/aggs, so later stages rejected
        # real output columns and accepted phantom ones
        from benthos_spark.engine.spark_exec import CompileError

        ev = spark.createDataFrame(
            [(1, "click", "2024-01-01 00:00:05"), (2, "view", "2024-01-01 00:00:55")],
            "event_id long, event_type string, ts_s string",
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        conf = [
            {"window": {"kind": "tumbling", "size": "1 minute",
                        "keys": ["event_type"], "ts_col": "ts",
                        "aggs": [{"fn": "count", "as": "n"}]}},
            {"bloblang": "big = n > 0\nkey = event_type"},
        ]
        pipe = NativePipeline(conf, dict(ev.dtypes))
        rows = {r["event_type"]: r for r in pipe(ev).collect()}
        assert rows["click"]["n"] == 1 and rows["click"]["big"] is True
        # phantom pages columns must NOT compile after a generic window
        with pytest.raises(CompileError):
            NativePipeline(
                conf[:1] + [{"bloblang": "x = n_pages"}], dict(ev.dtypes)
            )
        # keep_first tracks payload columns, no win_end
        kf = [{"window": {"kind": "keep_first", "size": "1 minute",
                          "keys": ["event_type"], "ts_col": "ts"}},
              {"bloblang": "eid = event_id"}]
        out = NativePipeline(kf, dict(ev.dtypes))(ev)
        assert "win_end" not in out.columns and "eid" in out.columns

    def test_native_dedupe_keeps_first_by_seq(self, spark):
        df = pages(spark, 5000, n_hosts=20)
        pipe = NativePipeline([{"dedupe": {"key": '${! json("url") }'}}], set(df.columns))
        out = pipe(df)
        assert out.count() == df.select("url").distinct().count()
        # kept row is the first-seen seq per url
        first = df.groupBy("url").agg(F.min("seq").alias("seq"))
        assert out.join(first, ["url", "seq"], "left_anti").count() == 0

    def test_native_switch_routes_and_unions(self, spark):
        df = pages(spark, 1000, n_hosts=10)
        conf = [
            {
                "switch": [
                    {
                        "condition": {"bloblang": 'lang == "en"'},
                        "processors": [{"bloblang": 'route = "english"'}],
                    },
                    {
                        "condition": {"static": True},
                        "processors": [{"bloblang": 'route = "other"'}],
                    },
                ]
            }
        ]
        out, mode = compile_or_frame(df, conf)
        assert mode == "native"
        agg = {r["route"]: r["n"] for r in out.groupBy("route").agg(F.count("*").alias("n")).collect()}
        assert agg.get("english", 0) > 0 and agg.get("other", 0) > 0
        assert sum(agg.values()) == 1000

    def test_dedupe_text_byte_identity(self, spark):
        # north-rule invariant: duplicate urls carry byte-identical text
        df = pages(spark, 20000, n_hosts=100)
        bad = (
            df.groupBy("url")
            .agg(F.countDistinct("text").alias("nt"))
            .filter(F.col("nt") > 1)
            .count()
        )
        assert bad == 0
        dups = df.groupBy("url").count().filter(F.col("count") > 1).count()
        assert dups > 0  # the fixture actually produces duplicates

    def test_enrich_broadcast_join(self, spark):
        df = pages(spark, 1000, n_hosts=20).withColumn(
            "host", F.split(F.col("url"), "/")[2]
        )
        side = enrich_side(spark, 20)
        joined = df.join(F.broadcast(side), "host", "left")
        assert joined.filter(F.col("category").isNull()).count() == 0
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        ) if False else joined._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan


@pytest.mark.spark
@pytest.mark.streaming
class TestFrameStreaming:
    def test_schemaless_processors_over_stream(self, spark, tmp_path):
        import json as _json

        from benthos_spark.engine.spark_exec import run_frame_pipeline_streaming
        from benthos_spark.streaming.sink import IdempotentSink

        # a stream of schemaless JSON payloads (frame columns)
        in_dir = str(tmp_path / "in")
        rows = [
            (0, i, _json.dumps({"v": i, "keep": i % 2 == 0}).encode(), {})
            for i in range(100)
        ]
        df = spark.createDataFrame(
            rows, "batch_id long, seq long, content binary, meta map<string,string>"
        )
        df.coalesce(2).write.parquet(in_dir)
        stream = spark.readStream.schema(
            "batch_id long, seq long, content binary, meta map<string,string>"
        ).parquet(in_dir)
        sink = IdempotentSink(str(tmp_path / "out"))
        run_frame_pipeline_streaming(
            stream,
            [
                {"bloblang": 'root = this\ndoubled = json("v") * 2'},
                {"filter_parts": {"json": {"path": "keep", "operator": "equals", "arg": True}}},
            ],
            sink,
            str(tmp_path / "ckpt"),
        )
        got = sink.read(spark).collect()
        assert len(got) == 50
        docs = [_json.loads(bytes(r["content"])) for r in got]
        assert all(d["doubled"] == d["v"] * 2 for d in docs)
        assert all(d["keep"] for d in docs)


@pytest.mark.spark
class TestCompilerSemantics:
    """Regression tests for native-path semantics vs the reference/interpreter
    (ADVICE round 1: literal escaping, ANSI arithmetic, truncated modulo)."""

    def _map(self, spark, df, src):
        from benthos_spark.bloblang.compiler import compile_mapping_to_transform
        from benthos_spark.bloblang.parser import parse_mapping

        t = compile_mapping_to_transform(parse_mapping(src), dict(df.dtypes))
        return t(df)

    def test_re_find_all_backslash_pattern(self, spark):
        df = spark.createDataFrame([("ab12cd34",)], "text string")
        out = self._map(spark, df, r'nums = text.re_find_all("\d+")').collect()
        assert out[0]["nums"] == ["12", "34"]

    def test_trim_cutset_special_chars(self, spark):
        df = spark.createDataFrame([("\\'x'\\",)], "text string")
        out = self._map(spark, df, r"""t = text.trim("\\'")""").collect()
        assert out[0]["t"] == "x"

    def test_string_plus_string_concats_via_dtypes(self, spark):
        df = spark.createDataFrame([("foo", "bar")], "a string, b string")
        out = self._map(spark, df, "c = a + b").collect()
        assert out[0]["c"] == "foobar"

    def test_number_plus_number(self, spark):
        df = spark.createDataFrame([(3, 4.5)], "a long, b double")
        out = self._map(spark, df, "c = a + b").collect()
        assert out[0]["c"] == 7.5

    def test_string_plus_number_is_compile_error(self, spark):
        from benthos_spark.bloblang.compiler import CompileError

        df = spark.createDataFrame([("x", 1)], "a string, b long")
        with pytest.raises(CompileError):
            self._map(spark, df, "c = a + b")

    def test_arithmetic_on_bad_string_yields_null_not_abort(self, spark):
        # ANSI mode would abort with CAST_INVALID_INPUT on plain cast
        df = spark.createDataFrame([("oops",), ("7",)], "a string")
        got = {r["a"]: r["c"] for r in self._map(spark, df, "c = a * 2").collect()}
        assert got == {"oops": None, "7": 14.0}

    def test_modulo_truncates_toward_zero(self, spark):
        from benthos_spark.bloblang.interp import Interpreter, Part
        from benthos_spark.bloblang.parser import parse_mapping

        df = spark.createDataFrame([(-7, 3), (7, -3), (-7, -3), (7, 3)], "a long, b long")
        out = self._map(spark, df, "m = a % b").orderBy("a", "b").collect()
        got = {(r["a"], r["b"]): r["m"] for r in out}
        assert got == {(-7, -3): -1, (-7, 3): -1, (7, -3): 1, (7, 3): 1}
        # interpreter agrees (Go % semantics)
        interp = Interpreter()
        part = Part(b'{"a":-7,"b":3}', {})
        res = interp.map_part(parse_mapping("root.m = this.a % this.b"), [part], 0)
        import json as _json
        assert _json.loads(res.content)["m"] == -1


@pytest.mark.spark
class TestFileLinesInput:
    """file input with custom delimiter + multipart (lib/input/file.go:38-89,
    lib/input/reader/lines.go:185-215) replayed through frame mode."""

    def test_multipart_blank_line_batches(self, spark, tmp_path):
        from benthos_spark.engine.spec import run_spec

        p = tmp_path / "in.txt"
        p.write_text("a1\na2\n\nb1\n\nc1\nc2\nc3\n")
        out = run_spec(spark, {
            "input": {"file": {"path": str(p), "multipart": True}},
            "pipeline": {"processors": [
                {"bloblang": "root.joined = content().string()\nroot.idx = batch_index()\nroot.n = batch_size()\nroot = match { batch_index() > 0 => deleted() }"},
            ]},
            "output": {"memory": {}},
        }).collect()
        got = sorted(json.loads(bytes(r["content"]))["joined"] for r in out)
        sizes = {json.loads(bytes(r["content"]))["joined"]: json.loads(bytes(r["content"]))["n"] for r in out}
        assert got == ["a1", "b1", "c1"]
        assert sizes == {"a1": 2, "b1": 1, "c1": 3}

    def test_single_part_lines_skip_empty(self, spark, tmp_path):
        from benthos_spark.streaming.source import file_lines_input

        p = tmp_path / "in.txt"
        p.write_text("x\n\ny\nz\n")
        rows = file_lines_input(spark, str(p)).collect()
        assert sorted(bytes(r["content"]).decode() for r in rows) == ["x", "y", "z"]
        # each line its own batch
        assert len({r["batch_id"] for r in rows}) == 3

    def test_custom_delimiter(self, spark, tmp_path):
        from benthos_spark.streaming.source import file_lines_input

        p = tmp_path / "in.txt"
        p.write_text("a|b|c")
        rows = file_lines_input(spark, str(p), delimiter="|").collect()
        assert sorted(bytes(r["content"]).decode() for r in rows) == ["a", "b", "c"]

    def test_multiple_files_deterministic_batch_ids(self, spark, tmp_path):
        from benthos_spark.streaming.source import file_lines_input

        (tmp_path / "f1.txt").write_text("a\nb\n")
        (tmp_path / "f2.txt").write_text("c\n")
        rows = file_lines_input(spark, str(tmp_path)).collect()
        by_content = {bytes(r["content"]).decode(): r["batch_id"] for r in rows}
        assert by_content["a"] >> 32 == 0 and by_content["c"] >> 32 == 1
        assert rows[0]["meta"]["path"].endswith(".txt")


@pytest.mark.spark
class TestJmespathNativeSubset:
    def test_simple_path_compiles_native(self, spark):
        from benthos_spark.engine.spark_exec import NativePipeline

        df = spark.createDataFrame([(1, '{"a":{"b":"x"}}')], "id long, content string")
        pipe = NativePipeline(
            [{"jmespath": {"query": "a.b", "column": "content", "result": "r"}}],
            dict(df.dtypes),
        )
        assert pipe(df).collect()[0]["r"] == "x"

    def test_complex_query_falls_back(self, spark):
        from benthos_spark.bloblang.compiler import CompileError
        from benthos_spark.engine.spark_exec import NativePipeline

        df = spark.createDataFrame([(1, "{}")], "id long, content string")
        with pytest.raises(CompileError):
            NativePipeline(
                [{"jmespath": {"query": "a[?b=='x']"}}], dict(df.dtypes)
            )

    def test_batch_bytes_zero_length_guard(self, spark):
        from benthos_spark.engine.spark_exec import NativePipeline

        df = spark.createDataFrame(
            [(0, ""), (1, ""), (2, "abc")], "seq long, content string"
        )
        pipe = NativePipeline(
            [{"batch": {"byte_size": 2, "order_by": ["seq"], "size_col": "content"}}],
            dict(df.dtypes),
        )
        got = {r["seq"]: r["batch"] for r in pipe(df).collect()}
        assert got[0] == 0 and got[1] == 0 and got[2] == 1
