"""Frame-mode native Bloblang compilation (r4 verdict ask #7): dynamic-JSON
mappings over message frames compile to get_json_object/coalesce Catalyst
expressions instead of the Arrow interpreter kernel. Every test here runs the
SAME frame through the native path (compile_or_frame must report "native")
AND the interpreter kernel (run_frame_pipeline) and asserts byte-identical
surviving contents — the interpreter is the semantics oracle, the golden
corpus pins IT to the reference.
"""

import pytest
from pyspark.sql import functions as F

from benthos_spark.engine.spark_exec import (
    FRAME_SCHEMA,
    compile_or_frame,
    run_frame_pipeline,
)

# the reference's own cookbook mapping (config/test/cookbooks/filtering.yaml)
FILTERING_MAPPING = """root = match {
  meta("topic").or("") == "foo" ||
  doc.type.or("") == "bar" ||
  doc.urls.contains("https://www.benthos.dev/").catch(false) => deleted()
}
"""


def frame(spark, parts):
    """parts: list of (content_str, meta_dict)."""
    rows = [(0, i, c.encode(), m or {}) for i, (c, m) in enumerate(parts)]
    return spark.createDataFrame(rows, FRAME_SCHEMA)


def surviving(df):
    out = df.orderBy("seq").select("content", "meta").collect()
    return [(bytes(r["content"]).decode(), dict(r["meta"] or {})) for r in out]


def both_paths(spark, parts, conf):
    df = frame(spark, parts)
    native_out, mode = compile_or_frame(df, conf)
    assert mode == "native", "expected native compilation"
    interp_out = run_frame_pipeline(frame(spark, parts), conf)
    return surviving(native_out), surviving(interp_out)


@pytest.mark.spark
class TestFrameNativeFiltering:
    def test_filtering_cookbook_native_matches_interpreter(self, spark):
        parts = [
            ('{"doc":{"should":"remain"},"id":"1"}', {}),
            ('{"doc":{"should":"not remain"},"id":"2"}', {"topic": "foo"}),
            ('{"doc":{"should":"not remain","type":"bar"},"id":"3"}', {}),
            (
                '{"doc":{"should":"not remain","urls":'
                '["https://www.benthos.dev/"]},"id":"4"}',
                {},
            ),
        ]
        conf = [{"bloblang": FILTERING_MAPPING}]
        native, interp = both_paths(spark, parts, conf)
        assert native == interp
        assert [c for c, _m in native] == ['{"doc":{"should":"remain"},"id":"1"}']

    def test_contains_is_array_membership_not_substring(self, spark):
        # a url that merely CONTAINS the target as a prefix must survive:
        # contains() on a JSON array is exact-value membership (the dynamic
        # CASE dispatch), not substring search over the serialized text
        parts = [
            ('{"doc":{"urls":["https://www.benthos.dev/about"]},"id":"p"}', {}),
            ('{"doc":{"urls":["https://www.benthos.dev/"]},"id":"x"}', {}),
            ('{"doc":{"urls":"see https://www.benthos.dev/ here"},"id":"s"}', {}),
        ]
        conf = [{"bloblang": FILTERING_MAPPING}]
        native, interp = both_paths(spark, parts, conf)
        assert native == interp
        ids = [c for c, _m in native]
        assert len(ids) == 1 and '"id":"p"' in ids[0]

    def test_meta_missing_key_coalesces(self, spark):
        parts = [('{"a":1}', {}), ('{"a":2}', {"topic": "foo"})]
        conf = [{"bloblang": 'root = match { meta("topic").or("") == "foo" => deleted() }'}]
        native, interp = both_paths(spark, parts, conf)
        assert native == interp
        assert [c for c, _m in native] == ['{"a":1}']

    def test_numeric_comparison_coerces_json_string(self, spark):
        # "10" > 9 must be numeric (true), not lexicographic ("10" < "9")
        parts = [('{"n":10}', {}), ('{"n":9}', {}), ('{"n":2}', {})]
        conf = [{"bloblang": "root = match { n > 9 => deleted() }"}]
        native, interp = both_paths(spark, parts, conf)
        assert native == interp
        assert [c for c, _m in native] == ['{"n":9}', '{"n":2}']


@pytest.mark.spark
class TestFrameNativeRootAssign:
    def test_format_content_replacement(self, spark):
        # the reference's unit_test_example.yaml mapping
        parts = [("example content", {"example_key": "example metadata value"})]
        conf = [
            {"bloblang": 'root = "%vend".format(content().uppercase().string())'}
        ]
        native, interp = both_paths(spark, parts, conf)
        assert native == interp
        assert native == [
            ("EXAMPLE CONTENTend", {"example_key": "example metadata value"})
        ]

    def test_field_assignment_still_falls_back(self, spark):
        # field assignment needs JSON reserialization -> interpreter kernel
        parts = [('{"id":"foo","fans":[]}', {})]
        df = frame(spark, parts)
        out, mode = compile_or_frame(df, [{"bloblang": "root = this\nx = 1"}])
        assert mode == "frame"

    def test_meta_set_delete_clear(self, spark):
        parts = [('{"id":"a"}', {"keep": "1", "drop": "2"}),
                 ('{"id":"b"}', {"x": "y"})]
        conf = [{"bloblang": (
            'meta added = "v-" + meta("keep").or("none")\n'
            "meta drop = deleted()"
        )}]
        native, interp = both_paths(spark, parts, conf)
        assert native == interp
        assert native[0][1] == {"keep": "1", "added": "v-1"}
        assert native[1][1] == {"x": "y", "added": "v-none"}

        conf2 = [{"bloblang": "meta = deleted()"}]
        native2, interp2 = both_paths(spark, parts, conf2)
        assert native2 == interp2
        assert all(m == {} for _c, m in native2)

    def test_meta_numeric_value_falls_back(self, spark):
        # Go to_string(5.0) == "5" but Spark cast gives "5.0" — must not
        # compile natively
        df = frame(spark, [('{"n":1}', {})])
        out, mode = compile_or_frame(df, [{"bloblang": "meta x = 1 + 2"}])
        assert mode == "frame"

    def test_spec_frameifies_content_shaped_input(self, spark):
        # drive-discovered r5 gap: an inline typed input of raw JSON strings
        # (schema "content string") must reach message semantics — the spec
        # runner coerces it to the frame schema and retries native
        from benthos_spark.engine.spec import run_spec

        out = run_spec(spark, {
            "input": {"inline": {
                "rows": [['{"doc":{"should":"remain"},"id":"1"}'],
                         ['{"doc":{"type":"bar"},"id":"2"}'],
                         ['{"doc":{"urls":["https://www.benthos.dev/"]},"id":"3"}']],
                "schema": "content string",
            }},
            "pipeline": {"processors": [{"bloblang": FILTERING_MAPPING}]},
            "output": {"memory": {}},
        })
        rows = out.collect()
        assert len(rows) == 1
        assert b'"id":"1"' in bytes(rows[0]["content"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan

    def test_spec_typed_noncompilable_still_raises(self, spark):
        # a genuinely typed pipeline (no content column) whose mapping cannot
        # compile must NOT be silently frame-ified (bare refs would become
        # JSON paths); it fails fast with the ORIGINAL CompileError — not a
        # misleading input-shape complaint (r5 review finding)
        import pytest as _pytest

        from benthos_spark.bloblang.compiler import CompileError
        from benthos_spark.engine.spec import run_spec

        with _pytest.raises(CompileError, match="parse_json needs a schema"):
            run_spec(spark, {
                "input": {"inline": {"rows": [[1, "x"]],
                                     "schema": "a long, b string"}},
                "pipeline": {"processors": [
                    {"bloblang": 'c = b.parse_json().get("k")'}
                ]},
                "output": {"memory": {}},
            })

    def test_native_plan_has_no_python(self, spark):
        df = frame(spark, [('{"doc":{"type":"bar"}}', {})])
        out, mode = compile_or_frame(df, [{"bloblang": FILTERING_MAPPING}])
        assert mode == "native"
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan
