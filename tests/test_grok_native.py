"""Native (single-regex codegen) grok vs the frame kernel.

The native stage must agree value-for-value with GrokProc (the Python
reference surface already replaying grok.go semantics) and keep Python out
of the plan.
"""

import json as _json

import pytest
from pyspark.sql import functions as F

from benthos_spark.engine.processors_ext import (
    _GROK_PATTERNS,
    GrokProc,
    grok_to_java,
)
from benthos_spark.engine.spark_exec import (
    CompileError,
    NativePipeline,
    frame_from_strings,
    run_frame_pipeline,
)


def plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


APACHE_LINES = [
    '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326',
    '10.1.2.3 - - [10/Oct/2000:13:55:36 -0700] "POST /form HTTP/1.1" 302 -',
    "not an apache line at all",
    '192.168.0.9 - bob [10/Oct/2000:13:55:36 -0700] "HEAD /x HTTP/1.1" 404 0',
    "",
]


def frame_grok(spark, lines, conf):
    frame = frame_from_strings(spark, [l.encode() for l in lines])
    out = run_frame_pipeline(frame, [{"grok": conf}]).collect()
    docs = {}
    for r in out:
        meta = dict(r["meta"] or {})
        if meta.get("benthos_processing_failed") or meta.get("error"):
            docs[r["seq"]] = None
        else:
            try:
                docs[r["seq"]] = _json.loads(bytes(r["content"]))
            except Exception:
                docs[r["seq"]] = None
    return docs


def native_grok(spark, lines, conf, fields):
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lines)], "i long, line string"
    )
    pipe = NativePipeline(
        [{"grok": {**conf, "column": "line"}}], dict(df.dtypes)
    )
    out = pipe(df)
    assert "MapInPandas" not in plan_of(out)
    assert "BatchEvalPython" not in plan_of(out)
    return {r["i"]: {f: r[f] for f in fields} for r in out.collect()}


class TestGrokNative:
    def test_apache_values_match_frame_kernel(self, spark):
        conf = {"patterns": ["%{COMMONAPACHELOG}"]}
        _, fields, _ = grok_to_java("%{COMMONAPACHELOG}")
        names = [n for n, _ in fields]
        kernel = frame_grok(spark, APACHE_LINES, conf)
        native = native_grok(spark, APACHE_LINES, conf, names)
        for i, line in enumerate(APACHE_LINES):
            k, n = kernel[i], native[i]
            if k is None:
                assert all(v is None for v in n.values()), (line, n)
                continue
            for f in names:
                assert n[f] == k.get(f), (line, f, n[f], k.get(f))

    def test_casts_int_float(self, spark):
        conf = {
            "patterns": ["dur=%{NUMBER:dur:float} code=%{INT:code:int}"],
        }
        lines = ["dur=1.25 code=200", "dur=x code=y", "dur=3 code=-7"]
        _, fields, casts = grok_to_java(conf["patterns"][0])
        names = [n for n, _ in fields]
        assert casts == {"dur": "float", "code": "int"}
        native = native_grok(spark, lines, conf, names)
        assert native[0] == {"dur": 1.25, "code": 200}
        assert all(v is None for v in native[1].values())
        assert native[2] == {"dur": 3.0, "code": -7}

    def test_custom_definitions_and_multiline(self, spark):
        conf = {
            "patterns": ["id=%{MYID:ident}"],
            "pattern_definitions": {"MYID": "[A-Z]{3}-[0-9]+"},
        }
        lines = ["prefix\nid=ABC-123\nsuffix", "id=nope"]
        native = native_grok(spark, lines, conf, ["ident"])
        assert native[0] == {"ident": "ABC-123"}
        assert native[1] == {"ident": None}

    def test_multi_pattern_first_match_wins(self, spark):
        """Kernel semantics: patterns tried in order, fields come from the
        FIRST matching pattern only."""
        conf = {"patterns": ["num=%{INT:a:int}", "word=%{WORD:b}"]}
        lines = ["num=42", "word=hello", "num=1 word=x", "nothing here"]
        kernel = frame_grok(spark, lines, conf)
        native = native_grok(spark, lines, conf, ["a", "b"])
        assert native[0] == {"a": 42, "b": None}
        assert native[1] == {"a": None, "b": "hello"}
        # line 2 matches pattern 0 first -> only 'a'
        assert native[2] == {"a": 1, "b": None}
        assert native[3] == {"a": None, "b": None}
        for i in (0, 1, 2):
            k = kernel[i]
            for f in ("a", "b"):
                assert native[i][f] == k.get(f), (i, f)
        assert kernel[3] is None

    def test_no_pattern_fails_compile(self, spark):
        with pytest.raises(CompileError):
            NativePipeline(
                [{"grok": {"patterns": [], "column": "x"}}], {"x": "string"}
            )

    def test_every_standard_pattern_converts(self):
        for name in _GROK_PATTERNS:
            java, _, _ = grok_to_java("%%{%s:f}" % name if False else "%{" + name + ":f}")
            assert java  # conversion itself must not raise

    def test_python_only_constructs_rejected(self):
        with pytest.raises(ValueError):
            grok_to_java("(?P<a>x)(?P=a)", {})

    def test_group_indices_align_with_python(self):
        """The recorded Java group index must equal Python's for every
        standard pattern — verified by matching a synthetic line with the
        PYTHON regex and comparing groupdict to indexed groups."""
        import re

        from benthos_spark.engine.processors_ext import grok_to_regex

        pat = "%{COMBINEDAPACHELOG}"
        casts = {}
        py = grok_to_regex(pat, None, casts)
        java, fields, _ = grok_to_java(pat)
        rx = re.compile(py)
        line = (
            '1.2.3.4 - u7 [10/Oct/2000:13:55:36 -0700] '
            '"GET /a/b?q=1 HTTP/1.1" 200 512 "http://r.example/" "curl/8"'
        )
        m = rx.search(line)
        assert m
        for name, idx in fields:
            assert m.group(idx) == m.groupdict()[name], name

    def test_empty_capture_nulled_like_remove_empty(self, spark):
        conf = {"patterns": ["a=%{DATA:a} b=%{WORD:b}"]}
        lines = ["a= b=zz"]
        kernel = frame_grok(spark, lines, conf)
        native = native_grok(spark, lines, conf, ["a", "b"])
        assert kernel[0] == {"b": "zz"}  # empty a dropped by remove_empty
        assert native[0] == {"a": None, "b": "zz"}


class TestReferenceVectors:
    """lib/processor/grok_test.go replayed byte-exactly through GrokProc
    (frame kernel) and value-exactly through the native stage."""

    VECTORS = [
        ("%{WORD:first},%{INT:second:int}", None, "foo,0",
         '{"first":"foo","second":0}'),
        ("%{WORD:first},%{INT:second:int}", None, "foo,2",
         '{"first":"foo","second":2}'),
        ("%{COMMONAPACHELOG}", None,
         '127.0.0.1 - - [23/Apr/2014:22:58:32 +0200] "GET /index.php HTTP/1.1" 404 207',
         '{"auth":"-","bytes":"207","clientip":"127.0.0.1","httpversion":"1.1",'
         '"ident":"-","request":"/index.php","response":"404",'
         '"timestamp":"23/Apr/2014:22:58:32 +0200","verb":"GET"}'),
        ("%{ACTION:action} connection from %{IPV4:ipv4}", {"ACTION": "(pass|deny)"},
         "pass connection from 127.0.0.1",
         '{"action":"pass","ipv4":"127.0.0.1"}'),
    ]

    def test_frame_kernel_byte_exact(self):
        from benthos_spark.bloblang.interp import Interpreter
        from benthos_spark.engine.processors import Env, Part, build_processor

        env = Env(interp=Interpreter())
        for pattern, defs, inp, want in self.VECTORS:
            conf = {"patterns": [pattern]}
            if defs:
                conf["pattern_definitions"] = defs
            proc = build_processor({"grok": conf})
            [batch] = proc.process([Part(inp.encode(), {})], env)
            assert batch[0].content.decode() == want, (pattern, inp)

    def test_native_stage_value_exact(self, spark):
        import json

        for pattern, defs, inp, want in self.VECTORS:
            conf = {"patterns": [pattern]}
            if defs:
                conf["pattern_definitions"] = defs
            _, fields, _ = grok_to_java(pattern, defs or {})
            names = [n for n, _ in fields]
            got = native_grok(spark, [inp], conf, names)[0]
            expected = json.loads(want)
            for f in names:
                assert got[f] == expected.get(f), (pattern, f)
