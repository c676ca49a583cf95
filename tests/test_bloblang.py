"""Unit tests for the Bloblang-subset parser/interpreter, mirroring the
reference's Go test tables (lib/bloblang/x/query/methods_test.go,
arithmetic_test.go, mapping/parser_test.go — behavior, not code)."""

import pytest

from benthos_spark.bloblang import Interpreter, Part, parse_mapping
from benthos_spark.bloblang.values import (
    Delete,
    go_format_float,
    serialize,
    to_string,
    values_equal,
)


def run_map(src: str, content: bytes, meta=None, batch=None, index=0):
    it = Interpreter()
    parts = batch if batch is not None else [Part(content, meta or {})]
    return it.map_part(parse_mapping(src), parts, index)


class TestFloatFormat:
    @pytest.mark.parametrize(
        "f,s",
        [
            (5.0, "5"),
            (821.0, "821"),
            (0.57, "0.57"),
            (-3.25, "-3.25"),
            (0.0, "0"),
            (1e21, "1e+21"),
            (1.5e-7, "1.5e-07"),
            (123456789.5, "123456789.5"),
        ],
    )
    def test_go_format(self, f, s):
        assert go_format_float(f) == s


class TestSerialize:
    def test_sorted_keys_no_html_escape(self):
        assert (
            serialize({"b": 1, "a": "<x> & y"}) == '{"a":"<x> & y","b":1}'
        )

    def test_nested(self):
        assert serialize({"a": [1.0, {"z": None, "y": True}]}) == '{"a":[1,{"y":true,"z":null}]}'


class TestCoercion:
    def test_equality_restriction(self):
        assert values_equal(3, 3.0)
        assert not values_equal(3, "3")
        assert not values_equal(True, 1)
        assert values_equal(b"x", "x")

    def test_to_string(self):
        assert to_string(None) == "null"
        assert to_string(5.0) == "5"
        assert to_string(True) == "true"
        assert to_string({"a": 1}) == '{"a":1}'


class TestMappings:
    def test_root_passthrough_when_unassigned(self):
        out = run_map("root = match {\n  false => deleted()\n}", b"not json at all")
        assert out.content == b"not json at all"

    def test_arith_widens_to_float(self):
        out = run_map('root = json("a") + json("b")', b'{"a":2,"b":3}')
        assert out.content == b"5"

    def test_string_concat(self):
        out = run_map('root = json("a") + "-suffix"', b'{"a":"x"}')
        assert out.content == b"x-suffix"

    def test_subpath_assignment_creates_containers(self):
        out = run_map('root.a.b = 1\nroot.a.c = "x"', b"{}")
        assert out.content == b'{"a":{"b":1,"c":"x"}}'

    def test_delete_field(self):
        out = run_map('root = this\nroot.b = deleted()', b'{"a":1,"b":2}')
        assert out.content == b'{"a":1}'

    def test_meta_assignment_coerces_string(self):
        out = run_map("root = this\nmeta count = 5 + 5", b"{}")
        assert out.meta["count"] == "10"

    def test_meta_delete(self):
        out = run_map("meta topic = deleted()", b"{}", meta={"topic": "x", "o": "y"})
        assert out.meta == {"o": "y"}

    def test_let_var(self):
        out = run_map('let x = json("a") * 2\nroot.y = var("x") + 1', b'{"a":4}')
        assert out.content == b'{"y":9}'

    def test_named_map_apply(self):
        src = 'map parts {\n  root.len = this.length()\n}\nroot = json("s").apply("parts")'
        out = run_map(src, b'{"s":"hello"}')
        assert out.content == b'{"len":5}'

    def test_batch_functions(self):
        batch = [Part(b'{"v":%d}' % i) for i in range(4)]
        it = Interpreter()
        mp = parse_mapping(
            'root.i = batch_index()\nroot.n = batch_size()\nroot.all = json("v").from_all()\nroot.two = json("v").from(2)'
        )
        out = it.map_part(mp, batch, 1)
        assert out.content == b'{"all":[0,1,2,3],"i":1,"n":4,"two":2}'

    def test_match_literal_case(self):
        src = 'root = match json("t") {\n  "a" => 1\n  "b" => 2\n  _ => 0\n}'
        assert run_map(src, b'{"t":"b"}').content == b"2"
        assert run_map(src, b'{"t":"z"}').content == b"0"

    def test_deleted_root_drops_part(self):
        assert run_map("root = deleted()", b"{}") is Delete

    def test_error_catch_or(self):
        out = run_map(
            'root.a = json("missing").number().catch(-1)\n'
            'root.b = meta("nope").or("dflt")',
            b"{}",
        )
        assert out.content == b'{"a":-1,"b":"dflt"}'

    def test_string_methods(self):
        out = run_map(
            'root.u = json("s").uppercase()\n'
            'root.p = json("s").has_prefix("he")\n'
            'root.r = json("s").replace("l", "L")\n'
            'root.re = json("s").re_replace("l+", "_")\n'
            'root.sl = json("s").slice(1, 3)\n'
            'root.sp = json("csv").split(",")',
            b'{"s":"hello","csv":"a,b,c"}',
        )
        assert (
            out.content
            == b'{"p":true,"r":"heLLo","re":"he_o","sl":"el","sp":["a","b","c"],"u":"HELLO"}'
        )

    def test_hash_encode(self):
        out = run_map(
            'root.h = json("s").hash("sha256").encode("hex").string()\n'
            'root.x = json("s").hash("xxhash64").string()',
            b'{"s":"hello world"}',
        )
        import hashlib

        want_h = hashlib.sha256(b"hello world").hexdigest()
        # XXH64("hello world") reference digest = 0x45ab6734b21e6968
        assert out.content.decode() == (
            '{"h":"%s","x":"%d"}' % (want_h, 0x45AB6734B21E6968)
        )

    def test_array_object_methods(self):
        out = run_map(
            'root.f = json("a").flatten()\n'
            'root.k = json("o").keys()\n'
            'root.v = json("o").values().sort()\n'
            'root.c = json("o").collapse()\n'
            'root.m = json("o").merge({"c": 3})',
            b'{"a":[[1,2],[3]],"o":{"a":1,"b":2}}',
        )
        assert (
            out.content == b'{"c":{"a":1,"b":2},"f":[1,2,3],"k":["a","b"],'
            b'"m":{"a":1,"b":2,"c":3},"v":[1,2]}'
        )

    def test_number_coercions(self):
        out = run_map(
            'root.n = json("s").number()\nroot.d = json("bad").number(9)', b'{"s":"1.5","bad":"xx"}'
        )
        assert out.content == b'{"d":9,"n":1.5}'

    def test_count_function_increments(self):
        it = Interpreter()
        mp = parse_mapping('root.c = count("x")')
        p = [Part(b"{}")]
        assert it.map_part(mp, p, 0).content == b'{"c":1}'
        assert it.map_part(mp, p, 0).content == b'{"c":2}'

    def test_context_expression(self):
        out = run_map('root = json("a").(b | c)', b'{"a":{"c":42}}')
        assert out.content == b"42"

    def test_sort_by_and_filter(self):
        out = run_map(
            'root = json("a").filter(this > 1).sort_by(this * -1)', b'{"a":[3,1,2]}'
        )
        assert out.content == b"[3,2]"


class TestLegacyInterpolation:
    """Full deprecated interpolation table
    (lib/bloblang/x/query/deprecated_functions.go:144-228)."""

    def test_all_legacy_forms(self):
        import json

        from benthos_spark.bloblang.interp import InterpolatedField, Interpreter, Part

        i = Interpreter()
        parts = [Part(b'{"doc":{"title":"hi"}}', {"topic": "t1"}), Part(b"x", {})]

        def r(src):
            return InterpolatedField(src).resolve(i, parts, 0)

        assert r("${!json_field:doc.title}") == "hi"
        assert r("${!json_field:doc.title,0}") == "hi"
        assert r("${!metadata:topic}") == "t1"
        assert r("${!echo:foo}") == "foo"
        assert r("${!batch_size}") == "2"
        assert r("${!content}") == '{"doc":{"title":"hi"}}'
        assert json.loads(r("${!metadata_json_object}")) == {"topic": "t1"}
        assert len(r("${!timestamp_utc:2006-01-02}")) == 10
        assert r("${!count:legacy_ctr}") == "1" and r("${!count:legacy_ctr}") == "2"
