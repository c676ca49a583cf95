"""avro / jmespath / json_schema processors + new conditions — table tests
mirroring the reference's own vectors (lib/processor/avro_test.go,
lib/processor/jmespath.go docs example, lib/condition/jmespath_test.go,
lib/condition/check_interpolation.go docs example)."""

import json

import pytest

from benthos_spark.bloblang.interp import FAIL_META_KEY, Interpreter, Part
from benthos_spark.engine.conditions import build_condition
from benthos_spark.engine.processors import Env, Resources, build_processor
import benthos_spark.engine.processors_ext  # noqa: F401 — registers ext processors

AVRO_SCHEMA = """{
    "namespace": "foo.namespace.com",
    "type": "record",
    "name": "identity",
    "fields": [
        { "name": "Name", "type": "string"},
        { "name": "Address", "type": ["null",{
            "namespace": "my.namespace.com",
            "type": "record",
            "name": "address",
            "fields": [
                { "name": "City", "type": "string" },
                { "name": "State", "type": "string" }
            ]
        }],"default":null}
    ]
}"""


def run_proc(conf, payloads):
    proc = build_processor(conf)
    env = Env()
    batches = proc.process([Part(p if isinstance(p, bytes) else p.encode(), {}) for p in payloads], env)
    assert len(batches) == 1
    return batches[0]


class TestAvroProcessor:
    # vectors from /root/reference/lib/processor/avro_test.go:49-115
    def test_textual_to_json(self):
        out = run_proc(
            {"avro": {"operator": "to_json", "encoding": "textual", "schema": AVRO_SCHEMA}},
            ['{"Name":"foo","Address":{"my.namespace.com.address":{"City":"foo","State":"bar"}}}'],
        )
        assert out[0].content == (
            b'{"Address":{"my.namespace.com.address":{"City":"foo","State":"bar"}},"Name":"foo"}'
        )
        assert FAIL_META_KEY not in out[0].meta

    def test_binary_to_json(self):
        out = run_proc(
            {"avro": {"operator": "to_json", "encoding": "binary", "schema": AVRO_SCHEMA}},
            [b"\x06foo\x02\x06foo\x06bar"],
        )
        assert out[0].content == (
            b'{"Address":{"my.namespace.com.address":{"City":"foo","State":"bar"}},"Name":"foo"}'
        )

    def test_json_to_binary(self):
        out = run_proc(
            {"avro": {"operator": "from_json", "encoding": "binary", "schema": AVRO_SCHEMA}},
            ['{"Name":"foo","Address":{"my.namespace.com.address":{"City":"foo","State":"bar"}}}'],
        )
        assert out[0].content == b"\x06foo\x02\x06foo\x06bar"

    def test_single_object_fingerprint_matches_goavro(self):
        # commented-out goavro vector in avro_test.go:104-115:
        # \xc3\x01 + LE fingerprint 84 3e e0 ee bb f1 c7 8b + binary body
        from benthos_spark.formats.avro import Codec

        codec = Codec(AVRO_SCHEMA)
        native = {"Name": "foo", "Address": {"my.namespace.com.address": {"City": "foo", "State": "bar"}}}
        single = codec.encode(native, "single")
        assert single == b"\xc3\x01\x84\x3e\xe0\xee\xbb\xf1\xc7\x8b\x06foo\x02\x06foo\x06bar"
        assert codec.decode(single, "single") == native

    def test_null_union_branch(self):
        out = run_proc(
            {"avro": {"operator": "from_json", "encoding": "binary", "schema": AVRO_SCHEMA}},
            ['{"Name":"n","Address":null}'],
        )
        assert out[0].content == b"\x02n\x00"
        back = run_proc(
            {"avro": {"operator": "to_json", "encoding": "binary", "schema": AVRO_SCHEMA}},
            [out[0].content],
        )
        assert json.loads(back[0].content) == {"Name": "n", "Address": None}

    def test_bad_payload_flags_error(self):
        out = run_proc(
            {"avro": {"operator": "from_json", "encoding": "binary", "schema": AVRO_SCHEMA}},
            ["not json"],
        )
        assert FAIL_META_KEY in out[0].meta

    def test_primitive_roundtrip_all_encodings(self):
        from benthos_spark.formats.avro import Codec

        schema = {
            "type": "record", "name": "t", "fields": [
                {"name": "i", "type": "int"},
                {"name": "l", "type": "long"},
                {"name": "d", "type": "double"},
                {"name": "b", "type": "boolean"},
                {"name": "s", "type": "string"},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "string"}},
                {"name": "e", "type": {"type": "enum", "name": "col", "symbols": ["RED", "BLUE"]}},
            ],
        }
        codec = Codec(schema)
        datum = {"i": -42, "l": 1 << 40, "d": 2.5, "b": True, "s": "héllo",
                 "arr": [1, -2, 3], "m": {"a": "x"}, "e": "BLUE"}
        for enc in ("binary", "textual", "single"):
            assert codec.decode(codec.encode(datum, enc), enc) == datum


class TestJMESPath:
    def test_processor_replaces_payload(self):
        # docs example at lib/processor/jmespath.go:30-55
        doc = {
            "locations": [
                {"name": "Seattle", "state": "WA"},
                {"name": "New York", "state": "NY"},
                {"name": "Bellevue", "state": "WA"},
                {"name": "Olympia", "state": "WA"},
            ]
        }
        out = run_proc(
            {"jmespath": {"query": "locations[?state == 'WA'].name | sort(@) | {Cities: join(', ', @)}"}},
            [json.dumps(doc)],
        )
        assert json.loads(out[0].content) == {"Cities": "Bellevue, Olympia, Seattle"}

    def test_processor_flags_unparseable(self):
        out = run_proc({"jmespath": {"query": "foo"}}, ["not json"])
        assert FAIL_META_KEY in out[0].meta

    def test_condition_boolean_only(self):
        # lib/condition/jmespath_test.go: bool pos/neg + non-bool result -> False
        interp = Interpreter()
        cond = build_condition({"jmespath": {"query": "foo == 'bar'"}})
        assert cond.check([Part(b'{"foo":"bar"}', {})], 0, interp) is True
        assert cond.check([Part(b'{"foo":"baz"}', {})], 0, interp) is False
        cond2 = build_condition({"jmespath": {"query": "foo"}})
        assert cond2.check([Part(b'{"foo":"bar"}', {})], 0, interp) is False


class TestJSONSchema:
    SCHEMA = {
        "type": "object",
        "properties": {
            "firstName": {"type": "string"},
            "age": {"type": "integer", "minimum": 0},
        },
    }

    def test_processor_keeps_payload_flags_invalid(self):
        ok = json.dumps({"firstName": "John", "age": 21})
        bad = json.dumps({"firstName": "John", "age": -21})
        out = run_proc({"json_schema": {"schema": self.SCHEMA}}, [ok, bad])
        assert out[0].content == ok.encode() and FAIL_META_KEY not in out[0].meta
        assert out[1].content == bad.encode() and "age" in out[1].meta[FAIL_META_KEY]

    def test_condition(self):
        interp = Interpreter()
        cond = build_condition({"json_schema": {"schema": self.SCHEMA}})
        assert cond.check([Part(b'{"age": 3}', {})], 0, interp) is True
        assert cond.check([Part(b'{"age": -3}', {})], 0, interp) is False


class TestNewConditions:
    def test_check_interpolation_batch_size(self):
        # docs example at lib/condition/check_interpolation.go:27-35
        interp = Interpreter()
        cond = build_condition(
            {"check_interpolation": {
                "value": "${! batch_size() }",
                "condition": {"number": {"operator": "greater_than", "arg": 1}},
            }}
        )
        two = [Part(b"a", {}), Part(b"b", {})]
        assert cond.check(two, 0, interp) is True
        assert cond.check([Part(b"a", {})], 0, interp) is False

    def test_resource_condition(self):
        env = Env(resources=Resources())
        env.resources.conditions["is_bar"] = build_condition(
            {"text": {"operator": "equals_cs", "arg": "bar"}}
        )
        cond = build_condition({"resource": "is_bar"})
        assert cond.check([Part(b"bar", {})], 0, env.interp) is True
        assert cond.check([Part(b"baz", {})], 0, env.interp) is False
        with pytest.raises(ValueError):
            build_condition({"resource": "missing"}).check([Part(b"x", {})], 0, env.interp)


class TestAvroProperty:
    def test_random_documents_roundtrip(self):
        """Property: decode(encode(x)) == x across all three encodings for
        randomized documents over a fixed record schema (seeded hypothesis)."""
        from hypothesis import given, settings, strategies as st

        from benthos_spark.formats.avro import Codec

        schema = {
            "type": "record", "name": "doc", "fields": [
                {"name": "s", "type": "string"},
                {"name": "n", "type": "long"},
                {"name": "d", "type": "double"},
                {"name": "b", "type": "boolean"},
                {"name": "opt", "type": ["null", "string"], "default": None},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "string"}},
            ],
        }
        codec = Codec(schema)

        @settings(max_examples=200, deadline=None)
        @given(
            s=st.text(max_size=40),
            n=st.integers(min_value=-(2**63), max_value=2**63 - 1),
            d=st.floats(allow_nan=False, allow_infinity=False),
            b=st.booleans(),
            opt=st.none() | st.text(max_size=10),
            arr=st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=8),
            m=st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=5),
        )
        def check(s, n, d, b, opt, arr, m):
            datum = {"s": s, "n": n, "d": d, "b": b,
                     "opt": None if opt is None else {"string": opt},
                     "arr": arr, "m": m}
            for enc in ("binary", "single"):
                assert codec.decode(codec.encode(datum, enc), enc) == datum

        check()
