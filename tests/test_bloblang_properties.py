"""Property tests (hypothesis) for Bloblang coercion/arithmetic semantics vs
the Go behavior table (SURVEY.md §1.2; type_helpers.go / arithmetic.go —
behavior only). Also round-trips the canonical serializer."""

import json
import math

from hypothesis import given, settings, strategies as st

from benthos_spark.bloblang import Interpreter, Part, parse_mapping
from benthos_spark.bloblang.values import (
    go_format_float,
    parse_json,
    serialize,
    to_string,
    values_equal,
)

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15
)
json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-(2**53), 2**53), finite_floats, st.text()
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=10,
)


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_serializer_roundtrips_through_python_json(v):
    out = serialize(v)
    assert parse_json(out) == json.loads(out)


@given(finite_floats)
@settings(max_examples=300, deadline=None)
def test_go_float_format_parses_back_exactly(f):
    s = go_format_float(f)
    assert float(s) == f
    # Go never prints a trailing ".0" for integral values
    assert not s.endswith(".0")


@given(st.integers(-(2**50), 2**50), st.integers(-(2**50), 2**50))
@settings(max_examples=100, deadline=None)
def test_addition_widens_to_float(a, b):
    it = Interpreter()
    mp = parse_mapping('root = json("a") + json("b")')
    out = it.map_part(mp, [Part(serialize({"a": a, "b": b}).encode())], 0)
    assert float(out.content) == float(a) + float(b)


@given(json_scalars, json_scalars)
@settings(max_examples=200, deadline=None)
def test_equality_restriction_symmetric_and_type_safe(a, b):
    assert values_equal(a, b) == values_equal(b, a)
    if isinstance(a, bool) != isinstance(b, bool):
        assert not values_equal(a, b)
    if isinstance(a, str) and isinstance(b, (int, float)) and not isinstance(b, bool):
        assert not values_equal(a, b)  # "3" != 3 (restrictForComparison)


@given(st.integers(0, 2**53), st.integers(1, 2**30))
@settings(max_examples=100, deadline=None)
def test_mod_and_div_semantics(a, b):
    it = Interpreter()
    mp = parse_mapping('root.m = json("a") % json("b")\nroot.d = json("a") / json("b")')
    out = it.map_part(mp, [Part(serialize({"a": a, "b": b}).encode())], 0)
    doc = parse_json(out.content)
    assert doc["m"] == a % b
    assert math.isclose(doc["d"], a / b, rel_tol=1e-12)


@given(st.lists(st.integers(-1000, 1000), min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_sum_and_fold_max_agree_with_python(xs):
    it = Interpreter()
    mp = parse_mapping(
        'root.s = json("xs").sum()\n'
        'root.m = json("xs").fold(-100000, match { tally < value => value\n _ => tally })'
    )
    out = it.map_part(mp, [Part(serialize({"xs": xs}).encode())], 0)
    doc = parse_json(out.content)
    assert doc["s"] == sum(xs)
    assert doc["m"] == max(xs, default=-100000)


@given(st.text(max_size=50))
@settings(max_examples=200, deadline=None)
def test_string_methods_total(s):
    it = Interpreter()
    mp = parse_mapping(
        'root.u = json("s").uppercase()\n'
        'root.t = json("s").trim()\n'
        'root.l = json("s").length()\n'
        'root.q = json("s").quote().unquote()'
    )
    out = it.map_part(mp, [Part(serialize({"s": s}).encode())], 0)
    doc = parse_json(out.content)
    assert doc["u"] == s.upper()
    assert doc["t"] == s.strip()
    assert doc["l"] == len(s)
    assert doc["q"] == s


@given(st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_xxhash64_matches_known_vectors_shape(data):
    from benthos_spark.bloblang.xxhash64 import xxhash64_int

    h = xxhash64_int(data)
    assert 0 <= h < 2**64
    assert xxhash64_int(data) == h  # deterministic


def test_xxhash64_reference_vectors():
    # public XXH64 test vectors (xxhash.com spec): seed 0
    from benthos_spark.bloblang.xxhash64 import xxhash64_int

    assert xxhash64_int(b"") == 0xEF46DB3751D8E999
    assert xxhash64_int(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64_int(b"abc") == 0x44BC2CF5AD770999
    assert xxhash64_int(b"Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1
