"""Replay the reference's own awk processor test table
(/root/reference/lib/processor/awk_test.go TestAWK) through our AwkProc —
same pattern as the golden corpus: the vectors are read from the reference
at test time, never copied into this repo."""

import os
import re

import pytest

from benthos_spark.bloblang.interp import FAIL_META_KEY, Part
from benthos_spark.engine.processors import Env, build_processor

AWK_TEST_GO = "/root/reference/lib/processor/awk_test.go"

_FIELD_RE = re.compile(
    r"(?P<key>name|codec|program|input|output)\s*:\s*(?:`(?P<raw>[^`]*)`|\"(?P<q>(?:\\.|[^\"\\])*)\")",
    re.S,
)
_MAP_RE = re.compile(
    r"(?P<key>metadata|metadataAfter)\s*:\s*map\[string\]string\{(?P<body>[^}]*)\}", re.S
)
_KV_RE = re.compile(r"\"((?:\\.|[^\"\\])*)\"\s*:\s*\"((?:\\.|[^\"\\])*)\"")


def _collect():
    if not os.path.exists(AWK_TEST_GO):
        return []
    src = open(AWK_TEST_GO).read()
    body = src.split("tests := []jTest{", 1)[1]
    # struct literals are brace-balanced; walk entries at depth 1
    cases, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0 and start is not None:
                cases.append(body[start + 1:i])
                start = None
            if depth < 0:
                break
    out = []
    for c in cases:
        entry = {"metadata": {}, "metadataAfter": {}}
        for m in _MAP_RE.finditer(c):
            entry[m.group("key")] = dict(_KV_RE.findall(m.group("body")))
            c = c.replace(m.group(0), "")
        for m in _FIELD_RE.finditer(c):
            val = m.group("raw") if m.group("raw") is not None else m.group("q")
            entry[m.group("key")] = val
        if "program" in entry and "name" in entry:
            out.append(pytest.param(entry, id=entry["name"].replace(" ", "_")))
    return out


_CASES = _collect()


@pytest.mark.skipif(not _CASES, reason="reference awk_test.go not available")
@pytest.mark.parametrize("case", _CASES)
def test_awk_reference_case(case):
    proc = build_processor(
        {"awk": {"codec": case.get("codec", "none"), "program": case["program"]}}
    )
    part = Part(case.get("input", "").encode(), dict(case["metadata"]))
    (batch,) = proc.process([part], Env())
    got = batch[0]
    # mirror awk_test.go exactly: content + metadataAfter (error cases keep
    # the original payload and carry the fail flag, which the reference's own
    # test doesn't inspect)
    assert got.content.decode() == case.get("output", "")
    if case["metadataAfter"]:
        meta = {k: v for k, v in got.meta.items() if k != FAIL_META_KEY}
        assert meta == case["metadataAfter"]
