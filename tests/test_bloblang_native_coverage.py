"""Bloblang native-compilation coverage report (r3 verdict ask #9).

The ColumnCompiler-vs-interpreter split decides the hot path: mappings that
compile to Catalyst Columns run in whole-stage codegen, everything else
falls back to the Arrow-batched interpreter kernel. This test measures —
over every bloblang mapping in the reference's own config-test corpus —
which mappings compile natively, prints the per-mapping report into pytest
output (-s / failure), and asserts a FLOOR so a refactor that silently
knocks mappings off the native path fails loudly.

(Compilation builds Column objects, which need an active SparkContext —
no jobs run, but the session fixture is required.)
"""

import os

import pytest
import yaml

from benthos_spark.bloblang.compiler import (
    CompileError,
    compile_mapping_to_transform,
)
from benthos_spark.bloblang.parser import (
    ArrayLit,
    Bin,
    CtxExpr,
    FieldRef,
    Func,
    Lit,
    Mapping,
    Match,
    Method,
    ObjectLit,
    This,
    Unary,
    parse_mapping,
)
from benthos_spark.engine.golden import REFERENCE_TEST_DIR


def _walk_fields(node, out):
    """Collect top-level field names a mapping reads (so compilation is
    measured against a schema that HAS those columns — we are measuring
    expressibility, not schema availability)."""
    if isinstance(node, FieldRef):
        if node.path:
            out.add(node.path[0])
        return
    if isinstance(node, (This, Lit)) or node is None:
        return
    if isinstance(node, ArrayLit):
        for x in node.items:
            _walk_fields(x, out)
    elif isinstance(node, ObjectLit):
        for k, v in node.items:
            _walk_fields(k, out)
            _walk_fields(v, out)
    elif isinstance(node, Func):
        for a in node.args:
            _walk_fields(a, out)
    elif isinstance(node, Method):
        _walk_fields(node.recv, out)
        for a in node.args:
            _walk_fields(a, out)
    elif isinstance(node, CtxExpr):
        _walk_fields(node.recv, out)
        _walk_fields(node.expr, out)
    elif isinstance(node, Match):
        _walk_fields(node.operand, out)
        for c, b in node.cases:
            _walk_fields(c, out)
            _walk_fields(b, out)
    elif isinstance(node, Bin):
        _walk_fields(node.left, out)
        _walk_fields(node.right, out)
    elif isinstance(node, Unary):
        _walk_fields(node.operand, out)
    elif isinstance(node, Mapping):
        for st in node.statements:
            _walk_fields(st.expr, out)
        for m in node.maps.values():
            _walk_fields(m, out)


def _collect_corpus_mappings():
    found = []  # (case_id, mapping_src)
    if not os.path.isdir(REFERENCE_TEST_DIR):
        return found

    def scan(obj, origin):
        if isinstance(obj, dict):
            for k, v in obj.items():
                if k == "bloblang" and isinstance(v, str):
                    found.append((origin, v))
                else:
                    scan(v, origin)
        elif isinstance(obj, list):
            for x in obj:
                scan(x, origin)

    for root, _dirs, files in os.walk(REFERENCE_TEST_DIR):
        for fn in sorted(files):
            if not fn.endswith(".yaml"):
                continue
            path = os.path.join(root, fn)
            try:
                with open(path) as fh:
                    docs = list(yaml.safe_load_all(fh))
            except yaml.YAMLError:
                continue
            for d in docs:
                scan(d, fn)
    return found


CORPUS = _collect_corpus_mappings()

# Representative typed-analytics mappings — the shapes the native path is
# DESIGNED to carry (projection/filter pipelines over typed columns). Every
# one of these must keep compiling to Catalyst: the floor is 100%.
REPRESENTATIVE = [
    ("flagship extract", "extracted = html.string().strip_html()"),
    ("string chain", "u = name.uppercase().trim().replace(\"-\", \"_\")"),
    ("regex", "m = text.re_replace(\"[0-9]+\", \"#\")"),
    ("arith typed", "score = (hits + 1) * 2 - misses / 4"),
    ("numeric methods", "r = price.number().round()\nfl = price.number().floor()"),
    ("bool predicates", "ok = text.contains(\"x\") && n > 3 || flag.not()"),
    ("prefix suffix", "p = url.has_prefix(\"https\")\ns = url.has_suffix(\".com\")"),
    ("length", "n = text.length()"),
    ("slice", "head = text.slice(0, 8)"),
    ("match case", 'kind = match { n > 10 => "big", n > 3 => "mid", _ => "small" }'),
    ("filter delete", "root = match { n < 0 => deleted() }"),
    ("let reuse", "let t = text.lowercase()\na = var(\"t\").length()\nb = var(\"t\").has_prefix(\"x\")"),
    ("coalesce", "v = maybe.catch(\"fallback\")"),
    ("hash", "h = text.hash(\"sha256\").encode(\"hex\")"),
    ("codec", "b = text.encode(\"base64\")"),
    ("url escape", "q = term.escape_url_query()"),
    ("json path get", "city = address.get(\"city\")"),
    ("concat format", 'line = "%v-%v".format(a, b)'),
    ("uppercase lit", "shout = greeting.uppercase() + \"!\""),
    ("ternary-ish", 'lvl = match sev { "e" => 3, "w" => 2, _ => 1 }'),
]

# Floors, measured 2026-08-17. The representative set must stay fully
# native. Corpus mappings run over message frames, so they are measured in
# FRAME mode (get_json_object extraction, root filters, whole-root string
# assignment — r4 verdict ask #7): filtering.yaml and unit_test_example.yaml
# now compile; the three whole-document JSON reshapers (csv, fans, windowed)
# are interpreter work by design. Parse failures are hard errors everywhere.
REPRESENTATIVE_FLOOR = 1.0
CORPUS_FLOOR = 2 / 5


def _try_compile(src, frame_mode=False):
    mapping = parse_mapping(src)
    if frame_mode:
        cols = {"batch_id": "bigint", "seq": "bigint",
                "content": "binary", "meta": "map<string,string>"}
        compile_mapping_to_transform(mapping, cols, frame_mode=True)
        return
    fields = set()
    _walk_fields(mapping, fields)
    compile_mapping_to_transform(mapping, set(fields))


def _report(pairs, frame_mode=False):
    rows = []
    n_native = 0
    for origin, src in pairs:
        label = f"{origin}: {src.strip().splitlines()[0][:60]}"
        try:
            _try_compile(src, frame_mode=frame_mode)
            rows.append(("native", label, ""))
            n_native += 1
        except CompileError as exc:
            rows.append(("fallback", label, str(exc)[:80]))
        except Exception as exc:
            rows.append(("PARSE-FAIL", label, str(exc)[:80]))
    return rows, n_native


def test_native_compilation_coverage_report(spark):
    rep_rows, rep_native = _report(REPRESENTATIVE)
    corp_rows, corp_native = _report(CORPUS, frame_mode=True)

    lines = [
        "bloblang native-compilation coverage:",
        f"  representative typed mappings: {rep_native}/{len(rep_rows)} native",
        f"  reference corpus mappings:     {corp_native}/{len(corp_rows)} native"
        " (frame mode; whole-document JSON reshaping -> interpreter by design)",
    ]
    for status, label, why in rep_rows + corp_rows:
        lines.append(f"  [{status:10s}] {label}" + (f"  <- {why}" if why else ""))
    report = "\n".join(lines)
    print(report)

    assert not any(s == "PARSE-FAIL" for s, _, _ in rep_rows + corp_rows), report
    rate = rep_native / len(rep_rows)
    assert rate >= REPRESENTATIVE_FLOOR, report
    if corp_rows:
        assert corp_native / len(corp_rows) >= CORPUS_FLOOR, report
