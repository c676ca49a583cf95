"""Round-3 awk surface: loops, associative arrays, split/gsub/sub/match,
compound assignment/increment, ternary, printf, user-defined functions —
the constructs real awk programs use beyond the reference corpus's
straight-line subset (lib/processor/awk.go embeds full goawk)."""

import pytest

from benthos_spark.engine import awk_mini as A


def run(program: str, record: str = "", variables=None):
    prog = A.parse_program(program)
    out = A.run_program(prog, record, variables or {}, {})
    return None if out is None else "\n".join(out)


CASES = [
    # loops -------------------------------------------------------------
    ("for-loop", '{ s = 0; for (i = 1; i <= 5; i++) s += i; print s }', "", "15"),
    ("while-loop", '{ i = 0; n = 0; while (i < 10) { i += 3; n++ }; print i, n }', "", "12 4"),
    ("do-while", '{ i = 5; do { i-- } while (i > 2); print i }', "", "2"),
    ("break", '{ for (i = 0; i < 100; i++) { if (i == 7) break }; print i }', "", "7"),
    ("continue", '{ s = 0; for (i = 1; i <= 10; i++) { if (i % 2) continue; s += i }; print s }',
     "", "30"),
    ("nested-loops", '{ n = 0; for (i = 0; i < 3; i++) for (j = 0; j < 4; j++) n++; print n }',
     "", "12"),
    # arrays ------------------------------------------------------------
    ("array-count", '{ for (i = 1; i <= NF; i++) c[$i]++; print c["a"], c["b"] }',
     "a b a a b", "3 2"),
    ("array-in", '{ a["x"] = 1; print ("x" in a), ("y" in a) }', "", "1 0"),
    ("array-delete", '{ a["x"] = 1; a["y"] = 2; delete a["x"]; print ("x" in a), length(a) }',
     "", "0 1"),
    ("array-delete-all", '{ a[1] = 1; a[2] = 2; delete a; print length(a) }', "", "0"),
    ("array-forin", '{ a["k1"] = 10; a["k2"] = 20; s = 0; for (k in a) s += a[k]; print s }',
     "", "30"),
    ("array-multidim", '{ a[1, 2] = "x"; print a[1, 2], ((1 SUBSEP 2) in a) }', "", "x 1"),
    # split/gsub/sub/match ----------------------------------------------
    ("split-comma", '{ n = split("a,b,c", parts, ","); print n, parts[1], parts[3] }',
     "", "3 a c"),
    ("split-regex", '{ n = split("a1b22c", p, /[0-9]+/); print n, p[2], p[3] }', "", "3 b c"),
    ("split-fs-default", '{ n = split("  x  y ", p); print n, p[1], p[2] }', "", "2 x y"),
    ("split-empty", '{ n = split("", p, ","); print n }', "", "0"),
    ("gsub-count", '{ n = gsub(/o/, "0"); print n, $0 }', "foo boo", "4 f00 b00"),
    ("gsub-target", '{ s = "aaa"; n = gsub(/a/, "b", s); print n, s }', "", "3 bbb"),
    ("gsub-ampersand", '{ s = "ab"; gsub(/b/, "[&]", s); print s }', "", "a[b]"),
    ("gsub-literal-amp", r'{ s = "ab"; gsub(/b/, "[\\&]", s); print s }', "", "a[&]"),
    ("sub-first-only", '{ s = "aaa"; n = sub(/a/, "b", s); print n, s }', "", "1 baa"),
    ("sub-dollar0", '{ sub(/world/, "awk"); print }', "hello world", "hello awk"),
    ("match-sets-vars", '{ r = match($0, /l+o/); print r, RSTART, RLENGTH }',
     "hello", "3 3 3"),
    ("match-miss", '{ match($0, /zz/); print RSTART, RLENGTH }', "hello", "0 -1"),
    # operators ----------------------------------------------------------
    ("compound-assign", '{ x = 10; x += 5; x *= 2; x -= 6; x /= 3; x %= 5; print x }',
     "", "3"),
    ("pre-post-incr", '{ i = 5; a = i++; b = ++i; print a, b, i }', "", "5 7 7"),
    ("ternary", '{ print (NF > 2 ? "many" : "few") }', "a b c", "many"),
    ("power", '{ print 2 ^ 10, 2 ^ 0.5 ^ 2 }', "", "1024 1.18921"),
    ("field-assign", '{ $2 = "X"; print $0 }', "a b c", "a X c"),
    ("field-extend", '{ $5 = "z"; print NF, $0 }', "a b", "5 a b   z"),
    ("dollar0-assign", '{ $0 = "x y z"; print NF, $2 }', "a", "3 y"),
    # builtins -----------------------------------------------------------
    ("printf-basic", '{ printf "%s=%d;", "n", 42; printf "%05.1f", 3.14159 }', "", "n=42;003.1"),
    ("printf-hex-char", '{ printf "%x %c %o", 255, 65, 8 }', "", "ff A 10"),
    ("int-builtin", '{ print int(3.9), int(-3.9) }', "", "3 -3"),
    ("sqrt-exp", '{ print sqrt(16), exp(0), log(1) }', "", "4 1 0"),
    ("length-array-vs-str", '{ a[1] = 1; a[2] = 2; print length(a), length("abc") }',
     "", "2 3"),
    # FS in BEGIN applies to the record ----------------------------------
    ("begin-fs", 'BEGIN { FS = "," } { print $2 }', "a,b,c", "b"),
    ("ofs", 'BEGIN { OFS = "-" } { print $1, $3 }', "a b c", "a-c"),
    # user functions ------------------------------------------------------
    ("user-func", 'function add(a, b) { return a + b } { print add(2, 3) }', "", "5"),
    ("user-func-recursive",
     'function fib(n) { return n < 2 ? n : fib(n-1) + fib(n-2) } { print fib(10) }',
     "", "55"),
    ("user-func-array-byref",
     'function fill(arr, n,  i) { for (i = 1; i <= n; i++) arr[i] = i * i }\n'
     '{ fill(sq, 4); print sq[2], sq[4], length(sq) }',
     "", "4 16 4"),
    ("user-func-local-params",
     'function f(x,  tmp) { tmp = x * 2; return tmp } { tmp = 99; f(1); print tmp }',
     "", "99"),
    ("user-func-outparam",
     'function collect(out) { out["hit"] = 1 } { collect(res); print ("hit" in res) }',
     "", "1"),
    # patterns with the new constructs -----------------------------------
    ("next-stops-rules", '{ print "first"; next } { print "second" }', "x", "first"),
    ("end-sees-arrays", '{ for (i = 1; i <= NF; i++) seen[$i] = 1 } END { print length(seen) }',
     "a b a c", "3"),
    ("regex-bare-expr", '{ n = /ell/ ? 1 : 0; print n }', "hello", "1"),
]


@pytest.mark.parametrize("name,program,record,expected", CASES, ids=[c[0] for c in CASES])
def test_awk_extended(name, program, record, expected):
    assert run(program, record) == expected


def test_getline_raises_clear_error():
    with pytest.raises(A.AwkError, match="getline"):
        A.parse_program("{ getline line }")


def test_loop_guard_trips():
    with pytest.raises(A.AwkError, match="iterations"):
        run("{ while (1) x++ }")


def test_scalar_as_array_raises():
    with pytest.raises(A.AwkError, match="scalar"):
        run('{ x = 5; x["k"] = 1 }')


def test_through_processor_kernel():
    """The extended grammar must flow through the AwkProc frame kernel
    (codec json, custom function table intact)."""
    from benthos_spark.bloblang.interp import Interpreter, Part
    from benthos_spark.engine.processors import Env, Resources, build_processor

    proc = build_processor({
        "awk": {
            "codec": "json",
            "program": (
                '{ n = split(tags, parts, ","); c = 0;'
                '  for (i = 1; i <= n; i++) if (parts[i] ~ /^t/) c++;'
                '  json_set("t_count", c); json_set("n_tags", n) }'
            ),
        }
    })
    env = Env(interp=Interpreter(), resources=Resources())
    [out] = proc.process([Part(b'{"tags":"top,mid,tip"}', {})], env)
    import json
    doc = json.loads(out[0].content)
    # awk values are strnum; json_set writes the %.6g string form
    # (matches the reference's goawk-side value rendering)
    assert doc["t_count"] == "2" and doc["n_tags"] == "3"
