"""Mini-AWK interpreter for the awk processor.

Re-implements the observable semantics of the reference's awk processor
(/root/reference/lib/processor/awk.go — goawk + a custom function table,
codecs none|text|json) as a small self-contained interpreter: the grammar
subset the processor's documented use cases and the reference's own test
corpus (awk_test.go, 57 programs) exercise.

Supported grammar:
  program  := rule+
  rule     := [BEGIN | END | /regex/ | expr] '{' stmts '}'
  stmt     := print exprlist | name '=' expr | if '(' expr ')' block
              [else block] | expr (call statement) | block
  expr     := ternary of || && | comparison (< <= > >= == != ~ !~)
              | concat (juxtaposition) | + - | * / % | unary -/! | postfix
  primary  := number | "string" | name | name(args) | $expr | (expr)

Value model: awk strnum semantics — numbers are floats printed with %.6g
(integers without a decimal point), uninitialized variables are "",
comparisons are numeric when both operands look numeric.

Custom functions (json_*/metadata_*/timestamp_*/create_json_*) are injected
per message by the AwkProc kernel; builtins length/substr/index/toupper/
tolower/sprintf are always available.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..bloblang.interp import go_layout_to_strftime


class AwkError(ValueError):
    pass


# ------------------------------------------------------------------ lexer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<newline>\n)
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<name>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op>&&|\|\||==|!=|<=|>=|!~|[-+*/%<>=!~$(){};,])
    """,
    re.VERBOSE,
)


def _lex(src: str) -> List[Tuple[str, str]]:
    toks: List[Tuple[str, str]] = []
    i = 0
    while i < len(src):
        # regex literal: '/' in pattern position (start, or after { ; && || ( ,)
        if src[i] == "/" and (
            not toks
            or toks[-1][1] in ("{", "}", ";", "\n", "&&", "||", "(", ",", "~", "!~")
        ):
            j = i + 1
            while j < len(src) and src[j] != "/":
                j += 2 if src[j] == "\\" else 1
            if j >= len(src):
                raise AwkError("unterminated regex literal")
            toks.append(("regex", src[i + 1:j]))
            i = j + 1
            continue
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise AwkError(f"awk lex error at {src[i:i+20]!r}")
        kind = m.lastgroup
        if kind == "newline":
            toks.append(("op", "\n"))
        elif kind not in ("ws", "comment"):
            toks.append((kind, m.group()))
        i = m.end()
    return toks


# ----------------------------------------------------------------- parser
class _Parser:
    def __init__(self, toks: List[Tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self, skip_nl: bool = True):
        j = self.i
        while skip_nl and j < len(self.toks) and self.toks[j] == ("op", "\n"):
            j += 1
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self, skip_nl: bool = True):
        while skip_nl and self.i < len(self.toks) and self.toks[self.i] == ("op", "\n"):
            self.i += 1
        if self.i >= len(self.toks):
            return ("eof", "")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str):
        t = self.next()
        if t[1] != val:
            raise AwkError(f"expected {val!r}, got {t[1]!r}")

    # rules ------------------------------------------------------------
    def parse_program(self):
        rules = []
        while self.peek()[0] != "eof":
            rules.append(self.parse_rule())
        return rules

    def parse_rule(self):
        kind, val = self.peek()
        pattern: Any = None
        if val == "{":
            pass
        elif kind == "name" and val in ("BEGIN", "END"):
            self.next()
            pattern = (val,)
        elif kind == "regex":
            self.next()
            pattern = ("regex", re.compile(val))
        else:
            pattern = ("expr", self.parse_expr())
        self.expect("{")
        stmts = self.parse_stmts()
        self.expect("}")
        return (pattern, stmts)

    def parse_stmts(self):
        stmts = []
        while True:
            t = self.peek()
            if t[1] in ("}", "") or t[0] == "eof":
                return stmts
            if t[1] == ";":
                self.next()
                continue
            stmts.append(self.parse_stmt())

    def parse_stmt(self):
        kind, val = self.peek()
        if val == "{":
            self.next()
            inner = self.parse_stmts()
            self.expect("}")
            return ("block", inner)
        if kind == "name" and val == "print":
            self.next()
            args = []
            t = self.peek(skip_nl=False)
            # statement ends at ; } or newline
            while t[1] not in (";", "}", "\n") and t[0] != "eof":
                args.append(self.parse_expr())
                t = self.peek(skip_nl=False)
                if t[1] == ",":
                    self.next()
                    t = self.peek(skip_nl=False)
            return ("print", args)
        if kind == "name" and val == "if":
            self.next()
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            then = [self.parse_stmt()]
            other = []
            if self.peek()[1] == "else" and self.peek()[0] == "name":
                self.next()
                other = [self.parse_stmt()]
            return ("if", cond, then, other)
        # assignment?
        if kind == "name":
            save = self.i
            name = self.next()[1]
            if self.peek(skip_nl=False)[1] == "=" and (
                self.i + 1 >= len(self.toks) or self.toks[self.i + 1][1] != "="
            ):
                nxt = self.toks[self.i][1]
                if nxt == "=":
                    self.next(skip_nl=False)
                    return ("assign", name, self.parse_expr())
            self.i = save
        return ("expr", self.parse_expr())

    # expressions --------------------------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.peek(skip_nl=False)[1] == "||":
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.peek(skip_nl=False)[1] == "&&":
            self.next()
            left = ("and", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_concat()
        t = self.peek(skip_nl=False)
        if t[1] in ("<", "<=", ">", ">=", "==", "!=", "~", "!~"):
            op = self.next()[1]
            right = self.parse_concat()
            return ("cmp", op, left, right)
        return left

    _CONCAT_STARTERS = ("number", "string", "name", "regex")

    def parse_concat(self):
        left = self.parse_add()
        while True:
            t = self.peek(skip_nl=False)
            if t[0] in self._CONCAT_STARTERS and t[1] not in ("else",) or t[1] in ("$", "("):
                right = self.parse_add()
                left = ("concat", left, right)
            else:
                return left

    def parse_add(self):
        left = self.parse_mul()
        while self.peek(skip_nl=False)[1] in ("+", "-"):
            op = self.next()[1]
            left = ("arith", op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self.peek(skip_nl=False)[1] in ("*", "/", "%"):
            op = self.next()[1]
            left = ("arith", op, left, self.parse_unary())
        return left

    def parse_unary(self):
        t = self.peek(skip_nl=False)
        if t[1] == "-":
            self.next()
            return ("neg", self.parse_unary())
        if t[1] == "!":
            self.next()
            return ("not", self.parse_unary())
        return self.parse_primary()

    def parse_primary(self):
        kind, val = self.next()
        if kind == "number":
            return ("num", float(val))
        if kind == "string":
            return ("str", val[1:-1].encode().decode("unicode_escape"))
        if val == "$":
            return ("field", self.parse_primary())
        if val == "(":
            e = self.parse_expr()
            self.expect(")")
            return e
        if kind == "name":
            if self.peek(skip_nl=False)[1] == "(":
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.parse_expr())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.parse_expr())
                self.expect(")")
                return ("call", val, args)
            return ("var", val)
        raise AwkError(f"unexpected token {val!r}")


def parse_program(src: str):
    return _Parser(_lex(src)).parse_program()


# ---------------------------------------------------------------- runtime
_NUMERIC_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def to_num(v: Any) -> float:
    if isinstance(v, (int, float)):
        return float(v)
    s = str(v).strip()
    m = re.match(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
    return float(m.group()) if m else 0.0


def awk_str(v: Any) -> str:
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e16:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def truthy(v: Any) -> bool:
    if isinstance(v, (int, float)):
        return v != 0
    return str(v) != ""


class Env:
    def __init__(self, record: str, variables: Dict[str, str], funcs: Dict[str, Callable]):
        self.vars: Dict[str, Any] = dict(variables)
        self.fields = record.split()
        self.vars.setdefault("NF", float(len(self.fields)))
        self.vars.setdefault("NR", 1.0)
        self.record = record
        self.funcs = funcs
        self.out: List[str] = []


def _builtin(env: Env, name: str, args: List[Any]) -> Any:
    if name == "length":
        return float(len(awk_str(args[0]) if args else env.record))
    if name == "substr":
        s = awk_str(args[0])
        start = int(to_num(args[1])) - 1
        n = int(to_num(args[2])) if len(args) > 2 else len(s)
        return s[max(start, 0):max(start, 0) + n]
    if name == "index":
        return float(awk_str(args[0]).find(awk_str(args[1])) + 1)
    if name == "toupper":
        return awk_str(args[0]).upper()
    if name == "tolower":
        return awk_str(args[0]).lower()
    if name == "sprintf":
        fmt = awk_str(args[0])
        vals = []
        for spec, a in zip(re.findall(r"%[-.0-9]*[sdfgx]", fmt), args[1:]):
            vals.append(awk_str(a) if spec.endswith("s") else to_num(a))
        return fmt % tuple(vals)
    raise AwkError(f"unknown function {name}")


def _eval(node, env: Env) -> Any:
    tag = node[0]
    if tag == "num":
        return node[1]
    if tag == "str":
        return node[1]
    if tag == "var":
        return env.vars.get(node[1], "")
    if tag == "field":
        i = int(to_num(_eval(node[1], env)))
        if i == 0:
            return env.record
        return env.fields[i - 1] if 1 <= i <= len(env.fields) else ""
    if tag == "concat":
        return awk_str(_eval(node[1], env)) + awk_str(_eval(node[2], env))
    if tag == "arith":
        a, b = to_num(_eval(node[2], env)), to_num(_eval(node[3], env))
        op = node[1]
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        return a - int(a / b) * b if b else 0.0  # awk fmod (truncated)
    if tag == "neg":
        return -to_num(_eval(node[1], env))
    if tag == "not":
        return 0.0 if truthy(_eval(node[1], env)) else 1.0
    if tag == "and":
        return 1.0 if truthy(_eval(node[1], env)) and truthy(_eval(node[2], env)) else 0.0
    if tag == "or":
        return 1.0 if truthy(_eval(node[1], env)) or truthy(_eval(node[2], env)) else 0.0
    if tag == "cmp":
        op = node[1]
        lv, rv = _eval(node[2], env), _eval(node[3], env)
        if op in ("~", "!~"):
            pat = rv.pattern if isinstance(rv, re.Pattern) else awk_str(rv)
            hit = re.search(pat, awk_str(lv)) is not None
            return 1.0 if hit == (op == "~") else 0.0
        both_num = (
            isinstance(lv, (int, float)) or _NUMERIC_RE.match(str(lv).strip())
        ) and (isinstance(rv, (int, float)) or _NUMERIC_RE.match(str(rv).strip()))
        if both_num:
            a, b = to_num(lv), to_num(rv)
        else:
            a, b = awk_str(lv), awk_str(rv)
        hit = {
            "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
            "==": a == b, "!=": a != b,
        }[op]
        return 1.0 if hit else 0.0
    if tag == "call":
        name, args_ast = node[1], node[2]
        args = [_eval(a, env) for a in args_ast]
        fn = env.funcs.get(name)
        if fn is not None:
            return fn(*args)
        return _builtin(env, name, args)
    raise AwkError(f"bad node {tag}")


def _exec_stmts(stmts, env: Env) -> None:
    for st in stmts:
        tag = st[0]
        if tag == "print":
            if not st[1]:
                env.out.append(env.record)
            else:
                env.out.append(" ".join(awk_str(_eval(a, env)) for a in st[1]))
        elif tag == "assign":
            env.vars[st[1]] = _eval(st[2], env)
        elif tag == "if":
            if truthy(_eval(st[1], env)):
                _exec_stmts(st[2], env)
            else:
                _exec_stmts(st[3], env)
        elif tag == "block":
            _exec_stmts(st[1], env)
        elif tag == "expr":
            _eval(st[1], env)
        else:
            raise AwkError(f"bad stmt {tag}")


def run_program(
    rules,
    record: str,
    variables: Dict[str, str],
    funcs: Dict[str, Callable],
) -> Optional[List[str]]:
    """Execute a parsed program over ONE record (the processor feeds one
    record per part: payload for codec text, ' ' otherwise). Returns the
    printed lines, or None if nothing printed (awk.go replaces the payload
    iff the out buffer is non-empty — an empty `print ""` counts)."""
    env = Env(record, variables, funcs)
    for pattern, stmts in rules:
        if pattern is not None and pattern[0] == "BEGIN":
            _exec_stmts(stmts, env)
    for pattern, stmts in rules:
        if pattern is None:
            _exec_stmts(stmts, env)
        elif pattern[0] == "regex":
            if pattern[1].search(record):
                _exec_stmts(stmts, env)
        elif pattern[0] == "expr":
            if truthy(_eval(pattern[1], env)):
                _exec_stmts(stmts, env)
    for pattern, stmts in rules:
        if pattern is not None and pattern[0] == "END":
            _exec_stmts(stmts, env)
    return env.out or None


# ------------------------------------------------- reference time helpers
_DEFAULT_LAYOUTS = [
    "Mon Jan _2 15:04:05 2006",          # ANSIC-ish
    "Mon, 02 Jan 2006 15:04:05 MST",     # RFC1123
    "2006-01-02T15:04:05Z07:00",         # RFC3339
    "02 Jan 06 15:04 MST",               # RFC822
    "2006-01-02T15:04:05MST",
    "2006-01-02T15:04:05",
    "2006-01-02 15:04:05",
    "2006-01-02T15:04:05Z0700",
    "2006-01-02",
]


def parse_time(date_str: str, layout: str = "") -> float:
    """awk.go getTime: explicit Go layout, or try the default layout list.
    Returns epoch seconds (UTC when the layout has no zone)."""
    import datetime as _dt

    layouts = [layout] if layout else _DEFAULT_LAYOUTS
    for lay in layouts:
        fmt = go_layout_to_strftime(lay)
        for f in (fmt, fmt.replace("%Z", "").replace("%z", "")):
            try:
                t = _dt.datetime.strptime(date_str, f)
            except ValueError:
                continue
            if t.tzinfo is None:
                t = t.replace(tzinfo=_dt.timezone.utc)
            return t.timestamp()
    raise AwkError(f"failed to detect datetime format of: {date_str}")


def format_time(epoch: float, layout: str, nanos: int = 0) -> str:
    import datetime as _dt

    lay = layout or "2006-01-02T15:04:05Z07:00"
    frac = ""
    m = re.search(r"\.(0+|9+)", lay)
    if m:
        width = len(m.group(1))
        frac = "." + f"{nanos:09d}"[:width]
        # NUL would truncate in C strftime; \x01 passes through untouched
        lay = lay[:m.start()] + "\x01" + lay[m.end():]
    t = _dt.datetime.fromtimestamp(int(epoch), _dt.timezone.utc)
    out = t.strftime(go_layout_to_strftime(lay).replace("%Z", "UTC").replace("%z", "+0000"))
    return out.replace("\x01", frac)
