"""Mini-AWK interpreter for the awk processor.

Re-implements the observable semantics of the reference's awk processor
(/root/reference/lib/processor/awk.go — goawk + a custom function table,
codecs none|text|json) as a small self-contained interpreter covering the
grammar the processor's documented use cases, the reference's own test
corpus (awk_test.go, 57 programs), and mainstream awk programs exercise.

Supported grammar (round 3 extends round 2's straight-line subset):
  program  := (rule | 'function' name '(' params ')' block)+
  rule     := [BEGIN | END | /regex/ | expr] '{' stmts '}'
  stmt     := print | printf | if/else | while | do..while
              | for(init;cond;post) | for (k in arr) | break | continue
              | next | return [expr] | delete arr[idx] | delete arr
              | block | expr
  expr     := assignment (= += -= *= /= %= ^=, right-assoc, lvalue =
              var | arr[i,j] | $n) | ternary ?: | || && | 'in' | comparison
              (< <= > >= == != ~ !~) | concat | + - | * / % | ^ | unary -/!
              | ++/-- (pre/post) | primary
  builtins := length substr index toupper tolower sprintf split sub gsub
              match sin cos atan2 exp log sqrt int rand srand

Value model: awk strnum semantics — numbers are floats printed with %.6g
(integers without a decimal point), uninitialized variables are "",
comparisons are numeric when both operands look numeric, associative arrays
are dicts keyed by strings (multi-dim subscripts join with SUBSEP).

Custom functions (json_*/metadata_*/timestamp_*/create_json_*) are injected
per message by the AwkProc kernel. User-defined functions pass arrays by
reference and scalars by value; unset variables passed as arguments
materialize as empty arrays in the caller (the common out-param idiom).

Out of scope (documented): getline, I/O redirection, range patterns, NF
assignment, pipes — none are meaningful in the one-record-per-part model.
"""

from __future__ import annotations

import random
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..bloblang.interp import go_layout_to_strftime


class AwkError(ValueError):
    pass


_KEYWORDS = frozenset(
    "BEGIN END if else while for do break continue next delete return "
    "function in print printf getline".split()
)

# ------------------------------------------------------------------ lexer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<newline>\n)
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<name>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op>&&|\|\||==|!=|<=|>=|!~|\+\+|--|\+=|-=|\*=|/=|%=|\^=|[-+*/%<>=!~$(){};,\[\]^?:])
    """,
    re.VERBOSE,
)

# token values after which a '/' starts a regex literal (not division)
_REGEX_POS = frozenset(
    ["{", "}", ";", "\n", "&&", "||", "(", ",", "~", "!~", "=", "==", "!=",
     "[", "?", ":", "!", "return"]
)


def _lex(src: str) -> List[Tuple[str, str]]:
    toks: List[Tuple[str, str]] = []
    i = 0
    while i < len(src):
        if src[i] == "/" and (not toks or toks[-1][1] in _REGEX_POS):
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
_ASSIGN_OPS = frozenset(["=", "+=", "-=", "*=", "/=", "%=", "^="])
_LVALUE_TAGS = frozenset(["var", "index", "field"])


class Program:
    def __init__(self, rules, funcs):
        self.rules = rules
        self.funcs = funcs  # name -> (params, body_stmts)


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
    def parse_program(self) -> Program:
        rules, funcs = [], {}
        while self.peek()[0] != "eof":
            if self.peek() == ("name", "function"):
                self.next()
                name = self.next()[1]
                self.expect("(")
                params = []
                if self.peek()[1] != ")":
                    params.append(self.next()[1])
                    while self.peek()[1] == ",":
                        self.next()
                        params.append(self.next()[1])
                self.expect(")")
                self.expect("{")
                body = self.parse_stmts()
                self.expect("}")
                funcs[name] = (params, body)
            else:
                rules.append(self.parse_rule())
        return Program(rules, funcs)

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

    def _parse_print_args(self):
        args = []
        t = self.peek(skip_nl=False)
        while t[1] not in (";", "}", "\n") and t[0] != "eof":
            args.append(self.parse_expr())
            t = self.peek(skip_nl=False)
            if t[1] == ",":
                self.next()
                t = self.peek(skip_nl=False)
        return args

    def parse_stmt(self):
        kind, val = self.peek()
        if val == "{":
            self.next()
            inner = self.parse_stmts()
            self.expect("}")
            return ("block", inner)
        if kind == "name" and val == "print":
            self.next()
            return ("print", self._parse_print_args())
        if kind == "name" and val == "printf":
            self.next()
            args = self._parse_print_args()
            if not args:
                raise AwkError("printf requires a format argument")
            return ("printf", args)
        if kind == "name" and val == "if":
            self.next()
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            then = [self.parse_stmt()]
            other = []
            if self.peek() == ("name", "else"):
                self.next()
                other = [self.parse_stmt()]
            return ("if", cond, then, other)
        if kind == "name" and val == "while":
            self.next()
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            if self.peek()[1] == ";":  # while (...) ;
                self.next()
                return ("while", cond, [])
            return ("while", cond, [self.parse_stmt()])
        if kind == "name" and val == "do":
            self.next()
            body = [self.parse_stmt()]
            t = self.next()
            if t != ("name", "while"):
                raise AwkError(f"expected while after do body, got {t[1]!r}")
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            return ("do", body, cond)
        if kind == "name" and val == "for":
            self.next()
            self.expect("(")
            # for (k in arr) — two-token lookahead, restore on mismatch
            save = self.i
            t1 = self.next()
            if t1[0] == "name" and self.peek() == ("name", "in"):
                self.next()
                arr = self.next()[1]
                self.expect(")")
                return ("forin", t1[1], arr, [self.parse_stmt()])
            self.i = save
            init = None if self.peek()[1] == ";" else ("expr", self.parse_expr())
            self.expect(";")
            cond = None if self.peek()[1] == ";" else self.parse_expr()
            self.expect(";")
            post = None if self.peek()[1] == ")" else ("expr", self.parse_expr())
            self.expect(")")
            return ("for", init, cond, post, [self.parse_stmt()])
        if kind == "name" and val in ("break", "continue", "next"):
            self.next()
            return (val,)
        if kind == "name" and val == "return":
            self.next()
            t = self.peek(skip_nl=False)
            if t[1] in (";", "}", "\n") or t[0] == "eof":
                return ("return", None)
            return ("return", self.parse_expr())
        if kind == "name" and val == "delete":
            self.next()
            name = self.next()[1]
            subs = None
            if self.peek(skip_nl=False)[1] == "[":
                self.next()
                subs = [self.parse_expr()]
                while self.peek()[1] == ",":
                    self.next()
                    subs.append(self.parse_expr())
                self.expect("]")
            return ("delete", name, subs)
        return ("expr", self.parse_expr())

    # expressions --------------------------------------------------------
    def parse_expr(self):
        return self.parse_assign()

    def parse_assign(self):
        left = self.parse_ternary()
        t = self.peek(skip_nl=False)
        if t[1] in _ASSIGN_OPS and left[0] in _LVALUE_TAGS:
            op = self.next(skip_nl=False)[1]
            right = self.parse_assign()  # right-assoc: a = b = 1
            return ("assign", op, left, right)
        return left

    def parse_ternary(self):
        cond = self.parse_or()
        if self.peek(skip_nl=False)[1] == "?":
            self.next()
            a = self.parse_ternary()
            self.expect(":")
            b = self.parse_ternary()
            return ("ternary", cond, a, b)
        return cond

    def parse_or(self):
        left = self.parse_and()
        while self.peek(skip_nl=False)[1] == "||":
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_in()
        while self.peek(skip_nl=False)[1] == "&&":
            self.next()
            left = ("and", left, self.parse_in())
        return left

    def parse_in(self):
        left = self.parse_cmp()
        while self.peek(skip_nl=False) == ("name", "in"):
            self.next()
            arr = self.next()[1]
            left = ("inop", left, arr)
        return left

    def parse_cmp(self):
        left = self.parse_concat()
        t = self.peek(skip_nl=False)
        if t[1] in ("<", "<=", ">", ">=", "==", "!=", "~", "!~"):
            op = self.next()[1]
            right = self.parse_concat()
            return ("cmp", op, left, right)
        return left

    _CONCAT_STARTERS = ("number", "string", "name")

    def _starts_operand(self, t) -> bool:
        if t[0] in self._CONCAT_STARTERS:
            return t[1] not in _KEYWORDS
        return t[1] in ("$", "(", "++", "--")

    def parse_concat(self):
        left = self.parse_add()
        while self._starts_operand(self.peek(skip_nl=False)):
            left = ("concat", left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while self.peek(skip_nl=False)[1] in ("+", "-"):
            op = self.next()[1]
            left = ("arith", op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_pow()
        while self.peek(skip_nl=False)[1] in ("*", "/", "%"):
            op = self.next()[1]
            left = ("arith", op, left, self.parse_pow())
        return left

    def parse_pow(self):
        left = self.parse_unary()
        if self.peek(skip_nl=False)[1] == "^":
            self.next()
            return ("arith", "^", left, self.parse_pow())  # right-assoc
        return left

    def parse_unary(self):
        t = self.peek(skip_nl=False)
        if t[1] == "-":
            self.next()
            return ("neg", self.parse_unary())
        if t[1] == "!":
            self.next()
            return ("not", self.parse_unary())
        if t[1] in ("++", "--"):
            op = self.next()[1]
            target = self.parse_unary()
            if target[0] not in _LVALUE_TAGS:
                raise AwkError(f"{op} requires an lvalue")
            return ("incr", op, target, True)
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        t = self.peek(skip_nl=False)
        if t[1] in ("++", "--") and e[0] in _LVALUE_TAGS:
            op = self.next(skip_nl=False)[1]
            return ("incr", op, e, False)
        return e

    def parse_primary(self):
        kind, val = self.next()
        if kind == "number":
            return ("num", float(val))
        if kind == "string":
            return ("str", val[1:-1].encode().decode("unicode_escape"))
        if kind == "regex":
            return ("regexlit", re.compile(val))
        if val == "$":
            return ("field", self.parse_primary())
        if val == "(":
            e = self.parse_expr()
            self.expect(")")
            return e
        if kind == "name":
            if val == "getline":
                raise AwkError("getline is not supported (one-record model)")
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
            if self.peek(skip_nl=False)[1] == "[":
                self.next()
                subs = [self.parse_expr()]
                while self.peek()[1] == ",":
                    self.next()
                    subs.append(self.parse_expr())
                self.expect("]")
                return ("index", val, subs)
            return ("var", val)
        raise AwkError(f"unexpected token {val!r}")


def parse_program(src: str) -> Program:
    return _Parser(_lex(src)).parse_program()


# ---------------------------------------------------------------- runtime
_NUMERIC_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def to_num(v: Any) -> float:
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, dict):
        return 0.0
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
    if isinstance(v, dict):
        return ""
    return str(v)


def truthy(v: Any) -> bool:
    if isinstance(v, (int, float)):
        return v != 0
    if isinstance(v, dict):
        return bool(v)
    return str(v) != ""


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Next(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class Env:
    def __init__(
        self,
        record: str,
        variables: Dict[str, str],
        funcs: Dict[str, Callable],
        userfuncs: Optional[Dict[str, tuple]] = None,
    ):
        self.vars: Dict[str, Any] = dict(variables)
        self.vars.setdefault("FS", " ")
        self.vars.setdefault("OFS", " ")
        self.vars.setdefault("ORS", "\n")
        self.vars.setdefault("SUBSEP", "\x1c")
        self.vars.setdefault("NR", 1.0)
        self.record = record
        self.fields: List[str] = []
        self.resplit()
        self.funcs = funcs
        self.userfuncs = userfuncs or {}
        self.locals: List[Dict[str, Any]] = []
        self.buf: List[str] = []
        self.rng = random.Random(0)

    # scoping ----------------------------------------------------------
    def get_var(self, name: str) -> Any:
        if self.locals and name in self.locals[-1]:
            return self.locals[-1][name]
        if name == "NF":
            return float(len(self.fields))
        return self.vars.get(name, "")

    def set_var(self, name: str, v: Any) -> None:
        if self.locals and name in self.locals[-1]:
            self.locals[-1][name] = v
            return
        self.vars[name] = v
        if name == "FS":
            pass  # takes effect on next resplit (i.e. after BEGIN)

    def get_array(self, name: str) -> Dict[str, Any]:
        scope = self.locals[-1] if self.locals and name in self.locals[-1] else self.vars
        v = scope.get(name)
        if v is None or v == "":
            v = {}
            scope[name] = v
        if not isinstance(v, dict):
            raise AwkError(f"can't use scalar {name!r} as array")
        return v

    # fields ------------------------------------------------------------
    def resplit(self) -> None:
        fs = awk_str(self.vars.get("FS", " "))
        if fs == " ":
            self.fields = self.record.split()
        elif len(fs) == 1:
            self.fields = self.record.split(fs)
        else:
            self.fields = re.split(fs, self.record)

    def get_field(self, i: int) -> str:
        if i == 0:
            return self.record
        return self.fields[i - 1] if 1 <= i <= len(self.fields) else ""

    def set_field(self, i: int, v: Any) -> None:
        s = awk_str(v)
        if i == 0:
            self.record = s
            self.resplit()
            return
        while len(self.fields) < i:
            self.fields.append("")
        self.fields[i - 1] = s
        self.record = awk_str(self.vars.get("OFS", " ")).join(self.fields)


# lvalue helpers -------------------------------------------------------
def _subsep_key(subs: List[Any], env: Env) -> str:
    sep = awk_str(env.vars.get("SUBSEP", "\x1c"))
    return sep.join(awk_str(_eval(s, env)) for s in subs)


def _lv_get(node, env: Env) -> Any:
    tag = node[0]
    if tag == "var":
        return env.get_var(node[1])
    if tag == "index":
        return env.get_array(node[1]).get(_subsep_key(node[2], env), "")
    if tag == "field":
        return env.get_field(int(to_num(_eval(node[1], env))))
    raise AwkError(f"not an lvalue: {tag}")


def _lv_set(node, env: Env, value: Any) -> None:
    tag = node[0]
    if tag == "var":
        env.set_var(node[1], value)
    elif tag == "index":
        env.get_array(node[1])[_subsep_key(node[2], env)] = value
    elif tag == "field":
        env.set_field(int(to_num(_eval(node[1], env))), value)
    else:
        raise AwkError(f"not an lvalue: {tag}")


# gsub/sub replacement semantics: & = matched text, \& literal ---------
def _awk_repl(repl: str):
    def fn(m: "re.Match") -> str:
        out, i = [], 0
        while i < len(repl):
            c = repl[i]
            if c == "\\" and i + 1 < len(repl) and repl[i + 1] in ("&", "\\"):
                out.append(repl[i + 1])
                i += 2
            elif c == "&":
                out.append(m.group(0))
                i += 1
            else:
                out.append(c)
                i += 1
        return "".join(out)

    return fn


def _pattern_of(node, env: Env) -> str:
    if node[0] == "regexlit":
        return node[1].pattern
    return awk_str(_eval(node, env))


def _sprintf(fmt: str, args: List[Any]) -> str:
    out, i, ai = [], 0, 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        j = i + 1
        while j < len(fmt) and fmt[j] in "-+ #0123456789.":
            j += 1
        if j >= len(fmt):
            out.append(c)
            break
        conv = fmt[j]
        spec = fmt[i:j + 1]
        if conv == "%":
            out.append("%")
        else:
            a = args[ai] if ai < len(args) else ""
            ai += 1
            if conv == "c":
                s = awk_str(a)
                ch = s[0] if s and not _NUMERIC_RE.match(s) else chr(int(to_num(a)) or 0)
                out.append((spec[:-1] + "s") % ch)
            elif conv == "s":
                out.append(spec % awk_str(a))
            elif conv in "diouxX":
                py = spec[:-1] + {"i": "d", "u": "d"}.get(conv, conv)
                out.append(py % int(to_num(a)))
            elif conv in "eEfgG":
                out.append(spec % to_num(a))
            else:
                raise AwkError(f"unsupported printf conversion %{conv}")
        i = j + 1
    return "".join(out)


def _builtin(env: Env, name: str, args: List[Any]) -> Any:
    import math

    if name == "length":
        if not args:
            return float(len(env.record))
        if isinstance(args[0], dict):
            return float(len(args[0]))
        return float(len(awk_str(args[0])))
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
        return _sprintf(awk_str(args[0]), list(args[1:]))
    if name == "int":
        return float(int(to_num(args[0])))
    if name == "sin":
        return math.sin(to_num(args[0]))
    if name == "cos":
        return math.cos(to_num(args[0]))
    if name == "atan2":
        return math.atan2(to_num(args[0]), to_num(args[1]))
    if name == "exp":
        return math.exp(to_num(args[0]))
    if name == "log":
        return math.log(to_num(args[0]))
    if name == "sqrt":
        return math.sqrt(to_num(args[0]))
    if name == "rand":
        return env.rng.random()
    if name == "srand":
        prev = getattr(env, "_seed", 0.0)
        seed = to_num(args[0]) if args else 0.0
        env._seed = seed
        env.rng = random.Random(seed)
        return prev
    raise AwkError(f"unknown function {name}")


def _call_user(env: Env, name: str, args_ast: List[Any]) -> Any:
    params, body = env.userfuncs[name]
    if len(args_ast) > len(params):
        raise AwkError(f"function {name} called with too many arguments")
    scope: Dict[str, Any] = {}
    for p, a in zip(params, args_ast):
        if a[0] == "var":
            cur = env.get_var(a[1])
            if isinstance(cur, dict):
                scope[p] = cur  # array by reference
            elif cur == "":
                # unset: materialize as array in caller (out-param idiom);
                # scalar rebinds inside the callee stay local either way
                scope[p] = env.get_array(a[1])
            else:
                scope[p] = cur
        else:
            scope[p] = _eval(a, env)
    for p in params[len(args_ast):]:
        scope[p] = ""  # extra params are locals
    env.locals.append(scope)
    try:
        _exec_stmts(body, env)
        return ""
    except _Return as r:
        return r.value if r.value is not None else ""
    finally:
        env.locals.pop()


def _eval(node, env: Env) -> Any:
    tag = node[0]
    if tag == "num":
        return node[1]
    if tag == "str":
        return node[1]
    if tag == "var":
        return env.get_var(node[1])
    if tag == "index":
        return _lv_get(node, env)
    if tag == "field":
        return _lv_get(node, env)
    if tag == "regexlit":
        # bare /re/ in expression position matches against $0
        return 1.0 if node[1].search(env.record) else 0.0
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
        if op == "^":
            return a ** b
        return a - int(a / b) * b if b else 0.0  # awk fmod (truncated)
    if tag == "neg":
        return -to_num(_eval(node[1], env))
    if tag == "not":
        return 0.0 if truthy(_eval(node[1], env)) else 1.0
    if tag == "and":
        return 1.0 if truthy(_eval(node[1], env)) and truthy(_eval(node[2], env)) else 0.0
    if tag == "or":
        return 1.0 if truthy(_eval(node[1], env)) or truthy(_eval(node[2], env)) else 0.0
    if tag == "ternary":
        return _eval(node[2] if truthy(_eval(node[1], env)) else node[3], env)
    if tag == "inop":
        key = awk_str(_eval(node[1], env))
        return 1.0 if key in env.get_array(node[2]) else 0.0
    if tag == "assign":
        op, lv, rhs = node[1], node[2], node[3]
        v = _eval(rhs, env)
        if op != "=":
            cur = to_num(_lv_get(lv, env))
            n = to_num(v)
            v = {
                "+=": cur + n, "-=": cur - n, "*=": cur * n,
                "/=": cur / n if n else 0.0,
                "%=": (cur - int(cur / n) * n) if n else 0.0,
                "^=": cur ** n,
            }[op]
        _lv_set(lv, env, v)
        return v
    if tag == "incr":
        op, lv, pre = node[1], node[2], node[3]
        cur = to_num(_lv_get(lv, env))
        new = cur + (1.0 if op == "++" else -1.0)
        _lv_set(lv, env, new)
        return new if pre else cur
    if tag == "cmp":
        op = node[1]
        if op in ("~", "!~"):
            lv = _eval(node[2], env)
            rnode = node[3]
            pat = _pattern_of(rnode, env)
            hit = re.search(pat, awk_str(lv)) is not None
            return 1.0 if hit == (op == "~") else 0.0
        lv, rv = _eval(node[2], env), _eval(node[3], env)
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
        if name == "split":
            s = awk_str(_eval(args_ast[0], env))
            if args_ast[1][0] != "var":
                raise AwkError("split target must be an array name")
            arr = env.get_array(args_ast[1][1])
            arr.clear()
            fs = (
                _pattern_of(args_ast[2], env)
                if len(args_ast) > 2
                else awk_str(env.vars.get("FS", " "))
            )
            if fs == " ":
                parts = s.split()
            elif len(fs) == 1 and not args_ast[2:]:
                parts = s.split(fs)
            elif len(fs) == 1 and args_ast[2][0] != "regexlit":
                parts = s.split(fs)
            else:
                parts = re.split(fs, s) if s else []
            if s == "":
                parts = []
            for k, p in enumerate(parts, 1):
                arr[str(k)] = p
            return float(len(parts))
        if name in ("sub", "gsub"):
            pat = _pattern_of(args_ast[0], env)
            repl = _awk_repl(awk_str(_eval(args_ast[1], env)))
            target = args_ast[2] if len(args_ast) > 2 else ("field", ("num", 0.0))
            if target[0] not in _LVALUE_TAGS:
                raise AwkError(f"{name} target must be an lvalue")
            cur = awk_str(_lv_get(target, env))
            new, n = re.subn(pat, repl, cur, count=0 if name == "gsub" else 1)
            if n:
                _lv_set(target, env, new)
            return float(n)
        if name == "match":
            s = awk_str(_eval(args_ast[0], env))
            pat = _pattern_of(args_ast[1], env)
            m = re.search(pat, s)
            if m:
                env.set_var("RSTART", float(m.start() + 1))
                env.set_var("RLENGTH", float(m.end() - m.start()))
                return float(m.start() + 1)
            env.set_var("RSTART", 0.0)
            env.set_var("RLENGTH", -1.0)
            return 0.0
        if name == "length" and args_ast and args_ast[0][0] == "var":
            v = env.get_var(args_ast[0][1])
            if isinstance(v, dict):
                return float(len(v))
        if name in env.userfuncs:
            return _call_user(env, name, args_ast)
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
            ofs = awk_str(env.vars.get("OFS", " "))
            ors = awk_str(env.vars.get("ORS", "\n"))
            if not st[1]:
                env.buf.append(env.record + ors)
            else:
                env.buf.append(ofs.join(awk_str(_eval(a, env)) for a in st[1]) + ors)
        elif tag == "printf":
            args = [_eval(a, env) for a in st[1]]
            env.buf.append(_sprintf(awk_str(args[0]), args[1:]))
        elif tag == "if":
            if truthy(_eval(st[1], env)):
                _exec_stmts(st[2], env)
            else:
                _exec_stmts(st[3], env)
        elif tag == "while":
            guard = 0
            while truthy(_eval(st[1], env)):
                guard += 1
                if guard > 10_000_000:
                    raise AwkError("while loop exceeded 1e7 iterations")
                try:
                    _exec_stmts(st[2], env)
                except _Break:
                    break
                except _Continue:
                    continue
        elif tag == "do":
            while True:
                try:
                    _exec_stmts(st[1], env)
                except _Break:
                    break
                except _Continue:
                    pass
                if not truthy(_eval(st[2], env)):
                    break
        elif tag == "for":
            init, cond, post, body = st[1], st[2], st[3], st[4]
            if init is not None:
                _exec_stmts([init], env)
            guard = 0
            while cond is None or truthy(_eval(cond, env)):
                guard += 1
                if guard > 10_000_000:
                    raise AwkError("for loop exceeded 1e7 iterations")
                try:
                    _exec_stmts(body, env)
                except _Break:
                    break
                except _Continue:
                    pass
                if post is not None:
                    _exec_stmts([post], env)
        elif tag == "forin":
            var, arrname, body = st[1], st[2], st[3]
            for key in list(env.get_array(arrname).keys()):
                env.set_var(var, key)
                try:
                    _exec_stmts(body, env)
                except _Break:
                    break
                except _Continue:
                    continue
        elif tag == "break":
            raise _Break()
        elif tag == "continue":
            raise _Continue()
        elif tag == "next":
            raise _Next()
        elif tag == "return":
            raise _Return(_eval(st[1], env) if st[1] is not None else None)
        elif tag == "delete":
            arr = env.get_array(st[1])
            if st[2] is None:
                arr.clear()
            else:
                arr.pop(_subsep_key(st[2], env), None)
        elif tag == "block":
            _exec_stmts(st[1], env)
        elif tag == "expr":
            _eval(st[1], env)
        elif tag == "assign":  # legacy node shape (pre-round-3 parses)
            env.set_var(st[1], _eval(st[2], env))
        else:
            raise AwkError(f"bad stmt {tag}")


def run_program(
    prog,
    record: str,
    variables: Dict[str, str],
    funcs: Dict[str, Callable],
) -> Optional[List[str]]:
    """Execute a parsed program over ONE record (the processor feeds one
    record per part: payload for codec text, ' ' otherwise). Returns the
    printed lines, or None if nothing printed (awk.go replaces the payload
    iff the out buffer is non-empty — an empty `print ""` counts)."""
    if isinstance(prog, list):  # pre-round-3 callers passed bare rule lists
        prog = Program(prog, {})
    env = Env(record, variables, funcs, userfuncs=prog.funcs)
    rules = prog.rules
    try:
        for pattern, stmts in rules:
            if pattern is not None and pattern[0] == "BEGIN":
                _exec_stmts(stmts, env)
        env.resplit()  # FS assigned in BEGIN applies to the record split
        for pattern, stmts in rules:
            if pattern is None:
                _exec_stmts(stmts, env)
            elif pattern[0] == "regex":
                if pattern[1].search(env.record):
                    _exec_stmts(stmts, env)
            elif pattern[0] == "expr":
                if truthy(_eval(pattern[1], env)):
                    _exec_stmts(stmts, env)
    except _Next:
        pass
    for pattern, stmts in rules:
        if pattern is not None and pattern[0] == "END":
            try:
                _exec_stmts(stmts, env)
            except _Next:
                pass
    if not env.buf:
        return None
    s = "".join(env.buf)
    if s.endswith("\n"):
        s = s[:-1]
    return s.split("\n")


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
