"""Recursive-descent parser for the Bloblang subset.

Grammar re-derived from the observable behavior of the reference DSL
(/root/reference/lib/bloblang/x/mapping/parser.go, query/parser.go,
query/expression_parser.go — behavior only, no code reuse):

    mapping   := statement*
    statement := 'let' NAME '=' expr
               | 'meta' [NAME|STRING] '=' expr
               | 'map' NAME '{' mapping '}'
               | target '=' expr
    target    := 'root' ('.' seg)* | seg ('.' seg)*
    expr      := pratt expression with || && | == != < > <= >= + - * / % !
    postfix   := '.' NAME | '.' NAME '(' args ')' | '.' '(' expr ')'
    primary   := literal | '[' ... ']' | '{' ... '}' | NAME '(' args ')'
               | 'match' [expr] '{' case (',' | NL case)* '}'
               | 'this' | NAME | '(' expr ')' | '-' expr | '!' expr

Newlines terminate statements at bracket depth 0 and are ignored inside
brackets. Comments run ``#`` to end of line.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

from .values import BloblangError


# ----------------------------------------------------------------- AST nodes
@dataclass
class Lit:
    value: Any


@dataclass
class ArrayLit:
    items: List[Any]


@dataclass
class ObjectLit:
    items: List[Tuple[Any, Any]]  # (key_expr, value_expr)


@dataclass
class This:
    pass


@dataclass
class FieldRef:
    path: List[str]  # resolved against current context


@dataclass
class Func:
    name: str
    args: List[Any]


@dataclass
class Method:
    recv: Any
    name: str
    args: List[Any]


@dataclass
class CtxExpr:
    recv: Any
    expr: Any


@dataclass
class Match:
    operand: Optional[Any]
    cases: List[Tuple[Optional[Any], Any]]  # (condition | None for '_', body)


@dataclass
class Bin:
    op: str
    left: Any
    right: Any


@dataclass
class Unary:
    op: str
    operand: Any


@dataclass
class Statement:
    kind: str  # 'root' | 'meta' | 'let' | 'map'
    path: List[str]  # for root: doc path; meta: [key] or []; let/map: [name]
    expr: Any  # for map: a Mapping


@dataclass
class Mapping:
    statements: List[Statement] = field(default_factory=list)
    maps: dict = field(default_factory=dict)  # name -> Mapping


# ------------------------------------------------------------------- Lexer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\r]+)
  | (?P<comment>\#[^\n]*)
  | (?P<nl>\n)
  | (?P<arrow>=>)
  | (?P<op>\|\||&&|==|!=|>=|<=|[-+*/%<>=!|.,:()\[\]{}_])
  | (?P<number>\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"match", "this", "let", "meta", "map", "root", "true", "false", "null", "if", "else"}


def _unquote(s: str) -> str:
    q = s[0]
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            n = body[i + 1]
            mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\", "/": "/"}.get(n)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
            if n == "u" and i + 5 < len(body) + 1:
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
        out.append(c)
        i += 1
    return "".join(out)


class Lexer:
    def __init__(self, src: str):
        self.tokens: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(src):
            m = _TOKEN_RE.match(src, pos)
            if not m:
                raise BloblangError(f"lex error at {src[pos:pos+20]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            text = m.group()
            if kind == "nl":
                self.tokens.append(("nl", "\n"))
            elif kind == "number":
                self.tokens.append(("number", text))
            elif kind == "string":
                self.tokens.append(("string", _unquote(text)))
            elif kind == "name":
                self.tokens.append(("kw" if text in _KEYWORDS else "name", text))
            else:
                self.tokens.append(("op", text))
        self.tokens.append(("eof", ""))


_BIN_PRECEDENCE = [
    {"||"},
    {"&&"},
    {"|"},
    {"==", "!=", ">", "<", ">=", "<="},
    {"+", "-"},
    {"*", "/", "%"},
]

# methods whose arguments are lazy expressions evaluated against a rebound
# context (map_each / map: element; fold: {tally,value}; sort: {left,right})
LAZY_METHODS = {"map_each": {0}, "map": {0}, "fold": {1}, "sort_by": {0}, "filter": {0}}


class Parser:
    def __init__(self, src: str):
        self.toks = Lexer(src).tokens
        self.i = 0
        self.depth = 0

    # --- token helpers ------------------------------------------------
    def peek(self, skip_nl: Optional[bool] = None) -> Tuple[str, str]:
        skip = self.depth > 0 if skip_nl is None else skip_nl
        j = self.i
        while skip and self.toks[j][0] == "nl":
            j += 1
        return self.toks[j]

    def next(self, skip_nl: Optional[bool] = None) -> Tuple[str, str]:
        skip = self.depth > 0 if skip_nl is None else skip_nl
        while skip and self.toks[self.i][0] == "nl":
            self.i += 1
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str, text: Optional[str] = None) -> Tuple[str, str]:
        tok = self.next()
        if tok[0] != kind or (text is not None and tok[1] != text):
            raise BloblangError(f"expected {text or kind}, found {tok}")
        return tok

    def at(self, kind: str, text: Optional[str] = None, skip_nl: Optional[bool] = None) -> bool:
        tok = self.peek(skip_nl)
        return tok[0] == kind and (text is None or tok[1] == text)

    def skip_newlines(self):
        while self.toks[self.i][0] == "nl":
            self.i += 1

    # --- mapping / statements -----------------------------------------
    def parse_mapping(self) -> Mapping:
        mp = Mapping()
        self.skip_newlines()
        while not self.at("eof", skip_nl=False):
            st = self.parse_statement(mp)
            if st is not None:
                mp.statements.append(st)
            self.skip_newlines()
        return mp

    def parse_statement(self, mp: Mapping) -> Optional[Statement]:
        kind, text = self.peek(skip_nl=False)
        if kind == "kw" and text == "let":
            self.next()
            name = self.next()[1]
            self.expect("op", "=")
            return Statement("let", [name], self.parse_expr())
        if kind == "kw" and text == "meta":
            self.next()
            key: List[str] = []
            if self.at("name", skip_nl=False) or self.at("string", skip_nl=False):
                key = [self.next()[1]]
            self.expect("op", "=")
            return Statement("meta", key, self.parse_expr())
        if kind == "kw" and text == "map":
            self.next()
            name = self.next()[1]
            self.expect("op", "{")
            self.depth += 1
            sub = Mapping()
            self.skip_newlines()
            while not self.at("op", "}"):
                st = self.parse_statement(sub)
                if st is not None:
                    sub.statements.append(st)
                self.skip_newlines()
            self.expect("op", "}")
            self.depth -= 1
            mp.maps[name] = sub
            return None
        # root-path or bare-path target
        path: List[str] = []
        if kind == "kw" and text == "root":
            self.next()
            while self.at("op", ".", skip_nl=False):
                self.next()
                path.append(self.next()[1])
        else:
            path.append(self.next()[1])
            while self.at("op", ".", skip_nl=False):
                self.next()
                path.append(self.next()[1])
        self.expect("op", "=")
        return Statement("root", path, self.parse_expr())

    # --- expressions ----------------------------------------------------
    def parse_expr(self, level: int = 0) -> Any:
        if level >= len(_BIN_PRECEDENCE):
            return self.parse_unary()
        left = self.parse_expr(level + 1)
        while True:
            tok = self.peek(skip_nl=False)
            if tok[0] == "nl" and self.depth == 0:
                break
            tok = self.peek()
            if tok[0] == "op" and tok[1] in _BIN_PRECEDENCE[level]:
                self.next()
                right = self.parse_expr(level + 1)
                left = Bin(tok[1], left, right)
            else:
                break
        return left

    def parse_unary(self) -> Any:
        if self.at("op", "-"):
            self.next()
            return Unary("-", self.parse_unary())
        if self.at("op", "!"):
            self.next()
            return Unary("!", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self) -> Any:
        node = self.parse_primary()
        while True:
            if self.at("op", ".", skip_nl=False) or (self.depth > 0 and self.at("op", ".")):
                self.next()
                if self.at("op", "("):
                    self.next()
                    self.depth += 1
                    inner = self.parse_expr()
                    self.depth -= 1
                    self.expect("op", ")")
                    node = CtxExpr(node, inner)
                    continue
                name = self.next()[1]
                if self.at("op", "(", skip_nl=False):
                    args = self.parse_args()
                    node = Method(node, name, args)
                else:
                    node = Method(node, "get_field", [Lit(name)]) if False else _append_field(node, name)
            else:
                break
        return node

    def parse_args(self) -> List[Any]:
        self.expect("op", "(")
        self.depth += 1
        args: List[Any] = []
        if not self.at("op", ")"):
            while True:
                args.append(self.parse_expr())
                if self.at("op", ","):
                    self.next()
                    continue
                break
        self.expect("op", ")")
        self.depth -= 1
        return args

    def parse_primary(self) -> Any:
        kind, text = self.peek()
        if kind == "number":
            self.next()
            if re.fullmatch(r"\d+", text):
                return Lit(int(text))
            return Lit(float(text))
        if kind == "string":
            self.next()
            return Lit(text)
        if kind == "kw":
            if text in ("meta", "map"):
                self.next()
                if self.at("op", "(", skip_nl=False):
                    return Func(text, self.parse_args())
                return FieldRef([text])
            if text in ("true", "false"):
                self.next()
                return Lit(text == "true")
            if text == "null":
                self.next()
                return Lit(None)
            if text == "this":
                self.next()
                return This()
            if text == "root":
                self.next()
                return Func("__root__", [])
            if text == "match":
                return self.parse_match()
            if text == "if":
                return self.parse_if()
        if kind == "op" and text == "(":
            self.next()
            self.depth += 1
            inner = self.parse_expr()
            self.depth -= 1
            self.expect("op", ")")
            return inner
        if kind == "op" and text == "[":
            self.next()
            self.depth += 1
            items = []
            while not self.at("op", "]"):
                items.append(self.parse_expr())
                if self.at("op", ","):
                    self.next()
            self.expect("op", "]")
            self.depth -= 1
            return ArrayLit(items)
        if kind == "op" and text == "{":
            self.next()
            self.depth += 1
            items = []
            while not self.at("op", "}"):
                key = self.parse_expr()
                self.expect("op", ":")
                items.append((key, self.parse_expr()))
                if self.at("op", ","):
                    self.next()
            self.expect("op", "}")
            self.depth -= 1
            return ObjectLit(items)
        if kind == "op" and text == "_":
            self.next()
            return Lit("_")  # only meaningful as a match pattern
        if kind == "name":
            self.next()
            if self.at("op", "(", skip_nl=False):
                return Func(text, self.parse_args())
            return FieldRef([text])
        raise BloblangError(f"unexpected token {kind}:{text!r}")

    def parse_match(self) -> Match:
        self.expect("kw", "match")
        operand = None
        if not self.at("op", "{"):
            operand = self.parse_expr()
        self.expect("op", "{")
        self.depth += 1
        cases: List[Tuple[Optional[Any], Any]] = []
        while not self.at("op", "}"):
            if self.at("op", "_"):
                self.next()
                cond = None
            else:
                cond = self.parse_expr()
            self.expect("op", "=>")
            body = self.parse_expr()
            cases.append((cond, body))
            if self.at("op", ","):
                self.next()
        self.expect("op", "}")
        self.depth -= 1
        return Match(operand, cases)

    def parse_if(self) -> Match:
        # if cond { expr } [else if cond { expr }]* [else { expr }] sugar
        cases: List[Tuple[Optional[Any], Any]] = []
        while True:
            self.expect("kw", "if")
            cond = self.parse_expr()
            self.expect("op", "{")
            self.depth += 1
            body = self.parse_expr()
            self.depth -= 1
            self.expect("op", "}")
            cases.append((cond, body))
            if self.at("kw", "else"):
                self.next()
                if self.at("kw", "if"):
                    continue
                self.expect("op", "{")
                self.depth += 1
                body = self.parse_expr()
                self.depth -= 1
                self.expect("op", "}")
                cases.append((None, body))
            break
        return Match(None, cases)


def _append_field(node: Any, name: str) -> Any:
    if isinstance(node, FieldRef):
        return FieldRef(node.path + [name])
    return Method(node, "get", [Lit(name)])


def parse_mapping(src: str) -> Mapping:
    return Parser(src).parse_mapping()


def parse_query(src: str) -> Any:
    p = Parser(src)
    p.depth += 1  # allow newlines anywhere in a standalone query
    expr = p.parse_expr()
    p.skip_newlines()
    if not p.at("eof"):
        raise BloblangError(f"trailing tokens after query: {p.peek()}")
    return expr


# ------------------------------------------------- field interpolation
_INTERP_RE = re.compile(r"\$\{!(?P<body>[^}]*)\}")


def parse_interpolation(src: str) -> List[Any]:
    """Split ``a ${! expr } b`` into [str, AST, str, ...].

    Re-derived from the behavior of the reference's field expressions
    (/root/reference/lib/bloblang/x/field/expression.go:60-84). Legacy
    ``${!name:arg}`` forms compile to the equivalent function AST.
    """
    parts: List[Any] = []
    pos = 0
    for m in _INTERP_RE.finditer(src):
        if m.start() > pos:
            parts.append(src[pos : m.start()])
        body = m.group("body").strip()
        parts.append(_parse_interp_body(body))
        pos = m.end()
    if pos < len(src):
        parts.append(src[pos:])
    return parts


_LEGACY_RE = re.compile(r"^(?P<name>[a-z_0-9]+)(?::(?P<arg>.*))?$")


def _parse_interp_body(body: str) -> Any:
    # legacy deprecated function forms: name or name:arg. The name must be a
    # bare identifier from the deprecated table (no parens/spaces/dots); the
    # arg after ':' is raw text and may contain anything (e.g. a Go timestamp
    # layout with spaces).
    name, sep, arg = body.partition(":")
    if re.fullmatch(r"[a-z_0-9]+", name) and "(" not in body:
        arg = arg if sep else None
        legacy = {
            # full deprecated set: lib/bloblang/x/query/deprecated_functions.go:144-228
            # json_field:path,N — the part index N is dropped (parts are rows
            # here; cross-part reads need batch-scoped frame mode)
            "json_field": lambda a: Func(
                "json", [Lit(a.split(",")[0])] if a else []
            ),
            "metadata": lambda a: Func("meta", [Lit(a)] if a else []),
            "metadata_json_object": lambda a: Func("meta", []),
            "error": lambda a: Func("error", []),
            "content": lambda a: Func("content", []),
            "echo": lambda a: Lit(a or ""),
            "count": lambda a: Func("count", [Lit(a or "")]),
            "batch_size": lambda a: Func("batch_size", []),
            "timestamp_unix": lambda a: Func("timestamp_unix", []),
            "timestamp_unix_nano": lambda a: Func("timestamp_unix_nano", []),
            "timestamp": lambda a: Func("timestamp", [Lit(a)] if a else []),
            "timestamp_utc": lambda a: Func("timestamp_utc", [Lit(a)] if a else []),
            "uuid_v4": lambda a: Func("uuid_v4", []),
            "hostname": lambda a: Func("hostname", []),
        }.get(name)
        if legacy is not None:
            return legacy(arg)
    return parse_query(body)
