"""Bloblang AST -> Catalyst Column compiler (the hot path).

Mappings over *typed* DataFrames compile to native Spark expressions —
whole-stage-codegen'd, zero per-row Python. Anything the compiler cannot
express raises :class:`CompileError`, and the engine falls back to the
Arrow-batched interpreter kernel (exact semantics, slower). This mirrors the
reference's split between vectorizable projections and per-message closures,
except here the fast path is the default.

Deliberate deviations from interpreter semantics (documented, hot-path only):
- ``catch``/``or`` compile to ``coalesce`` (JVM expressions yield NULL where
  the interpreter raises recoverable errors — try_* funcs used where needed)
- arithmetic on non-numeric strings yields NULL (``try_cast``, ANSI-safe)
  instead of the reference's recoverable per-message error. ``a + b`` with
  statically-unknown operand types raises :class:`CompileError` so the
  interpreter kernel (exact dynamic concat-or-add semantics,
  lib/bloblang/x/query/arithmetic.go add) handles it instead
- ``hash("xxhash64")`` is not column-compilable byte-compatibly (Spark's
  xxhash64 is a seeded column hash, not a raw-byte digest) -> fallback
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from pyspark.sql import Column, functions as F

from .parser import (
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
)


class CompileError(Exception):
    """Raised when an AST is not expressible as a Catalyst Column."""


_STRIP_HTML_UDF = None


def _strip_html_udf():
    """Lazily-built, cached Arrow-batched strip_html UDF (htmlstrip.py)."""
    global _STRIP_HTML_UDF
    if _STRIP_HTML_UDF is None:
        import pandas as pd  # noqa: F401  (pandas_udf requires pandas)
        from pyspark.sql.functions import pandas_udf

        from .htmlstrip import strip_html_series

        @pandas_udf("string")
        def _udf(s):
            return strip_html_series(s)

        _STRIP_HTML_UDF = _udf
    return _STRIP_HTML_UDF


def _base_type(spark_dtype: Optional[str]) -> Optional[str]:
    """Spark simpleString dtype -> coarse static type for the arithmetic rules."""
    if spark_dtype is None:
        return None
    d = spark_dtype.lower()
    if d in ("string", "varchar", "char") or d.startswith(("varchar(", "char(")):
        return "string"
    if d in ("tinyint", "smallint", "int", "bigint", "float", "double") or d.startswith(
        "decimal"
    ):
        return "number"
    if d == "boolean":
        return "bool"
    return None


class ColumnCompiler:
    def __init__(
        self,
        columns: Optional[set] = None,
        meta_col: Optional[str] = None,
        content_col: Optional[str] = None,
        bindings: Optional[Dict[str, Column]] = None,
    ):
        # `columns` may be a dict {name: spark_dtype} (from df.dtypes) — then
        # static operand types are known and `+` can pick concat vs add the
        # way the reference's dynamic add() does per-row (arithmetic.go:38-64)
        if isinstance(columns, dict):
            self.dtypes: Dict[str, Optional[str]] = {
                k: _base_type(v) for k, v in columns.items()
            }
            self.columns: Optional[set] = set(columns)
        else:
            self.dtypes = {}
            self.columns = columns
        self.meta_col = meta_col
        self.content_col = content_col
        self.bindings = bindings or {}
        self.vars: Dict[str, Column] = {}
        # Frame mode (dynamic-JSON documents): field refs / json() compile
        # to get_json_object over the UTF-8 content column instead of
        # resolving against typed columns. Set via frame_mode=True on
        # compile_mapping_to_transform.
        self.json_frame = False

    def with_this(self, this: Column) -> "ColumnCompiler":
        c = ColumnCompiler(self.columns, self.meta_col, self.content_col, dict(self.bindings))
        c.dtypes = self.dtypes
        c.bindings["__this__"] = this
        c.vars = self.vars
        c.json_frame = self.json_frame
        return c

    # -- frame mode helpers ---------------------------------------------
    def _content_str(self) -> Column:
        return F.col(self.content_col).cast("string")

    def _json_path(self, dotted: str) -> Column:
        """get_json_object extraction: NULL for absent paths (which is what
        lets .or()/catch() compile to coalesce), the raw JSON text for
        arrays/objects, the unquoted value for scalars."""
        return F.get_json_object(self._content_str(), "$." + dotted)

    def is_dynamic_json(self, ast: Any) -> bool:
        """True when `ast` compiles to a get_json_object extraction (frame
        mode field ref or json() call) — used for usage-typed dispatch:
        numeric comparisons coerce, contains() picks array membership vs
        substring at runtime."""
        if not self.json_frame:
            return False
        if isinstance(ast, FieldRef):
            return "__this__" not in self.bindings and ast.path[0] not in self.bindings
        if isinstance(ast, Func) and ast.name == "json":
            return True
        if isinstance(ast, Method) and ast.name in ("or", "catch", "get"):
            return self.is_dynamic_json(ast.recv)
        return False

    # ------------------------------------------------------------------
    def compile(self, node: Any) -> Column:
        if isinstance(node, Lit):
            return F.lit(node.value)
        if isinstance(node, ArrayLit):
            return F.array(*[self.compile(x) for x in node.items])
        if isinstance(node, ObjectLit):
            pairs = []
            for k, v in node.items:
                if not isinstance(k, Lit):
                    raise CompileError("object keys must be literals")
                pairs.append(self.compile(v).alias(str(k.value)))
            return F.struct(*pairs)
        if isinstance(node, This):
            if "__this__" in self.bindings:
                return self.bindings["__this__"]
            raise CompileError("bare `this` outside lambda context")
        if isinstance(node, FieldRef):
            return self._field(node.path)
        if isinstance(node, Func):
            return self._func(node)
        if isinstance(node, Method):
            return self._method(node)
        if isinstance(node, CtxExpr):
            inner = self.compile(node.recv)
            return self.with_this(inner).compile(node.expr)
        if isinstance(node, Match):
            return self._match(node)
        if isinstance(node, Bin):
            return self._bin(node)
        if isinstance(node, Unary):
            v = self.compile(node.operand)
            return -_num(v) if node.op == "-" else ~v
        raise CompileError(f"cannot compile node {type(node).__name__}")

    # ------------------------------------------------------------------
    def _field(self, path) -> Column:
        head, rest = path[0], path[1:]
        if "__this__" in self.bindings:
            col = self.bindings["__this__"][head]
        elif head in self.bindings:
            col = self.bindings[head]
        elif self.json_frame:
            # frame mode: bare names are document JSON paths, NEVER the
            # frame's own internal columns (content/meta/seq/batch_id)
            return self._json_path(".".join(str(p) for p in path))
        elif self.columns is None or head in self.columns:
            col = F.col(head)
        else:
            raise CompileError(f"unknown column {head}")
        for seg in rest:
            col = col[seg]
        return col

    def _path_col(self, dotted: str) -> Column:
        if self.json_frame:
            return self._json_path(dotted)
        segs = dotted.split(".")
        if self.columns is not None and segs[0] not in self.columns:
            raise CompileError(f"unknown column {segs[0]}")
        col = F.col(segs[0])
        for seg in segs[1:]:
            col = col[seg]
        return col

    def _func(self, node: Func) -> Column:
        name = node.name
        if name == "json":
            if not node.args or not isinstance(node.args[0], Lit):
                raise CompileError("json() requires a literal path on the hot path")
            return self._path_col(str(node.args[0].value))
        if name == "content":
            if self.content_col is None:
                raise CompileError("no content column bound")
            if self.json_frame:
                # frame content is BINARY; the native path treats it as
                # UTF-8 text (documented deviation: string methods on
                # non-UTF-8 payloads need the interpreter kernel)
                return self._content_str()
            return F.col(self.content_col)
        if name in ("meta", "metadata"):
            if self.meta_col is None:
                raise CompileError("no meta column bound")
            if node.args and isinstance(node.args[0], Lit):
                return F.col(self.meta_col)[str(node.args[0].value)]
            return F.col(self.meta_col)
        if name == "deleted":
            raise CompileError("deleted() only supported as a match-case root value")
        if name == "nothing":
            raise CompileError("nothing() not column-compilable")
        if name == "uuid_v4":
            return F.expr("uuid()")
        if name == "timestamp_unix":
            return F.unix_timestamp()
        if name == "random_int":
            seed = node.args[0].value if node.args and isinstance(node.args[0], Lit) else 0
            return (F.rand(int(seed)) * F.lit(float(1 << 62))).cast("long")
        if name == "var":
            key = str(node.args[0].value)
            if key in self.vars:
                return self.vars[key]
            raise CompileError(f"variable {key} not bound")
        raise CompileError(f"function {name} not column-compilable")

    def _match(self, node: Match) -> Column:
        ctx = self
        operand: Optional[Column] = None
        if node.operand is not None:
            operand = self.compile(node.operand)
            ctx = self.with_this(operand)
        result: Optional[Column] = None
        chain = []
        for cond_ast, body_ast in node.cases:
            body = ctx.compile(body_ast)
            if cond_ast is None:
                chain.append((None, body))
                break
            cond = ctx.compile(cond_ast)
            if operand is not None and not _looks_boolean(cond_ast):
                cond = operand == cond
            chain.append((cond, body))
        for cond, body in chain:
            if cond is None:
                result = body if result is None else result.otherwise(body)
            else:
                result = F.when(cond, body) if result is None else result.when(cond, body)
        if result is None:
            raise CompileError("empty match")
        return result

    def _bin(self, node: Bin) -> Column:
        op = node.op
        left = self.compile(node.left)
        if op == "&&":
            return left & self.compile(node.right)
        if op == "||":
            return left | self.compile(node.right)
        if op == "|":
            return F.coalesce(left, self.compile(node.right))
        right = self.compile(node.right)
        if op in ("==", "!=", "<", ">", "<=", ">="):
            # usage-typed coercion for dynamic JSON refs: a get_json_object
            # extraction is STRING — compared against a statically-numeric
            # other side, coerce it so 10 > 9 (not "10" < "9")
            if self.is_dynamic_json(node.left) and self.is_dynamic_json(node.right):
                lt = _static_type(node.left, self)
                rt = _static_type(node.right, self)
                if lt is None and rt is None:
                    # two dynamic refs: JSON numbers compare numerically,
                    # strings lexicographically — the choice needs runtime
                    # types, so a string compare here would silently give
                    # 9 > 10 on numeric fields. Same rule as dynamic '+'.
                    raise CompileError(
                        "comparison of two dynamic values needs runtime types"
                    )
            if self.is_dynamic_json(node.left) and _static_type(node.right, self) == "number":
                left = _num(left)
            if self.is_dynamic_json(node.right) and _static_type(node.left, self) == "number":
                right = _num(right)
        if op == "==":
            return left == right
        if op == "!=":
            return left != right
        if op in ("<", ">", "<=", ">="):
            return {"<": left < right, ">": left > right, "<=": left <= right, ">=": left >= right}[op]
        if op == "+":
            lt = _static_type(node.left, self)
            rt = _static_type(node.right, self)
            if lt == "string" and rt == "string":
                return F.concat(left, right)
            if (lt == "string") != (rt == "string"):
                if lt in ("number", "bool") or rt in ("number", "bool"):
                    # reference add() errors on string+number per-row; surface
                    # the type clash at compile time instead of concat'ing
                    raise CompileError("cannot add string and non-string")
                # one statically-string side, other unknown: concat
                return F.concat(left.cast("string"), right.cast("string"))
            if lt is None and rt is None:
                # dynamic concat-or-add needs runtime types -> interpreter
                raise CompileError("operand types unknown for +")
            return _num(left) + _num(right)
        if op == "-":
            return _num(left) - _num(right)
        if op == "*":
            return _num(left) * _num(right)
        if op == "/":
            return _num(left) / _num(right)
        if op == "%":
            # Go's % truncates toward zero (arithmetic.go mod): -7 % 3 == -1,
            # unlike pmod/floored modulo
            lng = _long(left)
            rng = _long(right)
            mag = F.pmod(F.abs(lng), F.abs(rng))
            return F.when(lng < 0, -mag).otherwise(mag)
        raise CompileError(f"operator {op} not column-compilable")

    # ------------------------------------------------------------------
    def _method(self, node: Method) -> Column:
        name = node.name

        if name in ("catch", "or"):
            recv = self.compile(node.recv)
            return F.coalesce(recv, self.compile(node.args[0]))
        if name == "from_all" or name == "from":
            raise CompileError("batch-scoped methods need the batch window plan")

        # lambda methods
        if name in ("map_each", "filter", "sort_by", "fold"):
            recv = self.compile(node.recv)
            if name == "map_each":
                return F.transform(recv, lambda x: self.with_this(x).compile(node.args[0]))
            if name == "filter":
                return F.filter(recv, lambda x: self.with_this(x).compile(node.args[0]))
            if name == "sort_by":
                raise CompileError("sort_by not column-compilable")
            init = self.compile(node.args[0])
            lam = node.args[1]

            def merge(acc, x):
                c = ColumnCompiler(self.columns, self.meta_col, self.content_col,
                                   {**self.bindings, "tally": acc, "value": x})
                c.dtypes = self.dtypes
                c.vars = self.vars
                return c.compile(lam)

            return F.aggregate(recv, init.cast("double"), merge)

        recv = self.compile(node.recv)
        args = node.args

        def lit_arg(i: int, default=None):
            if len(args) <= i:
                return default
            a = args[i]
            if isinstance(a, Unary) and a.op == "-" and isinstance(a.operand, Lit):
                a = Lit(-a.operand.value)
            if not isinstance(a, Lit):
                raise CompileError("argument must be literal on the hot path")
            return a.value

        if name == "string":
            return recv.cast("string")
        if name == "number":
            out = _num(recv)
            if args:
                return F.coalesce(out, _num(self.compile(args[0])))
            return out
        if name == "bool":
            return recv.cast("boolean")
        if name == "not":
            return ~recv
        if name == "uppercase":
            return F.upper(recv)
        if name == "lowercase":
            return F.lower(recv)
        if name == "capitalize":
            return F.initcap(recv)
        if name == "trim":
            if args:
                # literal Column, not SQL text: backslashes/quotes in the
                # cutset must survive verbatim (lib/bloblang/x/query/methods_strings.go trim)
                return F.btrim(recv, F.lit(str(lit_arg(0))))
            return F.trim(recv)
        if name == "split":
            import re as _re

            return F.split(recv, _re.escape(str(lit_arg(0))))
        if name == "join":
            return F.array_join(recv, str(lit_arg(0, "")))
        if name == "length":
            return F.length(recv)
        if name == "size":
            return F.size(recv)
        if name == "contains":
            if self.is_dynamic_json(node.recv):
                # dynamic dispatch the way the reference's contains() does
                # per-row (methods.go Contains): membership when the JSON
                # value is an array, substring when it is a string. The
                # extraction yields the raw JSON text, so '[' prefix is the
                # runtime type tag; unparseable arrays -> NULL (caller's
                # catch()/or() picks the fallback).
                arg = self.compile(args[0])
                return F.when(
                    recv.startswith("["),
                    F.array_contains(F.from_json(recv, "array<string>"), arg),
                ).otherwise(recv.contains(arg))
            return recv.contains(self.compile(args[0]))
        if name == "has_prefix":
            return recv.startswith(self.compile(args[0]))
        if name == "has_suffix":
            return recv.endswith(self.compile(args[0]))
        if name == "replace":
            return F.replace(recv, self.compile(args[0]), self.compile(args[1]))
        if name == "re_match":
            return recv.rlike(str(lit_arg(0)))
        if name == "re_replace":
            return F.regexp_replace(recv, str(lit_arg(0)), str(lit_arg(1)))
        if name == "re_find_all":
            # literal Column: SQL-text quoting would swallow backslashes
            # (re_find_all("\d+") must not become regexp 'd+')
            return F.regexp_extract_all(recv, F.lit(str(lit_arg(0))), F.lit(0))
        if name == "format":
            # recv is the Go format string; %v/%s/%d/%f -> format_string
            if not isinstance(node.recv, Lit):
                raise CompileError("format string must be a literal")
            fmt = str(node.recv.value).replace("%v", "%s")
            return F.format_string(fmt, *[self.compile(a) for a in args])
        if name == "slice":
            lo = int(lit_arg(0))
            hi = lit_arg(1)
            if lo >= 0 and (hi is None or int(hi) >= 0):
                if hi is None:
                    return F.substring(recv, lo + 1, 1 << 30)
                return F.substring(recv, lo + 1, int(hi) - lo)
            # negative indices wrap from the end (strings only)
            ln = F.length(recv)
            start = (ln + F.lit(lo) + 1) if lo < 0 else F.lit(lo + 1)
            if hi is None:
                return F.substring(recv, start, F.lit(1 << 30))
            end = (ln + F.lit(int(hi))) if int(hi) < 0 else F.lit(int(hi))
            return F.substring(recv, start, end - start + 1)
        if name == "index":
            i = int(lit_arg(0))
            return F.element_at(recv, i + 1 if i >= 0 else i)
        if name == "sum":
            return F.aggregate(recv, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        if name == "flatten":
            return F.flatten(recv)
        if name == "sort":
            return F.array_sort(recv)
        if name == "unique":
            return F.array_distinct(recv)
        if name == "enumerated":
            raise CompileError("enumerated not column-compilable (posexplode is a plan op)")
        if name == "keys":
            return F.map_keys(recv)
        if name == "values":
            return F.map_values(recv)
        if name == "append":
            return F.concat(recv, F.array(*[self.compile(a) for a in args]))
        if name == "get":
            col = recv
            for seg in str(lit_arg(0)).split("."):
                col = col[seg]
            return col
        if name == "exists":
            col = recv
            for seg in str(lit_arg(0)).split("."):
                col = col[seg]
            return col.isNotNull()
        if name == "parse_json":
            raise CompileError("parse_json needs a schema; use from_json in the plan layer")
        if name == "strip_html":
            # bluemonday parity needs the full HTML5 entity table
            # (decode-then-re-escape, htmlstrip.py) — not expressible as a
            # Catalyst regex, so this compiles to an Arrow-batched pandas
            # UDF with a vectorized fast path for entity-free rows.
            return _strip_html_udf()(recv.cast("string"))
        if name == "escape_url_query":
            return F.url_encode(recv)
        if name == "unescape_url_query":
            return F.url_decode(recv)
        if name == "hash":
            alg = str(lit_arg(0))
            if alg == "sha256":
                return F.unhex(F.sha2(recv.cast("binary"), 256))
            if alg == "sha512":
                return F.unhex(F.sha2(recv.cast("binary"), 512))
            if alg == "sha1":
                return F.unhex(F.sha1(recv.cast("binary")))
            if alg == "md5":
                return F.unhex(F.md5(recv.cast("binary")))
            raise CompileError(f"hash {alg} not column-compilable byte-compatibly")
        if name == "encode":
            scheme = str(lit_arg(0))
            if scheme == "hex":
                return F.lower(F.hex(recv.cast("binary")))
            if scheme == "base64":
                return F.base64(recv.cast("binary"))
            raise CompileError(f"encoding {scheme} not column-compilable")
        if name == "decode":
            scheme = str(lit_arg(0))
            if scheme == "hex":
                return F.unhex(recv)
            if scheme == "base64":
                return F.unbase64(recv)
            raise CompileError(f"encoding {scheme} not column-compilable")
        if name == "floor":
            return F.floor(recv.cast("double")).cast("double")
        if name == "ceil":
            return F.ceil(recv.cast("double")).cast("double")
        if name == "round":
            return F.floor(recv.cast("double") + 0.5).cast("double")
        if name == "abs":
            return F.abs(recv.cast("double"))
        if name == "map":
            return self.with_this(recv).compile(args[0])
        if name == "merge":
            raise CompileError("merge not column-compilable generically")
        raise CompileError(f"method {name} not column-compilable")


def _looks_boolean(ast: Any) -> bool:
    if isinstance(ast, Bin) and ast.op in ("==", "!=", "<", ">", "<=", ">=", "&&", "||"):
        return True
    if isinstance(ast, Unary) and ast.op == "!":
        return True
    if isinstance(ast, Method) and ast.name in (
        "contains", "has_prefix", "has_suffix", "re_match", "exists", "not", "bool",
    ):
        return True
    if isinstance(ast, Lit) and isinstance(ast.value, bool):
        return True
    return False


def _is_string_lit(ast: Any) -> bool:
    return isinstance(ast, Lit) and isinstance(ast.value, str)


def _num(c: Column) -> Column:
    """ANSI-safe numeric coercion: non-numeric rows yield NULL, never a
    CAST_INVALID_INPUT job abort (Spark 4 defaults to ANSI mode)."""
    return c.try_cast("double") if hasattr(c, "try_cast") else c.cast("double")


def _long(c: Column) -> Column:
    return c.try_cast("long") if hasattr(c, "try_cast") else c.cast("long")


_STR_METHODS = {
    "string", "uppercase", "lowercase", "capitalize", "trim", "replace",
    "re_replace", "join", "format", "strip_html", "escape_url_query",
    "unescape_url_query",
}
_NUM_METHODS = {"number", "length", "size", "sum", "floor", "ceil", "round", "abs"}
_BOOL_METHODS = {"bool", "not", "contains", "has_prefix", "has_suffix", "re_match", "exists"}


def _static_type(node: Any, cc: Optional["ColumnCompiler"]) -> Optional[str]:
    """Best-effort static operand typing ('string'|'number'|'bool'|None) used
    by `+` to choose concat vs numeric add the way the reference's dynamic
    add() does per-row."""
    if isinstance(node, Lit):
        v = node.value
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, float)):
            return "number"
        if isinstance(v, str):
            return "string"
        return None
    if isinstance(node, Unary):
        return "number" if node.op == "-" else "bool"
    if isinstance(node, Bin):
        if node.op in ("-", "*", "/", "%"):
            return "number"
        if node.op in ("==", "!=", "<", ">", "<=", ">=", "&&", "||"):
            return "bool"
        if node.op in ("+", "|"):
            lt = _static_type(node.left, cc)
            rt = _static_type(node.right, cc)
            return lt if lt == rt else (lt or rt if node.op == "|" else None)
        return None
    if isinstance(node, Method):
        if node.name in _STR_METHODS:
            return "string"
        if node.name in _NUM_METHODS:
            return "number"
        if node.name in _BOOL_METHODS:
            return "bool"
        if node.name in ("catch", "or") and node.args:
            return _static_type(node.recv, cc) or _static_type(node.args[0], cc)
        if node.name == "slice":
            return _static_type(node.recv, cc)
        return None
    if isinstance(node, Func):
        if node.name in ("timestamp_unix", "random_int", "batch_index", "batch_size"):
            return "number"
        if node.name in ("uuid_v4", "hostname"):
            return "string"
        return None
    if isinstance(node, FieldRef):
        if cc is not None and len(node.path) == 1 and "__this__" not in cc.bindings:
            return cc.dtypes.get(node.path[0])
        return None
    if isinstance(node, Match):
        kinds = {_static_type(b, cc) for _c, b in node.cases}
        kinds.discard(None)
        return kinds.pop() if len(kinds) == 1 else None
    return None


# ---------------------------------------------------------------- mapping
class CompiledMapping:
    """A mapping compiled to a DataFrame transform: assignments become
    withColumn, root-level deleted() matches become filters."""

    def __init__(self, transform: Callable, description: str):
        self.transform = transform
        self.description = description

    def __call__(self, df):
        return self.transform(df)


def compile_mapping_to_transform(
    mapping: Mapping,
    columns,
    frame_mode: bool = False,
    content_col: str = "content",
    meta_col: str = "meta",
) -> CompiledMapping:
    """Compile a typed-mode mapping. Raises CompileError on any statement the
    Column compiler can't express (caller falls back to the kernel path).

    ``columns`` may be a plain set of names or a dict {name: spark_dtype}
    (``dict(df.dtypes)``) — with dtypes, ``+`` resolves concat-vs-add
    statically instead of falling back.

    ``frame_mode=True`` compiles dynamic-JSON mappings over a message frame
    (content BINARY + meta MAP): field refs and ``json()`` become
    ``get_json_object`` extractions, ``meta()``/``content()`` bind to the
    frame columns, and the supported statements are root-level delete
    filters plus whole-root assignment of a STRING expression (which
    replaces the content column). Field assignment would need JSON
    reserialization (key-sorted, Go-number-formatted) — that stays on the
    interpreter kernel."""
    steps = []  # (kind, payload)
    if frame_mode:
        cc = ColumnCompiler(columns=columns, meta_col=meta_col, content_col=content_col)
        cc.json_frame = True
    else:
        cc = ColumnCompiler(columns=columns)
    current_cols = cc.columns

    def add_col(name: str, static_t: Optional[str]) -> None:
        current_cols.add(name)
        cc.dtypes[name] = static_t
        if isinstance(columns, dict):  # keep the caller's container in sync
            columns[name] = {"string": "string", "number": "double", "bool": "boolean"}.get(
                static_t
            )

    def drop_col(name: str) -> None:
        current_cols.discard(name)
        cc.dtypes.pop(name, None)
        if isinstance(columns, dict):
            columns.pop(name, None)
    content_replaced = False
    for st in mapping.statements:
        if content_replaced:
            # After a whole-root content replacement, compiled expressions
            # would read the NEW content column (withColumn already applied)
            # while the interpreter resolves field refs against the input
            # document throughout (exec ctx `this` is the input part). No
            # later statement is safe natively — fall back.
            raise CompileError(
                "statements after whole-root replacement need the interpreter"
            )
        if st.kind == "let":
            cc.vars[st.path[0]] = cc.compile(st.expr)
            continue
        if st.kind == "meta":
            if not frame_mode:
                raise CompileError("meta assignment not supported in typed mode")
            # frame mode: metadata is the MAP column. Supported statements —
            # `meta k = <string expr>` (set), `meta k = deleted()` (unset),
            # `meta = deleted()` (clear). The interpreter coerces set values
            # via Go to_string; only statically-string expressions match that
            # byte-for-byte (double->string diverges: Spark "5.0", Go "5"),
            # so anything else stays on the interpreter kernel.
            is_del = isinstance(st.expr, Func) and st.expr.name == "deleted"
            if not st.path:
                if is_del:
                    steps.append(("meta_clear", None))
                    continue
                raise CompileError("root meta assignment needs an object (interpreter)")
            if is_del:
                steps.append(("meta_del", st.path[0]))
                continue
            if _static_type(st.expr, cc) != "string":
                raise CompileError("meta value must be statically string in frame mode")
            steps.append(("meta_set", (st.path[0], cc.compile(st.expr))))
            continue
        if st.kind != "root":
            raise CompileError(f"statement kind {st.kind} not compilable")
        # root = this -> identity; root = match {cond => deleted()} -> filter
        if not st.path:
            if isinstance(st.expr, This):
                continue
            if isinstance(st.expr, Match) and all(
                isinstance(body, Func) and body.name == "deleted"
                for _c, body in st.expr.cases
            ):
                conds = [cc.compile(c) for c, _b in st.expr.cases if c is not None]
                if not conds:
                    raise CompileError("unconditional delete")
                pred = conds[0]
                for c in conds[1:]:
                    pred = pred | c
                steps.append(("filter", ~F.coalesce(pred, F.lit(False))))
                continue
            if frame_mode and _static_type(st.expr, cc) == "string":
                # whole-root STRING assignment = replace the message content
                steps.append(("content", cc.compile(st.expr)))
                content_replaced = True
                continue
            raise CompileError("whole-root reshaping not supported in typed mode")
        if frame_mode:
            raise CompileError(
                "field assignment needs JSON reserialization (frame mode)"
            )
        if len(st.path) != 1:
            raise CompileError("nested assignment targets not supported in typed mode")
        name = st.path[0]
        if isinstance(st.expr, Func) and st.expr.name == "deleted":
            steps.append(("drop", name))
            drop_col(name)
            continue
        col = cc.compile(st.expr)
        steps.append(("set", (name, col)))
        add_col(name, _static_type(st.expr, cc))

    def transform(df):
        out = df
        for kind, payload in steps:
            if kind == "filter":
                out = out.filter(payload)
            elif kind == "drop":
                out = out.drop(payload)
            elif kind == "content":
                out = out.withColumn(content_col, payload.cast("binary"))
            elif kind == "meta_clear":
                # map_filter keeps the map<string,string> type, unlike
                # an untyped empty map literal
                out = out.withColumn(
                    meta_col,
                    F.map_filter(F.col(meta_col), lambda k, v: F.lit(False)),
                )
            elif kind == "meta_del":
                out = out.withColumn(
                    meta_col,
                    F.map_filter(F.col(meta_col), lambda k, v: k != F.lit(payload)),
                )
            elif kind == "meta_set":
                mk, mv = payload
                # remove any existing key first: map_concat rejects dup keys
                out = out.withColumn(
                    meta_col,
                    F.map_concat(
                        F.map_filter(F.col(meta_col), lambda k, v: k != F.lit(mk)),
                        F.create_map(F.lit(mk), mv.cast("string")),
                    ),
                )
            else:
                name, col = payload
                out = out.withColumn(name, col)
        return out

    return CompiledMapping(transform, f"{len(steps)} compiled steps")
