"""Interpreter for the Bloblang-subset AST.

Executes a parsed :class:`~benthos_spark.bloblang.parser.Mapping` against a
batch of message parts, re-implementing the observable semantics of the
reference's mapping executor (/root/reference/lib/bloblang/x/mapping/
parser.go:48-104 MapPart) and query functions/methods
(query/functions.go, query/methods.go, query/methods_strings.go).

This is the *semantic oracle* path. It runs per part inside Arrow-batched
``applyInPandas`` groups on the Spark side (see
benthos_spark.engine.processors); statically-analyzable mappings instead
compile to native Catalyst columns (benthos_spark.bloblang.compiler).
"""

from __future__ import annotations

import base64
import binascii
import copy
import hashlib
import hmac as hmac_mod
import math
import re
import urllib.parse
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

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
    Statement,
    This,
    Unary,
    parse_mapping,
)
from .values import (
    BloblangError,
    Delete,
    Nothing,
    Unassigned,
    get_bool,
    get_int,
    get_number,
    get_string,
    parse_json,
    serialize,
    to_bytes,
    to_string,
    type_name,
    values_equal,
)
from .xxhash64 import xxhash64_int

FAIL_META_KEY = "benthos_processing_failed"  # lib/types/message.go:12


@dataclass
class Part:
    """One message part: payload bytes + string metadata (lib/message/part.go)."""

    content: bytes
    meta: Dict[str, str] = field(default_factory=dict)
    _doc: Any = field(default=None, repr=False)
    _doc_ok: Optional[bool] = field(default=None, repr=False)

    def doc(self) -> Any:
        if self._doc_ok is None:
            try:
                self._doc = parse_json(self.content)
                self._doc_ok = True
            except BloblangError:
                self._doc_ok = False
        if not self._doc_ok:
            raise BloblangError("failed to parse part as JSON")
        return self._doc

    def copy(self) -> "Part":
        return Part(self.content, dict(self.meta))


@dataclass
class ExecContext:
    parts: List[Part]
    index: int
    this: Any
    vars: Dict[str, Any]
    maps: Dict[str, Mapping]
    counters: Dict[str, int]
    root: Any = Unassigned
    new_meta: Optional[Dict[str, str]] = None

    def rebind(self, this: Any) -> "ExecContext":
        c = copy.copy(self)
        c.this = this
        return c

    def with_part(self, i: int) -> "ExecContext":
        c = copy.copy(self)
        c.index = i
        c.this = None  # re-resolved lazily by FieldRef/json()
        try:
            c.this = self.parts[i].doc()
        except BloblangError:
            c.this = None
        return c


def _walk_path(value: Any, path: List[str]) -> Any:
    cur = value
    for seg in path:
        if cur is None:
            return None
        if isinstance(cur, dict):
            if seg in cur:
                cur = cur[seg]
            else:
                return None
        elif isinstance(cur, list):
            try:
                cur = cur[int(seg)]
            except (ValueError, IndexError):
                return None
        else:
            return None
    return cur


def _set_path(container: Any, path: List[str], value: Any) -> Any:
    """Set a dotted path inside nested dicts, creating objects as needed."""
    if not path:
        return value
    if not isinstance(container, dict):
        container = {}
    cur = container
    for seg in path[:-1]:
        nxt = cur.get(seg)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[seg] = nxt
        cur = nxt
    if value is Delete:
        cur.pop(path[-1], None)
    else:
        cur[path[-1]] = value
    return container


class Interpreter:
    """Evaluates ASTs; one instance per pipeline execution (shared counters)."""

    def __init__(self, maps: Optional[Dict[str, Mapping]] = None):
        self.counters: Dict[str, int] = {}
        self.maps = maps or {}

    # ------------------------------------------------------------ mapping
    def map_part(self, mapping: Mapping, parts: List[Part], index: int) -> Any:
        """Returns a new Part, or Delete if the part was filtered out."""
        part = parts[index]
        try:
            this = part.doc()
        except BloblangError:
            this = None
        ctx = ExecContext(
            parts=parts,
            index=index,
            this=this,
            vars={},
            maps={**self.maps, **mapping.maps},
            counters=self.counters,
        )
        for st in mapping.statements:
            self._exec_statement(st, ctx, part)
            if ctx.root is Delete:
                return Delete
        out_meta = ctx.new_meta if ctx.new_meta is not None else dict(part.meta)
        if ctx.root is Unassigned:
            return Part(part.content, out_meta)
        return Part(to_bytes_payload(ctx.root), out_meta)

    def _exec_statement(self, st: Statement, ctx: ExecContext, part: Part) -> None:
        value = self.eval(st.expr, ctx)
        if value is Nothing:
            return
        if st.kind == "let":
            ctx.vars[st.path[0]] = value
            return
        if st.kind == "meta":
            if ctx.new_meta is None:
                ctx.new_meta = dict(part.meta)
            if not st.path:
                if value is Delete:
                    ctx.new_meta.clear()
                elif isinstance(value, dict):
                    ctx.new_meta = {str(k): to_string(v) for k, v in value.items()}
                else:
                    raise BloblangError("setting root meta requires object value")
            elif value is Delete:
                ctx.new_meta.pop(st.path[0], None)
            else:
                ctx.new_meta[st.path[0]] = to_string(value)
            return
        # root target
        value = copy.deepcopy(value) if isinstance(value, (dict, list)) else value
        if not st.path:
            ctx.root = value
            return
        if value is Delete and ctx.root is Unassigned:
            ctx.root = {}
        base = {} if ctx.root is Unassigned else ctx.root
        ctx.root = _set_path(base, st.path, value)

    # --------------------------------------------------------------- eval
    def eval(self, node: Any, ctx: ExecContext) -> Any:
        if isinstance(node, Lit):
            return node.value
        if isinstance(node, ArrayLit):
            return [self.eval(x, ctx) for x in node.items]
        if isinstance(node, ObjectLit):
            return {
                to_string(self.eval(k, ctx)): self.eval(v, ctx)
                for k, v in node.items
            }
        if isinstance(node, This):
            return ctx.this
        if isinstance(node, FieldRef):
            return _walk_path(ctx.this, node.path)
        if isinstance(node, Func):
            return self._call_function(node, ctx)
        if isinstance(node, Method):
            return self._call_method(node, ctx)
        if isinstance(node, CtxExpr):
            v = self.eval(node.recv, ctx)
            return self.eval(node.expr, ctx.rebind(v))
        if isinstance(node, Match):
            return self._eval_match(node, ctx)
        if isinstance(node, Bin):
            return self._eval_bin(node, ctx)
        if isinstance(node, Unary):
            v = self.eval(node.operand, ctx)
            if node.op == "-":
                n = get_number(v)
                return -n
            return not get_bool(v)
        raise BloblangError(f"cannot evaluate node {node!r}")

    def _eval_match(self, node: Match, ctx: ExecContext) -> Any:
        if node.operand is not None:
            operand = self.eval(node.operand, ctx)
            mctx = ctx.rebind(operand)
        else:
            operand = ctx.this
            mctx = ctx
        for cond, body in node.cases:
            if cond is None:
                return self.eval(body, mctx)
            c = self.eval(cond, mctx)
            if isinstance(c, bool):
                if c:
                    return self.eval(body, mctx)
            elif values_equal(c, operand):
                return self.eval(body, mctx)
        return Nothing

    def _eval_bin(self, node: Bin, ctx: ExecContext) -> Any:
        op = node.op
        if op == "&&":
            return get_bool(self.eval(node.left, ctx)) and get_bool(
                self.eval(node.right, ctx)
            )
        if op == "||":
            return get_bool(self.eval(node.left, ctx)) or get_bool(
                self.eval(node.right, ctx)
            )
        if op == "|":
            try:
                left = self.eval(node.left, ctx)
            except BloblangError:
                left = None
            if left is None:
                return self.eval(node.right, ctx)
            return left
        left = self.eval(node.left, ctx)
        right = self.eval(node.right, ctx)
        if op == "==":
            return values_equal(left, right)
        if op == "!=":
            return not values_equal(left, right)
        if op in ("<", ">", "<=", ">="):
            try:
                lf, rf = get_number(left), get_number(right)
            except BloblangError:
                lf, rf = get_string(left), get_string(right)
            return {
                "<": lf < rf,
                ">": lf > rf,
                "<=": lf <= rf,
                ">=": lf >= rf,
            }[op]
        if op == "+":
            if isinstance(left, (str, bytes)) or isinstance(right, (str, bytes)):
                try:
                    return get_number(left) + get_number(right)
                except BloblangError:
                    return get_string(left) + get_string(right)
            return get_number(left) + get_number(right)
        if op == "-":
            return get_number(left) - get_number(right)
        if op == "*":
            return get_number(left) * get_number(right)
        if op == "/":
            r = get_number(right)
            if r == 0:
                raise BloblangError("cannot divide by zero")
            return get_number(left) / r
        if op == "%":
            r = get_int(right)
            if r == 0:
                raise BloblangError("cannot modulo by zero")
            # Go's % truncates toward zero (arithmetic.go mod): -7 % 3 == -1
            return int(math.fmod(get_int(left), r))
        raise BloblangError(f"unknown operator {op}")

    # ---------------------------------------------------------- functions
    def _call_function(self, node: Func, ctx: ExecContext) -> Any:
        name = node.name
        args = [self.eval(a, ctx) for a in node.args]
        part = ctx.parts[ctx.index]
        if name == "content":
            return part.content
        if name == "json":
            doc = part.doc()
            if args and args[0]:
                return _walk_path(doc, str(args[0]).split("."))
            return doc
        if name == "meta" or name == "metadata":
            if args and args[0]:
                return part.meta.get(str(args[0]))
            return dict(part.meta)
        if name == "batch_index":
            return ctx.index
        if name == "batch_size":
            return len(ctx.parts)
        if name == "count":
            key = str(args[0]) if args else ""
            ctx.counters[key] = ctx.counters.get(key, 0) + 1
            return ctx.counters[key]
        if name == "error":
            return part.meta.get(FAIL_META_KEY)
        if name == "errored":
            return FAIL_META_KEY in part.meta
        if name == "deleted":
            return Delete
        if name == "nothing":
            return Nothing
        if name == "var":
            key = str(args[0])
            if key not in ctx.vars:
                raise BloblangError(f"variable {key} undefined")
            return ctx.vars[key]
        if name == "uuid_v4":
            return str(uuid.uuid4())
        if name == "hostname":
            import socket

            return socket.gethostname()
        if name == "timestamp_unix":
            import time

            return int(time.time())
        if name == "timestamp_unix_nano":
            import time

            return int(time.time() * 1e9)
        if name in ("timestamp", "timestamp_utc"):
            import datetime

            fmt = str(args[0]) if args else "Mon Jan 2 15:04:05 -0700 MST 2006"
            now = datetime.datetime.now(datetime.timezone.utc)
            return now.strftime(go_layout_to_strftime(fmt))
        if name == "random_int":
            import random

            rng = random.Random(args[0] if args else 0)
            return rng.randint(0, (1 << 63) - 1)
        if name == "range":
            lo, hi = get_int(args[0]), get_int(args[1])
            step = get_int(args[2]) if len(args) > 2 else 1
            return list(range(lo, hi, step))
        if name == "throw":
            raise BloblangError(to_string(args[0]) if args else "thrown")
        if name == "__root__":
            return ctx.root if ctx.root is not Unassigned else None
        raise BloblangError(f"unrecognised function: {name}")

    # ------------------------------------------------------------ methods
    def _call_method(self, node: Method, ctx: ExecContext) -> Any:
        name = node.name

        # error-catching methods evaluate the receiver lazily
        if name in ("catch", "or"):
            try:
                v = self.eval(node.recv, ctx)
            except BloblangError:
                return self.eval(node.args[0], ctx)
            if v is None:
                return self.eval(node.args[0], ctx)
            return v
        if name == "exists":
            v = self.eval(node.recv, ctx)
            path = str(self.eval(node.args[0], ctx)).split(".")
            return _walk_path(v, path) is not None

        # batch-scoped methods re-evaluate the receiver per part
        if name == "from_all":
            out = []
            for i in range(len(ctx.parts)):
                try:
                    out.append(self.eval(node.recv, ctx.with_part(i)))
                except BloblangError:
                    out.append(None)
            return out
        if name == "from":
            i = get_int(self.eval(node.args[0], ctx))
            return self.eval(node.recv, ctx.with_part(i))

        v = self.eval(node.recv, ctx)

        # lazy-argument (lambda-ish) methods
        if name == "map_each":
            ast = node.args[0]
            if isinstance(v, dict):
                out_d = {}
                for k, el in v.items():
                    r = self.eval(ast, ctx.rebind({"key": k, "value": el}))
                    if r is Delete:
                        continue
                    out_d[k] = el if r is Nothing else r
                return out_d
            if not isinstance(v, list):
                raise BloblangError(
                    f"expected array value, found {type_name(v)}"
                )
            out = []
            for el in v:
                r = self.eval(ast, ctx.rebind(el))
                if r is Delete:
                    continue
                out.append(el if r is Nothing else r)
            return out
        if name == "map":
            return self.eval(node.args[0], ctx.rebind(v))
        if name == "fold":
            acc = self.eval(node.args[0], ctx)
            if not isinstance(v, list):
                raise BloblangError(f"expected array value, found {type_name(v)}")
            ast = node.args[1]
            for el in v:
                r = self.eval(ast, ctx.rebind({"tally": acc, "value": el}))
                acc = acc if r is Nothing else r
            return acc
        if name == "filter":
            ast = node.args[0]
            if not isinstance(v, list):
                raise BloblangError(f"expected array value, found {type_name(v)}")
            return [el for el in v if get_bool(self.eval(ast, ctx.rebind(el)))]
        if name == "sort_by":
            ast = node.args[0]
            return sorted(v, key=lambda el: self.eval(ast, ctx.rebind(el)))

        args = [self.eval(a, ctx) for a in node.args]
        return self._method_impl(name, v, args, ctx)

    def _method_impl(self, name: str, v: Any, args: List[Any], ctx: ExecContext) -> Any:
        if name == "apply":
            mp = ctx.maps.get(str(args[0]))
            if mp is None:
                raise BloblangError(f"map {args[0]} not found")
            sub = ExecContext(
                parts=ctx.parts,
                index=ctx.index,
                this=v,
                vars=dict(ctx.vars),
                maps=ctx.maps,
                counters=ctx.counters,
            )
            fake_part = Part(to_bytes_payload(v))
            for st in mp.statements:
                self._exec_statement(st, sub, fake_part)
            if sub.root is Delete:
                return Delete
            return v if sub.root is Unassigned else sub.root
        if name == "string":
            return to_string(v)
        if name == "bytes":
            return to_bytes(v)
        if name == "number":
            try:
                return get_number(v)
            except BloblangError:
                if args:
                    return get_number(args[0])
                raise
        if name == "bool":
            if isinstance(v, bool):
                return v
            if isinstance(v, (str, bytes)):
                s = get_string(v).lower()
                if s in ("true", "1"):
                    return True
                if s in ("false", "0"):
                    return False
            if isinstance(v, (int, float)):
                return v != 0
            if args:
                return get_bool(args[0])
            raise BloblangError(f"expected bool value, found {type_name(v)}")
        if name == "not":
            return not get_bool(v)
        if name == "type":
            return type_name(v)
        if name == "length":
            if isinstance(v, (str, bytes, list, dict)):
                return len(v)
            raise BloblangError(f"expected string/array/object, found {type_name(v)}")
        if name in ("uppercase", "lowercase"):
            if isinstance(v, bytes):
                return v.upper() if name == "uppercase" else v.lower()
            s = get_string(v)
            return s.upper() if name == "uppercase" else s.lower()
        if name == "capitalize":
            s = get_string(v)
            return re.sub(r"\b\w", lambda m: m.group().upper(), s)
        if name == "trim":
            s = get_string(v)
            return s.strip(str(args[0])) if args else s.strip()
        if name == "split":
            s = get_string(v)
            return s.split(get_string(args[0]))
        if name == "join":
            sep = get_string(args[0]) if args else ""
            if not isinstance(v, list):
                raise BloblangError(f"expected array value, found {type_name(v)}")
            return sep.join(to_string(x) for x in v)
        if name == "slice":
            lo = get_int(args[0])
            hi = get_int(args[1]) if len(args) > 1 else None
            if isinstance(v, (str, bytes, list)):
                return v[lo:hi]
            raise BloblangError(f"expected string/array, found {type_name(v)}")
        if name == "contains":
            if isinstance(v, list):
                return any(values_equal(x, args[0]) for x in v)
            if isinstance(v, dict):
                return any(values_equal(x, args[0]) for x in v.values())
            if isinstance(v, (str, bytes)):
                return get_string(args[0]) in get_string(v)
            raise BloblangError(f"expected string/array/object, found {type_name(v)}")
        if name == "has_prefix":
            return get_string(v).startswith(get_string(args[0]))
        if name == "has_suffix":
            return get_string(v).endswith(get_string(args[0]))
        if name == "replace":
            return get_string(v).replace(get_string(args[0]), get_string(args[1]))
        if name == "re_match":
            return re.search(get_string(args[0]), get_string(v)) is not None
        if name == "re_replace":
            pat = get_string(args[0])
            repl = re.sub(r"\$(\d+)", r"\\\1", get_string(args[1]))
            return re.sub(pat, repl, get_string(v))
        if name == "re_find_all":
            return re.findall(get_string(args[0]), get_string(v))
        if name == "format":
            return go_sprintf(get_string(v), args)
        if name == "get":
            path = str(args[0]).split(".") if args and args[0] != "" else []
            return _walk_path(v, path)
        if name == "keys":
            if isinstance(v, dict):
                return sorted(v.keys())
            raise BloblangError(f"expected object, found {type_name(v)}")
        if name == "values":
            if isinstance(v, dict):
                return list(v.values())
            raise BloblangError(f"expected object, found {type_name(v)}")
        if name == "append":
            if not isinstance(v, list):
                raise BloblangError(f"expected array, found {type_name(v)}")
            return v + list(args)
        if name == "index":
            if not isinstance(v, (list, str, bytes)):
                raise BloblangError(f"expected array, found {type_name(v)}")
            i = get_int(args[0])
            n = len(v)
            if n == 0 or i >= n or i < -n:
                raise BloblangError("index out of bounds")
            return v[i]
        if name == "enumerated":
            if not isinstance(v, list):
                raise BloblangError(f"expected array, found {type_name(v)}")
            return [{"index": i, "value": x} for i, x in enumerate(v)]
        if name == "flatten":
            if not isinstance(v, list):
                raise BloblangError(f"expected array, found {type_name(v)}")
            out = []
            for x in v:
                if isinstance(x, list):
                    out.extend(x)
                else:
                    out.append(x)
            return out
        if name == "collapse":
            out: Dict[str, Any] = {}

            def rec(prefix: str, val: Any):
                if isinstance(val, dict) and val:
                    for k, x in val.items():
                        rec(f"{prefix}.{k}" if prefix else str(k), x)
                elif isinstance(val, list) and val:
                    for i, x in enumerate(val):
                        rec(f"{prefix}.{i}" if prefix else str(i), x)
                else:
                    out[prefix] = val

            rec("", v)
            return out
        if name == "sum":
            if not isinstance(v, list):
                raise BloblangError(f"expected array, found {type_name(v)}")
            total = 0.0
            for x in v:
                if x is None:
                    continue
                total += get_number(x)
            return total
        if name == "sort":
            if not isinstance(v, list):
                raise BloblangError(f"expected array, found {type_name(v)}")
            try:
                return sorted(v, key=lambda x: get_number(x))
            except BloblangError:
                return sorted(v, key=lambda x: get_string(x))
        if name == "unique":
            seen, out = set(), []
            for x in v:
                k = serialize(x)
                if k not in seen:
                    seen.add(k)
                    out.append(x)
            return out
        if name == "merge":
            return deep_merge(v, args[0])
        if name == "parse_json":
            return parse_json(get_string(v))
        if name == "format_json" or name == "json_string":
            return serialize(v)
        if name == "quote":
            import json as _json

            return _json.dumps(get_string(v), ensure_ascii=False)
        if name == "unquote":
            import json as _json

            try:
                return _json.loads(get_string(v))
            except Exception as exc:
                raise BloblangError(f"unquote failed: {exc}")
        if name == "strip_html":
            # bluemonday strict policy (methods_strings.go:601): the
            # net/html tokenizer DECODES entities, then html.EscapeString
            # re-escapes only & ' < > " — see htmlstrip.py
            from .htmlstrip import strip_html_str

            return strip_html_str(get_string(v))
        if name == "escape_url_query":
            return urllib.parse.quote_plus(get_string(v))
        if name == "unescape_url_query":
            return urllib.parse.unquote_plus(get_string(v))
        if name == "encode":
            scheme = get_string(args[0])
            b = to_bytes(v)
            if scheme == "base64":
                return base64.b64encode(b).decode()
            if scheme == "hex":
                return b.hex()
            if scheme == "ascii85":
                return base64.a85encode(b).decode()
            if scheme == "z85":
                from .z85 import z85_encode

                try:
                    return z85_encode(b)
                except ValueError as exc:
                    raise BloblangError(str(exc))
            raise BloblangError(f"unrecognised encoding: {scheme}")
        if name == "decode":
            scheme = get_string(args[0])
            s = get_string(v)
            try:
                if scheme == "base64":
                    return base64.b64decode(s)
                if scheme == "hex":
                    return binascii.unhexlify(s)
                if scheme == "ascii85":
                    return base64.a85decode(s)
                if scheme == "z85":
                    from .z85 import z85_decode

                    return z85_decode(s)
            except Exception as exc:
                raise BloblangError(f"decode failed: {exc}")
            raise BloblangError(f"unrecognised encoding: {scheme}")
        if name == "hash":
            alg = get_string(args[0])
            b = to_bytes(v)
            if alg == "sha1":
                return hashlib.sha1(b).digest()
            if alg == "sha256":
                return hashlib.sha256(b).digest()
            if alg == "sha512":
                return hashlib.sha512(b).digest()
            if alg == "md5":
                return hashlib.md5(b).digest()
            if alg == "xxhash64":
                return str(xxhash64_int(b))
            if alg.startswith("hmac_sha"):
                if len(args) < 2:
                    raise BloblangError("hmac requires a key argument")
                key = to_bytes(args[1])
                digest = {"hmac_sha1": "sha1", "hmac_sha256": "sha256", "hmac_sha512": "sha512"}[alg]
                return hmac_mod.new(key, b, getattr(hashlib, digest)).digest()
            raise BloblangError(f"unrecognised hash: {alg}")
        if name == "floor":
            return float(math.floor(get_number(v)))
        if name == "ceil":
            return float(math.ceil(get_number(v)))
        if name == "round":
            n = get_number(v)
            return float(math.floor(n + 0.5))
        if name == "abs":
            return abs(get_number(v))
        if name == "min":
            return min(get_number(x) for x in v)
        if name == "max":
            return max(get_number(x) for x in v)
        if name == "without":
            if not isinstance(v, dict):
                raise BloblangError(f"expected object, found {type_name(v)}")
            drop = {str(a) for a in args}
            return {k: x for k, x in v.items() if k not in drop}
        raise BloblangError(f"unrecognised method: {name}")


def to_bytes_payload(value: Any) -> bytes:
    """Serialize a mapped root back to payload bytes (part.go:71-85 behavior)."""
    if isinstance(value, bytes):
        return value
    if isinstance(value, str):
        return value.encode("utf-8")
    return serialize(value).encode("utf-8")


def deep_merge(a: Any, b: Any) -> Any:
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, vb in b.items():
            if k in out:
                out[k] = deep_merge(out[k], vb)
            else:
                out[k] = vb
        return out
    if isinstance(a, list):
        return a + (b if isinstance(b, list) else [b])
    if isinstance(b, list):
        return [a] + b
    return [a, b]


_GO_LAYOUT = [
    ("2006", "%Y"),
    ("01", "%m"),
    ("02", "%d"),
    ("15", "%H"),
    ("04", "%M"),
    ("05", "%S"),
    ("06", "%y"),  # after 2006/15/04/05 so their digits are already consumed
    ("Jan", "%b"),
    ("Mon", "%a"),
    ("MST", "%Z"),
    ("-0700", "%z"),
    (".000", ".%f"),
]


def go_layout_to_strftime(layout: str) -> str:
    out = layout
    for go, py in _GO_LAYOUT:
        out = out.replace(go, py)
    return out


_SPRINTF_RE = re.compile(r"%[vsdfqt%]")


def go_sprintf(fmt: str, args: List[Any]) -> str:
    it = iter(args)

    def sub(m: re.Match) -> str:
        spec = m.group()
        if spec == "%%":
            return "%"
        try:
            a = next(it)
        except StopIteration:
            raise BloblangError("format: not enough arguments")
        if spec == "%d":
            return str(get_int(a))
        if spec == "%f":
            return f"{get_number(a):f}"
        if spec == "%q":
            import json as _json

            return _json.dumps(to_string(a), ensure_ascii=False)
        if spec == "%t":
            return "true" if get_bool(a) else "false"
        return to_string(a)

    return _SPRINTF_RE.sub(sub, fmt)


class InterpolatedField:
    """A config string with ``${! ... }`` segments resolved per part."""

    def __init__(self, src: str):
        from .parser import parse_interpolation

        self.segments = parse_interpolation(src)
        self.is_static = all(isinstance(s, str) for s in self.segments)

    def resolve(self, interp: Interpreter, parts: List[Part], index: int) -> str:
        out = []
        for seg in self.segments:
            if isinstance(seg, str):
                out.append(seg)
                continue
            part = parts[index]
            try:
                this = part.doc()
            except BloblangError:
                this = None
            ctx = ExecContext(
                parts=parts,
                index=index,
                this=this,
                vars={},
                maps=interp.maps,
                counters=interp.counters,
            )
            try:
                out.append(to_string(interp.eval(seg, ctx)))
            except BloblangError:
                out.append("")
        return "".join(out)


def compile_mapping(src: str) -> Mapping:
    return parse_mapping(src)
