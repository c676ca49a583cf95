"""Batch processor kernels: ``List[Part] -> List[List[Part]]``.

Re-implements the observable semantics of the reference's processors
(/root/reference/lib/processor/*.go — behavior only; the shared signature is
``ProcessMessage(msg) ([]Message, Response)``, i.e. batch -> 0..N batches,
constructor registry at lib/processor/constructor.go:74-132).

These kernels are the *semantic layer*. They execute in two places:
  1. the golden-test runner (driver-side, tiny batches), and
  2. inside Arrow-batched ``applyInPandas`` groups on Spark for pipelines
     that genuinely need batch-local semantics.
Hot-path pipelines over typed tables instead compile to native Catalyst
plans (see benthos_spark.engine.compiler) and never touch this layer.
"""

from __future__ import annotations

import base64
import binascii
import bz2
import gzip
import hashlib
import io
import json as _json
import os
import re
import tarfile
import time
import zipfile
import zlib
from typing import Any, Dict, List, Optional

from ..bloblang.interp import (
    FAIL_META_KEY,
    InterpolatedField,
    Interpreter,
    Part,
    to_bytes_payload,
    deep_merge,
)
from ..bloblang.parser import parse_mapping
from ..bloblang.values import (
    BloblangError,
    Delete,
    get_number,
    parse_json,
    serialize,
    to_string,
)
from ..bloblang.xxhash64 import xxhash64_int
from .conditions import Condition, build_condition

Batch = List[Part]


class MemoryCache:
    """Named KV cache with per-item TTL (semantics of lib/cache/memory.go:42-68)."""

    def __init__(self, ttl: float = 300.0, clock=time.monotonic):
        self.ttl = ttl
        self.clock = clock
        self.items: Dict[str, tuple] = {}

    def _expired(self, key: str) -> bool:
        v = self.items.get(key)
        return v is not None and self.clock() - v[1] > self.ttl

    def get(self, key: str) -> Optional[bytes]:
        if key in self.items and not self._expired(key):
            return self.items[key][0]
        return None

    def set(self, key: str, value: bytes) -> None:
        self.items[key] = (value, self.clock())

    def add(self, key: str, value: bytes) -> bool:
        """False if key already present (ErrKeyAlreadyExists semantics)."""
        if key in self.items and not self._expired(key):
            return False
        self.items[key] = (value, self.clock())
        return True

    def delete(self, key: str) -> None:
        self.items.pop(key, None)


class FileCache:
    """File-backed KV cache (semantics of lib/cache/file.go: one file per
    key under a directory) — the cross-job sibling of MemoryCache: any two
    pipelines pointed at the same directory (local FS / NFS / fuse-mounted
    object store) share state, which makes cross-job dedupe testable.

    Keys hex-encode to stay filesystem-safe. ``add`` is create-exclusive
    (O_CREAT|O_EXCL — atomic on POSIX), the property exactly-once dedupe
    relies on. Optional TTL is enforced on read via file mtime."""

    def __init__(self, directory: str, ttl: Optional[float] = None):
        self.dir = directory
        self.ttl = ttl
        os.makedirs(directory, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, key.encode("utf-8").hex())

    def _alive(self, p: str) -> bool:
        try:
            st = os.stat(p)
        except FileNotFoundError:
            return False
        return self.ttl is None or (time.time() - st.st_mtime) <= self.ttl

    def get(self, key: str) -> Optional[bytes]:
        p = self._path(key)
        if not self._alive(p):
            return None
        try:
            with open(p, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def set(self, key: str, value: bytes) -> None:
        p = self._path(key)
        tmp = p + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(value)
        os.replace(tmp, p)

    def add(self, key: str, value: bytes) -> bool:
        """False if key already present (ErrKeyAlreadyExists semantics)."""
        p = self._path(key)
        if not self._alive(p):
            try:
                os.remove(p)  # expired tombstone; losing the race is fine
            except FileNotFoundError:
                pass
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(value)
        return True

    def delete(self, key: str) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass


def build_cache(conf: Optional[Dict[str, Any]] = None):
    """Cache backend constructor (lib/cache/constructor.go analog; memory
    and file are the two backends that matter without external services)."""
    conf = conf or {}
    kind = conf.get("type", "memory")
    if kind == "memory":
        return MemoryCache(ttl=float(conf.get("ttl", 300.0)))
    if kind == "file":
        ttl = conf.get("ttl")
        return FileCache(conf["directory"], ttl=float(ttl) if ttl is not None else None)
    raise ValueError(f"unknown cache backend {kind!r} (memory|file)")


class Resources:
    """Named shared resources (caches, conditions, processors)."""

    def __init__(self):
        self.caches: Dict[str, Any] = {}
        self.conditions: Dict[str, Condition] = {}
        self.processors: Dict[str, "Processor"] = {}

    def cache(self, name: str, conf: Optional[Dict[str, Any]] = None):
        if name not in self.caches:
            self.caches[name] = build_cache(conf)
        return self.caches[name]


class Processor:
    name = "base"

    def process(self, batch: Batch, env: "Env") -> List[Batch]:
        raise NotImplementedError


class Env:
    def __init__(self, interp: Optional[Interpreter] = None, resources: Optional[Resources] = None):
        self.interp = interp or Interpreter()
        self.resources = resources or Resources()
        # resource-condition lookups reach the registry via the interpreter
        self.interp.resources = self.resources


def flag_err(part: Part, msg: str = "failed") -> Part:
    part.meta[FAIL_META_KEY] = msg
    return part


def execute_all(procs: List[Processor], batch: Batch, env: Optional[Env] = None) -> List[Batch]:
    """Sequential pipeline execution (lib/processor/util.go ExecuteAll behavior)."""
    env = env or Env()
    batches = [batch]
    for proc in procs:
        nxt: List[Batch] = []
        for b in batches:
            if not b:
                continue
            nxt.extend(x for x in proc.process(b, env) if x)
        batches = nxt
        if not batches:
            return []
    return [b for b in batches if b]


# --------------------------------------------------------------- mapping
class BloblangProc(Processor):
    name = "bloblang"

    def __init__(self, conf: Any):
        src = conf if isinstance(conf, str) else conf.get("mapping", conf.get("query", ""))
        self.mapping = parse_mapping(src)

    def process(self, batch, env):
        out: Batch = []
        for i in range(len(batch)):
            try:
                r = env.interp.map_part(self.mapping, batch, i)
            except BloblangError as exc:
                out.append(flag_err(batch[i].copy(), str(exc)))
                continue
            if r is not Delete:
                out.append(r)
        return [out]


class TextProc(Processor):
    """text processor (lib/processor/text.go:309-340 operator table)."""

    name = "text"

    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "trim_space")
        self.arg = str(conf.get("arg", ""))
        self.value = InterpolatedField(str(conf.get("value", "")))

    def process(self, batch, env):
        out: Batch = []
        for i, part in enumerate(batch):
            value = self.value.resolve(env.interp, batch, i)
            s = part.content.decode("utf-8", errors="replace")
            op = self.operator
            try:
                if op == "set":
                    s = value
                elif op == "append":
                    s = s + value
                elif op == "prepend":
                    s = value + s
                elif op == "to_lower":
                    s = s.lower()
                elif op == "to_upper":
                    s = s.upper()
                elif op == "trim":
                    s = s.strip(self.arg) if self.arg else s.strip()
                elif op == "trim_space":
                    s = s.strip()
                elif op == "quote":
                    s = _json.dumps(s, ensure_ascii=False)
                elif op == "unquote":
                    s = _json.loads(s)
                elif op == "replace":
                    s = s.replace(self.arg, value)
                elif op == "replace_regexp":
                    s = re.sub(self.arg, re.sub(r"\$(\d+)", r"\\\1", value), s)
                elif op == "regexp_expand":
                    m = re.search(self.arg, s)
                    s = "" if m is None else m.expand(re.sub(r"\$(\d+)", r"\\\1", value))
                elif op == "find_regexp":
                    m = re.search(self.arg, s)
                    s = m.group() if m else ""
                elif op == "strip_html":
                    from ..bloblang.htmlstrip import strip_html_str

                    s = strip_html_str(s)
                elif op == "escape_url_query":
                    import urllib.parse

                    s = urllib.parse.quote_plus(s)
                elif op == "unescape_url_query":
                    import urllib.parse

                    s = urllib.parse.unquote_plus(s)
                else:
                    raise ValueError(f"unknown text operator {op}")
                out.append(Part(s.encode("utf-8"), dict(part.meta)))
            except Exception as exc:
                out.append(flag_err(part.copy(), str(exc)))
        return [out]


class JsonProc(Processor):
    """json processor (lib/processor/json.go:755-792 operator table)."""

    name = "json"

    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "set")
        self.path = str(conf.get("path", ""))
        raw_value = conf.get("value", "")
        if not isinstance(raw_value, str):
            raw_value = _json.dumps(raw_value)
        self.value = InterpolatedField(raw_value)

    def _segs(self) -> List[str]:
        return [s for s in self.path.split(".") if s] if self.path else []

    def process(self, batch, env):
        out: Batch = []
        for i, part in enumerate(batch):
            try:
                doc = parse_json(part.content)
            except BloblangError as exc:
                out.append(flag_err(part.copy(), str(exc)))
                continue
            try:
                doc2 = self._apply(doc, batch, i, env)
            except Exception as exc:
                out.append(flag_err(part.copy(), str(exc)))
                continue
            if isinstance(doc2, list) and self.operator == "split":
                out.extend(Part(to_bytes_payload(d), dict(part.meta)) for d in doc2)
            else:
                out.append(Part(to_bytes_payload(doc2), dict(part.meta)))
        return [out]

    def _apply(self, doc: Any, batch: Batch, i: int, env: Env) -> Any:
        op = self.operator
        segs = self._segs()
        if op == "set":
            if self.value.is_static:
                raw = self.value.resolve(env.interp, batch, i)
                try:
                    val = _json.loads(raw)
                except Exception:
                    val = raw
            else:
                val = self.value.resolve(env.interp, batch, i)
            return _set_in(doc, segs, val)
        if op == "delete":
            return _del_in(doc, segs)
        if op == "move":
            val = _get_in(doc, segs)
            doc = _del_in(doc, segs)
            dest = [s for s in self.value.segments[0].split(".") if s]
            return _set_in(doc, dest, val)
        if op == "copy":
            val = _get_in(doc, segs)
            dest = [s for s in self.value.segments[0].split(".") if s]
            return _set_in(doc, dest, val)
        if op == "select":
            return _get_in(doc, segs)
        if op == "append":
            cur = _get_in(doc, segs)
            raw = self.value.resolve(env.interp, batch, i)
            try:
                val = _json.loads(raw)
            except Exception:
                val = raw
            if cur is None:
                cur = []
            if not isinstance(cur, list):
                cur = [cur]
            return _set_in(doc, segs, cur + [val])
        if op == "clean":
            return _clean(doc)
        if op == "explode":
            target = _get_in(doc, segs)
            if isinstance(target, list):
                return [_set_in(_deepcopy(doc), segs, x) for x in target]
            if isinstance(target, dict):
                return {
                    k: _set_in(_deepcopy(doc), segs, v) for k, v in target.items()
                }
            raise ValueError("explode target must be array or object")
        if op == "split":
            target = _get_in(doc, segs) if segs else doc
            if not isinstance(target, list):
                raise ValueError("split target must be array")
            return list(target)
        if op == "flatten":
            target = _get_in(doc, segs) if segs else doc
            flat: Dict[str, Any] = {}

            def rec(prefix, val):
                if isinstance(val, dict) and val:
                    for k, x in val.items():
                        rec(f"{prefix}.{k}" if prefix else str(k), x)
                else:
                    flat[prefix] = val

            rec("", target)
            return _set_in(doc, segs, flat) if segs else flat
        if op == "flatten_array":
            target = _get_in(doc, segs) if segs else doc
            out = []
            for x in target:
                out.extend(x if isinstance(x, list) else [x])
            return _set_in(doc, segs, out) if segs else out
        if op == "fold_number_array":
            target = _get_in(doc, segs) if segs else doc
            total = sum(get_number(x) for x in target)
            return _set_in(doc, segs, total) if segs else total
        if op == "fold_string_array":
            target = _get_in(doc, segs) if segs else doc
            joined = "".join(to_string(x) for x in target)
            return _set_in(doc, segs, joined) if segs else joined
        raise ValueError(f"unknown json operator {op}")


def _deepcopy(x):
    import copy

    return copy.deepcopy(x)


def _get_in(doc: Any, segs: List[str]) -> Any:
    cur = doc
    for s in segs:
        if isinstance(cur, dict) and s in cur:
            cur = cur[s]
        elif isinstance(cur, list):
            try:
                cur = cur[int(s)]
            except (ValueError, IndexError):
                return None
        else:
            return None
    return cur


def _set_in(doc: Any, segs: List[str], value: Any) -> Any:
    if not segs:
        return value
    s = segs[0]
    if isinstance(doc, list):
        # numeric segments index into arrays (gabs PathP behavior)
        try:
            i = int(s)
        except ValueError:
            return doc
        if 0 <= i < len(doc):
            doc[i] = _set_in(doc[i], segs[1:], value)
        return doc
    if not isinstance(doc, dict):
        doc = {}
    doc[s] = _set_in(doc.get(s), segs[1:], value)
    return doc


def _del_in(doc: Any, segs: List[str]) -> Any:
    if not segs:
        return {}
    cur = doc
    for s in segs[:-1]:
        if isinstance(cur, dict) and s in cur:
            cur = cur[s]
        else:
            return doc
    if isinstance(cur, dict):
        cur.pop(segs[-1], None)
    return doc


def _clean(doc: Any) -> Any:
    if isinstance(doc, dict):
        out = {}
        for k, v in doc.items():
            v = _clean(v)
            if v in (None, "", [], {}):
                continue
            out[k] = v
        return out
    if isinstance(doc, list):
        out_l = [x for x in (_clean(v) for v in doc) if x not in (None, "", [], {})]
        return out_l
    return doc


_AWK_VAR_INVALID = re.compile(r"[^a-zA-Z0-9_]")


def _awk_flatten(path: str, data: Any, out: Dict[str, str]) -> None:
    """awk.go flattenForAWK: nested keys join with '.', arrays flatten into
    their parent path, scalars render Go-%v style."""
    if isinstance(data, dict):
        for k, v in data.items():
            _awk_flatten(f"{path}.{k}" if path else k, v, out)
    elif isinstance(data, list):
        for ele in data:
            _awk_flatten(path, ele, out)
    else:
        if isinstance(data, bool):
            out[path] = "true" if data else "false"
        elif isinstance(data, float) and data == int(data):
            out[path] = str(int(data))
        else:
            out[path] = "" if data is None else str(data)


class AwkProc(Processor):
    """awk processor (lib/processor/awk.go): a mini-AWK interpreter
    (engine/awk_mini.py) + the full custom function table, codecs
    none|text|json. If the program prints, the printed output (sans trailing
    newline) REPLACES the payload; json_set*/metadata_set mutate in place."""

    name = "awk"

    def __init__(self, conf: Dict[str, Any]):
        from .awk_mini import parse_program

        self.codec = conf.get("codec", "text")
        if self.codec not in ("none", "text", "json"):
            raise ValueError(f"unrecognised codec: {self.codec}")
        self.rules = parse_program(conf.get("program", ""))

    def process(self, batch, env):
        from . import awk_mini as A

        out: Batch = []
        for part in batch:
            meta = dict(part.meta)
            state = {"doc": None, "doc_dirty": False}

            def get_doc():
                if state["doc"] is None:
                    state["doc"] = parse_json(part.content)
                return state["doc"]

            def set_doc(d):
                state["doc"] = d
                state["doc_dirty"] = True

            def j_get(path):
                v = _get_in(get_doc(), str(path).split("."))
                if v is None:
                    return "null"
                if isinstance(v, str):
                    return v
                return serialize(v)

            def j_set(path, v):
                set_doc(_set_in(get_doc() if part.content.strip() else {},
                                str(path).split("."), v))
                return 0.0

            def j_append(path, v):
                doc = get_doc() if part.content.strip() else {}
                segs = str(path).split(".")
                cur = _get_in(doc, segs)
                if cur is None:
                    arr = [v]
                elif isinstance(cur, list):
                    arr = cur + [v]
                else:
                    arr = [cur, v]
                set_doc(_set_in(doc, segs, arr))
                return 0.0

            def j_type(path):
                doc = get_doc()
                segs = str(path).split(".")
                cur = doc
                for s in segs:
                    if isinstance(cur, dict) and s in cur:
                        cur = cur[s]
                    else:
                        return "undefined"
                if cur is None:
                    return "null"
                if isinstance(cur, bool):
                    return "bool"
                if isinstance(cur, (int, float)):
                    return "float"
                if isinstance(cur, str):
                    return "string"
                if isinstance(cur, list):
                    return "array"
                return "object"

            def j_length(path):
                v = _get_in(get_doc(), str(path).split("."))
                if isinstance(v, (str, list)):
                    return float(len(v))
                return 0.0

            def create_obj(*vals):
                pairs = {}
                for i in range(0, len(vals) - 1, 2):
                    pairs[A.awk_str(vals[i])] = A.awk_str(vals[i + 1])
                return serialize(pairs)

            funcs = {
                "metadata_get": lambda k: meta.get(A.awk_str(k), ""),
                "metadata_set": lambda k, v: meta.__setitem__(A.awk_str(k), A.awk_str(v)) or 0.0,
                "json_get": lambda p: j_get(p),
                "json_set": lambda p, v: j_set(p, A.awk_str(v)),
                "json_set_int": lambda p, v: j_set(p, int(A.to_num(v))),
                "json_set_float": lambda p, v: j_set(p, A.to_num(v)),
                "json_set_bool": lambda p, v: j_set(p, A.truthy(v)),
                "json_append": lambda p, v: j_append(p, A.awk_str(v)),
                "json_append_int": lambda p, v: j_append(p, int(A.to_num(v))),
                "json_append_float": lambda p, v: j_append(p, A.to_num(v)),
                "json_append_bool": lambda p, v: j_append(p, A.truthy(v)),
                "json_delete": lambda p: (set_doc(_del_in(get_doc(), str(p).split("."))), 0.0)[1],
                "json_type": lambda p: j_type(p),
                "json_length": lambda p: j_length(p),
                "create_json_object": create_obj,
                "create_json_array": lambda *vs: serialize([A.awk_str(v) for v in vs]),
                "timestamp_unix": lambda d, fmt="": float(int(A.parse_time(A.awk_str(d), A.awk_str(fmt) if fmt else ""))),
                "timestamp_unix_nano": lambda d, fmt="": A.parse_time(A.awk_str(d), A.awk_str(fmt) if fmt else "") * 1e9,
                "timestamp_format": lambda u, fmt="": A.format_time(A.to_num(u), A.awk_str(fmt) if fmt else ""),
                "timestamp_format_nano": lambda u, fmt="": A.format_time(
                    A.to_num(u) // 1e9, A.awk_str(fmt) if fmt else "",
                    nanos=int(A.to_num(u) % 1e9),
                ),
                "print_log": lambda v, lvl="INFO": 0.0,
            }

            variables: Dict[str, str] = {}
            record = " "
            if self.codec == "text":
                record = part.content.decode("utf-8", errors="replace")
            if self.codec == "json":
                try:
                    flat: Dict[str, str] = {}
                    _awk_flatten("", parse_json(part.content), flat)
                    for k, v in flat.items():
                        variables[_AWK_VAR_INVALID.sub("_", k)] = v
                except BloblangError as exc:
                    out.append(flag_err(part.copy(), f"failed to parse part into json: {exc}"))
                    continue
            if self.codec != "none":
                for k, v in meta.items():
                    variables[_AWK_VAR_INVALID.sub("_", k)] = v

            try:
                printed = A.run_program(self.rules, record, variables, funcs)
            except Exception as exc:
                out.append(flag_err(part.copy(), f"awk: {exc}"))
                continue
            if printed is not None:
                content = "\n".join(printed).encode("utf-8")
            elif state["doc_dirty"]:
                content = to_bytes_payload(state["doc"])
            else:
                content = part.content
            out.append(Part(content, meta))
        return [out]


# ------------------------------------------------------------- filtering
class FilterProc(Processor):
    """filter: drop the whole batch unless condition passes on part 0
    (lib/processor/filter.go:101 behavior)."""

    name = "filter"

    def __init__(self, conf: Any):
        self.cond = build_condition(conf)

    def process(self, batch, env):
        if self.cond.check(batch, 0, env.interp):
            return [batch]
        return []


class FilterPartsProc(Processor):
    name = "filter_parts"

    def __init__(self, conf: Any):
        self.cond = build_condition(conf)

    def process(self, batch, env):
        kept = [p for i, p in enumerate(batch) if self.cond.check(batch, i, env.interp)]
        return [kept] if kept else []


# --------------------------------------------------------------- dedupe
class DedupeProc(Processor):
    """dedupe (lib/processor/dedupe.go:82-99,126-140 behavior): interpolated
    key (or raw parts), optional xxhash, cache.Add -> exists => drop batch."""

    name = "dedupe"

    def __init__(self, conf: Dict[str, Any]):
        self.cache_name = conf.get("cache", "default")
        self.parts = conf.get("parts", [0])
        self.key = InterpolatedField(conf["key"]) if conf.get("key") else None
        self.hash = conf.get("hash", "none")
        self.drop_on_err = conf.get("drop_on_err", True)
        # optional backend config; {"type": "file", "directory": ...} makes
        # the dedupe cache shared across jobs/restarts via the filesystem
        self.backend = conf.get("backend")

    def process(self, batch, env):
        if self.key is not None:
            key = self.key.resolve(env.interp, batch, 0)
        else:
            buf = b"".join(
                batch[i].content for i in self.parts if -len(batch) <= i < len(batch)
            )
            key = buf.decode("utf-8", errors="replace")
        if self.hash == "xxhash":
            key = str(xxhash64_int(key.encode()))
        cache = env.resources.cache(self.cache_name, self.backend)
        if cache.add(key, b"t"):
            return [batch]
        return []


class CacheProc(Processor):
    name = "cache"

    def __init__(self, conf: Dict[str, Any]):
        self.cache_name = conf.get("cache", "default")
        self.operator = conf.get("operator", "set")
        self.key = InterpolatedField(str(conf.get("key", "")))
        self.value = InterpolatedField(str(conf.get("value", "")))
        # optional inline backend config ({"type": "file", "directory": ...,
        # "ttl": ...}); a file backend makes the cache shared across jobs,
        # groups, and restarts via the filesystem
        self.backend = conf.get("backend")

    def process(self, batch, env):
        cache = env.resources.cache(self.cache_name, self.backend)
        out: Batch = []
        for i, part in enumerate(batch):
            key = self.key.resolve(env.interp, batch, i)
            if self.operator == "set":
                cache.set(key, self.value.resolve(env.interp, batch, i).encode())
                out.append(part)
            elif self.operator == "add":
                if cache.add(key, self.value.resolve(env.interp, batch, i).encode()):
                    out.append(part)
                else:
                    out.append(flag_err(part.copy(), "key already exists"))
            elif self.operator == "get":
                v = cache.get(key)
                if v is None:
                    out.append(flag_err(part.copy(), "key does not exist"))
                else:
                    out.append(Part(v, dict(part.meta)))
            elif self.operator == "delete":
                cache.delete(key)
                out.append(part)
            else:
                raise ValueError(f"unknown cache operator {self.operator}")
        return [out]


# ----------------------------------------------------- routing / batching
class SwitchProc(Processor):
    """switch (lib/processor/switch.go:19-43 behavior): first matching case's
    processors run on the batch; fallthrough continues to the next case."""

    name = "switch"

    def __init__(self, conf: List[Dict[str, Any]]):
        self.cases = []
        for c in conf:
            cond = build_condition(c.get("condition", {"static": True}))
            procs = [build_processor(p) for p in c.get("processors", [])]
            self.cases.append((cond, procs, bool(c.get("fallthrough", False))))

    def process(self, batch, env):
        batches = [batch]
        matched = False
        for cond, procs, fall in self.cases:
            if not matched:
                if not cond.check(batch, 0, env.interp):
                    continue
                matched = True
            nxt: List[Batch] = []
            for b in batches:
                nxt.extend(execute_all(procs, b, env))
            batches = nxt
            if not fall:
                break
        return batches if matched else [batch]


class ConditionalProc(Processor):
    name = "conditional"

    def __init__(self, conf: Dict[str, Any]):
        self.cond = build_condition(conf.get("condition", {"static": True}))
        self.procs = [build_processor(p) for p in conf.get("processors", [])]
        self.else_procs = [build_processor(p) for p in conf.get("else_processors", [])]

    def process(self, batch, env):
        procs = self.procs if self.cond.check(batch, 0, env.interp) else self.else_procs
        return execute_all(procs, batch, env)


class GroupByProc(Processor):
    """group_by (lib/processor/group_by.go:115-132,207-240 behavior):
    split the batch by first matching condition; run per-group processors."""

    name = "group_by"

    def __init__(self, conf: List[Dict[str, Any]]):
        self.groups = []
        for g in conf:
            cond = build_condition(g.get("condition", {"static": True}))
            procs = [build_processor(p) for p in g.get("processors", [])]
            self.groups.append((cond, procs))

    def process(self, batch, env):
        buckets: List[Batch] = [[] for _ in self.groups]
        default: Batch = []
        for i, part in enumerate(batch):
            for gi, (cond, _) in enumerate(self.groups):
                if cond.check(batch, i, env.interp):
                    buckets[gi].append(part)
                    break
            else:
                default.append(part)
        out: List[Batch] = []
        for (cond, procs), bucket in zip(self.groups, buckets):
            if bucket:
                out.extend(execute_all(procs, bucket, env))
        if default:
            out.append(default)
        return out


class GroupByValueProc(Processor):
    """group_by_value: split batch by interpolated key, first-seen order
    (lib/processor/group_by_value.go:60-78,122-149 behavior)."""

    name = "group_by_value"

    def __init__(self, conf: Dict[str, Any]):
        self.value = InterpolatedField(str(conf.get("value", "")))

    def process(self, batch, env):
        order: List[str] = []
        groups: Dict[str, Batch] = {}
        for i, part in enumerate(batch):
            key = self.value.resolve(env.interp, batch, i)
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append(part)
        return [groups[k] for k in order]


class SplitProc(Processor):
    """split into size / byte_size chunks (lib/processor/split.go:92-120)."""

    name = "split"

    def __init__(self, conf: Dict[str, Any]):
        conf = conf or {}
        self.size = int(conf.get("size", 1))
        self.byte_size = int(conf.get("byte_size", 0))

    def process(self, batch, env):
        out: List[Batch] = []
        if self.byte_size > 0:
            cur: Batch = []
            cur_bytes = 0
            for part in batch:
                n = len(part.content)
                if cur and cur_bytes + n > self.byte_size:
                    out.append(cur)
                    cur, cur_bytes = [], 0
                cur.append(part)
                cur_bytes += n
            if cur:
                out.append(cur)
            return out
        for i in range(0, len(batch), self.size):
            out.append(batch[i : i + self.size])
        return out


class SelectPartsProc(Processor):
    name = "select_parts"

    def __init__(self, conf: Dict[str, Any]):
        self.parts = conf.get("parts", [0])

    def process(self, batch, env):
        n = len(batch)
        kept = [batch[i] for i in self.parts if -n <= i < n]
        return [kept] if kept else []


class InsertPartProc(Processor):
    name = "insert_part"

    def __init__(self, conf: Dict[str, Any]):
        self.index = int(conf.get("index", -1))
        self.content = InterpolatedField(str(conf.get("content", "")))

    def process(self, batch, env):
        payload = self.content.resolve(env.interp, batch, 0).encode()
        new = Part(payload)
        i = self.index
        n = len(batch)
        if i < 0:
            i = max(0, n + 1 + i)
        i = min(i, n)
        return [batch[:i] + [new] + batch[i:]]


class ForEachProc(Processor):
    name = "for_each"

    def __init__(self, conf: List[Any]):
        self.procs = [build_processor(p) for p in conf or []]

    def process(self, batch, env):
        out: Batch = []
        for part in batch:
            for b in execute_all(self.procs, [part], env):
                out.extend(b)
        return [out] if out else []


class ParallelProc(ForEachProc):
    """parallel: for_each with a worker cap (lib/processor/parallel.go:113);
    the cap is a concurrency knob, not a semantic — Spark supplies parallelism."""

    name = "parallel"

    def __init__(self, conf: Dict[str, Any]):
        super().__init__((conf or {}).get("processors", []))


class WhileProc(Processor):
    name = "while"

    def __init__(self, conf: Dict[str, Any]):
        self.cond = build_condition(conf.get("condition", {"static": False}))
        self.procs = [build_processor(p) for p in conf.get("processors", [])]
        self.at_least_once = bool(conf.get("at_least_once", False))
        self.max_loops = int(conf.get("max_loops", 0))

    def process(self, batch, env):
        batches = [batch]
        loops = 0
        while True:
            if self.max_loops and loops >= self.max_loops:
                break
            if not batches:
                break
            if loops == 0 and self.at_least_once:
                pass
            elif not self.cond.check(batches[0], 0, env.interp):
                break
            nxt: List[Batch] = []
            for b in batches:
                nxt.extend(execute_all(self.procs, b, env))
            batches = nxt
            loops += 1
        return batches


class TryProc(Processor):
    """try (lib/processor/try.go:109): failed parts skip remaining children."""

    name = "try"

    def __init__(self, conf: List[Any]):
        self.procs = [build_processor(p) for p in conf or []]

    def process(self, batch, env):
        cur = batch
        for proc in self.procs:
            ok_idx = [i for i, p in enumerate(cur) if FAIL_META_KEY not in p.meta]
            if not ok_idx:
                break
            sub = [cur[i] for i in ok_idx]
            res = proc.process(sub, env)
            flat = [p for b in res for p in b]
            if len(flat) == len(ok_idx):
                merged = list(cur)
                for j, i in enumerate(ok_idx):
                    merged[i] = flat[j]
                cur = merged
            else:
                cur = flat + [cur[i] for i in range(len(cur)) if i not in ok_idx]
        return [cur] if cur else []


class CatchProc(Processor):
    """catch (lib/processor/catch.go:112): children run on failed parts only,
    then the fail flag is cleared."""

    name = "catch"

    def __init__(self, conf: List[Any]):
        self.procs = [build_processor(p) for p in conf or []]

    def process(self, batch, env):
        failed_idx = [i for i, p in enumerate(batch) if FAIL_META_KEY in p.meta]
        if not failed_idx:
            return [batch]
        sub = [batch[i] for i in failed_idx]
        res = execute_all(self.procs, sub, env)
        flat = [p for b in res for p in b]
        merged = list(batch)
        if len(flat) == len(failed_idx):
            for j, i in enumerate(failed_idx):
                merged[i] = flat[j]
        else:
            merged = [p for i, p in enumerate(batch) if i not in failed_idx] + flat
        for p in merged:
            p.meta.pop(FAIL_META_KEY, None)
        return [merged] if merged else []


# ----------------------------------------------------- format / codec ops
class ArchiveProc(Processor):
    """archive: batch -> one part (lib/processor/archive.go:220-228)."""

    name = "archive"

    def __init__(self, conf: Dict[str, Any]):
        self.format = conf.get("format", "binary")
        self.path = InterpolatedField(str(conf.get("path", "${!count:files}-benthos_part.dat")))

    def process(self, batch, env):
        fmt = self.format
        if fmt == "lines":
            payload = b"\n".join(p.content for p in batch)
        elif fmt == "json_array":
            docs = []
            for p in batch:
                docs.append(parse_json(p.content))
            payload = serialize(docs).encode()
        elif fmt == "concatenate":
            payload = b"".join(p.content for p in batch)
        elif fmt == "tar":
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for i, p in enumerate(batch):
                    name = self.path.resolve(env.interp, batch, i)
                    info = tarfile.TarInfo(name=name)
                    info.size = len(p.content)
                    tf.addfile(info, io.BytesIO(p.content))
            payload = buf.getvalue()
        elif fmt == "zip":
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                for i, p in enumerate(batch):
                    zf.writestr(self.path.resolve(env.interp, batch, i), p.content)
            payload = buf.getvalue()
        elif fmt == "binary":
            # simple length-prefixed binary blob format (v0 message serialization)
            out = bytearray()
            out += len(batch).to_bytes(4, "big")
            for p in batch:
                out += len(p.content).to_bytes(4, "big")
                out += p.content
            payload = bytes(out)
        else:
            raise ValueError(f"unknown archive format {fmt}")
        return [[Part(payload, dict(batch[0].meta))]]


class UnarchiveProc(Processor):
    """unarchive: one part -> batch (lib/processor/unarchive.go:263-276)."""

    name = "unarchive"

    def __init__(self, conf: Dict[str, Any]):
        self.format = conf.get("format", "binary")

    def process(self, batch, env):
        out: Batch = []
        for part in batch:
            try:
                out.extend(self._expand(part))
            except Exception as exc:
                out.append(flag_err(part.copy(), str(exc)))
        return [out] if out else []

    def _expand(self, part: Part) -> Batch:
        fmt = self.format
        if fmt == "lines":
            return [
                Part(line.encode(), dict(part.meta))
                for line in part.content.decode().split("\n")
            ]
        if fmt == "json_array":
            arr = parse_json(part.content)
            if not isinstance(arr, list):
                raise ValueError("expected JSON array")
            return [Part(to_bytes_payload(x), dict(part.meta)) for x in arr]
        if fmt == "json_map":
            obj = parse_json(part.content)
            if not isinstance(obj, dict):
                raise ValueError("expected JSON object")
            out = []
            for k in sorted(obj):
                meta = dict(part.meta)
                meta["archive_key"] = k
                out.append(Part(to_bytes_payload(obj[k]), meta))
            return out
        if fmt == "json_documents":
            dec = _json.JSONDecoder()
            s = part.content.decode()
            pos, out = 0, []
            while pos < len(s):
                while pos < len(s) and s[pos].isspace():
                    pos += 1
                if pos >= len(s):
                    break
                obj, pos = dec.raw_decode(s, pos)
                out.append(Part(to_bytes_payload(obj), dict(part.meta)))
            return out
        if fmt == "tar":
            out = []
            with tarfile.open(fileobj=io.BytesIO(part.content)) as tf:
                for member in tf.getmembers():
                    f = tf.extractfile(member)
                    if f is not None:
                        out.append(Part(f.read(), dict(part.meta)))
            return out
        if fmt == "zip":
            out = []
            with zipfile.ZipFile(io.BytesIO(part.content)) as zf:
                for name in zf.namelist():
                    out.append(Part(zf.read(name), dict(part.meta)))
            return out
        if fmt == "binary":
            data = part.content
            n = int.from_bytes(data[:4], "big")
            pos = 4
            out = []
            for _ in range(n):
                ln = int.from_bytes(data[pos : pos + 4], "big")
                pos += 4
                out.append(Part(data[pos : pos + ln], dict(part.meta)))
                pos += ln
            return out
        raise ValueError(f"unknown unarchive format {fmt}")


class CompressProc(Processor):
    name = "compress"

    def __init__(self, conf: Dict[str, Any]):
        self.algorithm = conf.get("algorithm", "gzip")
        self.level = int(conf.get("level", -1))

    def process(self, batch, env):
        out: Batch = []
        for part in batch:
            level = self.level if self.level >= 0 else 9
            if self.algorithm == "gzip":
                payload = gzip.compress(part.content, compresslevel=level, mtime=0)
            elif self.algorithm == "zlib":
                payload = zlib.compress(part.content, level)
            elif self.algorithm == "flate":
                co = zlib.compressobj(level, zlib.DEFLATED, -zlib.MAX_WBITS)
                payload = co.compress(part.content) + co.flush()
            else:
                out.append(flag_err(part.copy(), f"unknown algorithm {self.algorithm}"))
                continue
            out.append(Part(payload, dict(part.meta)))
        return [out]


class DecompressProc(Processor):
    name = "decompress"

    def __init__(self, conf: Dict[str, Any]):
        self.algorithm = conf.get("algorithm", "gzip")

    def process(self, batch, env):
        out: Batch = []
        for part in batch:
            try:
                if self.algorithm == "gzip":
                    payload = gzip.decompress(part.content)
                elif self.algorithm == "zlib":
                    payload = zlib.decompress(part.content)
                elif self.algorithm == "flate":
                    payload = zlib.decompress(part.content, -zlib.MAX_WBITS)
                elif self.algorithm == "bzip2":
                    payload = bz2.decompress(part.content)
                else:
                    raise ValueError(f"unknown algorithm {self.algorithm}")
                out.append(Part(payload, dict(part.meta)))
            except Exception as exc:
                out.append(flag_err(part.copy(), str(exc)))
        return [out]


class EncodeProc(Processor):
    name = "encode"

    def __init__(self, conf: Dict[str, Any]):
        self.scheme = conf.get("scheme", "base64")

    def process(self, batch, env):
        out: Batch = []
        for part in batch:
            try:
                if self.scheme == "base64":
                    payload = base64.b64encode(part.content)
                elif self.scheme == "hex":
                    payload = binascii.hexlify(part.content)
                elif self.scheme == "ascii85":
                    payload = base64.a85encode(part.content)
                elif self.scheme == "z85":
                    from ..bloblang.z85 import z85_encode

                    payload = z85_encode(part.content).encode()
                else:
                    raise ValueError(f"unknown scheme {self.scheme}")
                out.append(Part(payload, dict(part.meta)))
            except Exception as exc:
                out.append(flag_err(part.copy(), str(exc)))
        return [out]


class DecodeProc(Processor):
    name = "decode"

    def __init__(self, conf: Dict[str, Any]):
        self.scheme = conf.get("scheme", "base64")

    def process(self, batch, env):
        out: Batch = []
        for part in batch:
            try:
                if self.scheme == "base64":
                    payload = base64.b64decode(part.content)
                elif self.scheme == "hex":
                    payload = binascii.unhexlify(part.content)
                elif self.scheme == "ascii85":
                    payload = base64.a85decode(part.content)
                elif self.scheme == "z85":
                    from ..bloblang.z85 import z85_decode

                    payload = z85_decode(part.content.decode())
                else:
                    raise ValueError(f"unknown scheme {self.scheme}")
                out.append(Part(payload, dict(part.meta)))
            except Exception as exc:
                out.append(flag_err(part.copy(), str(exc)))
        return [out]


class HashProc(Processor):
    name = "hash"

    def __init__(self, conf: Dict[str, Any]):
        self.algorithm = conf.get("algorithm", "sha256")
        self.key = conf.get("key", "")

    def process(self, batch, env):
        out: Batch = []
        for part in batch:
            alg = self.algorithm
            if alg in ("sha1", "sha256", "sha512", "md5"):
                payload = getattr(hashlib, alg)(part.content).digest()
            elif alg == "xxhash64":
                payload = str(xxhash64_int(part.content)).encode()
            elif alg.startswith("hmac-") or alg.startswith("hmac_"):
                import hmac as _hmac

                digest = alg.split("-")[-1].split("_")[-1]
                payload = _hmac.new(
                    str(self.key).encode(), part.content, getattr(hashlib, digest)
                ).digest()
            else:
                out.append(flag_err(part.copy(), f"unknown algorithm {alg}"))
                continue
            out.append(Part(payload, dict(part.meta)))
        return [out]


class MetadataProc(Processor):
    name = "metadata"

    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "set")
        self.key = InterpolatedField(str(conf.get("key", "")))
        self.value = InterpolatedField(str(conf.get("value", "")))

    def process(self, batch, env):
        out: Batch = []
        for i, part in enumerate(batch):
            meta = dict(part.meta)
            key = self.key.resolve(env.interp, batch, i)
            if self.operator == "set":
                meta[key] = self.value.resolve(env.interp, batch, i)
            elif self.operator == "delete" or self.operator == "delete_all":
                if self.operator == "delete":
                    meta.pop(key, None)
                else:
                    meta.clear()
            elif self.operator == "delete_prefix":
                meta = {k: v for k, v in meta.items() if not k.startswith(key)}
            else:
                raise ValueError(f"unknown metadata operator {self.operator}")
            out.append(Part(part.content, meta))
        return [out]


class MergeJsonProc(Processor):
    name = "merge_json"

    def __init__(self, conf: Dict[str, Any]):
        conf = conf or {}
        self.parts = conf.get("parts", [])
        self.retain_parts = bool(conf.get("retain_parts", False))

    def process(self, batch, env):
        idx = self.parts or list(range(len(batch)))
        merged: Any = None
        for i in idx:
            if not (-len(batch) <= i < len(batch)):
                continue
            doc = parse_json(batch[i].content)
            merged = doc if merged is None else deep_merge(merged, doc)
        new_part = Part(to_bytes_payload(merged), dict(batch[idx[0]].meta))
        if self.retain_parts:
            return [batch + [new_part]]
        kept = [p for i, p in enumerate(batch) if i not in idx and i - len(batch) not in idx]
        return [kept + [new_part]]


class NumberProc(Processor):
    name = "number"

    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "add")
        self.value = InterpolatedField(str(conf.get("value", "0")))

    def process(self, batch, env):
        out: Batch = []
        for i, part in enumerate(batch):
            try:
                n = get_number(part.content.decode())
                arg = get_number(self.value.resolve(env.interp, batch, i))
                if self.operator == "add":
                    n = n + arg
                elif self.operator == "subtract":
                    n = n - arg
                else:
                    raise ValueError(f"unknown number operator {self.operator}")
                out.append(Part(to_string(n).encode(), dict(part.meta)))
            except (BloblangError, ValueError) as exc:
                out.append(flag_err(part.copy(), str(exc)))
        return [out]


class BoundsCheckProc(Processor):
    name = "bounds_check"

    def __init__(self, conf: Dict[str, Any]):
        self.max_parts = int(conf.get("max_parts", 100))
        self.min_parts = int(conf.get("min_parts", 1))
        self.max_part_size = int(conf.get("max_part_size", 1 << 30))
        self.min_part_size = int(conf.get("min_part_size", 1))

    def process(self, batch, env):
        if not (self.min_parts <= len(batch) <= self.max_parts):
            return []
        for p in batch:
            if not (self.min_part_size <= len(p.content) <= self.max_part_size):
                return []
        return [batch]


class SampleProc(Processor):
    name = "sample"

    def __init__(self, conf: Dict[str, Any]):
        self.retain = float(conf.get("retain", 10.0)) / 100.0
        self.seed = int(conf.get("seed", 0))
        import random

        self.rng = random.Random(self.seed)

    def process(self, batch, env):
        if self.rng.random() < self.retain:
            return [batch]
        return []


class HashSampleProc(Processor):
    """hash_sample: deterministic hash-range sample (lib/processor/hash_sample.go)."""

    name = "hash_sample"

    def __init__(self, conf: Dict[str, Any]):
        self.retain_min = float(conf.get("retain_min", 0.0))
        self.retain_max = float(conf.get("retain_max", 10.0))
        self.parts = conf.get("parts", [0])

    def process(self, batch, env):
        buf = b"".join(
            batch[i].content for i in self.parts if -len(batch) <= i < len(batch)
        )
        rate = (xxhash64_int(buf) % 10000) / 100.0
        if self.retain_min <= rate < self.retain_max:
            return [batch]
        return []


class ProcessFieldProc(Processor):
    name = "process_field"

    def __init__(self, conf: Dict[str, Any]):
        self.path = str(conf.get("path", ""))
        self.codec = conf.get("codec", "json")
        self.result_type = conf.get("result_type", "string")
        self.procs = [build_processor(p) for p in conf.get("processors", [])]

    def process(self, batch, env):
        out: Batch = []
        for part in batch:
            try:
                doc = parse_json(part.content)
                segs = self.path.split(".")
                val = _get_in(doc, segs)
                sub = Part(to_bytes_payload(val), dict(part.meta))
                res = execute_all(self.procs, [sub], env)
                flat = [p for b in res for p in b]
                new_raw = flat[0].content.decode() if flat else ""
                typed: Any = new_raw
                if self.result_type == "int":
                    typed = int(float(new_raw))
                elif self.result_type == "float":
                    typed = float(new_raw)
                elif self.result_type == "bool":
                    typed = new_raw.lower() == "true"
                elif self.result_type == "object":
                    typed = _json.loads(new_raw)
                elif self.result_type == "discard":
                    out.append(part)
                    continue
                doc = _set_in(doc, segs, typed)
                out.append(Part(to_bytes_payload(doc), dict(part.meta)))
            except Exception as exc:
                out.append(flag_err(part.copy(), str(exc)))
        return [out]


class NoopProc(Processor):
    name = "noop"

    def __init__(self, conf: Any = None):
        pass

    def process(self, batch, env):
        return [batch]


class ResourceProc(Processor):
    name = "resource"

    def __init__(self, conf: Any):
        self.target = conf if isinstance(conf, str) else conf.get("name", "")

    def process(self, batch, env):
        proc = env.resources.processors.get(self.target)
        if proc is None:
            raise ValueError(f"processor resource {self.target} not found")
        return proc.process(batch, env)


_REGISTRY = {
    "bloblang": BloblangProc,
    "mapping": BloblangProc,
    "text": TextProc,
    "json": JsonProc,
    "awk": AwkProc,
    "filter": FilterProc,
    "filter_parts": FilterPartsProc,
    "dedupe": DedupeProc,
    "cache": CacheProc,
    "switch": SwitchProc,
    "conditional": ConditionalProc,
    "group_by": GroupByProc,
    "group_by_value": GroupByValueProc,
    "split": SplitProc,
    "select_parts": SelectPartsProc,
    "insert_part": InsertPartProc,
    "for_each": ForEachProc,
    "process_batch": ForEachProc,
    "while": WhileProc,
    "try": TryProc,
    "catch": CatchProc,
    "archive": ArchiveProc,
    "unarchive": UnarchiveProc,
    "compress": CompressProc,
    "decompress": DecompressProc,
    "encode": EncodeProc,
    "decode": DecodeProc,
    "hash": HashProc,
    "metadata": MetadataProc,
    "merge_json": MergeJsonProc,
    "number": NumberProc,
    "bounds_check": BoundsCheckProc,
    "sample": SampleProc,
    "hash_sample": HashSampleProc,
    "process_field": ProcessFieldProc,
    "noop": NoopProc,
    "resource": ResourceProc,
    # pacing / observability processors are semantic no-ops in the engine
    "sleep": NoopProc,
    "log": NoopProc,
    "metric": NoopProc,
    "rate_limit": NoopProc,
    "throttle": NoopProc,
    "parallel": ParallelProc,
}


def build_processor(conf: Any) -> Processor:
    """Build a processor from its YAML form ``{type: config}`` or ``{type: t, ...}``."""
    if isinstance(conf, Processor):
        return conf
    if not isinstance(conf, dict):
        raise ValueError(f"invalid processor config: {conf!r}")
    conf = dict(conf)
    ptype = conf.pop("type", None)
    if ptype is None:
        if len(conf) != 1:
            raise ValueError(f"ambiguous processor config: {list(conf)}")
        ptype, body = next(iter(conf.items()))
    else:
        body = conf.get(ptype, conf)
    cls = _REGISTRY.get(ptype)
    if cls is None:
        raise ValueError(f"unknown processor type {ptype}")
    return cls(body)
