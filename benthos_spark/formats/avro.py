"""Pure-Python Avro codec (binary / textual-JSON / single-object encodings).

Implements the subset of the public Avro 1.x specification needed by the
avro processor (/root/reference/lib/processor/avro.go:78-170 — operators
to_json/from_json over encodings textual|binary|single, backed by goavro).
No external Avro library exists in this container and Spark's `from_avro`
module jar is absent, so the codec is self-contained; it runs inside
Arrow-batched kernels (one call per document, vectorized at the batch
level).

Supported schema forms: primitives (null, boolean, int, long, float,
double, bytes, string), record, enum, array, map, union, fixed, named-type
references. Logical types are passed through as their underlying type.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Dict, List, Tuple, Union

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

Schema = Union[str, Dict[str, Any], List[Any]]


class AvroError(ValueError):
    pass


def parse_schema(src: Union[str, Dict, List]) -> Schema:
    """Parse and validate a schema, resolving named-type references."""
    schema = json.loads(src if isinstance(src, str) else json.dumps(src))
    names: Dict[str, Dict] = {}
    _collect_names(schema, names, None)
    return _resolve(schema, names)


def _fullname(name: str, namespace) -> str:
    if "." in name or not namespace:
        return name
    return f"{namespace}.{name}"


def _collect_names(s: Schema, names: Dict[str, Dict], ns) -> None:
    if isinstance(s, list):
        for b in s:
            _collect_names(b, names, ns)
        return
    if not isinstance(s, dict):
        return
    t = s.get("type")
    if t in ("record", "enum", "fixed") and "name" in s:
        if ns and "namespace" not in s and "." not in s["name"]:
            s["namespace"] = ns  # inherit enclosing namespace (Avro spec)
        names[_fullname(s["name"], s.get("namespace"))] = s
        names.setdefault(s["name"], s)
    ns = s.get("namespace", ns)
    if t == "record":
        for f in s.get("fields", []):
            _collect_names(f.get("type"), names, ns)
    elif t == "array":
        _collect_names(s.get("items"), names, ns)
    elif t == "map":
        _collect_names(s.get("values"), names, ns)


def _resolve(s: Schema, names: Dict[str, Dict]) -> Schema:
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return s
        if s in names:
            return names[s]
        raise AvroError(f"unknown type reference: {s}")
    if isinstance(s, list):
        return [_resolve(b, names) for b in s]
    if isinstance(s, dict):
        t = s.get("type")
        if t == "record":
            s = dict(s)
            s["fields"] = [
                {**f, "type": _resolve(f["type"], names)} for f in s.get("fields", [])
            ]
            return s
        if t == "array":
            return {**s, "items": _resolve(s.get("items"), names)}
        if t == "map":
            return {**s, "values": _resolve(s.get("values"), names)}
        if t in ("enum", "fixed"):
            return s
        if isinstance(t, (str, list, dict)) and t not in ("record", "enum", "fixed"):
            # {"type": "string", ...} wrapper or logical type annotation
            return _resolve(t, names)
    raise AvroError(f"unsupported schema: {s!r}")


def _type_of(s: Schema) -> str:
    if isinstance(s, str):
        return s
    if isinstance(s, list):
        return "union"
    return s["type"]


# ------------------------------------------------------------------ binary
def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> Tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _branch_name(s: Schema) -> str:
    """Union branch key, goavro-compatible: namespace-qualified fullname for
    named types, type name otherwise."""
    if isinstance(s, str):
        return s
    if isinstance(s, dict):
        if s.get("name"):
            return _fullname(s["name"], s.get("namespace"))
        return s["type"]
    return "union"


def _union_index(datum: Any, branches: List[Schema]) -> int:
    def matches(s: Schema) -> bool:
        t = _type_of(s)
        if datum is None:
            return t == "null"
        if isinstance(datum, bool):
            return t == "boolean"
        if isinstance(datum, int):
            return t in ("int", "long", "float", "double")
        if isinstance(datum, float):
            return t in ("float", "double")
        if isinstance(datum, str):
            return t in ("string", "enum")
        if isinstance(datum, (bytes, bytearray)):
            return t in ("bytes", "fixed")
        if isinstance(datum, dict):
            return t in ("record", "map")
        if isinstance(datum, list):
            return t == "array"
        return False

    for i, b in enumerate(branches):
        if matches(b):
            return i
    raise AvroError(f"datum {datum!r} matches no union branch")


def binary_encode(datum: Any, schema: Schema) -> bytes:
    t = _type_of(schema)
    if t == "null":
        if datum is not None:
            raise AvroError(f"expected null, got {datum!r}")
        return b""
    if t == "boolean":
        return b"\x01" if datum else b"\x00"
    if t in ("int", "long"):
        return _zigzag_encode(int(datum))
    if t == "float":
        return struct.pack("<f", float(datum))
    if t == "double":
        return struct.pack("<d", float(datum))
    if t == "bytes":
        b = bytes(datum)
        return _zigzag_encode(len(b)) + b
    if t == "string":
        b = str(datum).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            if f["name"] not in datum and "default" in f:
                v = f["default"]
            else:
                if f["name"] not in datum:
                    raise AvroError(f"missing record field {f['name']}")
                v = datum[f["name"]]
            out += binary_encode(v, f["type"])
        return bytes(out)
    if t == "enum":
        try:
            return _zigzag_encode(schema["symbols"].index(datum))
        except ValueError:
            raise AvroError(f"{datum!r} not an enum symbol")
    if t == "array":
        out = bytearray()
        items = list(datum)
        if items:
            out += _zigzag_encode(len(items))
            for it in items:
                out += binary_encode(it, schema["items"])
        out += _zigzag_encode(0)
        return bytes(out)
    if t == "map":
        out = bytearray()
        if datum:
            out += _zigzag_encode(len(datum))
            for k, v in datum.items():
                kb = str(k).encode("utf-8")
                out += _zigzag_encode(len(kb)) + kb
                out += binary_encode(v, schema["values"])
        out += _zigzag_encode(0)
        return bytes(out)
    if t == "union":
        # accept goavro/Avro-JSON style {"branch": value} wrappers too
        if isinstance(datum, dict) and len(datum) == 1:
            key = next(iter(datum))
            for i, b in enumerate(schema):
                if _branch_name(b) == key:
                    return _zigzag_encode(i) + binary_encode(datum[key], b)
        i = _union_index(datum, schema)
        return _zigzag_encode(i) + binary_encode(datum, schema[i])
    if t == "fixed":
        b = bytes(datum)
        if len(b) != schema["size"]:
            raise AvroError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        return b
    raise AvroError(f"cannot encode type {t}")


def binary_decode(buf: bytes, schema: Schema, pos: int = 0) -> Tuple[Any, int]:
    t = _type_of(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    if t == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = binary_decode(buf, f["type"], pos)
        return out, pos
    if t == "enum":
        i, pos = _zigzag_decode(buf, pos)
        return schema["symbols"][i], pos
    if t == "array":
        out = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(n):
                v, pos = binary_decode(buf, schema["items"], pos)
                out.append(v)
    if t == "map":
        out = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(n):
                kn, pos = _zigzag_decode(buf, pos)
                k = buf[pos:pos + kn].decode("utf-8")
                pos += kn
                out[k], pos = binary_decode(buf, schema["values"], pos)
    if t == "union":
        i, pos = _zigzag_decode(buf, pos)
        if _type_of(schema[i]) == "null":
            return None, pos
        # goavro native form: {"branch_fullname": value}
        v, pos = binary_decode(buf, schema[i], pos)
        return {_branch_name(schema[i]): v}, pos
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos:pos + n]), pos + n
    raise AvroError(f"cannot decode type {t}")


# ----------------------------------------------------------------- textual
def to_textual(datum: Any, schema: Schema) -> Any:
    """Native -> Avro JSON encoding (unions become {"branch": value})."""
    t = _type_of(schema)
    if t == "union":
        if datum is None and any(_type_of(b) == "null" for b in schema):
            return None
        if isinstance(datum, dict) and len(datum) == 1 and any(
            _branch_name(b) == next(iter(datum)) for b in schema
        ):
            key = next(iter(datum))
            b = next(b for b in schema if _branch_name(b) == key)
            return {key: to_textual(datum[key], b)}
        i = _union_index(datum, schema)
        return {_branch_name(schema[i]): to_textual(datum, schema[i])}
    if t == "record":
        return {
            f["name"]: to_textual(datum.get(f["name"], f.get("default")), f["type"])
            for f in schema["fields"]
        }
    if t == "array":
        return [to_textual(v, schema["items"]) for v in datum]
    if t == "map":
        return {k: to_textual(v, schema["values"]) for k, v in datum.items()}
    if t in ("bytes", "fixed"):
        return bytes(datum).decode("latin-1")
    return datum


def from_textual(doc: Any, schema: Schema) -> Any:
    """Avro JSON encoding -> native (goavro form: union wrappers kept)."""
    t = _type_of(schema)
    if t == "union":
        if doc is None:
            if any(_type_of(b) == "null" for b in schema):
                return None
            raise AvroError("null not allowed by union")
        if isinstance(doc, dict) and len(doc) == 1:
            key = next(iter(doc))
            for b in schema:
                if _branch_name(b) == key:
                    return {key: from_textual(doc[key], b)}
        i = _union_index(doc, schema)
        return {_branch_name(schema[i]): from_textual(doc, schema[i])}
    if t == "record":
        out = {}
        for f in schema["fields"]:
            if f["name"] in doc:
                out[f["name"]] = from_textual(doc[f["name"]], f["type"])
            elif "default" in f:
                out[f["name"]] = f["default"]
            else:
                raise AvroError(f"missing field {f['name']}")
        return out
    if t == "array":
        return [from_textual(v, schema["items"]) for v in doc]
    if t == "map":
        return {k: from_textual(v, schema["values"]) for k, v in doc.items()}
    if t in ("bytes", "fixed"):
        return str(doc).encode("latin-1")
    return doc


def textual_encode(datum: Any, schema: Schema) -> bytes:
    return json.dumps(
        to_textual(datum, schema), separators=(",", ":"), sort_keys=False
    ).encode("utf-8")


def textual_decode(buf: bytes, schema: Schema) -> Any:
    return from_textual(json.loads(buf.decode("utf-8")), schema)


# ------------------------------------------------------------ single-object
_CRC64_EMPTY = 0xC15D213AA4D7A795
_CRC64_TABLE = []
for _i in range(256):
    _fp = _i
    for _ in range(8):
        _fp = (_fp >> 1) ^ (_CRC64_EMPTY & -(_fp & 1))
    _CRC64_TABLE.append(_fp)


def crc64_avro(data: bytes) -> int:
    """CRC-64-AVRO schema fingerprint (Avro spec 'single object encoding')."""
    fp = _CRC64_EMPTY
    for b in data:
        fp = (fp >> 8) ^ _CRC64_TABLE[(fp ^ b) & 0xFF]
    return fp


def canonical_form(schema: Schema) -> str:
    """Parsing Canonical Form (subset: strips non-essential attributes,
    orders keys per spec)."""
    def canon(s: Schema) -> Any:
        if isinstance(s, str):
            return s
        if isinstance(s, list):
            return [canon(b) for b in s]
        t = s["type"]
        if t == "record":
            return {
                "name": _fullname(s["name"], s.get("namespace")),
                "type": "record",
                "fields": [
                    {"name": f["name"], "type": canon(f["type"])} for f in s["fields"]
                ],
            }
        if t == "enum":
            return {
                "name": _fullname(s["name"], s.get("namespace")),
                "type": "enum",
                "symbols": s["symbols"],
            }
        if t == "fixed":
            return {
                "name": _fullname(s["name"], s.get("namespace")),
                "type": "fixed",
                "size": s["size"],
            }
        if t == "array":
            return {"type": "array", "items": canon(s["items"])}
        if t == "map":
            return {"type": "map", "values": canon(s["values"])}
        return t

    key_order = ["name", "type", "fields", "symbols", "items", "values", "size"]

    def dump(o: Any) -> str:
        if isinstance(o, str):
            return json.dumps(o)
        if isinstance(o, list):
            return "[" + ",".join(dump(x) for x in o) + "]"
        if isinstance(o, dict):
            items = [(k, o[k]) for k in key_order if k in o]
            return "{" + ",".join(f"{json.dumps(k)}:{dump(v)}" for k, v in items) + "}"
        return json.dumps(o)

    return dump(canon(schema))


_SINGLE_MAGIC = b"\xc3\x01"


def single_encode(datum: Any, schema: Schema) -> bytes:
    fp = crc64_avro(canonical_form(schema).encode("utf-8"))
    return _SINGLE_MAGIC + struct.pack("<Q", fp) + binary_encode(datum, schema)


def single_decode(buf: bytes, schema: Schema) -> Any:
    if buf[:2] != _SINGLE_MAGIC:
        raise AvroError("not a single-object-encoded Avro payload")
    fp = struct.unpack_from("<Q", buf, 2)[0]
    want = crc64_avro(canonical_form(schema).encode("utf-8"))
    if fp != want:
        raise AvroError(f"schema fingerprint mismatch: {fp:#x} != {want:#x}")
    v, _ = binary_decode(buf, schema, 10)
    return v


# ------------------------------------------------------------------- codec
class Codec:
    """goavro.Codec-alike: one parsed schema, all three encodings
    (avro.go:78-160 operator table)."""

    def __init__(self, schema_src: Union[str, Dict, List]):
        self.schema = parse_schema(schema_src)

    def encode(self, datum: Any, encoding: str = "binary") -> bytes:
        if encoding == "binary":
            return binary_encode(datum, self.schema)
        if encoding == "textual":
            return textual_encode(datum, self.schema)
        if encoding == "single":
            return single_encode(datum, self.schema)
        raise AvroError(f"unknown encoding {encoding}")

    def decode(self, buf: bytes, encoding: str = "binary") -> Any:
        if encoding == "binary":
            v, _ = binary_decode(buf, self.schema)
            return v
        if encoding == "textual":
            return textual_decode(buf, self.schema)
        if encoding == "single":
            return single_decode(buf, self.schema)
        raise AvroError(f"unknown encoding {encoding}")
