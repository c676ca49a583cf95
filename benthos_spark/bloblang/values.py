"""Value model for the Bloblang-subset interpreter.

Re-implements (from observed behavior, not code) the dynamic-value semantics of
the reference's coercion helpers (see /root/reference/lib/bloblang/x/query/
type_helpers.go:24-176 and arithmetic.go:28-64 for WHAT is computed):

- values are: None | bool | int | float | str | bytes | list | dict
- arithmetic coerces numeric strings and widens to float64
- equality restricts both sides to a comparable domain (numbers -> float,
  bytes -> str) and returns False across incompatible types
- serialization matches Go ``encoding/json`` with ``SetEscapeHTML(false)``
  and sorted object keys (Go map marshaling), shortest float formatting
  (/root/reference/lib/message/part.go:71-85).
"""

from __future__ import annotations

import json
import math
from typing import Any


class BloblangError(Exception):
    """A recoverable mapping error (caught by .catch() / .or() / pipe)."""


class _Sentinel:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def __repr__(self) -> str:  # pragma: no cover
        return self.name


#: assigning Delete to root drops the part; in map_each drops the element
Delete = _Sentinel("Delete")
#: Nothing leaves the target unchanged (match fall-through)
Nothing = _Sentinel("Nothing")
#: root not yet assigned -> pass original bytes through untouched
Unassigned = _Sentinel("Unassigned")


def go_format_float(f: float) -> str:
    """Format a float the way Go's encoding/json does (ES6-style).

    Integral floats print without a decimal point; very large/small use
    exponent notation with the same thresholds as Go (abs < 1e-6 or >= 1e21).
    """
    if math.isnan(f) or math.isinf(f):
        raise BloblangError("unsupported float value: %r" % f)
    if f == 0:
        return "0"
    a = abs(f)
    if 1e-6 <= a < 1e21:
        if f == int(f) and a < 1e16:
            return str(int(f))
        out = repr(f)
        if "e" in out or "E" in out:
            # repr chose exponent inside the fixed-notation window; expand
            # exactly (shortest repr digits, shifted) via Decimal
            import decimal

            out = format(decimal.Decimal(out), "f")
            if "." in out:
                out = out.rstrip("0").rstrip(".")
        return out
    # exponent form, Go style: d.ddde+XX (no leading zero in exponent pad to 2)
    out = repr(f)
    if "e" not in out and "E" not in out:
        out = format(f, "e")
        mant, _, exp = out.partition("e")
        mant = mant.rstrip("0").rstrip(".")
        out = mant + "e" + exp
    # normalize exponent: Go prints e+21 / e-07
    mant, _, exp = out.partition("e")
    sign = "+"
    if exp.startswith("-"):
        sign, exp = "-", exp[1:]
    elif exp.startswith("+"):
        exp = exp[1:]
    if len(exp) < 2:
        exp = "0" + exp
    return f"{mant}e{sign}{exp}"


def _canon(value: Any) -> Any:
    if isinstance(value, bytes):
        return value.decode("utf-8", errors="replace")
    if isinstance(value, dict):
        return {str(k): _canon(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_canon(v) for v in value]
    return value


class _GoFloat(float):
    """float whose json repr matches Go."""


def canonical_json(value: Any) -> str:
    """Serialize like Go json.Encoder with SetEscapeHTML(false), sorted keys."""
    value = _canon(value)

    def default(o):  # pragma: no cover
        raise BloblangError(f"cannot serialize {type(o).__name__}")

    out = json.dumps(
        value,
        sort_keys=True,
        separators=(",", ":"),
        ensure_ascii=False,
        default=default,
    )
    return out


# json.dumps cannot be overridden per-float easily; monkeypatch via a scanner
# would be fragile. Instead, encode with a custom encoder:
class _Encoder(json.JSONEncoder):
    def __init__(self, **kw):
        kw.setdefault("sort_keys", True)
        kw.setdefault("separators", (",", ":"))
        kw.setdefault("ensure_ascii", False)
        super().__init__(**kw)

    def iterencode(self, o, _one_shot=False):
        for chunk in super().iterencode(o, _one_shot=False):
            yield chunk

    def default(self, o):
        raise BloblangError(f"cannot serialize {type(o).__name__}")


def _encode(value: Any) -> str:
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return go_format_float(value)
    if isinstance(value, str):
        return json.dumps(value, ensure_ascii=False)
    if isinstance(value, bytes):
        return json.dumps(value.decode("utf-8", errors="replace"), ensure_ascii=False)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_encode(v) for v in value) + "]"
    if isinstance(value, dict):
        items = sorted((str(k), v) for k, v in value.items())
        return (
            "{"
            + ",".join(
                json.dumps(k, ensure_ascii=False) + ":" + _encode(v)
                for k, v in items
            )
            + "}"
        )
    raise BloblangError(f"cannot serialize {type(value).__name__}")


def serialize(value: Any) -> str:
    """Canonical Go-compatible JSON text for *value*."""
    return _encode(value)


def to_string(value: Any) -> str:
    """Go IToString semantics (type_helpers.go behavior, re-derived)."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        return go_format_float(value)
    if isinstance(value, int):
        return str(value)
    if isinstance(value, str):
        return value
    if isinstance(value, bytes):
        return value.decode("utf-8", errors="replace")
    return serialize(value)


def to_bytes(value: Any) -> bytes:
    if isinstance(value, bytes):
        return value
    return to_string(value).encode("utf-8")


def get_number(value: Any) -> float:
    """Go IGetNumber: numbers pass; numeric strings parse; else error."""
    if isinstance(value, bool):
        raise BloblangError("expected number value, found bool")
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, (str, bytes)):
        s = value.decode("utf-8") if isinstance(value, bytes) else value
        try:
            return float(s)
        except ValueError:
            raise BloblangError(f"expected number value, found string: {s!r}")
    raise BloblangError(f"expected number value, found {type_name(value)}")


def get_int(value: Any) -> int:
    n = get_number(value)
    if n != int(n):
        raise BloblangError(f"expected integer value, found {n}")
    return int(n)


def get_bool(value: Any) -> bool:
    if isinstance(value, bool):
        return value
    raise BloblangError(f"expected bool value, found {type_name(value)}")


def get_string(value: Any) -> str:
    if isinstance(value, str):
        return value
    if isinstance(value, bytes):
        return value.decode("utf-8", errors="replace")
    raise BloblangError(f"expected string value, found {type_name(value)}")


def type_name(value: Any) -> str:
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, int) or isinstance(value, float):
        return "number"
    if isinstance(value, (str, bytes)):
        return "string"
    if isinstance(value, list):
        return "array"
    if isinstance(value, dict):
        return "object"
    return type(value).__name__


def restrict_for_comparison(value: Any) -> Any:
    """arithmetic.go restrictForComparison: numbers->float, bytes->str."""
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, bytes):
        return value.decode("utf-8", errors="replace")
    return value


def values_equal(a: Any, b: Any) -> bool:
    a = restrict_for_comparison(a)
    b = restrict_for_comparison(b)
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if type(a) is not type(b):
        # float vs float only after restriction; different types never equal
        return False
    return a == b


def parse_json(raw: Any) -> Any:
    s = raw.decode("utf-8") if isinstance(raw, bytes) else raw
    try:
        return json.loads(s)
    except Exception as exc:
        raise BloblangError(f"failed to parse JSON document: {exc}")
