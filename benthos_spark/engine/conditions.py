"""Condition registry: Check(batch, index) -> bool.

Re-implements the observable semantics of the reference's condition types
(/root/reference/lib/condition/constructor.go:43-62 — behavior only).
On the Spark side each condition also compiles to a boolean Column where
statically possible (see engine.compiler).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

from ..bloblang.interp import FAIL_META_KEY, Interpreter, Part
from ..bloblang.parser import parse_mapping
from ..bloblang.values import BloblangError, Delete, get_string, parse_json, values_equal


class Condition:
    def check(self, parts: List[Part], index: int, interp: Interpreter) -> bool:
        raise NotImplementedError


class StaticCond(Condition):
    def __init__(self, value: bool):
        self.value = bool(value)

    def check(self, parts, index, interp):
        return self.value


class TextCond(Condition):
    """text condition: operator over the raw payload string."""

    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "equals_cs")
        self.arg = str(conf.get("arg", ""))

    def check(self, parts, index, interp):
        s = parts[index].content.decode("utf-8", errors="replace")
        op, arg = self.operator, self.arg
        if op == "equals_cs" or op == "equals":
            return s == arg if op == "equals_cs" else s.lower() == arg.lower()
        if op == "contains_cs":
            return arg in s
        if op == "contains":
            return arg.lower() in s.lower()
        if op == "prefix_cs":
            return s.startswith(arg)
        if op == "prefix":
            return s.lower().startswith(arg.lower())
        if op == "suffix_cs":
            return s.endswith(arg)
        if op == "suffix":
            return s.lower().endswith(arg.lower())
        if op == "regexp_partial":
            return re.search(arg, s) is not None
        if op == "regexp_exact":
            return re.fullmatch(arg, s) is not None
        if op == "enum":
            return s in [a.strip() for a in arg.split(",")]
        raise ValueError(f"unknown text operator {op}")


class NumberCond(Condition):
    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "equals")
        self.arg = float(conf.get("arg", 0))

    def check(self, parts, index, interp):
        try:
            n = float(parts[index].content)
        except ValueError:
            return False
        if self.operator == "equals":
            return n == self.arg
        if self.operator == "greater_than":
            return n > self.arg
        if self.operator == "less_than":
            return n < self.arg
        raise ValueError(f"unknown number operator {self.operator}")


class MetadataCond(Condition):
    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "equals_cs")
        self.key = str(conf.get("key", ""))
        self.arg = conf.get("arg", "")

    def check(self, parts, index, interp):
        v = parts[index].meta.get(self.key)
        if v is None:
            return False
        op, arg = self.operator, str(self.arg)
        if op == "equals_cs" or op == "equals":
            return v == arg if op == "equals_cs" else v.lower() == arg.lower()
        if op == "exists":
            return True
        if op == "contains":
            return arg in v
        if op == "prefix":
            return v.startswith(arg)
        if op == "regexp_partial":
            return re.search(arg, v) is not None
        if op == "enum":
            return v in (self.arg if isinstance(self.arg, list) else arg.split(","))
        if op == "greater_than":
            try:
                return float(v) > float(arg)
            except ValueError:
                return False
        if op == "less_than":
            try:
                return float(v) < float(arg)
            except ValueError:
                return False
        raise ValueError(f"unknown metadata operator {op}")


class JsonCond(Condition):
    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "exists")
        self.path = str(conf.get("path", ""))
        self.arg = conf.get("arg")

    def check(self, parts, index, interp):
        try:
            doc = parts[index].doc()
        except BloblangError:
            return False
        cur: Any = doc
        if self.path:
            for seg in self.path.split("."):
                if isinstance(cur, dict) and seg in cur:
                    cur = cur[seg]
                else:
                    return False if self.operator == "exists" else False
        if self.operator == "exists":
            return True
        if self.operator == "equals":
            return values_equal(cur, self.arg)
        if self.operator == "equals_fold":
            try:
                return get_string(cur).lower() == get_string(self.arg).lower()
            except BloblangError:
                return False
        if self.operator == "contains":
            if isinstance(cur, list):
                return any(values_equal(x, self.arg) for x in cur)
            if isinstance(cur, str):
                return str(self.arg) in cur
            return False
        raise ValueError(f"unknown json operator {self.operator}")


class BloblangCond(Condition):
    def __init__(self, src: str):
        self.ast = parse_mapping(f"root = {src}" if "\n" not in src.strip() else src)

    def check(self, parts, index, interp):
        out = interp.map_part(self.ast, parts, index)
        if out is Delete:
            return False
        try:
            return parse_json(out.content) is True
        except BloblangError:
            return out.content == b"true"


class CountCond(Condition):
    """Stateful: true every Nth message (lib/condition behavior)."""

    _counters: Dict[int, int] = {}

    def __init__(self, conf: Dict[str, Any]):
        self.arg = int(conf.get("arg", 100))
        self.count = 0

    def check(self, parts, index, interp):
        self.count += 1
        if self.count >= self.arg:
            self.count = 0
            return True
        return False


class ProcessorFailedCond(Condition):
    def __init__(self, conf):
        pass

    def check(self, parts, index, interp):
        return FAIL_META_KEY in parts[index].meta


class BoolCombCond(Condition):
    def __init__(self, op: str, children: List[Condition]):
        self.op = op
        self.children = children

    def check(self, parts, index, interp):
        if self.op == "and":
            return all(c.check(parts, index, interp) for c in self.children)
        if self.op == "or":
            return any(c.check(parts, index, interp) for c in self.children)
        if self.op == "not":
            return not self.children[0].check(parts, index, interp)
        if self.op == "xor":
            return sum(c.check(parts, index, interp) for c in self.children) == 1
        if self.op == "all":
            return all(
                c.check(parts, i, interp)
                for c in self.children
                for i in range(len(parts))
            )
        if self.op == "any":
            return any(
                c.check(parts, i, interp)
                for c in self.children
                for i in range(len(parts))
            )
        raise ValueError(f"unknown combinator {self.op}")


class CheckFieldCond(Condition):
    """check_field: apply a child condition to a json path / metadata value."""

    def __init__(self, conf: Dict[str, Any]):
        self.path = str(conf.get("path", ""))
        self.metadata_key = str(conf.get("metadata_key", ""))
        self.child = build_condition(conf.get("condition", {"static": True}))

    def check(self, parts, index, interp):
        part = parts[index]
        if self.metadata_key:
            v = part.meta.get(self.metadata_key)
            if v is None:
                return False
            content = v.encode()
        else:
            try:
                doc = part.doc()
            except BloblangError:
                return False
            cur: Any = doc
            for seg in self.path.split("."):
                if isinstance(cur, dict) and seg in cur:
                    cur = cur[seg]
                else:
                    return False
            from ..bloblang.interp import to_bytes_payload

            content = to_bytes_payload(cur)
        fake = Part(content, dict(part.meta))
        return self.child.check([fake], 0, interp)


class JMESPathCond(Condition):
    """jmespath: query must evaluate to boolean true
    (lib/condition/jmespath.go:127-160; parse/search errors -> False)."""

    def __init__(self, conf: Any):
        import jmespath as _jp

        if isinstance(conf, str):
            conf = {"query": conf}
        self.query = _jp.compile(conf.get("query", ""))
        self.part = int(conf.get("part", 0))

    def check(self, parts, index, interp):
        i = self.part if self.part >= 0 else len(parts) + self.part
        if i < 0 or i >= len(parts):
            return False
        try:
            doc = parse_json(parts[i].content)
            result = self.query.search(doc)
        except Exception:
            return False
        return result is True


class JSONSchemaCond(Condition):
    """json_schema: True iff the document validates
    (lib/condition/jsonschema.go)."""

    def __init__(self, conf: Dict[str, Any]):
        import jsonschema as _js

        schema = conf.get("schema")
        if schema is None and conf.get("schema_path"):
            path = str(conf["schema_path"])
            if not path.startswith("file://"):
                raise ValueError("schema_path must start with file://")
            with open(path[len("file://"):]) as f:
                schema = f.read()
        if isinstance(schema, (str, bytes)):
            schema = parse_json(schema if isinstance(schema, bytes) else schema.encode())
        self.validator = _js.Draft7Validator(schema)
        self.part = int(conf.get("part", 0))

    def check(self, parts, index, interp):
        i = self.part if self.part >= 0 else len(parts) + self.part
        if i < 0 or i >= len(parts):
            return False
        try:
            doc = parse_json(parts[i].content)
        except Exception:
            return False
        return not any(True for _ in self.validator.iter_errors(doc))


class CheckInterpolationCond(Condition):
    """check_interpolation: resolve a ${! } interpolated string, then test the
    result against a child condition (lib/condition/check_interpolation.go)."""

    def __init__(self, conf: Dict[str, Any]):
        from ..bloblang.interp import InterpolatedField

        self.field = InterpolatedField(str(conf.get("value", "")))
        self.child = build_condition(conf.get("condition", {"static": False}))

    def check(self, parts, index, interp):
        try:
            resolved = self.field.resolve(interp, parts, index)
        except BloblangError:
            return False
        fake = Part(resolved.encode(), dict(parts[index].meta))
        return self.child.check([fake], 0, interp)


class ResourceCond(Condition):
    """resource: delegate to a named condition in the resource registry
    (lib/condition/resource.go). Registry reachable via the interpreter's
    bound resources (set by engine.processors.Env)."""

    def __init__(self, conf: Any):
        self.target = conf if isinstance(conf, str) else conf.get("name", "")

    def check(self, parts, index, interp):
        resources = getattr(interp, "resources", None)
        if resources is None or self.target not in resources.conditions:
            raise ValueError(f"condition resource {self.target} not found")
        return resources.conditions[self.target].check(parts, index, interp)


def build_condition(conf: Any) -> Condition:
    """Build a condition from its YAML dict {type: {...}} or {type, ...}."""
    if isinstance(conf, Condition):
        return conf
    if not isinstance(conf, dict):
        raise ValueError(f"invalid condition config: {conf!r}")
    conf = dict(conf)
    ctype = conf.pop("type", None)
    if ctype is None:
        if len(conf) != 1:
            raise ValueError(f"ambiguous condition config: {conf!r}")
        ctype, body = next(iter(conf.items()))
    else:
        body = conf.get(ctype, conf)
    if ctype == "static":
        return StaticCond(body if isinstance(body, bool) else body.get("value", False))
    if ctype == "text":
        return TextCond(body)
    if ctype == "number":
        return NumberCond(body)
    if ctype == "metadata":
        return MetadataCond(body)
    if ctype == "json":
        return JsonCond(body)
    if ctype == "bloblang":
        return BloblangCond(body if isinstance(body, str) else body.get("query", ""))
    if ctype == "count":
        return CountCond(body if isinstance(body, dict) else {"arg": body})
    if ctype == "processor_failed":
        return ProcessorFailedCond(body)
    if ctype == "check_field":
        return CheckFieldCond(body)
    if ctype == "check_interpolation":
        return CheckInterpolationCond(body)
    if ctype == "jmespath":
        return JMESPathCond(body)
    if ctype == "json_schema":
        return JSONSchemaCond(body)
    if ctype == "resource":
        return ResourceCond(body)
    if ctype in ("and", "or", "xor"):
        return BoolCombCond(ctype, [build_condition(c) for c in body])
    if ctype == "not":
        return BoolCombCond("not", [build_condition(body)])
    if ctype in ("all", "any"):
        return BoolCombCond(ctype, [build_condition(body)])
    raise ValueError(f"unknown condition type {ctype}")
