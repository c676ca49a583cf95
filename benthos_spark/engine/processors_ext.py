"""Extended processor kernels: enrichment maps (process_map / process_dag /
workflow) and parsing codecs (grok-lite, parse_log, xml).

Behavior re-derived from /root/reference/lib/processor/{process_map.go:21-80,
process_dag.go:21-88, workflow.go:312, grok.go:154, parse_log.go:243-296,
xml.go:135} — no code reuse. On the Spark hot path the same semantics land
as column DAGs / joins (benthos_spark.streaming.enrich); these kernels serve
the schemaless frame mode and golden tests.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

from ..bloblang.interp import InterpolatedField, Part, to_bytes_payload
from ..bloblang.values import BloblangError, parse_json, serialize
from .conditions import build_condition
from .processors import (
    Batch,
    Processor,
    _REGISTRY,
    _get_in,
    _set_in,
    build_processor,
    execute_all,
    flag_err,
)


class ProcessMapProc(Processor):
    """process_map: premap paths -> child processors on the extracted doc ->
    postmap results back into the original doc; conditions gate per part."""

    name = "process_map"

    def __init__(self, conf: Dict[str, Any]):
        self.premap = {str(k): str(v) for k, v in (conf.get("premap") or {}).items()}
        self.premap_optional = {
            str(k): str(v) for k, v in (conf.get("premap_optional") or {}).items()
        }
        self.postmap = {str(k): str(v) for k, v in (conf.get("postmap") or {}).items()}
        self.postmap_optional = {
            str(k): str(v) for k, v in (conf.get("postmap_optional") or {}).items()
        }
        self.procs = [build_processor(p) for p in conf.get("processors", [])]
        self.conditions = [build_condition(c) for c in conf.get("conditions", [])]

    def process(self, batch: Batch, env) -> List[Batch]:
        out: Batch = []
        for i, part in enumerate(batch):
            if self.conditions and not all(
                c.check(batch, i, env.interp) for c in self.conditions
            ):
                out.append(part)
                continue
            try:
                doc = parse_json(part.content)
            except BloblangError as exc:
                out.append(flag_err(part.copy(), str(exc)))
                continue
            # premap: build the child payload
            payload: Any = {}
            failed = False
            for target, source in {**self.premap, **self.premap_optional}.items():
                src_segs = [] if source in (".", "") else source.split(".")
                val = _get_in(doc, src_segs) if src_segs else doc
                if val is None and target in self.premap and source not in (".", ""):
                    out.append(flag_err(part.copy(), f"premap path {source} not found"))
                    failed = True
                    break
                if target in (".", ""):
                    payload = val
                else:
                    payload = _set_in(payload if isinstance(payload, dict) else {}, target.split("."), val)
            if failed:
                continue
            sub = Part(to_bytes_payload(payload), dict(part.meta))
            results = execute_all(self.procs, [sub], env)
            flat = [p for b in results for p in b]
            if not flat:
                out.append(part)
                continue
            try:
                child = parse_json(flat[0].content)
            except BloblangError as exc:
                out.append(flag_err(part.copy(), str(exc)))
                continue
            new_doc = doc
            for target, source in {**self.postmap, **self.postmap_optional}.items():
                src_segs = [] if source in (".", "") else source.split(".")
                val = _get_in(child, src_segs) if src_segs else child
                if val is None and target in self.postmap and source not in (".", ""):
                    new_doc = None
                    out.append(flag_err(part.copy(), f"postmap path {source} not found"))
                    break
                new_doc = _set_in(new_doc, target.split("."), val) if target not in (".", "") else val
            if new_doc is not None:
                out.append(Part(to_bytes_payload(new_doc), dict(part.meta)))
        return [out] if out else []


class ProcessDagProc(Processor):
    """process_dag / workflow: named process_map stages with dependencies,
    executed in topological order (the reference parallelizes independent
    stages across goroutines; Catalyst does the same for independent column
    subtrees on the native path — here order is all that matters)."""

    name = "process_dag"

    def __init__(self, conf: Dict[str, Any]):
        self.stages: Dict[str, ProcessMapProc] = {}
        deps: Dict[str, List[str]] = {}
        for name, stage_conf in conf.items():
            stage_conf = dict(stage_conf)
            deps[name] = list(stage_conf.pop("dependencies", []) or [])
            self.stages[name] = ProcessMapProc(stage_conf)
        self.order = _topo_sort(deps)

    def process(self, batch: Batch, env) -> List[Batch]:
        batches = [batch]
        for name in self.order:
            nxt: List[Batch] = []
            for b in batches:
                nxt.extend(self.stages[name].process(b, env))
            batches = nxt
        return batches


def _topo_sort(deps: Dict[str, List[str]]) -> List[str]:
    order: List[str] = []
    seen: Dict[str, int] = {}

    def visit(n: str):
        state = seen.get(n, 0)
        if state == 1:
            raise ValueError(f"process_dag cycle at {n}")
        if state == 2:
            return
        seen[n] = 1
        for d in deps.get(n, []):
            if d in deps:
                visit(d)
        seen[n] = 2
        order.append(n)

    for n in sorted(deps):
        visit(n)
    return order


# Standard grok pattern library (the well-known public logstash-style
# definitions — names and sub-pattern composition are the public contract).
_GROK_PATTERNS = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?<![0-9.+-])(?>[+-]?(?:(?:[0-9]+(?:\.[0-9]+)?)|(?:\.[0-9]+)))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "IPV4": (
        r"(?<![0-9])(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(?![0-9])"
    ),
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|%{IPV4})",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": (
        r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(?:\.?|\b)"
    ),
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}",
    "MONTH": (
        r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|"
        r"Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|"
        r"Dec(?:ember)?)\b"
    ),
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "YEAR": r"(?>\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|"
        r"ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|"
        r"[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"
    ),
    "QUOTEDSTRING": r'(?>(?<!\\)(?>"(?>\\.|[^\\"]+)+"|""|(?>\'(?>\\.|[^\\\']+)+\')|\'\'|(?>`(?>\\.|[^\\`]+)+`)|``))',
    "QS": r"%{QUOTEDSTRING}",
    # --- numbers / identifiers ------------------------------------------
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "BASE16NUM": r"(?<![0-9A-Fa-f])(?:[+-]?(?:0x)?(?:[0-9A-Fa-f]+))",
    "BASE16FLOAT": (
        r"\b(?<![0-9A-Fa-f.])(?:[+-]?(?:0x)?(?:(?:[0-9A-Fa-f]+"
        r"(?:\.[0-9A-Fa-f]*)?)|(?:\.[0-9A-Fa-f]+)))\b"
    ),
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "CISCOMAC": r"(?:(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4})",
    "WINDOWSMAC": r"(?:(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2})",
    "COMMONMAC": r"(?:(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2})",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    # --- paths -----------------------------------------------------------
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?>[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "TTY": r"(?:/dev/(?:pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+))",
    # --- URIs ------------------------------------------------------------
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+\-.]+)+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT:port})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # --- dates / times ---------------------------------------------------
    "DAY": (
        r"\b(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|"
        r"Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)\b"
    ),
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "ISO8601_SECOND": r"(?:%{SECOND}|60)",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "TZ": r"(?:[PMCE][SD]T|UTC)",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822": r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG": r"%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    "HTTPDERROR_DATE": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    # --- syslog ----------------------------------------------------------
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGBASE": (
        r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?"
        r"%{SYSLOGHOST:logsource} %{SYSLOGPROG}:"
    ),
    "COMMONAPACHELOG": (
        r'%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} '
        r'\[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}'
        r'(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r'%{NUMBER:response} (?:%{NUMBER:bytes}|-)'
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w\[\]@.]+))?(?::(int|float|string))?\}")


def grok_to_regex(
    pattern: str,
    definitions: Dict[str, str] | None = None,
    casts: Dict[str, str] | None = None,
    _depth: int = 0,
) -> str:
    """Recursively expand %{NAME[:field[:cast]]} references against the
    custom definitions first, then the standard library (grok.go: user
    pattern_definitions shadow the defaults)."""
    if _depth > 25:
        raise ValueError("grok pattern recursion too deep")
    defs = definitions or {}

    def sub(m: re.Match) -> str:
        name, field, cast = m.group(1), m.group(2), m.group(3)
        base = defs.get(name, _GROK_PATTERNS.get(name))
        if base is None:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        inner = grok_to_regex(base, defs, casts, _depth + 1)
        if field:
            safe = re.sub(r"[^a-zA-Z0-9_]", "_", field)
            if cast is not None and casts is not None:
                # key by the sanitized name — that's what groupdict() and
                # the native field list carry
                casts[safe] = cast
            return f"(?P<{safe}>{inner})"
        return f"(?:{inner})"

    return _GROK_REF.sub(sub, pattern)


def grok_to_java(
    pattern: str, definitions: Dict[str, str] | None = None
) -> tuple:
    """Compile a grok pattern to a JAVA-regex string for the native
    (Catalyst) path: expand via :func:`grok_to_regex`, then convert Python
    ``(?P<name>...)`` named groups to plain capturing groups while recording
    each field's group INDEX (Spark's regex expressions address groups by
    number).  Returns ``(java_pattern, fields, casts)`` where ``fields`` is
    the ordered list of ``(field_name, group_index)``.

    Raises ValueError on constructs with no Java translation (named
    backreferences, conditionals, comments) — callers treat that as
    "use the frame kernel".  Everything the standard library emits
    (atomic groups, lookarounds, inline flags) is shared Python/Java
    syntax."""
    casts: Dict[str, str] = {}
    py = grok_to_regex(pattern, definitions, casts)
    re.compile(py)  # surface bad patterns here, not at executor time

    out = []
    fields = []  # (name, index) in group order
    idx = 0
    i, n = 0, len(py)
    in_class = False
    while i < n:
        ch = py[i]
        if ch == "\\" and i + 1 < n:
            out.append(py[i : i + 2])
            i += 2
            continue
        if in_class:
            out.append(ch)
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
            i += 1
            # leading ] or ^] is literal in a class
            if i < n and py[i] == "^":
                out.append("^")
                i += 1
            if i < n and py[i] == "]":
                out.append("]")
                i += 1
            continue
        if ch == "(":
            if py.startswith("(?P<", i):
                j = py.index(">", i)
                name = py[i + 4 : j]
                idx += 1
                fields.append((name, idx))
                out.append("(")
                i = j + 1
                continue
            if py.startswith("(?P=", i) or py.startswith("(?P>", i):
                raise ValueError("named backreference has no Java translation")
            if py.startswith("(?#", i) or py.startswith("(?(", i):
                raise ValueError("regex comment/conditional has no Java translation")
            if py.startswith("(?", i):
                out.append(ch)  # (?: (?= (?! (?> (?<= (?<! (?i) ... shared syntax
                i += 1
                continue
            idx += 1  # plain unnamed capturing group still counts in Java
            out.append(ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out), fields, casts


class GrokProc(Processor):
    """grok: extract named fields into a JSON object (grok.go semantics:
    captures stay STRINGS unless the pattern carries an explicit
    ``:int``/``:float`` cast; remove_empty_values and named_captures_only on
    by default; ``pattern_definitions`` shadow the standard library)."""

    name = "grok"

    def __init__(self, conf: Dict[str, Any]):
        pats = conf.get("patterns") or [conf.get("pattern", "")]
        defs = {str(k): str(v) for k, v in (conf.get("pattern_definitions") or {}).items()}
        self.casts: Dict[str, str] = {}
        self.regexes = [
            re.compile(grok_to_regex(p, defs, self.casts)) for p in pats if p
        ]
        self.named_only = bool(conf.get("named_captures_only", True))
        self.remove_empty = bool(conf.get("remove_empty_values", True))

    def process(self, batch: Batch, env) -> List[Batch]:
        out: Batch = []
        for part in batch:
            s = part.content.decode("utf-8", errors="replace")
            doc = None
            for rx in self.regexes:
                m = rx.search(s)
                if m:
                    doc = {}
                    for k, v in m.groupdict().items():
                        if v is None or (self.remove_empty and v == ""):
                            continue
                        cast = self.casts.get(k)
                        if cast == "int":
                            doc[k] = int(float(v))
                        elif cast == "float":
                            doc[k] = float(v)
                        else:
                            doc[k] = v
                    break
            if doc is None:
                out.append(flag_err(part.copy(), "grok: no pattern matched"))
            else:
                out.append(Part(to_bytes_payload(doc), dict(part.meta)))
        return [out]


def _maybe_number(s: str) -> Any:
    if re.fullmatch(r"[+-]?\d+", s):
        return int(s)
    if re.fullmatch(r"[+-]?\d+\.\d+", s):
        return float(s)
    return s


_RFC3164 = re.compile(
    r"^<(?P<priority>\d+)>(?P<timestamp>\w{3} [ \d]\d \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) (?:(?P<appname>[^:\[\s]+)(?:\[(?P<procid>\d+)\])?: ?)?(?P<message>.*)$"
)
_RFC5424 = re.compile(
    r"^<(?P<priority>\d+)>(?P<version>\d+) (?P<timestamp>\S+) (?P<hostname>\S+) "
    r"(?P<appname>\S+) (?P<procid>\S+) (?P<msgid>\S+) (?:\[(?P<structureddata>[^\]]*)\]|-)"
    r"(?: (?P<message>.*))?$"
)


class ParseLogProc(Processor):
    """parse_log: syslog rfc3164/rfc5424 -> JSON object (parse_log.go:243-296
    field names; severity/facility derived from priority)."""

    name = "parse_log"

    def __init__(self, conf: Dict[str, Any]):
        self.format = conf.get("format", "syslog_rfc5424")
        self.with_sev = bool(conf.get("with_severity", True))

    def process(self, batch: Batch, env) -> List[Batch]:
        rx = _RFC5424 if "5424" in self.format else _RFC3164
        out: Batch = []
        for part in batch:
            s = part.content.decode("utf-8", errors="replace").strip()
            m = rx.match(s)
            if not m:
                out.append(flag_err(part.copy(), f"{self.format}: parse failed"))
                continue
            doc: Dict[str, Any] = {}
            for k, v in m.groupdict().items():
                if v is None or k == "priority":
                    continue
                doc[k] = _maybe_number(v) if k in ("version", "procid") else v
            pri = int(m.group("priority"))
            if self.with_sev:
                doc["severity"] = pri % 8
                doc["facility"] = pri // 8
            doc["priority"] = pri
            out.append(Part(to_bytes_payload(doc), dict(part.meta)))
        return [out]


class XmlProc(Processor):
    """xml: to_json via ElementTree. Cast rules follow the mxj shape for
    simple documents (attributes prefixed '-', text as '#text', repeated
    children become arrays); exotic mxj behaviors flagged as deviations."""

    name = "xml"

    def __init__(self, conf: Dict[str, Any]):
        self.operator = conf.get("operator", "to_json")

    def process(self, batch: Batch, env) -> List[Batch]:
        import xml.etree.ElementTree as ET

        out: Batch = []
        for part in batch:
            try:
                root = ET.fromstring(part.content.decode("utf-8"))
            except ET.ParseError as exc:
                out.append(flag_err(part.copy(), f"xml parse failed: {exc}"))
                continue
            doc = {root.tag: _elem_to_obj(root)}
            out.append(Part(to_bytes_payload(doc), dict(part.meta)))
        return [out]


def _elem_to_obj(elem) -> Any:
    obj: Dict[str, Any] = {}
    for k, v in elem.attrib.items():
        obj[f"-{k}"] = v
    children: Dict[str, list] = {}
    for child in elem:
        children.setdefault(child.tag, []).append(_elem_to_obj(child))
    for tag, vals in children.items():
        obj[tag] = vals[0] if len(vals) == 1 else vals
    text = (elem.text or "").strip()
    if text and not obj:
        return _maybe_number(text)
    if text:
        obj["#text"] = text
    return obj if obj else None


class JMESPathProc(Processor):
    """jmespath: run a JMESPath query on the JSON document and REPLACE the
    payload with the result (lib/processor/jmespath.go:142-175); parse/search
    failures flag the part failed."""

    name = "jmespath"

    def __init__(self, conf: Any):
        import jmespath as _jp

        query = conf if isinstance(conf, str) else conf.get("query", "")
        self.query = _jp.compile(query)

    def process(self, batch: Batch, env) -> List[Batch]:
        out: Batch = []
        for part in batch:
            try:
                doc = parse_json(part.content)
            except Exception as exc:
                out.append(flag_err(part.copy(), f"failed to parse part into json: {exc}"))
                continue
            try:
                result = self.query.search(doc)
            except Exception as exc:
                out.append(flag_err(part.copy(), f"failed to search json: {exc}"))
                continue
            out.append(Part(to_bytes_payload(result), dict(part.meta)))
        return [out]


class JSONSchemaProc(Processor):
    """json_schema: validate the JSON document against a schema WITHOUT
    changing the payload (lib/processor/jsonschema.go:168-216); invalid parts
    carry the aggregated validation errors in the failure flag."""

    name = "json_schema"

    def __init__(self, conf: Dict[str, Any]):
        import jsonschema as _js

        schema = conf.get("schema")
        if schema is None and conf.get("schema_path"):
            path = str(conf["schema_path"])
            if not path.startswith("file://"):
                raise ValueError("schema_path must start with file:// (jsonschema.go:230)")
            with open(path[len("file://"):]) as f:
                schema = f.read()
        if isinstance(schema, (str, bytes)):
            schema = parse_json(schema if isinstance(schema, bytes) else schema.encode())
        self.validator = _js.Draft7Validator(schema)

    def process(self, batch: Batch, env) -> List[Batch]:
        out: Batch = []
        for part in batch:
            try:
                doc = parse_json(part.content)
            except Exception as exc:
                out.append(flag_err(part.copy(), f"failed to parse part into json: {exc}"))
                continue
            errs = sorted(self.validator.iter_errors(doc), key=lambda e: list(e.path))
            if errs:
                msg = ", ".join(
                    f"{'.'.join(str(s) for s in e.path) or '(root)'}: {e.message}"
                    for e in errs
                )
                out.append(flag_err(part.copy(), msg))
            else:
                out.append(part)
        return [out]


class AvroProc(Processor):
    """avro: to_json / from_json over textual|binary|single encodings
    (lib/processor/avro.go:78-170), backed by the self-contained codec in
    benthos_spark.formats.avro. Failures flag the part failed."""

    name = "avro"

    def __init__(self, conf: Dict[str, Any]):
        from ..formats.avro import Codec

        schema = conf.get("schema")
        if schema is None and conf.get("schema_path"):
            path = str(conf["schema_path"])
            if not path.startswith("file://"):
                raise ValueError("schema_path must start with file:// or http:// (avro.go:230)")
            with open(path[len("file://"):]) as f:
                schema = f.read()
        self.codec = Codec(schema)
        self.operator = conf.get("operator", "to_json")
        self.encoding = conf.get("encoding", "textual")
        if self.operator not in ("to_json", "from_json"):
            raise ValueError(f"operator not recognised: {self.operator}")

    def process(self, batch: Batch, env) -> List[Batch]:
        out: Batch = []
        for part in batch:
            try:
                if self.operator == "to_json":
                    native = self.codec.decode(part.content, self.encoding)
                    out.append(Part(to_bytes_payload(native), dict(part.meta)))
                else:
                    doc = parse_json(part.content)
                    out.append(
                        Part(self.codec.encode(doc, self.encoding), dict(part.meta))
                    )
            except Exception as exc:
                out.append(flag_err(part.copy(), f"avro operator failed: {exc}"))
        return [out]


class SubprocessProc(Processor):
    """subprocess processor (lib/processor/subprocess.go): keep one child
    process alive per executor worker and, for each message part, pipe each
    LINE of its content to the child's stdin followed by a newline; a line
    returned over stdout replaces that line, a line over stderr flags the
    part as failed and keeps the original line (subprocess.go Send /
    ProcessMessage semantics, incl. the preserved trailing empty line and
    restart-on-exit). The child must flush per line (the reference
    documents the same requirement).

    Spark shape: the child lives for the lifetime of the Python worker (one
    per core, like the reference's one-per-pipeline), so per-line cost is a
    pipe round-trip, not a fork."""

    name = "subprocess"

    def __init__(self, conf: Dict[str, Any]):
        self.cmd = [str(conf.get("name", "cat"))] + [
            str(a) for a in (conf.get("args") or [])
        ]
        self.parts = [int(p) for p in (conf.get("parts") or [])]
        self.max_buffer = int(conf.get("max_buffer", 65536))
        self._proc = None
        self._out_buf = b""
        self._err_buf = b""
        self._closed: set = set()

    # -- child lifecycle -------------------------------------------------
    def _ensure(self):
        import subprocess as sp

        if self._proc is None or self._proc.poll() is not None:
            self._proc = sp.Popen(
                self.cmd, stdin=sp.PIPE, stdout=sp.PIPE, stderr=sp.PIPE,
                bufsize=0,
            )
            self._out_buf = b""
            self._err_buf = b""
            self._closed = set()

    def _read_line(self, timeout: float = 10.0) -> tuple:
        """(stdout_line | None, stderr_line | None) — whichever pipe
        produces a full line first (select-based, no deadlock)."""
        import os
        import select
        import time as _time

        p = self._proc
        deadline = _time.monotonic() + timeout
        while True:
            if b"\n" in self._out_buf:
                line, self._out_buf = self._out_buf.split(b"\n", 1)
                return line, None
            if b"\n" in self._err_buf:
                line, self._err_buf = self._err_buf.split(b"\n", 1)
                return None, line
            live = [f for f in (p.stdout, p.stderr) if f not in self._closed]
            if not live:
                # EOF on both pipes and no complete line buffered: a child
                # that exited right after responding must NOT lose its
                # answer, so EOF only raises here, never mid-drain
                raise IOError("subprocess closed its pipes")
            remaining = deadline - _time.monotonic()
            if remaining <= 0:
                raise TimeoutError("subprocess response timeout")
            rl, _, _ = select.select(live, [], [], min(remaining, 1.0))
            for f in rl:
                chunk = os.read(f.fileno(), self.max_buffer)
                if not chunk:
                    self._closed.add(f)
                elif f is p.stdout:
                    self._out_buf += chunk
                else:
                    self._err_buf += chunk

    def _send_once(self, line: bytes) -> bytes:
        self._ensure()
        self._proc.stdin.write(line + b"\n")
        self._proc.stdin.flush()
        out, err = self._read_line()
        if err is not None:
            raise RuntimeError(err.decode("utf-8", errors="replace"))
        return out

    def _send(self, line: bytes) -> bytes:
        try:
            return self._send_once(line)
        except (BrokenPipeError, IOError, TimeoutError):
            # child died (possibly mid-exit, so poll() hadn't noticed yet):
            # the reference restarts exited subprocesses — one restart+retry
            try:
                self._proc.kill()
            except Exception:
                pass
            self._proc = None
            return self._send_once(line)

    # -- processor -------------------------------------------------------
    def process(self, batch: Batch, env) -> List[Batch]:
        out: Batch = []
        targets = self.parts or range(len(batch))
        targets = {i % len(batch) for i in targets} if batch else set()
        for i, part in enumerate(batch):
            if i not in targets:
                out.append(part)
                continue
            pieces = part.content.split(b"\n")
            results = []
            failed = None
            for j, piece in enumerate(pieces):
                if piece == b"" and len(pieces) > 1 and j == len(pieces) - 1:
                    results.append(b"")  # preserved trailing empty line
                    continue
                try:
                    results.append(self._send(piece))
                except Exception as exc:  # stderr line / timeout / death
                    failed = str(exc)
                    results.append(piece)  # original line continues
            new = Part(b"\n".join(results), dict(part.meta))
            out.append(flag_err(new, failed) if failed else new)
        return [out]


class SQLProc(Processor):
    """sql (lib/processor/sql.go:270-305): one query per message batch
    against a target database; ``args`` are interpolation-resolved against
    part 0 (sql.go:266 ``v.String(0, result)``). ``result_codec:
    json_array`` replaces the batch with ONE part — part 0's metadata kept
    — whose content is the result rows as a JSON array of objects
    (sql.go:194-231; Go map marshaling sorts keys and formats numbers the
    Go way, which ``values.serialize`` reproduces); ``none`` executes the
    statement and leaves the batch unchanged. Any error flags EVERY part
    (sql.go:286-292) and the batch still flows.

    Backends are DBAPI modules resolved from ``driver``: ``sqlite``
    (stdlib, the in-sandbox test backend), ``mysql``/``postgres`` gated
    behind import-try (the reference links those two drivers). The query
    uses ``?`` placeholders like the reference; they are rewritten to
    ``%s`` for format-paramstyle drivers.

    Scale note (the Spark-first shape): a per-BATCH callout is
    driver-bounded by design — micro-batches arrive one at a time, so this
    kernel runs once per micro-batch, not per row. When the query is
    row-independent (a dimension lookup), the 100 TB shape is
    :func:`benthos_spark.ops.foreign.foreign_table` — load the result ONCE
    as a DataFrame and broadcast-join it, instead of re-querying per batch.
    """

    name = "sql"

    def __init__(self, conf: Dict[str, Any]):
        self.driver = str(conf.get("driver", "mysql"))
        self.dsn = str(conf.get("dsn", ""))
        self.query = str(conf.get("query", ""))
        self.args = [InterpolatedField(str(a)) for a in (conf.get("args") or [])]
        codec = str(conf.get("result_codec", "none"))
        if codec not in ("none", "json_array"):
            raise ValueError(f"unrecognised result codec: {codec}")
        self.codec = codec
        self._conn = None

    def _connect(self):
        if self._conn is not None:
            return self._conn
        # one driver table for the whole package: ops.foreign owns the
        # driver-name -> DBAPI dispatch (foreign_table shares it)
        from ..ops.foreign import _dbapi_connect

        try:
            self._conn = _dbapi_connect(self.driver, self.dsn)
        except ImportError as exc:  # pragma: no cover - driver not bundled
            raise RuntimeError(f"{self.driver} driver unavailable: {exc}")
        except ValueError as exc:
            raise RuntimeError(str(exc))
        return self._conn

    def _sql_text(self):
        mod = type(self._conn).__module__.split(".")[0]
        if mod in ("psycopg2", "MySQLdb"):  # pragma: no cover - format style
            return self.query.replace("?", "%s")
        return self.query

    def process(self, batch: Batch, env) -> List[Batch]:
        args = [a.resolve(env.interp, batch, 0) for a in self.args] if batch else [
            a.resolve(env.interp, [Part(b"", {})], 0) for a in self.args
        ]
        err = None
        out = list(batch)
        try:
            conn = self._connect()
            cur = conn.cursor()
            try:
                cur.execute(self._sql_text(), args)
                if self.codec == "json_array":
                    names = [d[0] for d in (cur.description or [])]
                    rows = cur.fetchall() if cur.description else []
                    j = [
                        {
                            n: (v.decode("utf-8", "replace") if isinstance(v, bytes) else v)
                            for n, v in zip(names, row)
                        }
                        for row in rows
                    ]
                    content = serialize(j).encode("utf-8")
                    keep = batch[0] if batch else Part(b"", {})
                    out = [Part(content, dict(keep.meta))]
                else:
                    conn.commit()
            finally:
                cur.close()
        except Exception as exc:
            err = f"failed to execute query: {exc}"
        if err is not None:
            out = [flag_err(Part(p.content, dict(p.meta)), err) for p in out]
        return [out]


_REGISTRY.update(
    {
        "process_map": ProcessMapProc,
        "process_dag": ProcessDagProc,
        "workflow": ProcessDagProc,
        "grok": GrokProc,
        "parse_log": ParseLogProc,
        "xml": XmlProc,
        "jmespath": JMESPathProc,
        "json_schema": JSONSchemaProc,
        "avro": AvroProc,
        "subprocess": SubprocessProc,
        "sql": SQLProc,
    }
)
