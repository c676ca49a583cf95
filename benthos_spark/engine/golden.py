"""Golden-test runner for the reference's own config-test corpus.

Re-implements the ``benthos test`` runner contract
(/root/reference/lib/service/test/case.go:16-56 Case schema,
processors_provider.go target selection, condition.go assertions) so the
reference's ``config/test/*_benthos_test.yaml`` cases run unmodified as the
correctness oracle for our processor kernels.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

from ..bloblang.interp import Interpreter, Part
from .processors import Env, Resources, build_processor, execute_all

REFERENCE_TEST_DIR = "/root/reference/config/test"


@dataclass
class CaseResult:
    config: str
    name: str
    ok: bool
    detail: str = ""


@dataclass
class GoldenCase:
    name: str
    target: str
    input_batch: List[Dict[str, Any]]
    output_batches: List[List[Dict[str, Any]]]
    environment: Dict[str, str] = field(default_factory=dict)


def _resolve_pointer(config: Dict[str, Any], pointer: str) -> Any:
    cur: Any = config
    for seg in pointer.strip("/").split("/"):
        if isinstance(cur, list):
            cur = cur[int(seg)]
        else:
            cur = cur[seg]
    return cur


def load_cases(test_file: str) -> tuple[Dict[str, Any], List[GoldenCase]]:
    base = test_file.replace("_benthos_test.yaml", ".yaml")
    with open(base) as f:
        config = yaml.safe_load(f)
    with open(test_file) as f:
        spec = yaml.safe_load(f)
    cases = []
    for t in spec.get("tests", []):
        cases.append(
            GoldenCase(
                name=t.get("name", "unnamed"),
                target=t.get("target_processors", "/pipeline/processors"),
                input_batch=t.get("input_batch", []),
                output_batches=t.get("output_batches", []),
                environment=t.get("environment", {}) or {},
            )
        )
    return config, cases


def run_case(config: Dict[str, Any], case: GoldenCase) -> CaseResult:
    target = _resolve_pointer(config, case.target)
    if isinstance(target, dict):
        target = [target]
    procs = [build_processor(p) for p in target]
    env = Env(interp=Interpreter(), resources=Resources())
    batch = [
        Part(
            str(m.get("content", "")).encode("utf-8"),
            {str(k): str(v) for k, v in (m.get("metadata") or {}).items()},
        )
        for m in case.input_batch
    ]
    got = execute_all(procs, batch, env)
    want = case.output_batches
    if len(got) != len(want):
        return CaseResult(
            "", case.name, False,
            f"batch count mismatch: got {len(got)}, want {len(want)}",
        )
    for bi, (gb, wb) in enumerate(zip(got, want)):
        if len(gb) != len(wb):
            return CaseResult(
                "", case.name, False,
                f"batch {bi} part count mismatch: got {len(gb)}, want {len(wb)}"
                f" (got contents: {[p.content[:80] for p in gb]})",
            )
        for pi, (gp, cond_map) in enumerate(zip(gb, wb)):
            for cond, arg in (cond_map or {}).items():
                if cond == "content_equals":
                    wanted = str(arg)
                    actual = gp.content.decode("utf-8", errors="replace")
                    # YAML block scalars carry a trailing newline; the Go
                    # runner compares after the YAML parse, same as us.
                    if actual != wanted and actual != wanted.rstrip("\n"):
                        return CaseResult(
                            "", case.name, False,
                            f"batch {bi} part {pi} content mismatch:\n"
                            f"  got:  {actual!r}\n  want: {wanted!r}",
                        )
                elif cond == "content_matches":
                    import re

                    if not re.search(str(arg), gp.content.decode("utf-8", "replace")):
                        return CaseResult(
                            "", case.name, False,
                            f"batch {bi} part {pi} does not match {arg!r}",
                        )
                elif cond == "metadata_equals":
                    for k, v in (arg or {}).items():
                        if gp.meta.get(str(k)) != str(v):
                            return CaseResult(
                                "", case.name, False,
                                f"batch {bi} part {pi} metadata {k!r}: "
                                f"got {gp.meta.get(str(k))!r}, want {v!r}",
                            )
                else:
                    return CaseResult("", case.name, False, f"unknown assertion {cond}")
    return CaseResult("", case.name, True)


def run_corpus(test_dir: str = REFERENCE_TEST_DIR) -> List[CaseResult]:
    results: List[CaseResult] = []
    for root, _dirs, files in os.walk(test_dir):
        for fn in sorted(files):
            if not fn.endswith("_benthos_test.yaml"):
                continue
            path = os.path.join(root, fn)
            try:
                config, cases = load_cases(path)
            except Exception as exc:
                results.append(CaseResult(fn, "<load>", False, str(exc)))
                continue
            for case in cases:
                try:
                    r = run_case(config, case)
                except Exception as exc:
                    r = CaseResult(fn, case.name, False, f"exception: {exc}")
                r.config = fn
                results.append(r)
    return results
