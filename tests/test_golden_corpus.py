"""Run the reference's own config-test corpus (config/test/*_benthos_test.yaml)
through our processor kernels — the primary correctness oracle (SURVEY.md §5)."""

import os

import pytest

from benthos_spark.engine.golden import REFERENCE_TEST_DIR, load_cases, run_case


def _collect():
    cases = []
    if not os.path.isdir(REFERENCE_TEST_DIR):
        return cases
    for root, _dirs, files in os.walk(REFERENCE_TEST_DIR):
        for fn in sorted(files):
            if fn.endswith("_benthos_test.yaml"):
                path = os.path.join(root, fn)
                config, cs = load_cases(path)
                for c in cs:
                    cases.append(pytest.param(config, c, id=f"{fn}::{c.name}"))
    return cases


_CASES = _collect()


@pytest.mark.skipif(not _CASES, reason="reference corpus not available")
@pytest.mark.parametrize("config,case", _CASES)
def test_golden_case(config, case):
    result = run_case(config, case)
    assert result.ok, result.detail
