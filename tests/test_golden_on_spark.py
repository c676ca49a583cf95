"""The reference's own golden corpus executed THROUGH SPARK (frame mode,
Arrow-batched applyInPandas) — same kernels as the pure runner, but proving
the distributed execution path produces identical bytes."""

import os

import pytest

from benthos_spark.engine.golden import REFERENCE_TEST_DIR, load_cases
from benthos_spark.engine.spark_exec import FRAME_SCHEMA, run_frame_pipeline


def _collect():
    out = []
    if not os.path.isdir(REFERENCE_TEST_DIR):
        return out
    for root, _dirs, files in os.walk(REFERENCE_TEST_DIR):
        for fn in sorted(files):
            if fn.endswith("_benthos_test.yaml"):
                config, cases = load_cases(os.path.join(root, fn))
                for c in cases:
                    out.append(pytest.param(config, c, id=f"{fn}::{c.name}"))
    return out


_CASES = _collect()


def _resolve(config, pointer):
    cur = config
    for seg in pointer.strip("/").split("/"):
        cur = cur[int(seg)] if isinstance(cur, list) else cur[seg]
    return [cur] if isinstance(cur, dict) else cur


@pytest.mark.spark
@pytest.mark.skipif(not _CASES, reason="reference corpus not available")
@pytest.mark.parametrize("config,case", _CASES)
def test_golden_case_on_spark(spark, config, case):
    procs = _resolve(config, case.target)
    rows = [
        (
            0,
            i,
            str(m.get("content", "")).encode("utf-8"),
            {str(k): str(v) for k, v in (m.get("metadata") or {}).items()},
        )
        for i, m in enumerate(case.input_batch)
    ]
    df = spark.createDataFrame(rows, FRAME_SCHEMA)
    out = run_frame_pipeline(df, procs).collect()
    batches = {}
    for r in sorted(out, key=lambda r: (r["out_batch"], r["seq"])):
        batches.setdefault(r["out_batch"], []).append(r)
    got = [batches[k] for k in sorted(batches)]
    want = case.output_batches
    assert len(got) == len(want), f"batch count {len(got)} != {len(want)}"
    for gb, wb in zip(got, want):
        assert len(gb) == len(wb)
        for gp, cond_map in zip(gb, wb):
            for cond, arg in (cond_map or {}).items():
                if cond == "content_equals":
                    actual = bytes(gp["content"]).decode("utf-8", errors="replace")
                    wanted = str(arg)
                    assert actual == wanted or actual == wanted.rstrip("\n"), (
                        f"got {actual!r} want {wanted!r}"
                    )
                elif cond == "metadata_equals":
                    for k, v in (arg or {}).items():
                        assert dict(gp["meta"]).get(str(k)) == str(v)
