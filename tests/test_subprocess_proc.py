"""subprocess processor (lib/processor/subprocess.go semantics): long-lived
child per worker, line-per-line protocol, stderr -> flagged part with
original content, restart after child exit, trailing-empty-line rule —
replaying the reference's own sed/cat test vectors (subprocess_test.go)."""

import pytest

from benthos_spark.bloblang.interp import Interpreter
from benthos_spark.engine.processors import Env, Part, build_processor


def run(proc, contents):
    env = Env(interp=Interpreter())
    [batch] = proc.process([Part(c, {}) for c in contents], env)
    return batch


class TestSubprocess:
    def test_sed_vectors(self):
        # subprocess_test.go TestSubprocessWithSed
        proc = build_processor(
            {"subprocess": {"name": "sed", "args": ["s/foo/bar/g", "-u"]}}
        )
        got = run(proc, [b"hello foo world", b"hello baz world", b"foo"])
        assert [p.content for p in got] == [
            b"hello bar world", b"hello baz world", b"bar",
        ]

    def test_cat_multiline_preserves_trailing_empty(self):
        # subprocess_test.go TestSubprocessWithCat + line-break doc rule
        proc = build_processor({"subprocess": {"name": "cat"}})
        got = run(proc, [b"line1\nline2", b"line\n", b"single"])
        assert [p.content for p in got] == [b"line1\nline2", b"line\n", b"single"]

    def test_stderr_flags_part_and_keeps_original(self):
        script = 'while read l; do if [ "$l" = "bad" ]; then echo "nope" >&2; else echo "ok:$l"; fi; done'
        proc = build_processor(
            {"subprocess": {"name": "sh", "args": ["-c", script]}}
        )
        got = run(proc, [b"fine", b"bad", b"alsofine"])
        assert got[0].content == b"ok:fine"
        assert got[1].content == b"bad"  # original kept
        assert got[1].meta.get("benthos_processing_failed") or got[1].meta.get("error")
        assert got[2].content == b"ok:alsofine"

    def test_restart_after_child_exit(self):
        # child exits after first line; the processor must restart it
        script = "read l; echo got:$l"
        proc = build_processor(
            {"subprocess": {"name": "sh", "args": ["-c", script]}}
        )
        got1 = run(proc, [b"a"])
        got2 = run(proc, [b"b"])
        assert got1[0].content == b"got:a"
        assert got2[0].content == b"got:b"

    def test_parts_selection(self):
        proc = build_processor(
            {"subprocess": {"name": "sed", "args": ["s/x/y/g", "-u"], "parts": [1]}}
        )
        got = run(proc, [b"xx", b"xx", b"xx"])
        assert [p.content for p in got] == [b"xx", b"yy", b"xx"]

    def test_rowlocal_plan_on_spark(self, spark):
        from benthos_spark.engine.spark_exec import (
            frame_from_strings,
            run_frame_pipeline,
        )

        frame = frame_from_strings(spark, [b"foo one", b"two foo"])
        out = run_frame_pipeline(
            frame, [{"subprocess": {"name": "sed", "args": ["s/foo/bar/g", "-u"]}}]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan and "Exchange" not in plan
        contents = sorted(bytes(r["content"]) for r in out.collect())
        assert contents == [b"bar one", b"two bar"]

    def test_spec_lint_accepts_subprocess(self):
        from benthos_spark.engine.spec import lint_spec

        assert lint_spec(
            {"input": {"parquet": {"path": "/x"}},
             "pipeline": {"processors": [{"subprocess": {"name": "cat"}}]},
             "output": {"memory": {}}}
        ) == []
