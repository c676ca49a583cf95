"""Sequence packing (ops/packer.py): exact span math on crafted corpora,
assignment-table tiling invariants, the pack_sequences spec stage, and
the no-single-task-sort plan shape."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.engine.spec import lint_spec, run_spec
from benthos_spark.ops.packer import pack_assignments, pack_sequences


def _docs(spark, counts):
    """doc i gets counts[i] single-char tokens (doc 0 -> 'w w w ...')."""
    rows = [[i, " ".join("w" for _ in range(c))] for i, c in enumerate(counts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
class TestPackSequences:
    def test_exact_spans(self, spark):
        # token stream: doc0 [0,7) doc1 [7,10) doc2 [10,25) doc3 [25,30)
        df = _docs(spark, [7, 3, 15, 5])
        got = {
            r["doc_id"]: r
            for r in pack_sequences(df, seq_len=10).collect()
        }
        # (begin_seq, end_seq, seq_offset, n_seqs)
        expect = {
            0: (0, 0, 0, 1),   # fits sequence 0
            1: (0, 0, 7, 1),   # finishes sequence 0 exactly
            2: (1, 2, 0, 2),   # spans sequences 1-2
            3: (2, 2, 5, 1),   # ends mid sequence 2
        }
        for did, (b, e, off, n) in expect.items():
            r = got[did]
            assert (r["begin_seq"], r["end_seq"], r["seq_offset"],
                    r["n_seqs"]) == (b, e, off, n), did

    def test_empty_docs_dropped(self, spark):
        df = _docs(spark, [4, 0, 6])
        got = pack_sequences(df, seq_len=5).collect()
        assert sorted(r["doc_id"] for r in got) == [0, 2]
        # doc 2 starts right after doc 0: stream is [0,4) then [4,10)
        by = {r["doc_id"]: r for r in got}
        assert by[2]["seq_offset"] == 4 and by[2]["n_seqs"] == 2

    def test_assignment_tiling(self, spark):
        counts = [7, 3, 15, 5, 1, 29, 10]
        L = 10
        spans = pack_sequences(_docs(spark, counts), seq_len=L)
        asg = pack_assignments(spans, seq_len=L).collect()
        total = sum(counts)
        # every doc's slices sum to its token count and start at offset 0
        by_doc = {}
        for r in asg:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert sorted(by_doc) == list(range(len(counts)))
        for did, rows in by_doc.items():
            rows.sort(key=lambda r: r["seq_id"])
            assert sum(r["len"] for r in rows) == counts[did]
            assert rows[0]["doc_offset"] == 0
            for a, b in zip(rows, rows[1:]):
                assert b["doc_offset"] == a["doc_offset"] + a["len"]
        # every sequence is tiled exactly: contiguous, full length except last
        by_seq = {}
        for r in asg:
            by_seq.setdefault(r["seq_id"], []).append(r)
        n_seqs = (total + L - 1) // L
        assert sorted(by_seq) == list(range(n_seqs))
        for sid, rows in by_seq.items():
            rows.sort(key=lambda r: r["offset_in_seq"])
            assert rows[0]["offset_in_seq"] == 0
            for a, b in zip(rows, rows[1:]):
                assert b["offset_in_seq"] == a["offset_in_seq"] + a["len"]
            want = L if sid < n_seqs - 1 else total - L * (n_seqs - 1)
            assert sum(r["len"] for r in rows) == want

    def test_no_single_partition_sort(self, spark):
        # the global cumsum must NOT funnel through one task
        df = _docs(spark, list(range(1, 40)))
        plan = pack_sequences(df, seq_len=16)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        # the running-sum window is keyed by the range partition id (the
        # range exchange itself sits behind global_running_sum's
        # localCheckpoint, so it doesn't appear in this plan)
        assert "windowspecdefinition(_pid" in plan

    def test_seq_len_validation(self, spark):
        with pytest.raises(ValueError):
            pack_sequences(_docs(spark, [3]), seq_len=0)


@pytest.mark.spark
class TestPackSpecStage:
    def test_annotate_stage(self, spark):
        rows = [[i, " ".join(f"w{j}" for j in range(6))] for i in range(5)]
        out = run_spec(spark, {
            "input": {"inline": {"rows": rows,
                                 "schema": "doc_id long, text string"}},
            "pipeline": {"processors": [
                {"pack_sequences": {"seq_len": 8}},
            ]},
            "output": {"memory": {}},
        })
        got = sorted(out.collect(), key=lambda r: r["doc_id"])
        assert len(got) == 5 and got[0]["text"].startswith("w0")
        # 6-token docs at L=8: doc0 [0,6) seq0; doc1 [6,12) spans 0-1 ...
        assert (got[0]["begin_seq"], got[0]["seq_offset"]) == (0, 0)
        assert (got[1]["begin_seq"], got[1]["n_seqs"]) == (0, 2)

    def test_explode_stage(self, spark):
        rows = [[i, " ".join("w" for _ in range(9))] for i in range(4)]
        out = run_spec(spark, {
            "input": {"inline": {"rows": rows,
                                 "schema": "doc_id long, text string"}},
            "pipeline": {"processors": [
                {"pack_sequences": {"seq_len": 12, "explode": True}},
            ]},
            "output": {"memory": {}},
        })
        got = out.collect()
        # 36 tokens -> 3 full sequences of 12
        assert sum(r["len"] for r in got) == 36
        assert set(r["seq_id"] for r in got) == {0, 1, 2}

    def test_after_mix_sources_no_column_collision(self, spark):
        # mix_sources already adds n_tokens/cum_tokens; the pack stage must
        # overwrite them (later stage wins), not emit duplicate columns
        rows = [[i, "a" if i < 4 else "b",
                 " ".join(f"w{j}" for j in range(10))] for i in range(8)]
        out = run_spec(spark, {
            "input": {"inline": {"rows": rows,
                                 "schema": "doc_id long, source string, text string"}},
            "pipeline": {"processors": [
                {"mix_sources": {"frac": 0.5, "weights": {"a": 3.0, "b": 1.0}}},
                {"pack_sequences": {"seq_len": 16}},
            ]},
            "output": {"memory": {}},
        })
        assert len(out.columns) == len(set(out.columns))
        got = sorted(out.collect(), key=lambda r: r["doc_id"])
        # cum_tokens is now the GLOBAL packing cumsum (10 tokens per doc)
        assert [r["cum_tokens"] for r in got] == [10 * (i + 1) for i in range(8)]
        assert got[1]["begin_seq"] == 0 and got[1]["n_seqs"] == 2
        assert "quota" in out.columns  # mixer's other columns survive

    def test_explode_custom_id_and_text_columns(self, spark):
        # string ids + non-default column names through the spec stage
        rows = [[f"u{i}", " ".join("w" for _ in range(9))] for i in range(4)]
        out = run_spec(spark, {
            "input": {"inline": {"rows": rows,
                                 "schema": "url string, body string"}},
            "pipeline": {"processors": [
                {"pack_sequences": {"seq_len": 12, "explode": True,
                                    "column": "body", "id_column": "url"}},
            ]},
            "output": {"memory": {}},
        })
        got = out.collect()
        assert out.columns == ["seq_id", "url", "offset_in_seq",
                               "doc_offset", "len"]
        assert sum(r["len"] for r in got) == 36
        assert {r["url"] for r in got} == {f"u{i}" for i in range(4)}

    def test_lint_accepts_pack(self):
        assert lint_spec({
            "input": {"inline": {"rows": [[1, "x"]],
                                 "schema": "doc_id long, text string"}},
            "pipeline": {"processors": [{"pack_sequences": {"seq_len": 4}}]},
            "output": {"memory": {}},
        }) == []

    def test_streaming_rejected(self, spark, tmp_path):
        import os

        src = str(tmp_path / "in")
        os.makedirs(src)
        _docs(spark, [3]).write.parquet(src + "/p0")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src + "/*")
        )
        from benthos_spark.engine.spark_exec import NativePipeline

        pipe = NativePipeline([{"pack_sequences": {"seq_len": 4}}],
                              columns={"doc_id": "bigint", "text": "string"})
        with pytest.raises(RuntimeError, match="batch-only"):
            pipe(stream).collect()


@pytest.mark.spark
def test_pack_annotate_drops_zero_token_docs(spark):
    """r6 (ADVICE): pack_sequences annotate mode inner-joins span rows back
    on the id, so ZERO-TOKEN documents are dropped from annotate output —
    the one annotate stage where rows vanish. Pinned deliberately: the
    registered oracle encodes this behavior, so it is documented (see
    engine/spark_exec.py pack_sequences annotate note) rather than changed."""
    from benthos_spark.engine.spark_exec import NativePipeline

    df = _docs(spark, [4, 0, 6])
    pipe = NativePipeline(
        [{"pack_sequences": {"seq_len": 4}}],
        columns={"doc_id": "bigint", "text": "string"},
    )
    out = pipe(df)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert ids == {0, 2}, ids  # doc 1 (zero tokens) is dropped, documented
