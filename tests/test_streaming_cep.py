"""Streaming CEP funnel (benthos_spark/streaming/cep.py): first completion
per key matches the batch funnel op exactly on ordered input; repeat
sequences emit one row each; exactly-once through the idempotent sink."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from benthos_spark.ops.funnel import funnel
from benthos_spark.streaming.cep import streaming_funnel
from benthos_spark.streaming.sink import IdempotentSink, run_to_sink


def _mk_events():
    """300 users, deterministic A/B/C event mixes over 2 hours; some users
    complete twice, some stall mid-funnel, some never start."""
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = []
    for u in range(300):
        seq = {
            0: ["A", "B", "C", "A", "B", "C"],   # completes twice
            1: ["A", "B", "A", "C"],             # completes once (C after B)
            2: ["B", "C", "A", "B"],             # stalls at stage 2
            3: ["A"],                            # stalls at stage 1
            4: ["B", "C"],                       # never starts
        }[u % 5]
        for i, typ in enumerate(seq):
            rows.append((u, base + dt.timedelta(minutes=u % 7 + i * 10), typ))
    rows.sort(key=lambda r: r[1])
    return rows


@pytest.fixture(scope="module")
def in_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cep") / "in")
    rows = _mk_events()
    # 3 chunk files in event-time order so micro-batches replay history
    n = len(rows) // 3
    for i in range(3):
        chunk = rows[i * n : (i + 1) * n if i < 2 else len(rows)]
        spark.createDataFrame(
            chunk, "user_id long, ts timestamp, event_type string"
        ).coalesce(1).write.mode("append").parquet(d)
    return d


@pytest.fixture(scope="module")
def completions(spark, in_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("cep_out")
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).option("maxFilesPerTrigger", 1).parquet(in_dir)
    sf = streaming_funnel(stream, steps=("A", "B", "C"), watermark="10 minutes")
    sink = IdempotentSink(str(out / "sink"))
    run_to_sink(sf, sink, str(out / "ckpt"))
    return sink.read(spark).collect()


@pytest.mark.spark
@pytest.mark.streaming
class TestStreamingFunnel:
    def test_first_completion_matches_batch_op(self, spark, in_dir, completions):
        batch = funnel(
            spark.read.parquet(in_dir), steps=("A", "B", "C"), key="user_id"
        )
        want = {
            r["user_id"]: (r["t1"], r["t2"], r["t3"], r["duration_s"])
            for r in batch.collect() if r["completed"]
        }
        first = {}
        for r in sorted(completions, key=lambda r: (r["user_id"], r["t1"])):
            first.setdefault(r["user_id"], (r["t1"], r["t2"], r["t3"], r["duration_s"]))
        assert first == want

    def test_repeat_sequences_emit_per_completion(self, completions):
        per_user = {}
        for r in completions:
            per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
        # u % 5 == 0 users complete twice, u % 5 in (1,) once, others never
        assert all(per_user[u] == 2 for u in per_user if u % 5 == 0)
        assert all(per_user[u] == 1 for u in per_user if u % 5 == 1)
        assert all(u % 5 in (0, 1) for u in per_user)

    def test_completion_count(self, completions):
        assert len(completions) == 60 * 2 + 60  # 60 double + 60 single

    def test_state_survives_restart(self, spark, tmp_path):
        """A funnel opened in run 1 (A arrived) must complete in run 2 when
        B arrives after a restart — the checkpoint holds the per-key state
        machine, not the JVM."""
        in_dir = str(tmp_path / "in")
        sink = IdempotentSink(str(tmp_path / "sink"))
        ckpt = str(tmp_path / "ckpt")

        def drain():
            stream = spark.readStream.schema(
                "user_id long, ts timestamp, event_type string"
            ).option("maxFilesPerTrigger", 1).parquet(in_dir)
            run_to_sink(
                streaming_funnel(stream, steps=("A", "B"), watermark="5 minutes"),
                sink, ckpt,
            )

        t0 = dt.datetime(2024, 1, 1, 10, 0)
        spark.createDataFrame(
            [(1, t0, "A"), (2, t0, "B")],
            "user_id long, ts timestamp, event_type string",
        ).coalesce(1).write.mode("append").parquet(in_dir)
        drain()
        assert sink.read(spark).count() == 0  # nothing completed yet

        spark.createDataFrame(
            [(1, t0 + dt.timedelta(minutes=3), "B")],
            "user_id long, ts timestamp, event_type string",
        ).coalesce(1).write.mode("append").parquet(in_dir)
        drain()
        rows = sink.read(spark).collect()
        assert len(rows) == 1 and rows[0]["user_id"] == 1
        assert rows[0]["duration_s"] == 180
