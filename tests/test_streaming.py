"""Streaming core tests: event-time windows, stateful TTL dedupe vs a pure
oracle, and exactly-once replay from checkpoint (the north-rule invariant)."""

import os

import pytest
from pyspark.sql import functions as F

from benthos_spark.fixtures import pages
from benthos_spark.streaming import (
    IdempotentSink,
    dedupe_exact,
    dedupe_ttl_reference,
    dedupe_ttl_stateful,
    dedupe_within_watermark,
    keep_first_of_window,
    pages_file_stream,
    run_to_sink,
    salted_host_window_agg,
    session_host_agg,
    tumbling_host_agg,
    write_pages_input,
)

N = 20_000


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_in"))
    write_pages_input(spark, d, N, n_chunks=4, n_hosts=50)
    return d


@pytest.mark.spark
@pytest.mark.streaming
class TestWindows:
    def test_tumbling_streaming_matches_batch(self, spark, input_dir, tmp_path):
        stream = tumbling_host_agg(
            pages_file_stream(spark, input_dir), size="10 minutes", watermark="1 hour"
        )
        sink = IdempotentSink(str(tmp_path / "sink"))
        run_to_sink(stream, sink, str(tmp_path / "ckpt"))
        got = sink.read(spark)

        batch = tumbling_host_agg(spark.read.parquet(input_dir), size="10 minutes")
        g = {
            (r["win_start"], r["url_host"]): (r["n_pages"], r["total_chars"])
            for r in got.collect()
        }
        rows = batch.collect()
        w = {
            (r["win_start"], r["url_host"]): (r["n_pages"], r["total_chars"])
            for r in rows
        }
        # append mode only emits windows finalized by the watermark: windows
        # ending after (max event time - watermark) are still open state
        import datetime

        max_ts = spark.read.parquet(input_dir).agg(F.max("warc_ts")).first()[0]
        horizon = max_ts - datetime.timedelta(hours=1)
        w_final = {
            (r["win_start"], r["url_host"]): (r["n_pages"], r["total_chars"])
            for r in rows
            if r["win_end"] <= horizon
        }
        # every emitted window matches the batch computation exactly
        assert g.items() <= w.items()
        # and every finalized window was emitted
        assert w_final.items() <= g.items()
        assert len(w_final) > 10

    def test_session_window_batch(self, spark, input_dir):
        out = session_host_agg(spark.read.parquet(input_dir), gap="2 minutes")
        rows = out.collect()
        assert rows
        # sessions never overlap per host and gaps are respected
        by_host = {}
        for r in rows:
            by_host.setdefault(r["url_host"], []).append((r["win_start"], r["win_end"]))
        for sess in by_host.values():
            sess.sort()
            for (s1, e1), (s2, _e2) in zip(sess, sess[1:]):
                assert (s2 - e1).total_seconds() >= 0

    def test_salted_agg_matches_plain(self, spark, input_dir):
        df = spark.read.parquet(input_dir)
        plain = tumbling_host_agg(
            df,
            size="10 minutes",
            aggs=[
                F.count(F.lit(1)).alias("n_pages"),
                F.sum(F.length("text")).alias("total_chars"),
                F.max("warc_ts").alias("max_ts"),
            ],
        )
        salted = salted_host_window_agg(df, size="10 minutes", n_salt=8)
        p = {(r["win_start"], r["url_host"]): (r["n_pages"], r["total_chars"]) for r in plain.collect()}
        s = {(r["win_start"], r["url_host"]): (r["n_pages"], r["total_chars"]) for r in salted.collect()}
        assert p == s

    def test_keep_first_of_window(self, spark, input_dir):
        df = spark.read.parquet(input_dir)
        out = keep_first_of_window(df, size="10 minutes").collect()
        assert out
        # each (window, host) appears once
        keys = [(r["win_start"], r["url_host"]) for r in out]
        assert len(keys) == len(set(keys))


@pytest.mark.spark
@pytest.mark.streaming
class TestDedupe:
    def test_streaming_dedupe_within_watermark(self, spark, input_dir, tmp_path):
        stream = dedupe_within_watermark(
            pages_file_stream(spark, input_dir), ["url"], watermark="10 hours"
        )
        sink = IdempotentSink(str(tmp_path / "sink"))
        run_to_sink(stream, sink, str(tmp_path / "ckpt"))
        got = sink.read(spark)
        n_distinct = spark.read.parquet(input_dir).select("url").distinct().count()
        assert got.count() == n_distinct
        assert got.select("url").distinct().count() == n_distinct

    def test_ttl_stateful_dedupe_matches_oracle(self, spark, input_dir, tmp_path):
        ttl = 3600.0
        stream = dedupe_ttl_stateful(
            pages_file_stream(spark, input_dir),
            ["url"],
            ttl_seconds=ttl,
            watermark="10 hours",
        )
        sink = IdempotentSink(str(tmp_path / "sink"))
        run_to_sink(stream, sink, str(tmp_path / "ckpt"))
        got = sorted(
            (r["url"], r["warc_ts"]) for r in sink.read(spark).select("url", "warc_ts").collect()
        )
        rows = [
            (r["url"], r["warc_ts"])
            for r in spark.read.parquet(input_dir).select("url", "warc_ts").collect()
        ]
        want = sorted(
            dedupe_ttl_reference(
                rows, key_fn=lambda r: r[0], ts_fn=lambda r: r[1].timestamp(), ttl_seconds=ttl
            )
        )
        assert got == want

    def test_batch_dedupe_byte_identical_text(self, spark, input_dir):
        df = spark.read.parquet(input_dir)
        out = dedupe_exact(df, ["url"], order_col="seq")
        # north-rule invariant: per url the surviving text is byte-identical
        # to every text that url ever carried
        joined = df.alias("a").join(out.alias("b"), "url")
        assert joined.filter(F.col("a.text") != F.col("b.text")).count() == 0


@pytest.mark.spark
@pytest.mark.streaming
class TestExactlyOnce:
    def test_replay_from_checkpoint_no_duplicates(self, spark, tmp_path):
        """Two-phase input: run, add data, run again with the same checkpoint.
        Then re-run the whole stream from scratch: identical sink rows."""
        in_dir = str(tmp_path / "in")
        write_pages_input(spark, in_dir, 4000, n_chunks=2, n_hosts=20)
        sink = IdempotentSink(str(tmp_path / "sink"))
        ckpt = str(tmp_path / "ckpt")

        def make_stream():
            return dedupe_within_watermark(
                pages_file_stream(spark, in_dir, max_files_per_trigger=1),
                ["url"],
                watermark="10 hours",
            )

        run_to_sink(make_stream(), sink, ckpt)
        n1 = sink.read(spark).count()
        # second run, same checkpoint, no new input: nothing re-emitted
        run_to_sink(make_stream(), sink, ckpt)
        assert sink.read(spark).count() == n1
        # idempotent sink: replaying an already-committed batch id is a no-op
        df = sink.read(spark).limit(5)
        committed = sink.metrics()[0]["batch_id"]
        sink.write_batch(df, committed)
        assert sink.read(spark).count() == n1
        assert n1 == spark.read.parquet(in_dir).select("url").distinct().count()

    def test_unbound_scheme_sink_raises_clear_error(self, spark):
        # scheme'd root -> Hadoop FS bound lazily; pre-bind calls must raise
        # a clear error (not AttributeError on None._jvm) and accept spark=
        s = IdempotentSink("file:/tmp/bs_unbound_probe")
        with pytest.raises(RuntimeError, match="pass spark="):
            s.metrics()
        assert s.is_committed(0, spark) is False  # lazily binds via spark=

    def test_ttl_state_survives_restart(self, spark, tmp_path):
        """applyInPandasWithState dedupe state must carry across a restart:
        a duplicate url arriving in run 2 within TTL of its run-1 admission
        must stay suppressed (checkpoint holds the state, not the JVM)."""
        from pyspark.sql import functions as F

        from benthos_spark.fixtures import pages

        in_dir = str(tmp_path / "in")
        full = pages(spark, 6000, n_hosts=20, rows_per_sec=100)
        # run 1 input: first 3000 rows; run 2 adds the rest (the fixture's
        # duplicate urls recur across the boundary)
        full.filter("seq < 3000").coalesce(1).write.mode("append").parquet(in_dir)
        ttl = 10 * 3600.0
        sink = IdempotentSink(str(tmp_path / "sink"))
        ckpt = str(tmp_path / "ckpt")

        def stream():
            return dedupe_ttl_stateful(
                pages_file_stream(spark, in_dir),
                ["url"],
                ttl_seconds=ttl,
                watermark="100 hours",
            )

        run_to_sink(stream(), sink, ckpt)
        full.filter("seq >= 3000").coalesce(1).write.mode("append").parquet(in_dir)
        run_to_sink(stream(), sink, ckpt)

        got = sorted(
            (r["url"], r["warc_ts"])
            for r in sink.read(spark).select("url", "warc_ts").collect()
        )
        rows = [
            (r["url"], r["warc_ts"])
            for r in spark.read.parquet(in_dir).select("url", "warc_ts").collect()
        ]
        want = sorted(
            dedupe_ttl_reference(
                rows, key_fn=lambda r: r[0], ts_fn=lambda r: r[1].timestamp(), ttl_seconds=ttl
            )
        )
        # NOTE: split processing can only differ from the global oracle if a
        # late duplicate lands in run 2 with an earlier event-time than the
        # run-1 admission; the fixture's duplicates are far apart in seq, so
        # the oracle holds exactly here.
        assert got == want
        # and the key point: fewer rows than input (state suppressed dups
        # across the restart boundary)
        assert len(got) < len(rows)

    def test_kill_restart_resumes_without_loss(self, spark, tmp_path):
        in_dir = str(tmp_path / "in")
        write_pages_input(spark, in_dir, 4000, n_chunks=4, n_hosts=20)
        ckpt = str(tmp_path / "ckpt")
        sink = IdempotentSink(str(tmp_path / "sink"))

        # phase 1: process only some files (maxFilesPerTrigger=1, stop early)
        stream = dedupe_within_watermark(
            pages_file_stream(spark, in_dir, max_files_per_trigger=1),
            ["url"],
            watermark="10 hours",
        )
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink.foreach_batch())
            .trigger(processingTime="0 seconds")
            .start()
        )
        import time as _t

        while not sink.metrics():
            _t.sleep(0.2)
        q.stop()  # "kill"
        q.awaitTermination()

        # phase 2: restart from the same checkpoint, drain everything.
        # One retry: when the phase-1 stop() lands mid-commit, the restarted
        # run shares this JVM's StateStoreCoordinator whose commit tracker
        # still expects the killed batch's commits and can fail validation
        # (STATE_STORE_COMMIT_VALIDATION_FAILED) — a same-JVM test artifact
        # (a real restart is a fresh driver); the retry is one more
        # crash-replay through the same checkpoint, which is the property
        # under test.
        from pyspark.errors.exceptions.captured import StreamingQueryException

        for attempt in range(2):
            try:
                run_to_sink(
                    dedupe_within_watermark(
                        pages_file_stream(spark, in_dir, max_files_per_trigger=1),
                        ["url"],
                        watermark="10 hours",
                    ),
                    sink,
                    ckpt,
                )
                break
            except StreamingQueryException:
                if attempt == 1:
                    raise
        got = sink.read(spark)
        want = spark.read.parquet(in_dir).select("url").distinct().count()
        assert got.count() == want
        assert got.select("url").distinct().count() == want
        # lineage columns present on every committed row
        assert {"_batch_id", "_partition_id"}.issubset(set(got.columns))


@pytest.mark.spark
class TestSinkFilesystemAbstraction:
    def test_hadoop_fs_markers_roundtrip(self, spark, tmp_path):
        """file:// root routes markers through Hadoop FileSystem; protocol
        must behave identically to the local-os path."""
        from benthos_spark.streaming.sink import IdempotentSink

        sink = IdempotentSink("file://" + str(tmp_path / "out"))
        df = spark.range(10).withColumnRenamed("id", "v")
        sink.write_batch(df, 0)
        sink.write_batch(df, 0)  # replay: skipped, not duplicated
        sink.write_batch(df, 1)
        got = sink.read(spark)
        assert got.count() == 20
        m = sink.metrics(spark)
        assert [x["batch_id"] for x in m] == [0, 1]
        assert sum(m[0]["rows_per_partition"].values()) == 10

    def test_committed_batch_with_missing_data_raises(self, spark, tmp_path):
        import shutil

        from benthos_spark.streaming.sink import IdempotentSink

        sink = IdempotentSink(str(tmp_path / "out"))
        df = spark.range(5).withColumnRenamed("id", "v")
        sink.write_batch(df, 0)
        shutil.rmtree(str(tmp_path / "out" / "data" / "batch_id=0"))
        with pytest.raises(IOError):
            sink.read(spark)


@pytest.mark.spark
class TestIcebergSink:
    def test_iceberg_sink_roundtrip(self, spark, tmp_path):
        """Gated on the Iceberg runtime jar: exercises the real
        writeTo(...).overwritePartitions() path when available — full
        write -> crash-before-marker -> replay -> read-back parity."""
        from benthos_spark.streaming.sink import IcebergSink, has_iceberg

        if not has_iceberg(spark):
            pytest.skip(
                "Iceberg runtime jar not on classpath; add "
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 "
                "(or the matching iceberg-spark-runtime artifact for this "
                "Spark minor) via spark.jars.packages plus a SparkCatalog "
                "config (spark.sql.catalog.local=org.apache.iceberg.spark."
                "SparkCatalog, type=hadoop, warehouse=<dir>). The jar-free "
                "MERGE-equivalence stand-in below runs the same protocol "
                "against dynamic partition overwrite."
            )
        from pyspark.sql import functions as F

        sink = IcebergSink("local.db.bench_sink", str(tmp_path / "markers"))
        df = spark.range(10).withColumnRenamed("id", "v")
        sink.write_batch(df, 0)
        # crash between data commit and marker: re-stage the data WITHOUT a
        # marker, then replay the whole batch — partition overwrite converges
        staged = df.withColumn("_batch_id", F.lit(1)).withColumn(
            "_partition_id", F.spark_partition_id()
        )
        sink._write_data(staged, 1)
        sink.write_batch(df, 1)  # replay rewrites partition 1, no dupes
        sink.write_batch(df, 1)  # marker present: skipped
        got = sink.read(spark)
        assert got.count() == 20
        assert got.groupBy("_batch_id").count().count() == 2

    def test_local_overwrite_partitions_merge_equivalence(self, spark, tmp_path):
        """Jar-free stand-in for the Iceberg data step: the SAME commit
        protocol over dynamic partition overwrite must converge through a
        crash-between-data-and-marker replay, and the final read-back must
        equal the plain IdempotentSink's for the same batch sequence."""
        from pyspark.sql import functions as F

        from benthos_spark.streaming.sink import (
            IdempotentSink,
            LocalOverwritePartitionsSink,
        )

        b0 = spark.range(0, 10).withColumnRenamed("id", "v")
        b1 = spark.range(100, 107).withColumnRenamed("id", "v")

        ice = LocalOverwritePartitionsSink(str(tmp_path / "ice"))
        plain = IdempotentSink(str(tmp_path / "plain"))
        for sink in (ice, plain):
            sink.write_batch(b0, 0)
            # crash: data for batch 1 lands, marker does not
            staged = b1.withColumn("_batch_id", F.lit(1)).withColumn(
                "_partition_id", F.spark_partition_id()
            )
            sink._write_data(staged, 1)
            # restart: foreachBatch replays batch 1 (no marker -> rewrite)
            sink.write_batch(b1, 1)
            # second replay with marker present: no-op
            sink.write_batch(b1, 1)

        got_ice = sorted(
            (r["v"], r["_batch_id"]) for r in ice.read(spark).collect()
        )
        got_plain = sorted(
            (r["v"], r["_batch_id"]) for r in plain.read(spark).collect()
        )
        assert got_ice == got_plain
        assert len(got_ice) == 17  # exactly-once: no duplicates from replay
        assert [x["batch_id"] for x in ice.metrics(spark)] == [0, 1]

    def test_local_overwrite_uncommitted_partition_invisible(self, spark, tmp_path):
        """Data written without a marker (crash) must not be readable."""
        from pyspark.sql import functions as F

        from benthos_spark.streaming.sink import LocalOverwritePartitionsSink

        sink = LocalOverwritePartitionsSink(str(tmp_path / "ice2"))
        b0 = spark.range(3).withColumnRenamed("id", "v")
        sink.write_batch(b0, 0)
        staged = b0.withColumn("_batch_id", F.lit(7)).withColumn(
            "_partition_id", F.spark_partition_id()
        )
        sink._write_data(staged, 7)  # orphaned data, no marker
        got = sink.read(spark)
        assert {r["_batch_id"] for r in got.collect()} == {0}

    def test_has_iceberg_detection_is_safe(self, spark):
        from benthos_spark.streaming.sink import has_iceberg

        assert has_iceberg(spark) in (True, False)


@pytest.mark.spark
class TestKafkaInput:
    """Jar-gated kafka path (lib/input/reader/kafka.go:28-103 analog).

    Without the spark-sql-kafka connector the frame-stream constructor must
    fail with a clear, actionable error; with it, the source must emit the
    schemaless message frame and keep offsets in the CHECKPOINT (consumer
    group deliberately unmapped — kafka.go:238-243's commit-after-ack is
    upgraded to exactly-once via checkpointed offsets)."""

    def test_kafka_frame_stream_schema_or_clear_error(self, spark):
        from benthos_spark.engine.spark_exec import FRAME_SCHEMA
        from benthos_spark.streaming.source import has_kafka, kafka_frame_stream

        if not has_kafka(spark):
            with pytest.raises(Exception) as ei:
                kafka_frame_stream(spark, ["broker:9092"], ["topic"])
            assert "kafka" in str(ei.value).lower()
            pytest.skip("spark-sql-kafka connector jar not on classpath")
        df = kafka_frame_stream(spark, ["broker:9092"], ["topic"])
        assert df.isStreaming
        assert [f.name for f in df.schema.fields] == [f.name for f in FRAME_SCHEMA.fields]
        assert dict(df.dtypes)["content"] == "binary"
        # offsets-in-checkpoint: the reader must NOT set a consumer group
        # (group offsets on the broker would fight the checkpoint's)
        plan = df._jdf.queryExecution().logical().toString()
        assert "kafka.group.id" not in plan

    def test_spec_kafka_input_maps_to_frame(self, spark):
        from benthos_spark.engine.spec import Stream
        from benthos_spark.streaming.source import has_kafka

        if not has_kafka(spark):
            pytest.skip("spark-sql-kafka connector jar not on classpath")
        stream = Stream(
            spark,
            {
                "input": {"kafka": {"addresses": ["broker:9092"], "topics": ["t"]}},
                "pipeline": {"processors": []},
                "output": {"memory": {}},
            },
        )
        assert stream.df.isStreaming
        assert "content" in stream.df.columns and "meta" in stream.df.columns

    def test_kafka_offsets_restored_from_checkpoint_not_broker(
        self, spark, tmp_path
    ):
        """lib/input/reader/kafka.go:238-243 analog, end-to-end: after a
        restart with the SAME checkpoint, consumption resumes from the
        checkpointed offsets — startingOffsets=earliest must NOT re-deliver
        already-processed messages, and messages produced while the query
        was down must arrive exactly once.

        Complete and executable the moment a connector jar AND a broker are
        available: producing goes through Spark's own kafka batch sink, so
        no extra client library is needed. Gated on has_kafka plus
        SPARK_GRAFT_KAFKA_BROKER (e.g. 'localhost:9092') with a
        per-run-unique topic."""
        import os
        import uuid

        from pyspark.sql import functions as F

        from benthos_spark.streaming.sink import IdempotentSink, run_to_sink
        from benthos_spark.streaming.source import has_kafka, kafka_frame_stream

        if not has_kafka(spark):
            pytest.skip(
                "spark-sql-kafka connector jar not on classpath; add "
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version> "
                "via spark.jars.packages"
            )
        broker = os.environ.get("SPARK_GRAFT_KAFKA_BROKER")
        if not broker:
            pytest.skip("no broker: set SPARK_GRAFT_KAFKA_BROKER=host:port")
        topic = f"bspark_ckpt_{uuid.uuid4().hex[:12]}"

        def produce(lo, hi):
            (
                spark.range(lo, hi)
                .select(F.col("id").cast("string").alias("value"))
                .write.format("kafka")
                .option("kafka.bootstrap.servers", broker)
                .option("topic", topic)
                .save()
            )

        def drain():
            frames = kafka_frame_stream(spark, [broker], [topic])
            run_to_sink(frames, sink, ckpt, available_now=True)

        sink = IdempotentSink(str(tmp_path / "out"))
        ckpt = str(tmp_path / "ckpt")

        produce(0, 50)
        drain()  # first run: startingOffsets=earliest -> 0..49
        produce(50, 80)  # while the query is down
        drain()  # restart, same checkpoint: offsets from CHECKPOINT
        got = sorted(
            int(bytes(r["content"]).decode())
            for r in sink.read(spark).collect()
        )
        # exactly once: no re-delivery of 0..49 despite earliest, no loss
        assert got == list(range(80))


@pytest.mark.spark
@pytest.mark.streaming
class TestChainedStatefulRestart:
    def test_dedupe_window_chain_survives_restart(self, spark, tmp_path):
        """The north-rule chain (watermark dedupe -> tumbling agg) compiled by
        the engine must produce identical sink contents whether the stream is
        drained in one run or killed and resumed from checkpoint midway."""
        from datetime import timedelta

        from pyspark.sql import functions as F

        from benthos_spark.engine.spark_exec import NativePipeline
        from benthos_spark.fixtures import pages

        full = pages(spark, 6000, n_hosts=20, rows_per_sec=100)
        max_ts = full.agg(F.max("warc_ts")).collect()[0][0]
        schema = full.schema

        def write_chunk(path, lo, hi):
            full.filter(f"seq >= {lo} AND seq < {hi}").coalesce(1).write.mode(
                "append"
            ).parquet(path)

        def sentinel(path):
            row = [("http://flush.example/x", max_ts + timedelta(hours=6), None, "flush", "xx", 999999, 5)]
            spark.createDataFrame(row, schema).coalesce(1).write.mode("append").parquet(path)

        def run(in_dir, sink_dir, ckpt):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
                .withColumn("hr", F.date_trunc("hour", "warc_ts"))
            )
            pipe = NativePipeline(
                [
                    {"dedupe": {"keys": ["url", "hr"], "watermark": "2 hours",
                                "ts_col": "warc_ts"}},
                    {"window": {"kind": "tumbling", "size": "1 hour",
                                "keys": ["url_host"], "ts_col": "warc_ts",
                                "aggs": [{"fn": "count", "as": "n"}]}},
                ],
                dict(stream.dtypes),
            )
            out = pipe(stream.withColumn("url_host", F.split("url", "/")[2]))
            sink = IdempotentSink(sink_dir)
            run_to_sink(out, sink, ckpt)
            return sink

        # interrupted run: first half, drain; then rest + sentinel, resume
        in_a = str(tmp_path / "in_a")
        write_chunk(in_a, 0, 3000)
        run(in_a, str(tmp_path / "sink_a"), str(tmp_path / "ckpt_a"))
        write_chunk(in_a, 3000, 6000)
        sentinel(in_a)
        sink_a = run(in_a, str(tmp_path / "sink_a"), str(tmp_path / "ckpt_a"))

        # single uninterrupted run over identical input
        in_b = str(tmp_path / "in_b")
        write_chunk(in_b, 0, 3000)
        write_chunk(in_b, 3000, 6000)
        sentinel(in_b)
        sink_b = run(in_b, str(tmp_path / "sink_b"), str(tmp_path / "ckpt_b"))

        def rows(sink):
            return sorted(
                (r["win_start"], r["url_host"], r["n"])
                for r in sink.read(spark)
                .filter(F.col("url_host") != "flush.example")
                .select("win_start", "url_host", "n")
                .collect()
            )

        a, b = rows(sink_a), rows(sink_b)
        assert a == b and len(a) > 0


@pytest.mark.spark
class TestSourceCombinators:
    def test_fan_in_union_by_name(self, spark):
        from benthos_spark.streaming.source import fan_in

        a = spark.createDataFrame([(1, "x")], "id long, a string")
        b = spark.createDataFrame([(2, "y")], "id long, b string")
        out = fan_in(a, b)
        rows = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
        assert rows == {1: ("x", None), 2: (None, "y")}

    @pytest.mark.streaming
    def test_read_until_stops_query_on_condition(self, spark, tmp_path):
        """read_until (lib/input/read_until.go): wrap a continuous stream and
        terminate once the sink-threshold condition fires."""
        from benthos_spark.streaming.sink import IdempotentSink
        from benthos_spark.streaming.source import read_until, write_pages_input

        in_dir = str(tmp_path / "in")
        write_pages_input(spark, in_dir, 2000, n_chunks=4, n_hosts=10)
        sink = IdempotentSink(str(tmp_path / "out"))
        stream = (
            spark.readStream.schema(
                "url string, warc_ts timestamp, html binary, text string, lang string, seq long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(sink.foreach_batch())
            .start()
        )

        def done():
            try:
                return len(sink.metrics()) >= 2  # stop after >= 2 committed batches
            except Exception:
                return False

        read_until(q, done, poll_s=0.2, timeout_s=120)
        assert not q.isActive
        assert len(sink.metrics()) >= 2
