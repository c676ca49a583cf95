"""Enrichment joins (stream-static broadcast, stream-stream within watermark,
DAG chain) and observability (observe metrics, streaming listener),
plus flagship pipeline parity across modes."""

import pytest
from pyspark.sql import functions as F

from benthos_spark.fixtures import enrich_side, pages
from benthos_spark.pipelines import pages_windowed_dedupe_agg
from benthos_spark.streaming.enrich import enrich_dag, enrich_static, enrich_stream
from benthos_spark.streaming.observe import MetricsListener, observed
from benthos_spark.streaming.sink import IdempotentSink, run_to_sink
from benthos_spark.streaming.source import pages_file_stream, write_pages_input


@pytest.mark.spark
class TestFlagshipParity:
    def test_hash_key_mode_matches_exact_mode(self, spark):
        df = pages(spark, 30000, n_hosts=50, rows_per_sec=100)
        a = {
            (r["win_start"], r["url_host"]): (r["n_pages"], r["total_chars"])
            for r in pages_windowed_dedupe_agg(df).collect()
        }
        b = {
            (r["win_start"], r["url_host"]): (r["n_pages"], r["total_chars"])
            for r in pages_windowed_dedupe_agg(df, hash_key=True).collect()
        }
        assert a == b

    def test_packed_min_matches_reference_semantics(self, spark):
        """The packed-min dedupe must pick the same winner (min seq) and its
        warc_ts, vs a straightforward min_by oracle."""
        df = pages(spark, 20000, n_hosts=30, rows_per_sec=100)
        got = pages_windowed_dedupe_agg(df, window_size="10 minutes")
        slim = (
            df.withColumn("text_len", F.length("text"))
            .filter(F.col("text_len") >= 40)
            .select("url", "warc_ts", "seq", "text_len")
        )
        oracle_ded = slim.groupBy("url").agg(
            F.min_by(F.struct("warc_ts", "text_len"), "seq").alias("r")
        )
        oracle = (
            oracle_ded.select(
                F.split("url", "/")[2].alias("url_host"),
                F.col("r.warc_ts").alias("warc_ts"),
                F.col("r.text_len").alias("text_len"),
            )
            .groupBy(F.window("warc_ts", "10 minutes").alias("win"), "url_host")
            .agg(F.count(F.lit(1)).alias("n_pages"), F.sum("text_len").alias("total_chars"))
        )
        g = {(r["win_start"], r["url_host"]): (r["n_pages"], r["total_chars"]) for r in got.collect()}
        w = {
            (r["win"]["start"], r["url_host"]): (r["n_pages"], r["total_chars"])
            for r in oracle.collect()
        }
        assert g == w


@pytest.mark.spark
class TestEnrich:
    def test_static_broadcast(self, spark):
        df = pages(spark, 2000, n_hosts=20).withColumn("host", F.split("url", "/")[2])
        out = enrich_static(df, enrich_side(spark, 20), on="host")
        assert out.filter(F.col("category").isNull()).count() == 0
        assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()

    def test_dag_chain(self, spark):
        df = pages(spark, 1000, n_hosts=10).withColumn("host", F.split("url", "/")[2])
        side = enrich_side(spark, 10)
        side2 = side.select("host", F.lit(1).alias("flag"))
        out = enrich_dag(df, [("host", side, ["category"]), ("host", side2, ["flag"])])
        assert {"category", "flag"} <= set(out.columns)
        assert out.count() == 1000

    @pytest.mark.streaming
    def test_stream_stream_join_within_watermark(self, spark, tmp_path):
        in_dir = str(tmp_path / "facts")
        write_pages_input(spark, in_dir, 4000, n_chunks=2, n_hosts=10)
        facts = pages_file_stream(spark, in_dir).withColumn(
            "host", F.split("url", "/")[2]
        ).select("host", "warc_ts", "url")

        # enrichment stream: one categorization event per host at t0 (static
        # parquet read as a stream)
        enr_dir = str(tmp_path / "enrich")
        enrich_side(spark, 10).write.parquet(enr_dir)
        enr = spark.readStream.schema(
            "host string, category string, updated_ts timestamp"
        ).parquet(enr_dir)

        joined = enrich_stream(
            facts,
            enr,
            on="host",
            fact_ts="warc_ts",
            enrich_ts="updated_ts",
            watermark="10 hours",
            join_window="200 hours",
        )
        sink = IdempotentSink(str(tmp_path / "sink"))
        run_to_sink(joined, sink, str(tmp_path / "ckpt"))
        got = sink.read(spark)
        assert got.count() > 0
        assert got.filter(F.col("e_category").isNull()).count() == 0


@pytest.mark.spark
class TestObserve:
    def test_observed_batch_metrics(self, spark):
        df = observed(pages(spark, 1000, n_hosts=5), "src", size_col="text")
        rows = df.collect()
        obs = df.observation if hasattr(df, "observation") else None
        assert len(rows) == 1000  # observe is transparent

    @pytest.mark.streaming
    def test_listener_records_progress(self, spark, tmp_path):
        in_dir = str(tmp_path / "in")
        write_pages_input(spark, in_dir, 2000, n_chunks=2, n_hosts=5)
        listener = MetricsListener(str(tmp_path / "metrics.jsonl"))
        spark.streams.addListener(listener)
        try:
            stream = observed(pages_file_stream(spark, in_dir), "ingest")
            sink = IdempotentSink(str(tmp_path / "sink"))
            run_to_sink(stream, sink, str(tmp_path / "ckpt"))
            # listener events are delivered on a separate thread; wait for them
            import time

            progress = []
            for _ in range(40):
                progress = [e for e in listener.read() if e["event"] == "progress"]
                if sum(e["num_input_rows"] for e in progress) >= 2000:
                    break
                time.sleep(0.5)
        finally:
            spark.streams.removeListener(listener)
        assert progress
        assert sum(e["num_input_rows"] for e in progress) == 2000
        assert any(e["observed"].get("ingest", {}).get("rows") for e in progress)
