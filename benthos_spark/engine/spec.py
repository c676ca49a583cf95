"""YAML pipeline spec -> executable Spark plan.

The reference's top-level config is input -> buffer -> pipeline -> output
(/root/reference/lib/stream/type.go:21-35, config lifecycle
lib/config/config.go:177, service lifecycle SURVEY.md §3.1). Here the same
spec compiles to a DataFrame plan: sources become ``spark.read`` /
``readStream``, processors compile natively (falling back to Arrow-batched
kernels for frame-shaped data), outputs become writers or the idempotent
streaming sink. There is no buffer layer — micro-batch scheduling +
checkpointing subsumes it (SURVEY.md §1.1).

Supported spec:

    input:
      parquet: {path: ...}                  # batch table scan
      file:    {path: ..., delimiter: ..., multipart: bool}  # line/multipart frames
      stream:  {path: ..., max_files_per_trigger: N}   # file stream
      generate: {rows: N, fixture: pages, ...}         # deterministic fixture
      inline:  {rows: [...], schema: ...}   # tests
    pipeline:
      processors: [ {bloblang: ...}, {dedupe: {...}}, ... ]
    output:
      parquet: {path: ..., mode: overwrite}
      sink:    {path: ..., checkpoint: ...} # idempotent exactly-once sink
      memory:  {}                           # return the DataFrame
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import yaml
from pyspark.sql import DataFrame, SparkSession

from ..bloblang.compiler import CompileError
from .spark_exec import FRAME_SCHEMA, NativePipeline, run_frame_pipeline


class Stream:
    """A compiled pipeline: bound source, transform, and output."""

    def __init__(self, spark: SparkSession, spec: Dict[str, Any]):
        self.spark = spark
        self.spec = spec
        self.df = self._build_input(spec.get("input", {}))
        procs = (spec.get("pipeline") or {}).get("processors", []) or []
        self.mode = "native"
        if procs:
            try:
                pipe = NativePipeline(procs, dict(self.df.dtypes))
                self.df = pipe(self.df)
            except CompileError as native_err:
                if not set(FRAME_SCHEMA.fieldNames()).issubset(self.df.columns):
                    # message-shaped typed input (e.g. inline rows of raw
                    # JSON in a `content` column): coerce to the frame
                    # schema so message semantics apply, then retry — the
                    # frame-native compiler may still carry it with zero
                    # Python before the interpreter kernel takes over.
                    # A typed input that is NOT content-shaped is a
                    # genuinely typed pipeline whose mapping failed to
                    # compile: surface the ORIGINAL CompileError (e.g.
                    # "unknown column x"), not a shape complaint.
                    try:
                        self.df = self._frameify(self.df)
                    except ValueError:
                        raise native_err
                    try:
                        pipe = NativePipeline(procs, dict(self.df.dtypes))
                        self.df = pipe(self.df)
                        return
                    except CompileError:
                        pass
                # already frame-shaped: retrying NativePipeline with the
                # same args would fail identically — go straight to the
                # interpreter kernel
                # fail fast on bad configs (the reference validates at startup,
                # lib/config/config.go:177) instead of at first action on an
                # executor
                from .processors import build_processor

                for p in procs:
                    build_processor(p)
                self.df = run_frame_pipeline(self.df, procs)
                self.mode = "frame"

    @staticmethod
    def _frameify(df: DataFrame) -> DataFrame:
        """Coerce a `content`-shaped typed DataFrame (string/binary content,
        optional map meta) to the message-frame schema. Raises the caller's
        CompileError pattern (ValueError here) for inputs that are neither a
        frame nor content-shaped — those are genuinely typed pipelines whose
        mapping failed to compile, and silently frame-ifying them would
        reinterpret bare column refs as JSON paths."""
        from pyspark.sql import functions as F

        dtypes = dict(df.dtypes)
        if dtypes.get("content") not in ("string", "binary") or df.isStreaming:
            raise ValueError(
                "pipeline processors not natively compilable and input is "
                "not message-shaped (needs a string/binary `content` column "
                "or the full frame schema)"
            )
        meta = (
            F.col("meta")
            if str(dtypes.get("meta", "")).startswith("map")
            else F.expr("cast(map() as map<string,string>)")
        )
        return df.select(
            F.lit(0).alias("batch_id"),
            F.monotonically_increasing_id().alias("seq"),
            F.col("content").cast("binary").alias("content"),
            meta.alias("meta"),
        )

    # ------------------------------------------------------------------
    def _build_input(self, conf: Dict[str, Any]) -> DataFrame:
        if not conf:
            raise ValueError("spec has no input")
        kind, body = next(iter(conf.items()))
        body = body or {}
        if kind == "parquet":
            return self.spark.read.parquet(body["path"])
        if kind in ("kafka", "kafka_balanced"):
            from ..streaming.source import kafka_frame_stream

            return kafka_frame_stream(
                self.spark,
                body.get("addresses") or ["localhost:9092"],
                body.get("topics") or [],
                start_oldest=bool(body.get("start_from_oldest", True)),
            )
        if kind in ("file", "files"):
            from ..streaming.source import file_lines_input

            return file_lines_input(
                self.spark,
                body["path"],
                delimiter=body.get("delimiter") or "\n",
                multipart=bool(body.get("multipart", False)),
            )
        if kind == "stream":
            from ..streaming.source import pages_file_stream

            fmt = body.get("format", "parquet")
            if fmt != "parquet":
                raise ValueError(f"stream format {fmt} not supported")
            schema = body.get("schema")
            if schema:
                r = self.spark.readStream.schema(schema)
                if body.get("max_files_per_trigger"):
                    r = r.option("maxFilesPerTrigger", body["max_files_per_trigger"])
                return r.parquet(body["path"])
            return pages_file_stream(
                self.spark, body["path"], body.get("max_files_per_trigger")
            )
        if kind == "warc":
            from ..streaming.source import read_warc

            return read_warc(
                self.spark,
                body["path"],
                stream=bool(body.get("stream", False)),
                max_files_per_trigger=body.get("max_files_per_trigger"),
                split_bytes=body.get("split_bytes"),
            )
        if kind == "generate":
            from .. import fixtures

            fixture = body.pop("fixture", "pages")
            rows = int(body.pop("rows", 10000))
            fn = getattr(fixtures, fixture)
            return fn(self.spark, rows, **body)
        if kind == "inline":
            return self.spark.createDataFrame(body["rows"], body.get("schema"))
        raise ValueError(f"unknown input kind {kind}")

    # ------------------------------------------------------------------
    def run(self) -> Optional[DataFrame]:
        out_conf = self.spec.get("output", {"memory": {}})
        kind, body = next(iter(out_conf.items()))
        body = body or {}
        if kind == "memory":
            return self.df
        if kind == "parquet":
            if self.df.isStreaming:
                raise ValueError("parquet output is batch-only; use sink")
            out = self.df
            # physical layout controls — the scan-side levers at scale:
            # partition_by gives partition pruning to every downstream
            # reader; repartition_by co-locates rows so each hive partition
            # is written by few tasks (no small-files explosion); num_files
            # caps output file count for small dimension-like results.
            if body.get("repartition_by"):
                from pyspark.sql import functions as F

                out = out.repartition(*[F.col(c) for c in body["repartition_by"]])
            elif body.get("num_files"):
                out = out.repartition(int(body["num_files"]))
            writer = out.write.mode(body.get("mode", "overwrite"))
            if body.get("partition_by"):
                writer = writer.partitionBy(*body["partition_by"])
            writer.parquet(body["path"])
            return None
        if kind == "kafka":
            # output kafka (lib/output/writer/kafka.go): content -> value,
            # key/partitioner mapped via streaming/kafka_out.py (murmur2 =
            # producer default, fnv1a/round_robin/random need
            # partition_count). Connector jar required on a real cluster
            # (--packages); offsets exactly-once via checkpoint + broker
            # idempotence.
            from ..streaming.kafka_out import kafka_output_frame

            frame = kafka_output_frame(
                self.df,
                key=body.get("key"),
                value_column=body.get("value_column", "content"),
                partitioner=body.get("partitioner"),
                partition_count=body.get("partition_count"),
                # frame mode always carries seq; round_robin uses it as the
                # per-batch row index (streaming plans can't use
                # monotonically_increasing_id)
                row_index_col="seq" if "seq" in self.df.columns else None,
            )
            w = (
                frame.writeStream.format("kafka")
                .option("kafka.bootstrap.servers", ",".join(body.get("addresses", [])))
                .option("topic", body.get("topic", ""))
                .option("checkpointLocation", body.get("checkpoint", "/tmp/bs_kafka_ckpt"))
            )
            q = w.start()
            q.awaitTermination()
            return None
        if kind == "sink":
            from ..streaming.sink import IdempotentSink, run_to_sink

            sink = IdempotentSink(body["path"])
            if self.df.isStreaming:
                run_to_sink(
                    self.df,
                    sink,
                    body.get("checkpoint", body["path"] + "/_checkpoint"),
                    output_mode=body.get("output_mode", "append"),
                )
            else:
                sink.write_batch(self.df, int(body.get("batch_id", 0)))
            return None
        raise ValueError(f"unknown output kind {kind}")


def run_spec(spark: SparkSession, spec: Union[str, Dict[str, Any]]) -> Optional[DataFrame]:
    if isinstance(spec, str):
        spec = yaml.safe_load(spec)
    return Stream(spark, spec).run()


_INPUT_KINDS = {"parquet", "file", "files", "kafka", "kafka_balanced", "stream", "generate", "inline", "warc"}
_OUTPUT_KINDS = {"memory", "parquet", "sink", "kafka"}


def lint_spec(spec: Union[str, Dict[str, Any]]) -> list:
    """Validate a pipeline spec WITHOUT a SparkSession (the reference's
    `benthos lint` surface, lib/config/lint.go behavior): unknown input/
    output kinds, unknown processor types, and per-processor config errors
    (bad Bloblang, bad Avro schema, bad grok pattern, ...) are collected and
    returned as strings; an empty list means the spec builds."""
    from .processors import build_processor

    if isinstance(spec, str):
        try:
            spec = yaml.safe_load(spec)
        except yaml.YAMLError as exc:
            return [f"yaml: {exc}"]
    errors = []
    if not isinstance(spec, dict):
        return ["spec must be a mapping"]
    in_conf = spec.get("input") or {}
    if not in_conf:
        errors.append("input: missing")
    else:
        kind = next(iter(in_conf))
        if kind not in _INPUT_KINDS:
            errors.append(f"input: unknown kind {kind!r}")
    out_conf = spec.get("output") or {"memory": {}}
    kind = next(iter(out_conf))
    if kind not in _OUTPUT_KINDS:
        errors.append(f"output: unknown kind {kind!r}")
    # r6 (r5 verdict #5): batch-only corpus ops are rejected at LINT time
    # for streaming specs — their semantics are corpus-wide aggregates
    # (global token quotas / cross-doc first-seen state) with no bounded
    # watermark formulation, so failing before any Spark session beats the
    # runtime raise the engine already had.
    stream_input = bool(in_conf) and (
        next(iter(in_conf)) in ("stream", "kafka", "kafka_balanced")
        or (
            next(iter(in_conf)) == "warc"
            and bool((in_conf.get("warc") or {}).get("stream", False))
        )
    )
    _BATCH_ONLY = {"mix_sources", "unit_dedup"}
    for i, p in enumerate((spec.get("pipeline") or {}).get("processors", []) or []):
        if stream_input and isinstance(p, dict) and p:
            ptype = p.get("type") or next(iter(p))
            if ptype in _BATCH_ONLY:
                errors.append(
                    f"pipeline.processors[{i}]: {ptype} is batch-only "
                    "(corpus-wide aggregates); not valid in a streaming spec"
                )
                continue
        try:
            build_processor(p)
        except Exception as exc:
            # native-only stages (corpus ops, windows) have no frame kernel;
            # the type is still valid if NativePipeline can compile it —
            # full config validation for those needs an input schema.
            if "unknown processor type" in str(exc) and isinstance(p, dict) and p:
                ptype = p.get("type") or next(iter(p))
                if hasattr(NativePipeline, f"_c_{ptype}"):
                    continue
            errors.append(f"pipeline.processors[{i}]: {exc}")
    return errors
