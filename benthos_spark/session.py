"""SparkSession factory tuned for the engine (local test + cluster defaults)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _xms(mem: str) -> str:
    """Initial heap: min(8g, -Xmx) so tiny test sessions stay valid
    (parses g/m suffixes; anything unparseable passes through)."""
    try:
        v = mem.lower()
        mb = int(v[:-1]) * (1024 if v.endswith("g") else 1) if v[-1] in "gm" else None
        if mb is not None and mb > 8 * 1024:
            return "8g"
    except (ValueError, IndexError):
        pass
    return mem


def get_spark(
    app_name: str = "benthos_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a SparkSession with the engine's defaults.

    On a real cluster the master/memory knobs come from spark-submit; locally
    we default to ``local[$SPARK_GRAFT_CPUS]``. AQE is on (skew-join handling
    and runtime coalescing are part of the scale story), Arrow is on (all
    Python-side kernels are Arrow-batched), timezone pinned UTC so event-time
    windows are deterministic.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = cpus if master.startswith("local[") else "200"
        try:
            shuffle_partitions = int(master[6:-1]) if master != "local[*]" else os.cpu_count()
        except ValueError:
            shuffle_partitions = int(n) if str(n).isdigit() else 32
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "40g")
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and master.startswith("local") and os.path.isdir("/dev/shm"):
        # single-node shuffle files on tmpfs; real clusters pass their own dirs
        local_dir = "/dev/shm/spark_local"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", mem)
        # Pre-size and pre-fault a working-set-sized initial heap: without
        # it the first 20M-row queries in a fresh JVM spend 10-20 s
        # page-faulting/zeroing freshly-grown heap INSIDE the timed region
        # (measured rep progression [17.3, 26.4, 3.1, 3.1] s with lazy
        # -Xms40g vs [9.6, 4.8, 3.1] with -Xms8g + AlwaysPreTouch; a full
        # 40g pretouch costs 30-120 s of JVM startup, the wrong trade for
        # short-lived test sessions). -Xmx stays at `mem` so heavy state /
        # wide joins still have headroom; growth beyond 8g faults lazily.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{_xms(mem)} -XX:+AlwaysPreTouch",
        )
        # NOTE: spark.sql.streaming.statefulOperator.checkCorrectness.enabled
        # stays at its default (true). Pipelines that chain stateful operators
        # in a shape Spark flags must opt out explicitly via extra_conf with a
        # per-shape justification — never globally.
        # RocksDB state store: bounded memory + changelog-style commits beat
        # the HDFS-backed provider's full-snapshot-per-batch at large state
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        # changelog checkpointing: commit the per-batch delta instead of a
        # full RocksDB snapshot — the difference is marginal at test-scale
        # state but is the knob that matters at 10^9-key dedupe state
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
