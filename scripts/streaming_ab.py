#!/usr/bin/env python3
"""A/B the streaming flagship across state-store configurations.

Round-2 verdict: the driver-recorded streaming flagship regressed 67.7k ->
50.4k docs/s in the same round that enabled RocksDB changelog checkpointing.
This script measures the three candidate configurations in fresh JVMs,
interleaved A/B/A/B (the host shows 3x minute-scale noise from external
tenants), and reports best-per-mode so the root cause is recorded rather
than guessed.

Modes:
  changelog  RocksDB provider + changelog checkpointing (current default)
  snapshot   RocksDB provider, changelog checkpointing off
  hdfs       HDFSBackedStateStoreProvider (Spark default)

Usage: python scripts/streaming_ab.py [--rows N] [--repeat K] [--modes a,b]
Child mode (one measurement, fresh JVM): --child --mode <mode>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = {
    "changelog": {},  # session defaults
    "snapshot": {
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "false",
    },
    "hdfs": {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    },
}


def run_child(mode: str, rows: int) -> None:
    sys.path.insert(0, REPO)
    from benthos_spark.pipelines import pages_windowed_dedupe_agg
    from benthos_spark.session import get_spark
    from benthos_spark.streaming.sink import IdempotentSink, run_to_sink
    from benthos_spark.streaming.source import pages_file_stream, write_pages_input

    spark = get_spark(app_name=f"stream_ab_{mode}", extra_conf=MODES[mode])
    workdir = tempfile.mkdtemp(prefix=f"ab_{mode}_")
    try:
        write_pages_input(
            spark, f"{workdir}/in", rows, n_chunks=8, n_hosts=1000, rows_per_sec=100
        )
        sink = IdempotentSink(f"{workdir}/sink")
        t0 = time.perf_counter()
        run_to_sink(
            pages_windowed_dedupe_agg(
                pages_file_stream(spark, f"{workdir}/in"),
                window_size="10 minutes",
                watermark="1 hour",
            ),
            sink,
            f"{workdir}/ckpt",
        )
        sec = time.perf_counter() - t0
        print(json.dumps({"mode": mode, "sec": round(sec, 3),
                          "docs_per_sec": round(rows / sec, 1)}))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


def main() -> None:
    rows = 1_000_000
    repeat = 3
    modes = list(MODES)
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    if "--modes" in sys.argv:
        modes = sys.argv[sys.argv.index("--modes") + 1].split(",")
    if "--child" in sys.argv:
        run_child(sys.argv[sys.argv.index("--mode") + 1], rows)
        return

    samples: dict[str, list] = {m: [] for m in modes}
    for r in range(repeat):
        for m in modes:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--mode", m, "--rows", str(rows)],
                capture_output=True, text=True, cwd=REPO, timeout=1800,
            )
            try:
                rec = json.loads(out.stdout.strip().splitlines()[-1])
            except (IndexError, json.JSONDecodeError):
                print(f"round{r} {m}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
                continue
            samples[m].append(rec["docs_per_sec"])
            print(f"round{r} {m}: {rec['docs_per_sec']:,} docs/s ({rec['sec']} s)")

    summary = {
        m: {"best": max(v), "all": v} for m, v in samples.items() if v
    }
    print(json.dumps({"rows": rows, "modes": summary}))


if __name__ == "__main__":
    main()
