#!/usr/bin/env python3
"""Interleaved fresh-JVM re-measurement of driver-bench regressions.

Round-4 verdict "What's wrong #2": three r4 driver numbers regressed vs r3
(dedup_simhash 0.99->1.46 s, window_session 0.80->1.12 s,
flagship_streaming 135.9k->120.1k docs/s) with no code change that explains
them; this host's documented minute-scale tenant noise is the suspected
cause. This script measures each target in a FRESH JVM, interleaved
A/B/C/A/B/C so a noisy minute hits all targets equally, and reports every
sample plus the best — the same method that root-caused the r3 streaming
regression (scripts/streaming_ab.py).

Usage:   python scripts/regression_ab.py [--repeat K] [--sf DIR]
Child:   python scripts/regression_ab.py --child --target <name>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r5: dedup_simhash merged into simhash_family (registry consolidation) —
# the A/B method stays valid, the target name follows the registry
TARGETS = ["simhash_family", "window_session", "flagship_streaming"]


def child(target: str, sf_dir: str) -> None:
    sys.path.insert(0, REPO)
    from benthos_spark.session import get_spark

    spark = get_spark(app_name=f"ab_{target}")
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    if target == "flagship_streaming":
        import shutil
        import tempfile

        from benthos_spark.pipelines import pages_windowed_dedupe_agg
        from benthos_spark.streaming.sink import IdempotentSink, run_to_sink
        from benthos_spark.streaming.source import (
            pages_file_stream, write_pages_input,
        )

        stream_rows = 1_000_000
        for _ in range(2):
            workdir = tempfile.mkdtemp(prefix="ab_stream_")
            try:
                write_pages_input(
                    spark, f"{workdir}/in", stream_rows, n_chunks=8,
                    n_hosts=1000, rows_per_sec=100,
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
                dt = time.perf_counter() - t0
                times.append(round(stream_rows / dt, 1))  # docs/s (higher=better)
            finally:
                shutil.rmtree(workdir, ignore_errors=True)
    else:
        import __spark_entry__ as entry_mod
        from bench import force

        fn = entry_mod.queries()[target]
        force(fn(spark, "/root/testdata/sf0.001"))  # warm codegen, not timed
        for _ in range(2):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"target": target, "samples": times}))


def main() -> None:
    if "--child" in sys.argv:
        target = sys.argv[sys.argv.index("--target") + 1]
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        child(target, sf)
        return
    repeat = 3
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    results: dict[str, list[float]] = {t: [] for t in TARGETS}
    for r in range(repeat):
        for t in TARGETS:  # interleaved: one noisy minute hits all targets
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--target", t],
                capture_output=True, text=True, cwd=REPO, timeout=900,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"round {r} {t}: CHILD FAILED\n{out.stderr[-800:]}",
                      file=sys.stderr)
                continue
            samples = json.loads(line[-1])["samples"]
            results[t].extend(samples)
            print(f"round {r} {t}: {samples}", flush=True)
    print("\n=== summary (fresh-JVM interleaved, all samples) ===")
    for t in TARGETS:
        s = results[t]
        if not s:
            continue
        best = max(s) if t == "flagship_streaming" else min(s)
        print(json.dumps({"target": t, "samples": s, "best": best}))


if __name__ == "__main__":
    main()
