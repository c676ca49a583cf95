#!/usr/bin/env python3
"""r6: engine-scaling CONTROL pair. The r6 flagship optimization cut
per-row compute ~4x, so the bench flagship became shuffle/fixed-cost
weighted and its single-box 8->32 efficiency dropped (guide §2.2 —
expected once a job is shuffle-bound). This probe re-runs the SAME
pipeline with the precomputed text_len column dropped (forcing the
per-row length(text) recompute — the r5-shape compute density) at two
parallelism levels, fresh JVM each, to show the ENGINE's scaling is
unchanged: heavier per-row work -> efficiency back at target.

Usage: python scripts/scaling_heavy_probe.py [rows] [reps]
Child: --child <cpus> <rows> <reps>
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
from bench import force
from benthos_spark.session import get_spark
from benthos_spark.fixtures import pages
from benthos_spark.pipelines import pages_windowed_dedupe_agg
rows, reps = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name="scaling_heavy")
def q(n):
    return pages_windowed_dedupe_agg(
        pages(spark, n, n_hosts=1000, rows_per_sec=100).drop("text_len"),
        window_size="10 minutes", hash_key=True)
force(q(10_000))
best = float("inf")
for _ in range(reps):
    t0 = time.perf_counter(); force(q(rows))
    best = min(best, time.perf_counter() - t0)
print("RESULT", rows / best, best)
spark.stop()
"""


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_level(cpus, rows, reps):
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    pre = loadavg()
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(rows), str(reps)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    post = loadavg()
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT")][-1]
    _, rate, sec = line.split()
    return {"cpus": cpus, "docs_per_sec": round(float(rate), 1),
            "sec": round(float(sec), 3), "load_pre": pre, "load_post": post}


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    best = {}
    for rnd in range(2):
        for cpus in (8, 32):
            r = run_level(cpus, rows, reps)
            if cpus not in best or r["docs_per_sec"] > best[cpus]["docs_per_sec"]:
                best[cpus] = r
            print(json.dumps({"round": rnd, **r}), flush=True)
    eff = best[32]["docs_per_sec"] / best[8]["docs_per_sec"] / 4
    print(json.dumps({"rows": rows, "heavy_path_efficiency": round(eff, 3),
                      "best": best,
                      "stamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}),
          flush=True)


if __name__ == "__main__":
    main()
