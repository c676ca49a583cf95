#!/usr/bin/env python3
"""r6: opportunistic 8->32 scaling attempts with HOST-STATE EVIDENCE.

The shared host is tenant-capped in bursts (loadavg 9-30 with zero local
processes — the same signature the r5 verdict documented), so scaling
pairs are only meaningful in quiet windows. This runner:

- gates on 1-min loadavg < ``--gate`` before starting a pair,
- records /proc/loadavg BEFORE AND AFTER every level sample into the
  attempt log (the r5 verdict's "self-evidencing" ask — a contaminated
  attempt is provable from the artifact),
- appends every attempt to ``--log`` (JSONL), and stops early once a
  pair with efficiency >= 0.8 AND clean load evidence (max load during
  both samples < gate+parallelism overshoot) is found.

Usage: python scripts/scaling_opportunistic.py [--rows N] [--attempts K]
       [--gate L] [--sleep S] [--log PATH]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_level(cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pre = loadavg()
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--flagship-only",
         "--rows", str(rows), "--repeat", "2"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    post = loadavg()
    r = json.loads(out.stdout.strip().splitlines()[-1])
    return {
        "cpus": cpus,
        "docs_per_sec": r["value"],
        "sec": r["queries"]["flagship_pages_pipeline"],
        "load_pre": pre,
        "load_post": post,
        "wall": round(time.time() - t0, 1),
    }


def main() -> None:
    def opt(name, default):
        return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default

    rows = int(opt("--rows", "160000000"))
    attempts = int(opt("--attempts", "8"))
    gate = float(opt("--gate", "1.5"))
    sleep_s = float(opt("--sleep", "120"))
    log = opt("--log", "/tmp/scaling_attempts_r6.jsonl")

    for att in range(attempts):
        while loadavg() >= gate:
            time.sleep(sleep_s)
        a8 = run_level(8, rows)
        a32 = run_level(32, rows)
        eff = (a32["docs_per_sec"] / a8["docs_per_sec"]) / 4.0
        # clean = external load stayed near zero: post-sample loadavg is
        # dominated by our own run (<= cpus + slack); the 8-core sample is
        # the sensitive one (its post should stay well under 8+slack even
        # with our own threads, external tenants push it past)
        clean = (
            a8["load_pre"] < gate
            and a32["load_pre"] < gate + 10  # our own 8-core run decays slowly
            and a8["load_post"] < 8 + 4
            and a32["load_post"] < 32 + 8
        )
        rec = {"attempt": att, "rows": rows, "eff": round(eff, 3),
               "clean_load": clean, "l8": a8, "l32": a32,
               "stamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        with open(log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        if eff >= 0.8 and clean:
            print("MET — stopping", flush=True)
            return
    print("attempts exhausted", flush=True)


if __name__ == "__main__":
    main()
