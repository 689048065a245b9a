#!/usr/bin/env python
"""Diagnostic ladder for the scaling bench: measures (a) a memory-bandwidth
proxy and (b) CC superstep throughput at pinned core counts 1..32 on the
same pre-materialized edge graph. Prints one JSON line per measurement.

Usage:
    python tools/scaling_probe.py bandwidth
    python tools/scaling_probe.py gen /path/edges.parquet [n_convs]
    python tools/scaling_probe.py cc <cpus> /path/edges.parquet
    python tools/scaling_probe.py ladder /path/edges.parquet "1,2,4,8,16,32"
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bandwidth_probe() -> None:
    """STREAM-triad-ish proxy: parallel numpy copies on pinned cores.

    Spawns <cpus> pinned single-core workers each doing a large triad loop;
    aggregate GB/s approximates the box's usable bandwidth at that core
    count. The ratio ladder bounds any memory-bound job's scaling."""
    for cpus in (1, 2, 4, 8, 16, 32):
        procs = []
        for i in range(cpus):
            p = subprocess.Popen(
                [sys.executable, "-c", (
                    "import os,sys,time,numpy as np\n"
                    f"os.sched_setaffinity(0, {{{i}}})\n"
                    "n = 64_000_000\n"
                    "a = np.ones(n); b = np.ones(n); c = np.empty(n)\n"
                    "t0 = time.monotonic(); reps = 5\n"
                    "for _ in range(reps): np.add(a, b, out=c); c *= 1.000001\n"
                    "dt = time.monotonic() - t0\n"
                    # triad reads a+b writes c, then read+write c: ~5 arrays
                    "gb = reps * n * 8 * 5 / 1e9\n"
                    "print(gb / dt)"
                )],
                stdout=subprocess.PIPE, text=True,
            )
            procs.append(p)
        total = 0.0
        for p in procs:
            out, _ = p.communicate()
            total += float(out.strip())
        print(json.dumps({"probe": "bandwidth", "cpus": cpus,
                          "gb_per_sec": round(total, 2)}), flush=True)


def ladder(edges_path: str, levels: str) -> None:
    for lvl in [int(x) for x in levels.split(",")]:
        t0 = time.monotonic()
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--cc-worker", str(lvl), edges_path],
            capture_output=True, text=True,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        rec = json.loads(line)
        rec["wall"] = round(time.monotonic() - t0, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "bandwidth":
        bandwidth_probe()
    elif mode == "gen":
        os.environ.setdefault("SPARK_GRAFT_SCALE_CONVS", sys.argv[3] if len(sys.argv) > 3 else "2400000")
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                        "--gen-graph", sys.argv[2]], check=True)
    elif mode == "cc":
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                        "--cc-worker", sys.argv[2], sys.argv[3]], check=True)
    elif mode == "ladder":
        ladder(sys.argv[2], sys.argv[3])
