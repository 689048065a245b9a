#!/usr/bin/env python
"""Hardware-ceiling probe for the N→4N scaling rule: measures how the HOST
itself scales from N to 4N pinned cores on the two resources a CC superstep
spends its time on — streaming memory bandwidth (shuffle write/read, cache
materialization) and shuffle-like random gather/scatter (hash partitioning,
hash aggregation). The efficiency these proxies reach between the same two
core sets is the ceiling ANY memory-heavy job can reach on this box;
reported next to the engine's own efficiency in BASELINE.md.

Usage: python tools/ceiling_probe.py [core_counts_csv]  (default "1,2,4,8,16,32")
Prints one JSON line per (kernel, cpus).
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

WORKER = r"""
import os, sys, time
import numpy as np

core = int(sys.argv[1]); kernel = sys.argv[2]
os.sched_setaffinity(0, {core})
n = 32_000_000  # 256 MB per array — far beyond LLC, short enough to repeat
rng = np.random.default_rng(12345)
if kernel == "stream":
    a = np.ones(n); b = np.ones(n); c = np.empty(n)
    c[:] = 0  # fault pages before timing
    def rep():
        np.add(a, b, out=c)          # 2 reads + 1 write
    bytes_per_rep = n * 8 * 3
else:  # shuffle: random gather + scatter of 8-byte records
    src = rng.integers(0, 1 << 62, n, dtype=np.int64)
    idx = rng.permutation(n)
    dst = np.empty(n, dtype=np.int64)
    dst[:] = 0
    def rep():
        np.take(src, idx, out=dst)   # random-gather read + stream write
    bytes_per_rep = n * 8 * 3        # src random + idx stream + dst write
rep()  # warmup
times = []
for _ in range(7):
    t0 = time.perf_counter(); rep(); times.append(time.perf_counter() - t0)
times.sort()
print(bytes_per_rep / times[len(times)//2] / 1e9)
"""


def steal_sample():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7]


def run_level(cpus: int, kernel: str) -> dict:
    ncpu = os.cpu_count() or cpus
    cores = list(range(ncpu - cpus, ncpu))  # highest cores, like bench.py
    t0, s0 = steal_sample()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(c), kernel],
            stdout=subprocess.PIPE, text=True,
        )
        for c in cores
    ]
    vals = [float(p.communicate()[0].strip()) for p in procs]
    t1, s1 = steal_sample()
    return {
        "probe": kernel,
        "cpus": cpus,
        "gb_per_sec_total": round(sum(vals), 2),
        "gb_per_sec_median_core": round(statistics.median(vals), 2),
        "cpu_steal_frac": round((s1 - s0) / max(t1 - t0, 1), 4),
    }


if __name__ == "__main__":
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8,16,32").split(",")]
    for kernel in ("stream", "shuffle"):
        for cpus in levels:
            print(json.dumps(run_level(cpus, kernel)), flush=True)
