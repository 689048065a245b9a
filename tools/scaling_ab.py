#!/usr/bin/env python
"""A/B the CC superstep configurations at two pinned core counts.

Usage: python tools/scaling_ab.py /path/edges.parquet "2,8" [reps]
Emits one JSON line per (config, cpus) run.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    {"SPARK_GRAFT_CC_MATERIALIZE": "persist", "SPARK_GRAFT_SHUFFLE_COMPRESS": "1"},
    {"SPARK_GRAFT_CC_MATERIALIZE": "persist", "SPARK_GRAFT_SHUFFLE_COMPRESS": "0"},
    {"SPARK_GRAFT_CC_MATERIALIZE": "local_checkpoint", "SPARK_GRAFT_SHUFFLE_COMPRESS": "0"},
]


def main():
    edges = sys.argv[1]
    levels = [int(x) for x in sys.argv[2].split(",")]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    for _ in range(reps):
        for cfg in CONFIGS:
            for lvl in levels:
                env = dict(os.environ, **cfg)
                out = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py"),
                     "--cc-worker", str(lvl), edges],
                    capture_output=True, text=True, env=env,
                )
                line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else json.dumps({"err": out.stderr[-400:]})
                print(line, flush=True)


if __name__ == "__main__":
    main()
