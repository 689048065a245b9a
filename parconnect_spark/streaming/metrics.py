"""Superstep metrics via df.observe() — the Spark-native version of the
reference's per-section timers and workload telemetry
(/root/reference/src/coloring/labelProp.hpp:283-342 section timers,
:658-669 active-tuple min/mean/max skew log).

``observe`` piggybacks aggregates on an existing action, so frontier sizes /
active counts cost no extra job — the cheap convergence-adjacent telemetry
SURVEY.md §7 calls for (hard part d).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, functions as F


def shuffle_totals(spark) -> tuple[int, int] | None:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) summed across
    executors, read from the JVM AppStatusStore — works with the web UI
    disabled, costs no Spark job. Callers diff consecutive snapshots to get
    per-superstep shuffle volume (the "shuffle metrics" half of the
    per-superstep telemetry rule). Totals are session-cumulative, so deltas
    are only attributable when supersteps run sequentially — true for every
    plan loop here. Best-effort: returns None if the internal accessor
    shape changes across Spark versions (telemetry is never worth a
    crash)."""
    try:
        ex = spark.sparkContext._jsc.sc().statusStore().executorList(False)
        n = ex.size()
        read = sum(ex.apply(i).totalShuffleRead() for i in range(n))
        write = sum(ex.apply(i).totalShuffleWrite() for i in range(n))
        return int(read), int(write)
    except Exception:
        return None


class SuperstepMetrics:
    """Collects one dict per superstep; attach() wraps a DataFrame with an
    Observation whose results are harvested after the caller's action."""

    def __init__(self):
        self.rows: list[dict] = []
        self._pending: list[tuple[int, Observation, float]] = []

    def attach(self, df: DataFrame, superstep: int) -> DataFrame:
        obs = Observation(f"superstep_{superstep}")
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
        )
        self._pending.append((superstep, obs, time.monotonic()))
        return out

    def harvest(self) -> list[dict]:
        for step, obs, t0 in self._pending:
            vals = dict(obs.get)
            vals["superstep"] = step
            vals["harvested_after_s"] = time.monotonic() - t0
            self.rows.append(vals)
        self._pending.clear()
        return self.rows
