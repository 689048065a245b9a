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
