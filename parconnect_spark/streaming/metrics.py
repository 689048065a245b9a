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


def spill_totals(spark) -> tuple[int, int] | None:
    """Cumulative (memory_spill_bytes, disk_spill_bytes) summed across all
    retained stages, read from the JVM AppStatusStore's stage list (the
    executor summary does not carry spill counters). Same contract as
    ``shuffle_totals``: no Spark job, UI-independent, diff consecutive
    snapshots for per-superstep spill volume, best-effort None on accessor
    drift. Spill deltas separate "the superstep got slower" from "the
    superstep started spilling" — the distinction that matters when sizing
    partitions for executor memory at scale. Cost is O(retained stages)
    py4j calls (capped by spark.ui.retainedStages, default 1000); totals
    under-count once early stages are evicted from the store, which only
    deflates deltas of long-past supersteps, never current ones."""
    try:
        sc = spark.sparkContext
        jvm, gw = sc._jvm, sc._gateway
        statuses = jvm.java.util.ArrayList()
        for s in ("COMPLETE", "ACTIVE", "FAILED", "PENDING", "SKIPPED"):
            statuses.add(jvm.org.apache.spark.status.api.v1.StageStatus.valueOf(s))
        stages = sc._jsc.sc().statusStore().stageList(
            statuses, False, False, gw.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
        n = stages.size()
        mem = sum(stages.apply(i).memoryBytesSpilled() for i in range(n))
        disk = sum(stages.apply(i).diskBytesSpilled() for i in range(n))
        return int(mem), int(disk)
    except Exception:
        return None


class IoTelemetry:
    """Per-superstep shuffle + spill byte deltas for iterative plan loops.

    Construct once before the loop (snapshots the session-cumulative
    counters), call ``record(m)`` after each superstep's action to add
    ``shuffle_read/write_bytes`` and ``memory/disk_spill_bytes`` deltas to
    that superstep's metrics dict. Inherits both accessors' best-effort
    contract: keys are simply absent if the JVM internals drift."""

    def __init__(self, spark):
        self._spark = spark
        self._sh = shuffle_totals(spark)
        self._sp = spill_totals(spark)

    def record(self, m: dict) -> None:
        sh, sp = shuffle_totals(self._spark), spill_totals(self._spark)
        if self._sh is not None and sh is not None:
            m["shuffle_read_bytes"] = sh[0] - self._sh[0]
            m["shuffle_write_bytes"] = sh[1] - self._sh[1]
        if self._sp is not None and sp is not None:
            m["memory_spill_bytes"] = sp[0] - self._sp[0]
            m["disk_spill_bytes"] = sp[1] - self._sp[1]
        self._sh, self._sp = sh, sp


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
