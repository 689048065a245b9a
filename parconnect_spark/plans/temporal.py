"""Time-respecting reachability — earliest-arrival over timed edges.

Temporal-graph family member (SURVEY.md §2.10 scope extension): in a
timed edge table an edge (u → v, t) is traversable only AT time t, so
reachability must respect non-decreasing timestamps — "information
starting at the source can reach v by time T" — which static CC/BFS
over the same edges overstates (they'd happily walk backwards in time).

The fixpoint is the label-correcting earliest-arrival relaxation:

    arr(v) ← min(arr(v), min { t : (u → v, t) ∈ E, t ≥ arr(u) })

monotone non-increasing over a finite value set ⇒ converges; each round
is one join + two map-side-combined min-aggregates, the same
superstep calculus as plans/sssp.py (Bellman–Ford) with the time
constraint replacing the additive weight. Convergence is detected by
the (count, sum) checksum fingerprint — the plans/connectivity.py
discipline — not by comparing tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def earliest_arrival(
    tedges: DataFrame,
    source: str,
    start_time: int = 0,
    max_iters: int = 100,
) -> DataFrame:
    """DataFrame[v, arrival]: earliest epoch-us time at which a
    time-respecting path from ``source`` (departing no earlier than
    ``start_time``) reaches v. The source row carries ``start_time``;
    unreachable vertices are absent. Raises if ``max_iters`` rounds
    don't converge (longest time-respecting path bound exceeded —
    a loud guard, same contract as the CC iteration cap)."""
    spark = tedges.sparkSession
    e = tedges.select("src", "dst", "t").localCheckpoint()
    arr = spark.createDataFrame(
        [(source, start_time)], "v string, arrival long"
    ).localCheckpoint()
    prev = (1, start_time)
    for _ in range(max_iters):
        relax = (
            e.join(arr, e["src"] == arr["v"])
            .where(F.col("t") >= F.col("arrival"))
            .select(F.col("dst").alias("v"), F.col("t").alias("arrival"))
        )
        arr = (
            arr.unionByName(relax)
            .groupBy("v")
            .agg(F.min("arrival").alias("arrival"))
            .localCheckpoint()
        )
        row = arr.agg(
            F.count(F.lit(1)).alias("c"), F.sum("arrival").alias("s")
        ).collect()[0]
        cur = (row["c"], row["s"])
        if cur == prev:
            return arr
        prev = cur
    raise RuntimeError(
        f"earliest_arrival did not converge in {max_iters} rounds"
    )
