"""Weighted single-source shortest paths — synchronous Bellman–Ford as
iterative DataFrame relaxation.

The reference's BFS (plans/bfs.py) is the unweighted special case; this is
the weighted generalization a link-graph engine needs for cost-annotated
edges (co-occurrence multiplicities, latencies, capacities). Plan per
round: one frontier ⨝ edges expansion + map-side-combined MIN — the
min-plus (tropical) matrix-vector product — then a full-outer merge with
the running distance table. Distances stay EXACT int64 when weights are
integers (the contract case): no float accumulation anywhere.

Convergence = a round that improves no vertex; round count is bounded by
the longest shortest-path hop count (≤ |V|−1 with positive weights — the
Bellman–Ford invariant: after k rounds all shortest paths of ≤ k hops are
final; the fixpoint is a no-op, which is what lets the DuckDB oracle
unroll a fixed round budget). Per-round lazy localCheckpoints keep plan
depth O(1) (the CC loop's discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sssp(
    edges: DataFrame,
    source: int,
    weight_col: str = "weight",
    max_rounds: int = 256,
) -> tuple[DataFrame, int]:
    """(DataFrame[v: long, dist: long], rounds) over vertices reachable
    from ``source``. ``edges`` are DIRECTED (src, dst, weight>0); pass a
    symmetrized table for undirected semantics. Raises if the round budget
    is exhausted before the fixpoint (never converging silently wrong —
    the connectivity-loop refusal rule)."""
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(source), 0)], "v long, dist long"
    ).localCheckpoint()
    rounds = 0
    while True:
        if rounds >= max_rounds:
            raise RuntimeError(f"sssp did not converge in {max_rounds} rounds")
        relax = (
            dist.join(edges, dist["v"] == edges["src"])
            .select(
                F.col("dst").alias("v"),
                (F.col("dist") + F.col(weight_col).cast("long")).alias("dist"),
            )
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.unionByName(relax)
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        rounds += 1
        improved = (
            merged.join(
                dist.withColumnRenamed("dist", "_old"), "v", "left"
            )
            .where(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .count()
        )
        dist = merged
        if improved == 0:
            return dist, rounds
