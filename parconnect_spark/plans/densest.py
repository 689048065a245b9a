"""Densest-subgraph extraction — the parallel greedy peel of Bahmani,
Kumar & Vassilvitskii (VLDB 2012), a (2+2ε)-approximation of Goldberg's
maximum-density subgraph in O(log n / ε) rounds.

Each round removes EVERY vertex whose degree is ≤ (1+ε)·avg_degree —
one hash aggregate (degrees) + two semi joins (surviving edges) — and
remembers the round with the highest density ρ = |E|/|V|. The batch
removal is what makes the algorithm MapReduce/Spark-shaped: Charikar's
one-vertex-at-a-time peel is inherently sequential, this one's round
count is logarithmic, so the per-superstep fixed cost amortizes exactly
like the CC loop's.

Determinism note (the oracle contract): the removal threshold is the
double expression ``(1+ε) · (rows/nv)`` computed identically by any IEEE
engine from the two exact integers (symmetric row count, vertex count) —
the unrolled SQL oracle replays the same peel decisions bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def densest_subgraph(
    edges: DataFrame, epsilon: float = 0.1, max_rounds: int = 64
) -> tuple[DataFrame, dict]:
    """(members, stats) for the densest peel round: ``members`` is
    DataFrame[v: long]; ``stats`` has round / n_vertices / n_edges (an
    undirected count) / density. ``edges`` must be distinct symmetric
    pairs without self-loops."""
    cur = edges.localCheckpoint(eager=False)
    best = None  # (density, round, nv, rows, members_df)
    rounds = 0
    while True:
        deg = (
            cur.groupBy(F.col("src").alias("v"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=False)
        )
        stats = deg.agg(
            F.count(F.lit(1)).alias("nv"), F.sum("deg").alias("rows")
        ).collect()[0]
        nv, rows = stats["nv"], stats["rows"]
        if not nv:
            break
        density = rows / (2.0 * nv)
        if best is None or density > best[0]:
            best = (density, rounds, nv, rows, deg.select("v"))
        if rounds >= max_rounds:
            raise RuntimeError(
                f"densest-subgraph peel exceeded {max_rounds} rounds"
            )
        # the parallel peel rule: everything at-or-below (1+eps)*avg degree.
        # The threshold is ONE double expression, factor * (rows / nv), on
        # exact integers — any IEEE engine (this one, the SQL oracle,
        # Python) computes the identical double, so peel decisions replay
        # bit-for-bit.
        threshold = (1.0 + epsilon) * (float(rows) / float(nv))
        survivors = deg.where(F.col("deg") > F.lit(threshold)).select("v")
        cur = (
            cur.join(survivors.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(survivors.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
        rounds += 1

    density, rnd, nv, rows, members = best
    return members, {
        "round": rnd,
        "n_vertices": int(nv),
        "n_edges": int(rows) // 2,
        "density": density,
    }
