"""k-truss decomposition by iterative edge peeling (SURVEY.md §2.10 family;
absent from the reference — the standard web-graph cohesion operator one
step up from triangles/k-core, e.g. the GraphChallenge k-truss kernel).

The k-truss is the maximal subgraph in which every edge participates in at
least k-2 triangles (equivalently: every edge's endpoints share >= k-2
common neighbors *within the subgraph*). Synchronous peel: each round drops
every edge whose current support is < k-2; the fixpoint is the k-truss
(order-independent, so it matches the textbook sequential peel).

Physical plan — triangles are enumerated ONCE, support is maintained
INCREMENTALLY (the same delta discipline as plans/kcore.py's degrees):

* round 0 pays one degree-ordered node-iterator enumeration
  (plans/triangles.enumerate_triangles — the hub-guarded wedge join that
  survives power-law skew) and materializes the triangle-edge incidence
  table TE[a, b, c, e]: three rows per triangle, ``e`` the packed canonical
  edge key. Support is one hash aggregate over TE.
* each later round only touches the DELTA: a triangle dies when its first
  edge is peeled, so the round semi-joins TE against the just-removed edge
  set (broadcast under a gate — the fringe is typically thin), distincts
  the dead triangle triples, decrements the supports of their OTHER edges
  via one small aggregate, and anti-joins TE down. The |TE|-row table is
  never re-shuffled; per-round shuffle volume is proportional to the
  triangles that actually died. The naive alternative — re-enumerating
  triangles per round — pays the full wedge join every round, which is
  exactly what kills the recompute formulation at 100x scale.
* TE and the support table are lazily localCheckpoint'ed per round and
  materialized by the next round's removed-count action, keeping plan
  depth O(1) across rounds (the CC loop's discipline).

Edge keys pack (lo, hi) as ``lo << 32 | hi`` — the same single-long packing
plans/connectivity.py uses for its window rounds; ids are dense-relabeled
longs < 2^32 by construction (operators/relabel.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.operators.graph import canonicalize
from parconnect_spark.plans.triangles import enumerate_triangles

BROADCAST_MAX_ROWS = 8_000_000


def _ekey(u: F.Column, v: F.Column) -> F.Column:
    """Packed canonical edge key: least(u,v) << 32 | greatest(u,v)."""
    return F.shiftleft(F.least(u, v), 32) + F.greatest(u, v)


def ktruss(
    edges: DataFrame,
    k: int,
    max_rounds: int | None = None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> tuple[DataFrame, int]:
    """Edges of the k-truss with their within-truss triangle support.

    ``edges``: distinct symmetric (src, dst) long pairs, both directions
    present, no self-loops (the shape derive_edges/symmetrize emit).
    Returns (DataFrame[src: long, dst: long, support: long], rounds) with
    src < dst, one row per undirected k-truss edge; empty when the k-truss
    is. ``max_rounds`` bounds the peel (None = run to fixpoint); hitting
    the bound raises, mirroring connectivity's refusal to return
    unconverged results.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (k-2 triangle support)")
    min_sup = k - 2

    und = canonicalize(edges)  # src < dst, one row per undirected edge
    tri = enumerate_triangles(und)
    # incidence: 3 rows per triangle, each tagged with one canonical edge key
    te = (
        tri.select(
            "a", "b", "c",
            F.explode(
                F.array(
                    _ekey(F.col("a"), F.col("b")),
                    _ekey(F.col("a"), F.col("c")),
                    _ekey(F.col("b"), F.col("c")),
                )
            ).alias("e"),
        )
        .localCheckpoint()
    )
    sup = (
        und.select(_ekey(F.col("src"), F.col("dst")).alias("e"))
        .join(te.groupBy("e").agg(F.count(F.lit(1)).alias("sup")), "e", "left")
        .select("e", F.coalesce("sup", F.lit(0)).alias("sup"))
        .localCheckpoint()
    )

    rounds = 0
    while True:
        removed = sup.where(F.col("sup") < min_sup).select("e")
        n_removed = removed.count()
        if n_removed == 0:
            break
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError(
                f"ktruss did not converge within {max_rounds} rounds"
            )
        if n_removed <= broadcast_max_rows:
            removed = F.broadcast(removed)
        # a triangle dies when ANY of its 3 edges is peeled this round
        dead = (
            te.join(removed, "e", "left_semi")
            .select("a", "b", "c")
            .distinct()
        )
        dec = (
            te.join(dead, ["a", "b", "c"], "left_semi")
            .groupBy("e")
            .agg(F.count(F.lit(1)).alias("_dec"))
        )
        sup = (
            sup.join(removed, "e", "left_anti")
            .join(dec, "e", "left")
            .select(
                "e",
                (F.col("sup") - F.coalesce("_dec", F.lit(0))).alias("sup"),
            )
            .localCheckpoint(eager=False)
        )
        te = te.join(dead, ["a", "b", "c"], "left_anti").localCheckpoint(
            eager=False
        )

    out = sup.select(
        F.shiftright("e", 32).alias("src"),
        (F.col("e") - F.shiftleft(F.shiftright("e", 32), 32)).alias("dst"),
        F.col("sup").alias("support"),
    )
    return out, rounds
