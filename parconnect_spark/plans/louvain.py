"""Louvain local-moving phase, synchronous and deterministic (SURVEY.md
§2.10 family; absent from the reference — completes the engine's Louvain
trio: this move phase + operators/graph.contract_graph (the coarsening
level) + plans/labelprop-based modularity scoring).

One round: every vertex simultaneously evaluates moving into each
neighboring community and takes the modularity-gain argmax, moving only on
a STRICT improvement over staying. The classic sequential Louvain visits
vertices in an arbitrary order (non-deterministic across runs and engines);
the synchronous variant (Ghosh et al., "Distributed Louvain Algorithm for
Graph Community Detection", IPDPS 2018) evaluates all vertices against the
previous round's communities — the only formulation a data-parallel engine
and a SQL oracle can both replay exactly.

Determinism of the gain comparison (the cross-engine contract): for
integer edge weights every modularity-gain comparison is EXACT integer
arithmetic. Joining community C beats staying in c(i) iff

    G(C) = 2m·k_{i,in}(C) − k_i·Σtot'(C)   >   G(c(i))

where Σtot'(C) excludes k_i when i ∈ C — the ΔQ numerators with the
common 1/(2m)² factor cleared (2m = total directed weight). Ties break to
the SMALLEST community id via one lexicographic max over (G, −C) structs.
Bounds: exact while 2m·max(k_i) < 2^63 — far beyond any per-level graph
this engine contracts; past that, the same plan runs on decimal(38,0).

Physical plan, per round: k_{i,in} is one join + one map-side-combined
sum grouped by (vertex, neighbor community); Σtot one aggregate over |V|
rows; the argmax one grouped max of structs (no windows — a hub vertex's
candidate rows combine map-side); community state is lazily
localCheckpointed (the CC loop's O(1)-plan-depth rule). No collects
beyond the one scalar 2m.

Caveat, measured and deliberate: synchronous rounds are best-response
dynamics — each move is gain-positive ONLY with the others held fixed, so
simultaneous moves can interfere and global Q is not monotone (sequential
Louvain's monotonicity needs per-move recomputation, which no data-
parallel engine can afford). On planted modular structure the dynamics
recover the communities exactly (two-clique test); on the hub-dominated
transcript graph they converge in 2 rounds to a stable equilibrium whose
Q (−0.28) sits below the singleton start (−0.195) — every vertex is at
its individual optimum, the hub pile-on is collective. Pair with
plans/labelprop modularity scoring to MEASURE what a round bought before
contracting (operators/graph.contract_graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def louvain_move(
    wedges: DataFrame,
    rounds: int = 2,
) -> tuple[DataFrame, int]:
    """Synchronous Louvain move rounds over a weighted undirected graph.

    ``wedges``: DataFrame[src, dst, weight] with BOTH directions present
    (symmetric), integer weights, no self-loops. Returns
    ``(communities, m2)``: DataFrame[v: long, c: long] after ``rounds``
    synchronous rounds from the singleton start, and the total directed
    weight 2m (handy for callers scoring modularity).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    deg = (
        wedges.groupBy(F.col("src").alias("v"))
        .agg(F.sum("weight").cast("long").alias("k"))
        .localCheckpoint()
    )
    m2 = deg.agg(F.sum("k")).first()[0]
    cm = deg.select("v", F.col("v").alias("c"))
    for _ in range(rounds):
        # k_{i,in}(cc): weight from i into each neighbouring community.
        # ("cc" = candidate community — Spark resolves names
        # case-insensitively, so it must not collide with "c".)
        kin = (
            wedges.join(
                cm.select(F.col("v").alias("dst"), F.col("c").alias("cc")),
                "dst",
            )
            .groupBy(F.col("src").alias("v"), "cc")
            .agg(F.sum("weight").cast("long").alias("kin"))
        )
        tot = cm.join(deg, "v").groupBy(F.col("c").alias("cc")).agg(
            F.sum("k").alias("tot")
        )
        # candidate rows: every neighbouring community, PLUS the own
        # community (kin 0 when no neighbour shares it) so "stay" always
        # has a gain row to compare against.
        own = cm.select("v", F.col("c").alias("cc"))
        cand = (
            kin.unionByName(own.withColumn("kin", F.lit(0).cast("long")))
            .groupBy("v", "cc")
            .agg(F.max("kin").alias("kin"))
        )
        g = (
            cand.join(cm, "v")
            .join(deg, "v")
            .join(tot, "cc")
            .select(
                "v",
                "cc",
                "c",
                (
                    F.lit(int(m2)) * F.col("kin")
                    - F.col("k")
                    * (
                        F.col("tot")
                        - F.when(
                            F.col("cc") == F.col("c"), F.col("k")
                        ).otherwise(F.lit(0))
                    )
                ).alias("g"),
            )
        )
        stay = g.where(F.col("cc") == F.col("c")).select(
            "v", F.col("g").alias("g_own")
        )
        best = (
            g.where(F.col("cc") != F.col("c"))
            .groupBy("v")
            .agg(F.max(F.struct(F.col("g"), (-F.col("cc")).alias("nc"))).alias("b"))
            .select("v", (-F.col("b.nc")).alias("c_best"), F.col("b.g").alias("g_best"))
        )
        cm = (
            cm.join(stay, "v")
            .join(best, "v", "left")
            .select(
                "v",
                F.when(
                    F.col("g_best") > F.col("g_own"), F.col("c_best")
                )
                .otherwise(F.col("c"))
                .alias("c"),
            )
            .localCheckpoint(eager=False)
        )
    return cm, int(m2)
