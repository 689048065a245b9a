"""Greedy distributed graph coloring (Jones–Plassmann) — the classic
scheduling/symmetry-breaking primitive (register allocation, conflict-free
update scheduling, parallel Gauss-Seidel orderings), on the same
iterate-until-fixpoint substrate as plans/mis.py (SURVEY.md §2.10 family;
absent from the reference, which stops at connectivity).

Jones–Plassmann with a STATIC priority: every vertex draws one fixed
priority; each round, a still-uncolored vertex whose every uncolored
neighbor has a strictly smaller (priority, id) key becomes READY and takes
the mex (minimum excluded value) of its already-colored neighbors'
colors. Adjacent vertices can never be ready in the same round (one of
them holds the larger key), so simultaneous coloring is conflict-free by
construction, and the whole trajectory — who colors in which round, with
which color — is a deterministic function of the edge set.

Determinism (the cross-engine contract): the priority is the engine's
portable md5 fold ``md5int("<salt>:<vertex>")`` (functions/dedup.md5int,
15 hex digits = 60 bits) with vertex-id tie-break, and the mex is over
the SET of neighbor colors — both exactly replayable in SQL, so the
DuckDB oracle unrolls the identical rounds.

Physical plan, per round:
* readiness — one map-side-combinable ``max(struct(p(dst), dst))``
  grouped by src over the live (uncolored-uncolored) edge table, then a
  left join against the active vertex set (the MIS winner-test shape).
* mex — ready vertices join the FULL edge table against the colored
  table; per-vertex distinct neighbor colors fold through
  ``aggregate(array_sort(collect_set(color)), 0, (acc, x) → acc+1 if
  x=acc)`` — mex of a sorted distinct non-negative array, a pure
  Catalyst expression. The collected set is bounded by the vertex's
  degree (and in practice by the palette, ≤ Δ+1), the standard JP cost.
* shrink — colored vertices leave the active set and the live edge table
  by anti joins; per-round lazy ``localCheckpoint`` materialized by the
  round-count action (the CC loop's O(1)-plan-depth rule).

Round count is the longest strictly-decreasing priority path — O(log n /
log log n) expected on bounded-degree graphs, but a k-clique (e.g. the
per-conversation entity cliques of the transcript graph) serializes to k
rounds by necessity: within a clique only one vertex can color per round.
That is a property of JP itself, not of this plan; palette size stays
≤ Δ+1 regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.functions.dedup import md5int
from parconnect_spark.plans.mis import PRIORITY_HEX_CHARS


def _priority(col: F.Column, salt: str) -> F.Column:
    return md5int(
        F.concat(F.lit(f"{salt}:"), col.cast("string")),
        1,
        PRIORITY_HEX_CHARS,
    )


def jones_plassmann_coloring(
    edges: DataFrame,
    max_rounds: int = 256,
    salt: str = "jp",
) -> tuple[DataFrame, int]:
    """Greedy coloring of an undirected graph.

    ``edges``: distinct symmetric (src, dst) long pairs, both directions
    present, no self-loops (the shape derive_edges/symmetrize emit).
    Returns ``(coloring, rounds)`` where ``coloring`` is DataFrame[v:
    long, color: int, round: int] covering every vertex; no edge is
    monochromatic and every color is the mex of the vertex's
    earlier-colored neighborhood (so colors ≤ max degree). Raises if
    ``max_rounds`` is hit with vertices still uncolored.
    """
    spark = edges.sparkSession
    all_edges = edges.select("src", "dst").localCheckpoint(eager=False)
    verts = (
        all_edges.select(F.col("src").alias("v"))
        .unionByName(all_edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    live = all_edges
    colored = spark.createDataFrame([], "v long, color int, round int")
    rnd = 0
    while True:
        if verts.count() == 0:
            break
        if rnd >= max_rounds:
            raise RuntimeError(
                f"Jones-Plassmann did not finish in {max_rounds} rounds"
            )
        nbr_max = live.groupBy("src").agg(
            F.max(
                F.struct(
                    _priority(F.col("dst"), salt).alias("p"),
                    F.col("dst").alias("mv"),
                )
            ).alias("nk")
        )
        own = F.struct(
            _priority(F.col("v"), salt).alias("p"), F.col("v").alias("mv")
        )
        ready = (
            verts.join(nbr_max, verts["v"] == nbr_max["src"], "left")
            .where(F.col("src").isNull() | (own > F.col("nk")))
            .select("v")
            .localCheckpoint(eager=False)
        )
        # mex over already-colored neighbors (FULL edge table: colored
        # neighbors left the live table but their colors still exclude)
        used = (
            all_edges.join(ready.withColumnRenamed("v", "src"), "src")
            .join(
                colored.select(
                    F.col("v").alias("dst"), F.col("color").alias("_c")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.array_sort(F.collect_set("_c")).alias("_cs"))
        )
        mex = F.aggregate(
            F.coalesce(F.col("_cs"), F.array().cast("array<int>")),
            F.lit(0),
            lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
        )
        newly = (
            ready.join(used, ready["v"] == used["src"], "left")
            .select(
                "v",
                mex.cast("int").alias("color"),
                F.lit(rnd).cast("int").alias("round"),
            )
            .localCheckpoint(eager=False)
        )
        colored = colored.unionByName(newly).localCheckpoint(eager=False)
        verts = verts.join(ready, "v", "left_anti").localCheckpoint(
            eager=False
        )
        live = (
            live.join(ready.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(ready.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        rnd += 1
    return colored, rnd
