"""Maximal independent set via Luby's algorithm (SURVEY.md §2.10 family;
absent from the reference — the canonical symmetry-breaking primitive of
parallel graph processing, on the same iterate-until-fixpoint substrate as
plans/connectivity.py).

Luby round: every active vertex draws a priority; a vertex joins the MIS
iff its priority is a strict local minimum among its active neighbors
(vertices with no active neighbor join unconditionally). Winners and their
neighbors deactivate; repeat until no vertex is active. Two adjacent
winners are impossible (each would need the strictly smaller key), and
every deactivated non-winner had a winner neighbor at removal time — so
the result is independent AND maximal.

Determinism (the cross-engine contract): the per-round priority is the
engine's portable md5 fold — ``md5int("<salt><round>:<vertex>")``
(functions/dedup.md5int, 15 hex digits = 60 bits) — with ties broken by
vertex id, i.e. the comparison key is the pair ``(priority, v)``. Both the
per-round winner set and the round at which each vertex joined are
engine-independent, so the DuckDB oracle replays the exact rounds.

Physical plan, per round:
* neighbor minimum — one map-side-combinable ``min(struct(p(dst), dst))``
  grouped by src over the live edge table (the CC grouped-min shape; hub
  vertices combine partially map-side, no per-vertex buffering).
* winner test — one left join of the active vertex set against that
  (≤ |V|-row) aggregate.
* deactivation — winners' neighborhoods come from one join against the
  live edges; the live vertex/edge tables shrink by two anti joins (AQE
  broadcasts the removed set when it is small).
* per-round lazy ``localCheckpoint`` materialized by the next round's
  count — the CC loop's O(1)-plan-depth rule.

Expected O(log |V|) rounds (each round kills a constant expected fraction
of live edges); the live tables only shrink. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.functions.dedup import md5int

#: widest md5 fold that stays inside signed-64 (16^15 < 2^63).
PRIORITY_HEX_CHARS = 15


def _priority(col: F.Column, rnd: int, salt: str) -> F.Column:
    return md5int(
        F.concat(F.lit(f"{salt}{rnd}:"), col.cast("string")),
        1,
        PRIORITY_HEX_CHARS,
    )


def luby_mis(
    edges: DataFrame,
    max_rounds: int = 64,
    salt: str = "mis",
) -> tuple[DataFrame, int]:
    """Maximal independent set of an undirected graph.

    ``edges``: distinct symmetric (src, dst) long pairs, both directions
    present, no self-loops (the shape derive_edges/symmetrize emit).
    Returns ``(mis, rounds)`` where ``mis`` is DataFrame[v: long,
    round: int] — the MIS members and the round each joined (round is
    deterministic observability, not an implementation leak: it is part of
    Luby's definition under the fixed priority sequence). Raises if
    ``max_rounds`` is hit with vertices still active.
    """
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    live = edges.select("src", "dst").localCheckpoint(eager=False)
    winners_acc: list[DataFrame] = []
    rnd = 0
    while True:
        if verts.count() == 0:
            break
        if rnd >= max_rounds:
            raise RuntimeError(f"Luby MIS did not finish in {max_rounds} rounds")
        nbr_min = live.groupBy("src").agg(
            F.min(
                F.struct(_priority(F.col("dst"), rnd, salt).alias("p"), F.col("dst").alias("mv"))
            ).alias("nk")
        )
        own = F.struct(
            _priority(F.col("v"), rnd, salt).alias("p"), F.col("v").alias("mv")
        )
        win = (
            verts.join(nbr_min, verts["v"] == nbr_min["src"], "left")
            .where(F.col("src").isNull() | (own < F.col("nk")))
            .select("v")
            .localCheckpoint(eager=False)
        )
        winners_acc.append(win.select("v", F.lit(rnd).cast("int").alias("round")))
        removed = win.unionByName(
            live.join(win.withColumnRenamed("v", "src"), "src").select(
                F.col("dst").alias("v")
            )
        ).distinct()
        verts = verts.join(removed, "v", "left_anti").localCheckpoint(eager=False)
        live = (
            live.join(removed.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(removed.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        rnd += 1
    spark = edges.sparkSession
    if not winners_acc:
        return spark.createDataFrame([], "v long, round int"), 0
    out = winners_acc[0]
    for w in winners_acc[1:]:
        out = out.unionByName(w)
    return out, rnd
