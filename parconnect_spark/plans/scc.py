"""Strongly connected components over a DIRECTED edge table
(BASELINE.json link-graph family; absent from the reference, whose CC
engine only ever symmetrizes — /root/reference/src/ccl/ccl.hpp treats every
edge as undirected — so direction-sensitive connectivity is the natural
next operator on the same join+agg substrate).

Trim + forward-coloring + backward-sweep (the FW-BW / Orzan coloring
family, the standard distributed SCC decomposition):

1. **Trim**: a vertex with no in-edges or no out-edges in the remaining
   subgraph cannot lie on a cycle — it is a singleton SCC. Peeling to
   fixpoint dissolves DAG periphery (and entire DAGs, e.g. chains) without
   ever running a propagation round; this is what bounds the outer loop on
   the graphs that would otherwise be adversarial for pure coloring.
2. **Color**: propagate min vertex id FORWARD to fixpoint —
   color(v) = min u that reaches v. Every SCC is monochromatic (u, v in
   one SCC are reached by exactly the same vertex set), and a component's
   color is the id of a vertex INSIDE the component iff that vertex is a
   color root (color(r) = r).
3. **Sweep**: from each root r, walk REVERSED edges restricted to color-r
   vertices. A reached v satisfies v→r and (by color) r→v, so
   SCC(r) = reached set; connecting paths stay inside the SCC (any w on a
   v→r path with r→v is itself mutually reachable with r), so the color
   restriction loses nothing.
4. Remove swept vertices, loop. Each round retires every color-root SCC —
   at least one per round, in practice the bulk of the graph in round one
   (web-scale digraphs are one giant SCC + DAG periphery; the periphery
   trims, the giant falls in the first sweep).

Physical shape per superstep: one equi-join against the current label/
frontier table + one map-side-combined min aggregate (coloring) or one
dedup + anti join (sweep) — the working edge table is localCheckpointed
per outer round and never re-shuffled inside the fixpoints; labels ride
lazy localCheckpoints materialized by the convergence checksum, the
plans/connectivity.py discipline (checkpoint blocks are reclaimed when the
superseded DataFrame is GC'd, so no persist/unpersist bookkeeping). No
windows, no collects beyond scalar checksums.

Worst case: a cycle-of-cycles chain C_1 → C_2 → ... → C_k needs k outer
rounds (trim never fires, each sweep retires one cycle). That is the known
FB/coloring bound; real link graphs sit at 2-3 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _label_checksum(labels: DataFrame, col: str) -> int:
    """Order-insensitive fingerprint; the vertex set is fixed inside a
    fixpoint, so hash-sum equality alone witnesses convergence (and this
    action doubles as the lazy-checkpoint materializer)."""
    row = labels.agg(
        F.sum(F.xxhash64("v", col).cast("decimal(20,0)")).alias("s")
    ).collect()[0]
    return int(row["s"] or 0)


def strongly_connected_components(
    edges: DataFrame,
    max_outer_rounds: int = 10_000,
) -> DataFrame:
    """DataFrame[v: long, scc: long] — scc is the MIN vertex id of v's
    strongly connected component (deterministic, partitioning-invariant).

    ``edges`` is a directed (src, dst) long table; duplicates and self
    loops are tolerated (deduped / dropped — a self loop never changes an
    SCC). Vertices appear in the output iff they appear in some edge.
    """
    base = edges.dropDuplicates(["src", "dst"]).localCheckpoint(eager=False)
    # the FULL input vertex set (self loops count as appearance): every
    # vertex not swept into a cycle SCC below is a singleton — this single
    # final reconciliation covers trimmed vertices, vertices isolated by a
    # trim/sweep removal (all their edges vanished with the other
    # endpoint), and self-loop-only vertices, with one anti join.
    all_verts = (
        base.select(F.col("src").alias("v"))
        .unionByName(base.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = base.where(F.col("src") != F.col("dst"))
    assigned: list[DataFrame] = []

    for _ in range(max_outer_rounds):
        # ---- trim to fixpoint: no-in or no-out vertices are singletons
        empty = False
        while True:
            if e.limit(1).count() == 0:
                empty = True
                break
            srcs = e.select(F.col("src").alias("v")).distinct()
            dsts = e.select(F.col("dst").alias("v")).distinct()
            vs = srcs.unionByName(dsts).distinct()
            both = srcs.intersect(dsts)
            # eager: consumed by two anti joins (assignment happens in the
            # final singleton reconciliation, not here)
            trivial = vs.join(both, "v", "left_anti").localCheckpoint()
            if trivial.limit(1).count() == 0:
                break
            e = (
                e.join(trivial, e["src"] == trivial["v"], "left_anti")
                .join(trivial, e["dst"] == trivial["v"], "left_anti")
                .localCheckpoint(eager=False)
            )
        if empty:
            break

        # ---- forward min coloring to fixpoint
        verts = (
            e.select(F.col("src").alias("v"))
            .unionByName(e.select(F.col("dst").alias("v")))
            .distinct()
        )
        colors = verts.select("v", F.col("v").alias("color")).localCheckpoint(
            eager=False
        )
        prev = _label_checksum(colors, "color")
        while True:
            upd = (
                e.join(colors, e["src"] == colors["v"])
                .groupBy(F.col("dst").alias("u"))
                .agg(F.min("color").alias("_nc"))
            )
            colors = (
                colors.join(upd, colors["v"] == upd["u"], "left")
                .select(
                    "v",
                    F.least(
                        "color", F.coalesce("_nc", F.col("color"))
                    ).alias("color"),
                )
                .localCheckpoint(eager=False)
            )
            cur = _label_checksum(colors, "color")
            if cur == prev:
                break
            prev = cur

        # ---- backward sweep from color roots, within color
        # reversed reachability: only same-color edges can transmit it.
        csrc = colors.select(F.col("v").alias("_sv"), F.col("color").alias("_sc"))
        cdst = colors.select(F.col("v").alias("_dv"), F.col("color").alias("_dc"))
        er = (
            e.join(csrc, e["src"] == F.col("_sv"))
            .join(cdst, e["dst"] == F.col("_dv"))
            .where(F.col("_sc") == F.col("_dc"))
            .select("src", "dst")
            .localCheckpoint()  # eager: re-joined every sweep step
        )
        reached = (
            colors.where(F.col("color") == F.col("v"))
            .select("v", "color")
            .localCheckpoint()
        )
        frontier = reached
        while True:
            step = (
                er.join(frontier, er["dst"] == frontier["v"])
                .select(F.col("src").alias("v"), "color")
                .dropDuplicates(["v"])
                .join(reached.select("v"), "v", "left_anti")
                .localCheckpoint()
            )
            if step.limit(1).count() == 0:
                break
            reached = reached.unionByName(step).localCheckpoint()
            frontier = step
        assigned.append(reached.select("v", F.col("color").alias("scc")))
        e = (
            e.join(reached.select("v"), e["src"] == F.col("v"), "left_anti")
            .join(reached.select("v"), e["dst"] == F.col("v"), "left_anti")
            .localCheckpoint(eager=False)
        )
    else:
        # natural loop exit = round budget exhausted with edges remaining;
        # falling through would silently label the leftovers as singletons.
        if e.limit(1).count() > 0:
            raise RuntimeError(
                f"SCC did not converge within max_outer_rounds="
                f"{max_outer_rounds}; the remaining subgraph is a chain of "
                "SCCs longer than the budget (raise max_outer_rounds)"
            )
    swept = None
    if assigned:
        swept = assigned[0]
        for a in assigned[1:]:
            swept = swept.unionByName(a)
    singles = all_verts
    if swept is not None:
        singles = all_verts.join(swept.select("v"), "v", "left_anti")
    singles = singles.select("v", F.col("v").alias("scc"))
    return singles if swept is None else swept.unionByName(singles)
