"""Longest-path layering of a DAG — the topological-depth / critical-path
primitive (pipeline-stage assignment, dependency scheduling depth,
feedback-free flow analysis), on the katz/wl fixed-point substrate
(SURVEY.md §2.10 family; absent from the reference, which stops at
connectivity). Composed with plans/scc.py it layers the CONDENSATION of
any directed graph: SCCs are the feedback clusters, layers are the
pipeline stages between them.

    layer(v) = length in edges of the longest path ending at v
             = 0                          if v has no in-edges
             = 1 + max_{(u,v)∈E} layer(u) otherwise

computed as the monotone fixpoint

    l_0(v)     = 0
    l_{r+1}(v) = max( l_r(v), 1 + max_{(u,v)∈E} l_r(u) )

which converges in exactly depth(G) rounds on a DAG — and NEVER converges
on a cycle, so hitting ``max_rounds`` raises: the layering doubles as the
loud cycle guard (feed it SCC-condensed edges and it cannot fire). Every
intermediate is a small non-negative int64: bit-identical across engines
and partitionings, exactly replayable by an unrolled SQL oracle.

Physical plan, per round: ONE shuffle — the |V|-row layer table joins the
edge table on src and a grouped MAX lands on dst (map-side combinable,
hub-proof); the layer side broadcasts under the pagerank gate, above it
the persisted edge table is pre-hashed on src and never re-exchanges.
Convergence is the CC loop's order-insensitive (count, sum) fingerprint —
the layer sum is monotone non-decreasing, so one unchanged fingerprint is
a proof of fixpoint, not a heuristic. Rounds are lazy localCheckpoints
materialized by the fingerprint action (O(1) plan depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.plans.pagerank import BROADCAST_MAX_ROWS


def dag_layers(
    edges: DataFrame,
    max_rounds: int = 64,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> tuple[DataFrame, int]:
    """Returns ``(layers, rounds)``: ``layers`` is DataFrame[v: long,
    layer: int] — the longest-path depth of every vertex of the DAG —
    and ``rounds`` the update rounds to fixpoint (= the DAG depth).

    ``edges``: distinct DIRECTED (src, dst) long pairs, acyclic, no
    self-loops (the plans/scc.py condensation shape). Raises on
    ``max_rounds`` exhaustion — which on a correct DAG input is
    unreachable and on a cyclic input is the designed failure mode.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    spark = edges.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ed = edges.select("src", "dst").localCheckpoint()
    verts = (
        ed.select(F.col("src").alias("v"))
        .unionByName(ed.select(F.col("dst").alias("v")))
        .distinct()
    )
    lay = verts.select(
        "v", F.lit(0).cast("int").alias("layer")
    ).localCheckpoint()
    n = lay.count()
    if n == 0:
        return (
            spark.createDataFrame([], "v long, layer int"),
            0,
        )
    bcast = n <= broadcast_max_rows
    if not bcast:
        ed = ed.repartition(parts, "src").persist()
        ed.count()

    def _fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("c"), F.sum("layer").alias("s")
        ).first()
        return (row["c"], row["s"])

    prev = (n, 0)
    rounds = 0
    for _ in range(max_rounds):
        side = F.broadcast(lay) if bcast else lay.hint("shuffle_hash")
        upd = (
            ed.join(side, ed["src"] == side["v"])
            .groupBy(F.col("dst").alias("v"))
            .agg((F.max("layer") + F.lit(1)).cast("int").alias("_ml"))
        )
        if bcast:
            upd = F.broadcast(upd)
        nxt = (
            lay.join(upd, "v", "left")
            .select(
                "v",
                F.greatest(
                    "layer", F.coalesce(F.col("_ml"), F.lit(0))
                ).alias("layer"),
            )
            .localCheckpoint(eager=False)
        )
        cur = _fingerprint(nxt)  # materializes the lazy checkpoint
        if cur == prev:
            # monotone sum unchanged == fixpoint reached at `lay` already
            break
        lay = nxt
        prev = cur
        rounds += 1
    else:
        raise ValueError(
            f"dag_layers did not converge in {max_rounds} rounds — "
            "the input has a cycle (condense SCCs first) or max_rounds "
            "is below the DAG depth"
        )
    if not bcast:
        ed.unpersist()
    return lay, rounds
