"""Eigenvector centrality by power iteration — the undamped member of the
spectral-centrality family (PageRank = damped + teleport, Katz =
attenuated + additive, HITS = the bipartite pair; SURVEY.md §2.10 scope,
absent from the reference, same join+agg substrate as plans/pagerank.py).

    x_k(v) = Σ_{(u,v)∈E} x_{k-1}(u)   then L1-normalize

On the SYMMETRIZED entity graph the iteration converges to the principal
eigenvector of the adjacency matrix (Perron–Frobenius: non-negative,
unique per connected component reached by the uniform start). L1
normalization replaces the textbook L2 for the same reason as
plans/hits.py: any per-iteration rescale preserves the direction, and a
plain SUM keeps the unrolled oracle SQL exact — no cross-engine sqrt.

Physical plan = one plans/hits.py half-step per iteration: score side
broadcast under the gate (pre-hashed edge cache above it), one
map-side-combined partial-sum shuffle per iteration, normalizer riding
the plan as a broadcast one-row cross join, lazy localCheckpoints with a
depth bound. Isolated vertices keep score 0 and are never dropped."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.plans.pagerank import BROADCAST_MAX_ROWS


def eigencentrality(
    edges: DataFrame,
    num_iters: int = 8,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Returns DataFrame[v: long, score: double] over DIRECTED distinct
    (src, dst) pairs — pass a symmetrized edge table for the classic
    undirected eigenvector centrality."""
    if num_iters < 1:
        raise ValueError("num_iters must be >= 1")
    spark = edges.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    edges = edges.localCheckpoint()
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        verts.unpersist()
        return spark.createDataFrame([], "v long, score double")
    bcast = n <= broadcast_max_rows
    ed = edges.select("src", "dst")
    ed = ed.persist() if bcast else ed.repartition(parts, "src").persist()
    ed.count()

    x = verts.select("v", F.lit(1.0 / n).alias("score")).localCheckpoint()
    for it in range(1, num_iters + 1):
        side = F.broadcast(x) if bcast else x.hint("shuffle_hash")
        raw = (
            ed.join(side, ed["src"] == side["v"])
            .groupBy("dst")
            .agg(F.sum("score").alias("_s"))
            .localCheckpoint(eager=False)
        )
        tot = raw.agg(F.sum("_s").alias("_tot"))
        raw_b = raw.crossJoin(F.broadcast(tot))
        if bcast:
            raw_b = F.broadcast(raw_b)
        norm = F.when(
            F.col("_tot") > 0, F.coalesce("_s", F.lit(0.0)) / F.col("_tot")
        ).otherwise(F.lit(0.0))
        x = (
            verts.join(raw_b, verts["v"] == raw_b["dst"], "left")
            .select("v", norm.alias("score"))
            .localCheckpoint(eager=False)
        )
        if it % 4 == 0 and it < num_iters:
            x.count()

    out = x.localCheckpoint()
    verts.unpersist()
    ed.unpersist()
    return out
