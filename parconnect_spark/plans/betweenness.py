"""Sampled betweenness centrality — Brandes' algorithm (2001) batched over
a source sample, as level-synchronous DataFrame passes.

``bc(v) = Σ_{s ∈ sources} Σ_{t} σ_st(v)/σ_st`` — the classic "how much
shortest-path traffic crosses v" centrality; the source-sampled variant is
the standard scalable estimator (scale by |V|/|sources| for the unbiased
estimate; the raw sum is returned, the caller owns scaling — the
harmonic/closeness convention of plans/bfs.py).

Two passes, both multi-source batched on composite (root, v) keys so the
per-superstep fixed cost amortizes across the whole sample (the MS-BFS
shape, plans/bfs.multi_source_bfs):

* forward: level-synchronous BFS carrying σ (the number of shortest
  s-paths) — a frontier ⨝ edges expansion whose map-side-combined SUM of
  predecessor σ IS the path-count recurrence, then an anti join against
  the visited set. σ stays an exact int64.
* backward: levels processed descending; δ(v) = Σ_{w: succ}
  σ(v)/σ(w)·(1+δ(w)) — one join of level-l vertices through the edge
  table into level-(l+1) deltas, one map-side-combined sum.

Undirected convention: pair dependencies are halved (each unordered pair
is counted from both endpoints on a symmetric edge table).

Plan-depth discipline: every level is lazily localCheckpointed and
materialized by the count that drives the loop, so lineage stays O(1)
(the CC/kcore rule). Driver state is one small (root, v)-level list of
DataFrames — never row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def betweenness_centrality(
    edges: DataFrame, sources: list[int], max_depth: int = 64
) -> DataFrame:
    """DataFrame[v: long, bc: double] over vertices with nonzero
    source-sampled betweenness. ``edges`` must be distinct symmetric
    pairs without self-loops (the derive_edges/symmetrize shape);
    ``sources`` are root vertex ids (absent ids contribute nothing).
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = edges.sparkSession
    roots = spark.createDataFrame(
        [(int(s),) for s in sorted(set(sources))], "root long"
    )
    # roots that actually exist in the graph
    f0 = (
        roots.join(
            edges.select(F.col("src").alias("root")).distinct(), "root"
        )
        .select(
            "root",
            F.col("root").alias("v"),
            F.lit(1).cast("long").alias("sigma"),
        )
        .localCheckpoint()
    )
    levels = [f0]
    visited = f0.select("root", "v").localCheckpoint(eager=False)
    frontier = f0
    depth = 0
    while True:
        if depth >= max_depth:
            raise RuntimeError(f"BFS deeper than max_depth={max_depth}")
        nxt = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .groupBy("root", "dst")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("dst", "v")
            .join(visited, ["root", "v"], "left_anti")
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        depth += 1
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("root", "v")).localCheckpoint(
            eager=False
        )
        frontier = nxt

    # backward accumulation, deepest level first (its delta is 0)
    delta = levels[-1].select(
        "root", "v", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=False)
    acc = [delta]
    for lvl in range(len(levels) - 2, -1, -1):
        # explicit column renames on the successor side: levels share
        # lineage (level l+1 is built from level l), so a raw root == root
        # predicate would hit Spark's self-join ambiguity path
        succ = levels[lvl + 1].join(acc[-1], ["root", "v"]).select(
            F.col("root").alias("s_root"),
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
            "delta",
        )
        contrib = (
            levels[lvl]
            .join(edges, levels[lvl]["v"] == edges["src"])
            .join(
                succ,
                (F.col("dst") == F.col("w"))
                & (F.col("root") == F.col("s_root")),
            )
            .select(
                "root",
                "v",
                (
                    F.col("sigma").cast("double")
                    / F.col("sigma_w")
                    * (F.lit(1.0) + F.col("delta"))
                ).alias("_d"),
            )
            .groupBy("root", "v")
            .agg(F.sum("_d").alias("delta"))
        )
        cur = (
            levels[lvl]
            .select("root", "v")
            .join(contrib, ["root", "v"], "left")
            .select(
                "root", "v", F.coalesce("delta", F.lit(0.0)).alias("delta")
            )
            .localCheckpoint(eager=False)
        )
        acc.append(cur)

    all_delta = acc[0]
    for d in acc[1:]:
        all_delta = all_delta.unionByName(d)
    return (
        all_delta.where(F.col("v") != F.col("root"))
        .groupBy("v")
        .agg((F.sum("delta") / F.lit(2.0)).alias("bc"))
        .where(F.col("bc") > 0)
    )
