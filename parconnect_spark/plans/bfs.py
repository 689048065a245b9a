"""Parallel BFS as frontier joins — parconnect's giant-component peel.

The reference builds a CombBLAS 2D sparse matrix and runs SpMV per level
(/root/reference/src/bfs/bfsRunner.hpp:111-160, 214-231). In Spark the
frontier expansion IS a join — frontier ⨝ edges on src — and AQE broadcasts
the frontier while it is small, switching to shuffle join as it grows: the
adaptive strategy CombBLAS hand-codes with its row/column communicators.

* source selection  = global min unvisited id (bfsRunner.hpp:366-386).
* visited exclusion = left anti join (EWiseMult exclude, bfsRunner.hpp:223).
* residual filter   = left anti join of edges vs visited (filterEdgeList,
  bfsRunner.hpp:272-357 — 86 LoC of splitter/all2all that Spark's shuffle
  subsumes entirely).
* MTEPS             = traversed edges (Σ degree over visited) / seconds / 1e6
  (bfsRunner.hpp:238-255).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.operators.graph import degrees, vertices as vertex_table


@dataclass
class BFSResult:
    parents: DataFrame  # [v, parent] for every visited vertex
    residual_edges: DataFrame  # edges not touching any visited vertex
    runs: int
    levels: int
    visited_count: int
    mteps: float
    metrics: list = field(default_factory=list)


def bfs(
    edges: DataFrame,
    num_runs: int = 1,
    max_levels: int = 10_000,
) -> BFSResult:
    """Run ``num_runs`` BFS sweeps, each from the min unvisited vertex id.

    ``edges`` must be symmetric (both directions) — the reference asserts the
    same invariant before building its matrix
    (/root/reference/src/graphGen/common/utils.hpp:61-101).
    Returns parents (root's parent = itself), residual edge table, and MTEPS.
    """
    verts = vertex_table(edges).persist()
    verts.count()
    deg = degrees(edges).persist()

    parents = None  # DataFrame[v, parent]
    total_levels = 0
    runs_done = 0
    metrics: list = []
    t0 = time.monotonic()

    for _ in range(num_runs):
        unvisited = (
            verts if parents is None else verts.join(parents, "v", "left_anti")
        )
        src_row = unvisited.agg(F.min("v").alias("m")).collect()[0]
        if src_row["m"] is None:
            break  # everything visited
        root = int(src_row["m"])
        runs_done += 1

        frontier = edges.sparkSession.createDataFrame(
            [(root, root)], "v long, parent long"
        )
        run_parents = frontier.localCheckpoint()
        level = 0
        while level < max_levels:
            level += 1
            visited_all = (
                run_parents if parents is None else run_parents.unionByName(parents)
            )
            nxt = (
                edges.join(frontier.select("v"), edges["src"] == F.col("v"))
                .select(F.col("dst").alias("nv"), F.col("src").alias("parent"))
                .groupBy("nv")
                .agg(F.min("parent").alias("parent"))
                .select(F.col("nv").alias("v"), "parent")
                .join(visited_all.select("v"), "v", "left_anti")
                .localCheckpoint()
            )
            n = nxt.count()
            metrics.append({"run": runs_done, "level": level, "frontier": n})
            if n == 0:
                break
            run_parents = run_parents.unionByName(nxt).localCheckpoint()
            frontier = nxt
        total_levels += level
        parents = (
            run_parents if parents is None else parents.unionByName(run_parents)
        ).localCheckpoint()

    elapsed = max(time.monotonic() - t0, 1e-9)
    if parents is None:
        parents = edges.sparkSession.createDataFrame([], "v long, parent long")
        visited_count = 0
        traversed = 0
    else:
        visited_count = parents.count()
        traversed = (
            parents.join(deg, "v").agg(F.sum("degree").alias("s")).collect()[0]["s"]
            or 0
        )
    residual = edges.join(parents.select("v"), edges["src"] == F.col("v"), "left_anti")

    verts.unpersist()
    deg.unpersist()
    return BFSResult(
        parents=parents,
        residual_edges=residual,
        runs=runs_done,
        levels=total_levels,
        visited_count=visited_count,
        mteps=traversed / elapsed / 1e6,
        metrics=metrics,
    )


def bfs_peel(edges: DataFrame, num_runs: int = 1) -> tuple[DataFrame, DataFrame, int]:
    """Peel giant component(s): returns (visited_labels[v,label], residual_edges,
    components_peeled) — the hybrid pipeline's stage 1
    (/root/reference/test/benchmark_parconnect_auto.cpp:227-246). Each BFS
    run's component is labeled by its root (= min id in that component,
    since sources are chosen as global min unvisited)."""
    res = bfs(edges, num_runs=num_runs)
    if res.runs == 0:
        labels = edges.sparkSession.createDataFrame([], "v long, label long")
        return labels, edges, 0
    # parent chains all trace to the run root; root = min parent... the root
    # is the only vertex with parent == itself and equals min(v) of the run.
    # Label every visited vertex by the min vertex id of its run component:
    # recover via CC over the parent-tree edges (tiny: |visited| rows, tree
    # depth collapses in O(log d) pointer-jumping steps).
    tree = res.parents.select(F.col("v").alias("src"), F.col("parent").alias("dst"))
    from parconnect_spark.plans.connectivity import connected_components

    cc = connected_components(tree, algorithm="two_phase")
    return cc.labels, res.residual_edges, res.runs
