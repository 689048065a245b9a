"""The full hybrid connectivity pipeline — the engine's equivalent of the
reference's shipped binary (`parconnect`,
/root/reference/test/benchmark_parconnect_auto.cpp):

  1. input graph (edge-list file / generator / transcripts table)
  2. optional invertible-hash id permutation (anti-skew,
     benchmark_parconnect_auto.cpp:187)
  3. statistics-driven algorithm choice: power-law KS fit on the degree
     histogram → BFS peel or straight coloring (runBFSDecision, :194-210)
  4. BFS sweep(s) peel the giant component (:227-246)
  5. label-propagation coloring on the residual edges (:248-260)
  6. component count = BFS components + coloring components (:248,260,267)

All stages are DataFrame passes; wall-clock excludes graph construction,
matching the reference's timer placement (:181-184).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.plans.bfs import bfs
from parconnect_spark.plans.connectivity import CCResult, connected_components
from parconnect_spark.plans.decision import should_run_bfs


@dataclass
class PipelineResult:
    labels: DataFrame  # [v, label] over every non-isolated vertex
    component_count: int
    ran_bfs: bool
    bfs_components: int
    coloring_iterations: int
    seconds: float
    metrics: list = field(default_factory=list)


def parconnect_pipeline(
    edges: DataFrame,
    bfs_runs: int = 1,
    force_bfs: bool | None = None,
    cc_algorithm: str = "two_phase",
    pointer_doubling: bool = True,
    checkpoint=None,
    checkpoint_every: int = 5,
    cc_materialize: str = "auto",
    census_every: int | None = None,
) -> PipelineResult:
    """Run the hybrid BFS + coloring pipeline on a symmetric edge table.

    ``force_bfs``: None = data-driven decision (reference default);
    True/False = the manual knob of benchmark_parconnect.cpp:104-111.
    """
    edges = edges.persist()
    edges.count()  # materialize before the clock, like the reference
    t0 = time.monotonic()
    metrics: list = []

    run_bfs = force_bfs if force_bfs is not None else should_run_bfs(edges)
    bfs_components = 0
    bfs_labels = None
    residual = edges
    if run_bfs:
        res = bfs(edges, num_runs=bfs_runs)
        bfs_components = res.runs
        metrics.extend(res.metrics)
        if res.runs > 0:
            # label each BFS run's vertices by the run root (= min id of the
            # component, since sources are global min unvisited): pointer
            # jumping on the parent forest — O(log depth) joins, no full CC
            from parconnect_spark.plans.bfs import label_parent_forest

            bfs_labels = label_parent_forest(res.parents)
            residual = res.residual_edges

    cc: CCResult = connected_components(
        residual,
        algorithm=cc_algorithm,
        pointer_doubling=pointer_doubling,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        materialize=cc_materialize,
        **({} if census_every is None else {"census_every": census_every}),
    )
    metrics.extend(cc.metrics)

    labels = (
        cc.labels if bfs_labels is None else cc.labels.unionByName(bfs_labels)
    )
    n_components = labels.agg(F.countDistinct("label").alias("n")).collect()[0]["n"]
    dt = time.monotonic() - t0
    edges.unpersist()
    return PipelineResult(
        labels=labels,
        component_count=n_components,
        ran_bfs=run_bfs,
        bfs_components=bfs_components,
        coloring_iterations=cc.iterations,
        seconds=dt,
        metrics=metrics,
    )
