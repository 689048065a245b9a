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
* resumability      = one-iteration-per-call state carry, like the
  reference's per-iteration runner (test/test_bfsRunner.cpp:150-200): pass
  a SuperstepCheckpoint and every level commits (visited ∪ frontier flag)
  plus loop counters; a new bfs() call on the same checkpoint dir continues
  mid-run and converges to the uninterrupted result.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.operators.graph import degrees, vertices as vertex_table
from parconnect_spark.streaming.metrics import IoTelemetry

_STATE_SCHEMA = "v long, parent long, is_frontier boolean"


@dataclass
class BFSResult:
    parents: DataFrame  # [v, parent] for every visited vertex
    residual_edges: DataFrame  # edges not touching any visited vertex
    runs: int
    levels: int
    visited_count: int
    mteps: float
    metrics: list = field(default_factory=list)


def _bind_bfs_identity(edges: DataFrame, checkpoint) -> None:
    if checkpoint is None or getattr(checkpoint, "identity", None) is not None:
        return
    from parconnect_spark.plans.connectivity import _canonical, _checksum

    cnt, s = _checksum(_canonical(edges))
    checkpoint.bind_identity(
        {
            "algorithm": "bfs",
            "working_set_schema": "v:long,parent:long,is_frontier:boolean",
            "input_edges": cnt,
            "input_checksum": str(s),
        }
    )


def bfs(
    edges: DataFrame,
    num_runs: int = 1,
    max_levels: int = 10_000,
    checkpoint=None,
    checkpoint_every: int = 1,
    use_csr: bool = False,
) -> BFSResult:
    """Run ``num_runs`` BFS sweeps, each from the min unvisited vertex id.

    ``edges`` must be symmetric (both directions) — the reference asserts the
    same invariant before building its matrix
    (/root/reference/src/graphGen/common/utils.hpp:61-101).
    Returns parents (root's parent = itself), residual edge table, and MTEPS
    (measured over THIS invocation's wall-clock — a resumed run reports the
    post-resume portion).

    With ``checkpoint`` set, every ``checkpoint_every``-th level commits the
    working set (visited parents + current-frontier flags) and the loop
    counters; a later call with the same checkpoint dir resumes mid-run.
    ``max_levels`` caps levels per CALL, so max_levels=1 + resume replays the
    reference's one-iteration-per-call protocol exactly.

    ``use_csr``: expand frontiers against a cached hash-partitioned CSR
    block table (plans/csr.adjacency_blocks) instead of the raw edge list —
    the once-built, every-iteration-reused adjacency structure of the
    reference's CombBLAS matrix (bfsRunner.hpp:111-160). Per level the
    expansion then scans |V| compact array rows instead of |E| edge rows,
    and when the frontier outgrows broadcast only the frontier shuffles
    (the blocks' cached hash(v) placement already satisfies the join).
    Identical parents either way.
    """
    spark = edges.sparkSession
    _bind_bfs_identity(edges, checkpoint)
    verts = vertex_table(edges).persist()
    verts.count()
    deg = degrees(edges).persist()
    blocks = None
    if use_csr:
        from parconnect_spark.plans.csr import adjacency_blocks

        blocks = adjacency_blocks(edges, layout="hash").persist()
        blocks.count()

    parents = None  # DataFrame[v, parent] — all visited, frontier included
    frontier = None  # DataFrame[v] — current run's active frontier
    runs_done = 0
    total_levels = 0
    step = 0
    metrics: list = []

    if checkpoint is not None:
        ck_step, state = (
            checkpoint.latest() if hasattr(checkpoint, "latest") else (None, None)
        )
        if ck_step is not None:
            meta = checkpoint.latest_meta()["metrics"]
            runs_done = int(meta["runs_done"])
            total_levels = int(meta["levels_done"])
            step = ck_step
            parents = state.select("v", "parent").localCheckpoint()
            frontier = state.where("is_frontier").select("v").localCheckpoint()
            if frontier.limit(1).count() == 0:
                frontier = None
    # vertices already visited before this call: their degree mass must NOT
    # count toward this invocation's MTEPS (elapsed only covers this call)
    pre_visited = parents

    t0 = time.monotonic()
    levels_this_call = 0
    io_tel = IoTelemetry(edges.sparkSession)
    while levels_this_call < max_levels:
        if frontier is None:
            # between runs: pick the next source (min unvisited id)
            if runs_done >= num_runs:
                break
            unvisited = (
                verts if parents is None else verts.join(parents, "v", "left_anti")
            )
            src_row = unvisited.agg(F.min("v").alias("m")).collect()[0]
            if src_row["m"] is None:
                break  # everything visited
            root = int(src_row["m"])
            runs_done += 1
            seed = spark.createDataFrame([(root, root)], "v long, parent long")
            parents = (
                seed if parents is None else parents.unionByName(seed)
            ).localCheckpoint()
            frontier = seed.select("v").localCheckpoint()

        # one level: expand frontier, min-parent per new vertex, exclude
        # visited (EWiseMult exclude ≡ left anti)
        if blocks is not None:
            expanded = blocks.join(frontier, "v").select(
                F.explode("nbrs").alias("nv"), F.col("v").alias("parent")
            )
        else:
            expanded = edges.join(frontier, edges["src"] == frontier["v"]).select(
                F.col("dst").alias("nv"), F.col("src").alias("parent")
            )
        nxt = (
            expanded.groupBy("nv")
            .agg(F.min("parent").alias("parent"))
            .select(F.col("nv").alias("v"), "parent")
            .join(parents.select("v"), "v", "left_anti")
            .localCheckpoint()
        )
        n = nxt.count()
        total_levels += 1
        levels_this_call += 1
        step += 1
        m = {"run": runs_done, "level": total_levels, "frontier": n}
        io_tel.record(m)
        metrics.append(m)
        if n == 0:
            frontier = None  # run converged; next loop picks a new source
        else:
            parents = parents.unionByName(nxt).localCheckpoint()
            frontier = nxt.select("v")
        if checkpoint is not None and step % checkpoint_every == 0:
            state = parents.withColumn("is_frontier", F.lit(False))
            if frontier is not None:
                state = (
                    parents.join(frontier.withColumn("_f", F.lit(True)), "v", "left")
                    .select("v", "parent", F.coalesce("_f", F.lit(False)).alias("is_frontier"))
                )
            saved = checkpoint.save(
                step,
                state,
                {
                    "runs_done": runs_done,
                    "levels_done": total_levels,
                    "frontier": n,
                },
            )
            parents = saved.select("v", "parent")
            frontier = (
                saved.where("is_frontier").select("v") if n > 0 else None
            )
        if frontier is None and runs_done >= num_runs:
            break

    elapsed = max(time.monotonic() - t0, 1e-9)
    if parents is None:
        parents = spark.createDataFrame([], "v long, parent long")
        visited_count = 0
        traversed = 0
    else:
        visited_count = parents.count()
        traversed = (
            parents.join(deg, "v").agg(F.sum("degree").alias("s")).collect()[0]["s"]
            or 0
        )
        if pre_visited is not None:
            # resumed run: MTEPS counts only edges traversed THIS call
            traversed -= (
                pre_visited.join(deg, "v")
                .agg(F.sum("degree").alias("s"))
                .collect()[0]["s"]
                or 0
            )
    residual = edges.join(parents.select("v"), edges["src"] == F.col("v"), "left_anti")

    verts.unpersist()
    deg.unpersist()
    if blocks is not None:
        blocks.unpersist()
    return BFSResult(
        parents=parents,
        residual_edges=residual,
        runs=runs_done,
        levels=total_levels,
        visited_count=visited_count,
        mteps=traversed / elapsed / 1e6,
        metrics=metrics,
    )


def label_parent_forest(parents: DataFrame, max_iters: int = 64) -> DataFrame:
    """[v, label] from a rooted forest [v, parent] by pointer jumping:
    label ← label(label) until fixpoint — O(log depth) self-joins, the
    Shiloach-Vishkin shortcut. Far cheaper than running full CC over the
    tree edges (no large-star/small-star machinery, no per-superstep
    checksum): a BFS parent table already encodes its components, rooted at
    each run's source (= the component's min id by source selection)."""
    cur = parents.select("v", F.col("parent").alias("label")).localCheckpoint()
    for _ in range(max_iters):
        hop = cur.select(F.col("v").alias("_pv"), F.col("label").alias("_pl"))
        nxt = (
            cur.join(hop, cur["label"] == hop["_pv"], "left")
            .select(
                "v",
                F.col("label").alias("_old"),
                F.coalesce("_pl", "label").alias("label"),
            )
            .localCheckpoint()
        )
        changed = nxt.where(F.col("label") != F.col("_old")).count()
        cur = nxt.select("v", "label")
        if changed == 0:
            break
    return cur


def bfs_peel(edges: DataFrame, num_runs: int = 1) -> tuple[DataFrame, DataFrame, int]:
    """Peel giant component(s): returns (visited_labels[v,label], residual_edges,
    components_peeled) — the hybrid pipeline's stage 1
    (/root/reference/test/benchmark_parconnect_auto.cpp:227-246). Each BFS
    run's component is labeled by its root (= min id in that component,
    since sources are chosen as global min unvisited); labels come from
    pointer-jumping the parent forest, not a full CC run."""
    res = bfs(edges, num_runs=num_runs)
    if res.runs == 0:
        labels = edges.sparkSession.createDataFrame([], "v long, label long")
        return labels, edges, 0
    return label_parent_forest(res.parents), res.residual_edges, res.runs


def bfs_distances(
    edges: DataFrame, source: int, max_levels: int = 10_000
) -> DataFrame:
    """Hop distances from ``source``: DataFrame[v: long, dist: int] over the
    vertices REACHABLE from source (source itself at dist 0) — the distance
    labeling a feature pipeline exports (hop-to-hub features) and the
    primitive under :func:`pseudo_diameter`.

    ``edges`` directed as given; pass a symmetric table for undirected hops.
    Per level: one frontier equi-join + dedup + anti join against the
    visited set — the plans/scc.py sweep shape; the frontier is the only
    moving table, and callers doing many sweeps should persist ``edges``
    (hash-partitioned on src) once."""
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(source), 0)], "v long, dist int"
    ).localCheckpoint()
    frontier = dist.select("v")
    level = 0
    while level < max_levels:
        level += 1
        nxt = (
            edges.join(frontier, edges["src"] == frontier["v"])
            .select(F.col("dst").alias("v"))
            .dropDuplicates(["v"])
            .join(dist.select("v"), "v", "left_anti")
            .select("v", F.lit(level).cast("int").alias("dist"))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("v")
    return dist


def pseudo_diameter(edges: DataFrame, start: int | None = None) -> dict:
    """Double-sweep diameter lower bound (the standard BFS heuristic —
    exact on trees, tight on most real graphs): BFS from ``start`` (default
    the min vertex id), hop to the farthest vertex found (ties to the
    smaller id, so the result is deterministic and partitioning-invariant),
    BFS again; the second eccentricity is the bound.

    Returns {"start", "start_ecc", "far_vertex", "diameter_lb"} — driver
    scalars only; both sweeps are :func:`bfs_distances` plans."""
    if start is None:
        start = edges.agg(
            F.min(F.least("src", "dst")).alias("m")
        ).collect()[0]["m"]
        if start is None:
            return {
                "start": None,
                "start_ecc": None,
                "far_vertex": None,
                "diameter_lb": None,
            }
    d0 = bfs_distances(edges, int(start))
    far = (
        d0.orderBy(F.desc("dist"), F.asc("v")).limit(1).collect()[0]
    )
    d1 = bfs_distances(edges, int(far["v"]))
    lb = d1.agg(F.max("dist").alias("m")).collect()[0]["m"]
    return {
        "start": int(start),
        "start_ecc": int(far["dist"]),
        "far_vertex": int(far["v"]),
        "diameter_lb": int(lb),
    }


def multi_source_bfs(
    edges: DataFrame, sources: list[int], max_levels: int = 10_000
) -> DataFrame:
    """Batched BFS from MANY sources in ONE frontier loop (MS-BFS):
    DataFrame[root: long, v: long, dist: int] over reachable pairs.

    The composite frontier keys on (root, v), so k sweeps cost one loop of
    k-way-wider joins instead of k sequential loops — the standard trick
    for centrality sampling, and the only shape that amortizes the
    per-superstep fixed cost at cluster scale (the same economics the CC
    scaling protocol measures). Per level: one equi-join on src, a (root,
    v) dedup, an anti join against the settled set."""
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "root long, v long, dist int"
    ).localCheckpoint()
    frontier = dist.select("root", "v")
    level = 0
    while level < max_levels:
        level += 1
        nxt = (
            edges.join(frontier, edges["src"] == frontier["v"])
            .select("root", F.col("dst").alias("v"))
            .dropDuplicates(["root", "v"])
            .join(dist.select("root", "v"), ["root", "v"], "left_anti")
            .select("root", "v", F.lit(level).cast("int").alias("dist"))
            .localCheckpoint()
        )
        if nxt.limit(1).isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("root", "v")
    return dist


def harmonic_centrality(edges: DataFrame, sources: list[int]) -> DataFrame:
    """Harmonic centrality restricted to a source sample:
    ``h(v) = Σ_{s ∈ sources, s ≠ v} 1 / d(s, v)`` —
    DataFrame[v: long, harmonic: double] over vertices reached by at least
    one source at distance ≥ 1.

    On a symmetric edge table d(s, v) = d(v, s), so a deterministic source
    sample gives the standard sampled-harmonic estimator (scale by
    |V|/|sources| for the unbiased estimate; the raw sum is returned so the
    caller owns the scaling). One :func:`multi_source_bfs` + one hash
    aggregate."""
    d = multi_source_bfs(edges, sources)
    return (
        d.where(F.col("dist") > 0)
        .groupBy("v")
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"))
    )


def closeness_centrality(edges: DataFrame, sources: list[int]) -> DataFrame:
    """Sampled closeness centrality:
    ``c(v) = |{s ∈ sources : 0 < d(s, v) < ∞}| / Σ_{s} d(s, v)`` —
    DataFrame[v: long, n_sources: long, total_dist: long,
    closeness: double] over vertices reached by at least one source at
    distance ≥ 1 (the Wasserman–Faust sampled estimator up to the
    |sources|/(|V|−1) scale factor, which the caller owns — on a symmetric
    edge table d(s, v) = d(v, s) so source-sums ARE target-sums).

    One :func:`multi_source_bfs` (all sources share one frontier loop —
    the per-superstep fixed cost amortizes across the whole sample, the
    shape that matters at cluster scale) + one hash aggregate.
    """
    d = multi_source_bfs(edges, sources)
    return (
        d.where(F.col("dist") > 0)
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum("dist").alias("total_dist"),
        )
        .withColumn(
            "closeness", F.col("n_sources") / F.col("total_dist")
        )
    )


def landmark_distance_table(edges: DataFrame, k: int = 3) -> DataFrame:
    """Landmark (pivot) distance labeling: exact hop distances from the
    ``k`` highest-degree vertices (ties to the smaller id) to every
    reachable vertex — the classic distance-oracle sketch: store k·|V|
    distances instead of |V|² and answer d(u, v) ≲ min_l d(u,l)+d(l,v)
    by two lookups (triangle-inequality upper bound; exact when some
    shortest path passes a landmark — and top-degree vertices are
    exactly where shortest paths concentrate in scale-free graphs).

    Landmark selection is a TakeOrdered over the degree census; the k
    sweeps share ONE MS-BFS frontier loop (plans/bfs.multi_source_bfs —
    per-superstep fixed cost amortized k-way). Returns
    (root, v, dist)."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    roots = [
        int(r["src"])
        for r in deg.orderBy(F.desc("_d"), F.asc("src")).limit(k).collect()
    ]
    return multi_source_bfs(edges, roots)


def estimate_distance(
    landmark_table: DataFrame, u: int, v: int
) -> int | None:
    """Triangle-inequality distance estimate from the landmark table:
    min over landmarks of d(u,l) + d(l,v) (symmetric edges ⇒ d(l,u) =
    d(u,l)). None when no landmark reaches both. Two filtered lookups +
    a driver-side min — the query-time half of the sketch."""
    du = {
        r["root"]: r["dist"]
        for r in landmark_table.where(F.col("v") == u).collect()
    }
    dv = {
        r["root"]: r["dist"]
        for r in landmark_table.where(F.col("v") == v).collect()
    }
    common = set(du) & set(dv)
    return min((du[l] + dv[l] for l in common), default=None)
