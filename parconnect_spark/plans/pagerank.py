"""Power-iteration PageRank with teleport (BASELINE.json north_rule addition;
absent from the reference, built on the same join+agg substrate —
SURVEY.md §2.10).

rank_{k+1}(v) = (1-d)·p(v) + d * ( Σ_{(u,v)∈E} rank_k(u)/outdeg(u)
                                   + dangling_mass_k · p(v) )

with p(v) = 1/N (classic) or, with ``seeds`` given, the personalized
restart vector p(v) = 1/|S| on the seed set and 0 elsewhere (personalized
PageRank — random walk with restart to the seeds). Dangling mass is
redistributed by the same p so Σ rank = 1 at every step even on
non-symmetric graphs. Convergence: L1 delta < tol (allclose 1e-6 parity per
BASELINE.json), or exactly ``num_iters`` fixed iterations when ``tol`` is
None (used by the DuckDB oracle comparison, which unrolls the same fixed
recurrence in SQL).

Physical plan (one iteration):
* ``|V| <= broadcast_max_rows`` (the common case until ~10^8 vertices):
  the rank table is BROADCAST into the edge join, so the persisted edge
  table is never exchanged — the iteration's only shuffle is the map-side-
  combined groupBy(dst) partial sum, and the whole iteration runs as ONE
  job (the convergence-delta aggregate materializes the lazily
  local-checkpointed new ranks).
* above the gate: the edge table is cached PRE-HASHED on ``src`` once, so
  every iteration's join exchanges only the |V|-row rank side
  (shuffle-hash hinted — no per-iteration re-sort of |E| rows).
* hub skew: ``salt_buckets > 1`` splits hot dst keys into that many partial
  groups before the final combine (two-phase aggregation, the explicit
  skew handling BASELINE.json requires). For sum() the rewrite is exact.
* lineage truncated per iteration via lazy localCheckpoint; with ``tol``
  set the delta aggregate is the materializing action (1 job/iteration).

Resumability (north_rule): pass a SuperstepCheckpoint — every
``checkpoint_every``-th iteration persists the rank table + iteration
metrics, and a rerun resumes from the last committed iteration (identity-
stamped against the input graph like plans/connectivity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.operators.graph import vertices as vertex_table

#: |V| gate for broadcasting the rank table into the per-iteration join.
#: 8M (v:long, rank:double) rows ≈ 250 MB as a broadcast relation — the same
#: executor-memory calculus as plans/connectivity.BROADCAST_MAX_ROWS.
BROADCAST_MAX_ROWS = 8_000_000

#: seed-set cap for personalized PageRank: p(v) is evaluated as a literal
#: isin() so the restart vector never needs a join; a seed LIST beyond this
#: would bloat the expression tree (same calculus as the hub literal caps in
#: plans/connectivity.py). Practical PPR seed sets are a handful of vertices;
#: a full personalization DISTRIBUTION belongs in a joined table, which is a
#: different operator.
MAX_SEEDS = 4096


def _directed_checksum(
    edges: DataFrame, weight_col: str | None = None
) -> tuple[int, int]:
    """Order-insensitive (count, hash-sum) fingerprint of the DIRECTED edge
    set (orientation matters for PageRank, unlike connectivity's canonical
    form); weighted runs fold the weight in, so a resume against the same
    topology with different weights is rejected."""
    cols = ["src", "dst"] if weight_col is None else ["src", "dst", weight_col]
    row = edges.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.xxhash64(*cols).cast("decimal(20,0)")).alias("s"),
    ).collect()[0]
    return int(row["cnt"]), int(row["s"] or 0)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    num_iters: int = 50,
    salt_buckets: int = 1,
    hub_degree_threshold: int | None = None,
    checkpoint=None,
    checkpoint_every: int = 1,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    materialize_every: int = 8,
    seeds: list[int] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Returns DataFrame[v: long, rank: double]. ``edges`` are directed
    (u→v); pass a symmetrized table for undirected semantics.

    ``seeds``: personalized PageRank restart set (≤ MAX_SEEDS vertex ids) —
    teleport and dangling mass go only to the seeds, uniformly; ranks start
    at the restart vector. None keeps the classic uniform teleport.

    ``weight_col``: name of a POSITIVE edge-weight column — a vertex's rank
    flows out proportionally to weight / Σ out-weights instead of 1/outdeg
    (weighted PageRank, e.g. co-occurrence counts). The plan shape is
    unchanged: the normalized weight is folded into the same pre-joined
    ``_w`` column, so iterations cost exactly what the unweighted run costs.

    Skew: ``salt_buckets > 1`` salts the contribution sum into a two-phase
    aggregation. With ``hub_degree_threshold`` set, only edges whose dst
    in-degree exceeds it are salted (degree-based edge splitting,
    operators/skew.py) — cold keys keep the single-phase path."""
    spark = edges.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # EAGER localCheckpoints throughout the setup, not persists: every
    # iteration's plan embeds the vertex and contribution tables, and a
    # persist does NOT stop Spark's eager per-transformation ANALYSIS from
    # re-walking the trees a cached relation carries (the plans/triangles.py
    # finding). Checkpointing truncates them to RDD leaves — the iteration
    # loop then analyzes O(1)-size trees. localCheckpoint preserves the
    # pre-hashed partitioning (LogicalRDD keeps outputPartitioning), so the
    # above-the-gate no-re-exchange property survives.
    edges = edges.localCheckpoint()
    verts = (
        vertex_table(edges)
        .unionByName(edges.select(F.col("dst").alias("v")).distinct())
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "v long, rank double")
    bcast_ranks = n <= broadcast_max_rows
    out_mass = (
        F.sum(F.col(weight_col).cast("double"))
        if weight_col is not None
        else F.count(F.lit(1)).cast("double")
    )
    out_deg = edges.groupBy("src").agg(out_mass.alias("_deg")).localCheckpoint()

    # Pre-join degree onto edges once; reused every iteration. Above the
    # broadcast gate the cache is pre-hashed on the join key so the big side
    # never re-exchanges (the rank side is the only per-iteration shuffle).
    share = (
        F.col(weight_col).cast("double") / F.col("_deg")
        if weight_col is not None
        else F.lit(1.0) / F.col("_deg")
    )
    contrib_edges = edges.join(out_deg, "src").select(
        "src", "dst", share.alias("_w")
    )
    if salt_buckets > 1:
        if hub_degree_threshold is not None:
            from parconnect_spark.operators.skew import salt_hot_edges

            contrib_edges = salt_hot_edges(
                contrib_edges.select("dst", "src", "_w"),
                "dst",
                hub_degree_threshold,
                salt_buckets,
            )
        else:
            contrib_edges = contrib_edges.withColumn(
                "_salt", F.pmod(F.hash("src"), F.lit(salt_buckets))
            )
    if not bcast_ranks:
        contrib_edges = contrib_edges.repartition(parts, "src")
    contrib_edges = contrib_edges.localCheckpoint()

    if checkpoint is not None and getattr(checkpoint, "identity", None) is None:
        cnt, s = _directed_checksum(edges, weight_col)
        checkpoint.bind_identity(
            {
                "algorithm": "pagerank",
                "working_set_schema": "v:long,rank:double",
                "input_edges": cnt,
                "input_checksum": str(s),
                "damping": damping,
                "weight_col": weight_col or "none",
                # seeds change the fixpoint: a resume under a different
                # restart vector must be rejected as foreign state.
                "seeds": "uniform"
                if seeds is None
                else ",".join(str(int(s)) for s in sorted({int(x) for x in seeds})),
            }
        )

    # Restart vector p as a pure expression on "v" — a literal isin for
    # seeds, a constant otherwise — so personalization never adds a join to
    # the per-iteration plan.
    if seeds is None:
        pcol = F.lit(1.0 / n)
    else:
        svals = sorted({int(s) for s in seeds})
        if not svals:
            raise ValueError("seeds must be a non-empty list of vertex ids")
        if len(svals) > MAX_SEEDS:
            raise ValueError(
                f"{len(svals)} seeds exceeds MAX_SEEDS={MAX_SEEDS}; a "
                "personalization distribution that large should be a joined "
                "table, not a literal restart set"
            )
        pcol = (
            F.when(F.col("v").isin(svals), F.lit(1.0 / len(svals)))
            .otherwise(F.lit(0.0))
        )
    ranks = verts.select("v", pcol.alias("rank")).localCheckpoint()
    it = 0
    if checkpoint is not None:
        step, df = checkpoint.latest()
        if step is not None:
            it, ranks = step, df.localCheckpoint()

    # The dangling SET is fixed; compute it once. On symmetric graphs it is
    # empty and the per-iteration dangling-mass job disappears entirely.
    dangling_verts = verts.join(
        out_deg, verts["v"] == out_deg["src"], "left_anti"
    ).localCheckpoint()
    has_dangling = dangling_verts.limit(1).count() > 0

    while it < num_iters:
        it += 1
        dangling = (
            dangling_verts.join(ranks, "v").agg(F.sum("rank")).collect()[0][0] or 0.0
        ) if has_dangling else 0.0
        rank_side = F.broadcast(ranks) if bcast_ranks else ranks.hint("shuffle_hash")
        joined = contrib_edges.join(
            rank_side, contrib_edges["src"] == rank_side["v"]
        )
        if salt_buckets > 1:
            contribs = joined.select(
                "dst", "_salt", (F.col("rank") * F.col("_w")).alias("_c")
            )
            partial = contribs.groupBy("dst", "_salt").agg(
                F.sum("_c").alias("_ps")
            )
            summed = partial.groupBy("dst").agg(F.sum("_ps").alias("_s"))
        else:
            contribs = joined.select(
                F.col("dst"), (F.col("rank") * F.col("_w")).alias("_c")
            )
            summed = contribs.groupBy("dst").agg(F.sum("_c").alias("_s"))
        if bcast_ranks:
            summed = F.broadcast(summed)
        new = verts.join(summed, verts["v"] == summed["dst"], "left").select(
            "v",
            (
                F.lit(1.0 - damping) * pcol
                + F.lit(damping)
                * (F.coalesce("_s", F.lit(0.0)) + F.lit(dangling) * pcol)
            ).alias("rank"),
        )
        # Lazy checkpoint: the logical plan truncates now; the blocks
        # materialize under the delta aggregate (tol mode — exactly one job
        # per iteration) or cascade into the caller's terminal action (fixed
        # num_iters mode — the whole unrolled recurrence is ONE job).
        new = new.localCheckpoint(eager=False)
        delta = None
        if tol is not None:
            old = ranks.select("v", F.col("rank").alias("_old"))
            if bcast_ranks:
                old = F.broadcast(old)
            delta = (
                new.join(old, "v")
                .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("d"))
                .collect()[0]["d"]
            )
        ranks = new
        if tol is None and it % materialize_every == 0:
            # Fixed-iteration mode has no per-iteration action; bound the
            # lazy-checkpoint cascade depth (nested broadcast subqueries
            # execute recursively at the terminal action — fine at 8 deep,
            # fragile at 50). Interleaved A/B at sf0.1: depth-8 cascade
            # statistically tied with count()-per-iteration (medians 20.4
            # vs 21.2s under +/-20% host noise) — 8 keeps the job count
            # minimal without unbounded depth.
            ranks.count()
        if checkpoint is not None and it % checkpoint_every == 0:
            m = {
                "iteration": it,
                "algorithm": "pagerank",
                "dangling_mass": dangling,
                "l1_delta": delta,
            }
            ranks = checkpoint.save(it, ranks, m)
        if delta is not None and delta < tol:
            break

    return ranks
