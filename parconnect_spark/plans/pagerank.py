"""Power-iteration PageRank with teleport (BASELINE.json north_rule addition;
absent from the reference, built on the same join+agg substrate —
SURVEY.md §2.10).

rank_{k+1}(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} rank_k(u)/outdeg(u)
                                + dangling_mass_k / N )

Dangling mass is redistributed uniformly so Σ rank = 1 at every step even on
non-symmetric graphs. Convergence: L1 delta < tol (allclose 1e-6 parity per
BASELINE.json), or exactly ``num_iters`` fixed iterations when ``tol`` is
None (used by the DuckDB oracle comparison, which unrolls the same fixed
recurrence in SQL).

Scale notes:
* contributions are a single shuffle per iteration: edges ⨝ ranks on src
  (ranks side is |V|, edge side |E|) then groupBy(dst).sum — Catalyst gives
  map-side partial sums.
* hub skew: ``salt_buckets > 1`` splits hot dst keys into that many partial
  groups before the final combine (two-phase aggregation, the explicit
  skew handling BASELINE.json requires). For sum() the rewrite is exact.
* lineage truncated per iteration via localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.operators.graph import vertices as vertex_table


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float | None = 1e-6,
    num_iters: int = 50,
    salt_buckets: int = 1,
    hub_degree_threshold: int | None = None,
    checkpoint=None,
) -> DataFrame:
    """Returns DataFrame[v: long, rank: double]. ``edges`` are directed
    (u→v); pass a symmetrized table for undirected semantics.

    Skew: ``salt_buckets > 1`` salts the contribution sum into a two-phase
    aggregation. With ``hub_degree_threshold`` set, only edges whose dst
    in-degree exceeds it are salted (degree-based edge splitting,
    operators/skew.py) — cold keys keep the single-phase path."""
    verts = (
        vertex_table(edges)
        .unionByName(edges.select(F.col("dst").alias("v")).distinct())
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        verts.unpersist()
        return edges.sparkSession.createDataFrame([], "v long, rank double")
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg")).persist()

    # Pre-join degree onto edges once; reused every iteration.
    contrib_edges = edges.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("_deg")).alias("_w")
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
    contrib_edges = contrib_edges.persist()
    contrib_edges.count()

    ranks = verts.select("v", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    teleport = (1.0 - damping) / n

    # The dangling SET is fixed; compute it once. On symmetric graphs it is
    # empty and the per-iteration dangling-mass job disappears entirely.
    dangling_verts = verts.join(
        out_deg, verts["v"] == out_deg["src"], "left_anti"
    ).persist()
    has_dangling = dangling_verts.limit(1).count() > 0

    it = 0
    while it < num_iters:
        it += 1
        dangling = (
            dangling_verts.join(ranks, "v").agg(F.sum("rank")).collect()[0][0] or 0.0
        ) if has_dangling else 0.0
        if salt_buckets > 1:
            contribs = contrib_edges.join(
                ranks, contrib_edges["src"] == ranks["v"]
            ).select(
                "dst", "_salt", (F.col("rank") * F.col("_w")).alias("_c")
            )
            partial = contribs.groupBy("dst", "_salt").agg(
                F.sum("_c").alias("_ps")
            )
            summed = partial.groupBy("dst").agg(F.sum("_ps").alias("_s"))
        else:
            contribs = contrib_edges.join(
                ranks, contrib_edges["src"] == ranks["v"]
            ).select(F.col("dst"), (F.col("rank") * F.col("_w")).alias("_c"))
            summed = contribs.groupBy("dst").agg(F.sum("_c").alias("_s"))
        new = verts.join(summed, verts["v"] == summed["dst"], "left").select(
            "v",
            (
                F.lit(teleport)
                + F.lit(damping)
                * (F.coalesce("_s", F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        new = new.localCheckpoint()
        if tol is not None:
            delta = (
                new.join(ranks.withColumnRenamed("rank", "_old"), "v")
                .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))).alias("d"))
                .collect()[0]["d"]
            )
            ranks = new
            if delta < tol:
                break
        else:
            ranks = new

    verts.unpersist()
    out_deg.unpersist()
    contrib_edges.unpersist()
    dangling_verts.unpersist()
    return ranks
