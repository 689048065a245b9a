"""Link prediction over an undirected graph: common-neighbors count and
Adamic-Adar score for non-adjacent candidate pairs (SURVEY.md §2.10 family;
absent from the reference — a standard web-graph analytics op built on the
same wedge substrate as plans/triangles.py).

For a candidate pair (u, v) with u < v and (u, v) ∉ E:

    cn(u, v) = |N(u) ∩ N(v)|
    aa(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))

Physical plan:
* one wedge self-join through the shared neighbor ``w`` — identical shape
  to the triangle closure join, so the same scale hazard: a degree-d hub in
  the middle fans out d² candidate rows. ``max_wedge_degree`` excludes
  high-degree middles BEFORE the self-join (filter on the broadcast-able
  degree table). That is not just a guard, it is the semantically right
  default for Adamic-Adar — a hub's weight 1/ln(d) is exactly the score's
  own statement that hubs carry no signal — and it is part of the declared
  contract (the oracle applies the same cap), like the df-cap in
  functions/dedup.py shingle candidates.
* existing edges leave via a left_anti join against the (symmetric) edge
  table — one direction suffices because candidates are emitted u < v and
  the edge table carries both directions.
* the groupBy (u, v) aggregation is map-side combined; nothing here
  collects or windows globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def link_prediction(
    edges: DataFrame,
    max_wedge_degree: int | None = 64,
) -> DataFrame:
    """Scored non-adjacent candidate pairs.

    ``edges``: distinct symmetric (src, dst) long pairs, both directions
    present, no self-loops (the shape derive_edges/symmetrize emit).

    Returns DataFrame[u: long, v: long, cn: long, aa: double,
    jaccard: double, pa: long] with u < v; pairs whose every shared
    neighbor exceeds ``max_wedge_degree`` (or with no shared neighbor at
    all) do not appear. ``max_wedge_degree=None`` disables the cap (small
    graphs / tests only — the self-join through an uncapped hub is
    quadratic in its degree).

    Scores: cn = |N(u) ∩ N(v)| over capped middles, aa = Adamic-Adar over
    the same middles, jaccard = cn / (deg(u) + deg(v) - cn) — capped
    intersection over TRUE union (consistent: the cap is the declared
    contract for which middles carry signal, while endpoint degrees are
    cheap exact facts), pa = deg(u)·deg(v) preferential attachment with
    true degrees.
    """
    # EAGER localCheckpoint: ``edges`` feeds four consumers (neighbor list,
    # wedge-cap degree table, existing-pair anti join, true-degree table),
    # and a caller-supplied derivation tree would be re-ANALYZED per
    # consumer — measured 9.4s → 2.8s per call at sf0.01 with identical
    # rows (the plans/triangles.py finding; analysis is eager and its cost
    # multiplies with repeated deep subtrees).
    edges = edges.localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("_d"))
    if max_wedge_degree is not None:
        deg = deg.where(F.col("_d") <= int(max_wedge_degree))
    # Neighbor lists keyed by the wedge middle, weight attached once per
    # middle (broadcast-size after the cap is NOT guaranteed — deg is
    # |V|-sized — so this stays a hash join on w; Catalyst/AQE may still
    # broadcast it when small).
    nb = edges.select(F.col("src").alias("w"), F.col("dst").alias("n")).join(
        deg, "w"
    )
    left = nb.select("w", F.col("n").alias("u"), F.col("_d"))
    right = nb.select("w", F.col("n").alias("v"))
    wedges = left.join(right, "w").where(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count("*").alias("cn"),
        F.sum(F.lit(1.0) / F.log(F.col("_d").cast("double"))).alias("aa"),
    )
    existing = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    fresh = scored.join(existing, ["u", "v"], "left_anti")
    # true (uncapped) endpoint degrees for jaccard / preferential
    # attachment — two more joins against the |V|-sized degree table.
    full_deg = edges.groupBy(F.col("src").alias("_fv")).agg(
        F.count("*").alias("_fd")
    )
    du = full_deg.select(F.col("_fv").alias("u"), F.col("_fd").alias("_du"))
    dv = full_deg.select(F.col("_fv").alias("v"), F.col("_fd").alias("_dv"))
    return (
        fresh.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            "aa",
            (
                F.col("cn").cast("double")
                / (F.col("_du") + F.col("_dv") - F.col("cn")).cast("double")
            ).alias("jaccard"),
            (F.col("_du") * F.col("_dv")).alias("pa"),
        )
    )
