"""Synchronous label propagation (BASELINE.json north_rule addition).

Community-detection flavor: every superstep, each vertex adopts the most
frequent label among its neighbors (ties broken toward the smaller label —
deterministic, so results are reproducible across parallelism levels, the
same order-invariance the reference's tests demand via shuffled inputs,
/root/reference/test/test_ccl_coloring.cpp:63). ``rule="min"`` degenerates
to the reference's min-label coloring semantics
(/root/reference/src/coloring/labelProp.hpp:358-432).

Each superstep: one join (edges ⨝ labels on src) + one grouped count + one
argmax window-free reduce via max_by on a packed (count, -label) struct —
two shuffles, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.operators.graph import vertices as vertex_table


def label_propagation(
    edges: DataFrame,
    num_iters: int = 10,
    rule: str = "majority",
    checkpoint=None,
) -> DataFrame:
    """Returns DataFrame[v: long, label: long]. ``edges`` must be symmetric
    for undirected semantics (both directions present)."""
    verts = vertex_table(edges).persist()
    labels = verts.select("v", F.col("v").alias("label")).localCheckpoint()

    for _ in range(num_iters):
        nbr = edges.join(labels, edges["dst"] == labels["v"]).select(
            F.col("src").alias("u"), "label"
        )
        if rule == "min":
            chosen = nbr.groupBy("u").agg(F.min("label").alias("new_label"))
        elif rule == "majority":
            counted = nbr.groupBy("u", "label").agg(
                F.count(F.lit(1)).alias("_c")
            )
            # argmax by (count desc, label asc): max_by over struct orders
            # lexicographically, so negate the label.
            chosen = counted.groupBy("u").agg(
                (
                    -F.max(F.struct(F.col("_c"), (-F.col("label")).alias("_nl")))[
                        "_nl"
                    ]
                ).alias("new_label")
            )
        else:
            raise ValueError(f"unknown rule {rule!r}")
        if rule == "min":
            # min-label coloring keeps the vertex's own label in the min
            # (the self-tuple semantics of labelProp.hpp:244-261).
            pick = F.least("label", F.coalesce("new_label", "label"))
        else:
            pick = F.coalesce("new_label", "label")
        labels = (
            labels.join(chosen, labels["v"] == chosen["u"], "left")
            .select("v", pick.alias("label"))
            .localCheckpoint()
        )
    verts.unpersist()
    return labels


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a community assignment over a SYMMETRIC edge
    table — the standard quality score for label-propagation output:

        Q = E_in/(2m) − Σ_c (deg_c / (2m))²

    with 2m = symmetric row count, E_in = same-community symmetric rows,
    deg_c = total degree inside community c. ``labels`` is any
    DataFrame[v, label] covering the graph's vertices (label_propagation
    output, CC labels, an external clustering).

    One tagged-edge aggregate (two |V|-sized label joins feeding a single
    global sum — map-side combined) + one per-community degree aggregate,
    then a scalar cross join; nothing collects. Returns a single row
    DataFrame[modularity: double, n_communities: long, two_m: long]."""
    ls = labels.select(F.col("v").alias("_sv"), F.col("label").alias("_sl"))
    ld = labels.select(F.col("v").alias("_dv"), F.col("label").alias("_dl"))
    tagged = edges.join(ls, edges["src"] == F.col("_sv")).join(
        ld, edges["dst"] == F.col("_dv")
    )
    t1 = tagged.agg(
        F.count(F.lit(1)).cast("double").alias("_two_m"),
        F.sum(
            F.when(F.col("_sl") == F.col("_dl"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("double")
        .alias("_e_in"),
    )
    deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("double").alias("_d")
    )
    dc = labels.join(deg, "v").groupBy("label").agg(F.sum("_d").alias("_dc"))
    t2 = dc.agg(
        F.sum(F.col("_dc") * F.col("_dc")).alias("_sum_dc2"),
        F.count(F.lit(1)).alias("n_communities"),
    )
    return t1.crossJoin(t2).select(
        (
            F.col("_e_in") / F.col("_two_m")
            - F.col("_sum_dc2") / (F.col("_two_m") * F.col("_two_m"))
        ).alias("modularity"),
        "n_communities",
        F.col("_two_m").cast("long").alias("two_m"),
    )


def conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance over a SYMMETRIC edge table — the cut
    quality score beside :func:`modularity` (low conductance = few
    boundary edges relative to the community's internal volume):

        φ(C) = cut(C) / min(vol(C), 2m − vol(C))

    with vol(C) = Σ_{v∈C} deg(v) (= symmetric rows whose src ∈ C),
    cut(C) = symmetric rows with src ∈ C, dst ∉ C, and 2m = total
    symmetric row count. A community spanning the whole graph has
    min(vol, 2m − vol) = 0 and is defined to score 0.0 (its cut is 0).

    Returns DataFrame[label, cut: long, volume: long, conductance:
    double]. All inputs to the ratio are exact int64 counts and the ratio
    is one double division — engine-deterministic without rounding (the
    contract still rounds to 6dp for uniformity).

    Scale shape: two |V|-row label joins tag each edge endpoint, then ONE
    map-side-combined hash aggregate per community plus a broadcast
    scalar — the modularity plan with a per-community key. No windows;
    a giant community is an AQE-splittable aggregation key."""
    ls = labels.select(F.col("v").alias("_sv"), F.col("label").alias("_sl"))
    ld = labels.select(F.col("v").alias("_dv"), F.col("label").alias("_dl"))
    tagged = edges.join(ls, edges["src"] == F.col("_sv")).join(
        ld, edges["dst"] == F.col("_dv")
    )
    per = tagged.groupBy(F.col("_sl").alias("label")).agg(
        F.count(F.lit(1)).alias("volume"),
        F.sum(
            F.when(F.col("_sl") != F.col("_dl"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("cut"),
    )
    two_m = edges.agg(F.count(F.lit(1)).alias("_two_m"))
    denom = F.least(F.col("volume"), F.col("_two_m") - F.col("volume"))
    return per.crossJoin(F.broadcast(two_m)).select(
        "label",
        "cut",
        "volume",
        F.when(denom > 0, F.col("cut") / denom)
        .otherwise(F.lit(0.0))
        .alias("conductance"),
    )
