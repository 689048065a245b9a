"""Node-iterator triangle counting (BASELINE.json north_rule addition;
SURVEY.md §2.10).

Classic degree-ordered node-iterator: orient each undirected edge from the
lower-(degree, id) endpoint to the higher — every triangle then has exactly
one "apex" vertex with two out-edges closed by a third edge that is itself
oriented by the same total order. Wedge endpoints are emitted in that order
too, so the closure check is a pure equi semi-join on (both endpoints) —
hash-joinable, never a nested loop.

The degree ordering is the skew guard: a hub of degree d contributes
O(sum of smaller-degree pairs) wedges instead of O(d²), which is what makes
the node-iterator survive power-law graphs at 100 TB (the hub-conversation
skew BASELINE.json calls out). Three hash joins, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.operators.graph import canonicalize, degrees


def _oriented(edges: DataFrame) -> DataFrame:
    """DataFrame[lo, hi, dlo, dhi]: canonical edges oriented by
    (degree, id) ascending, degrees retained for downstream ordering."""
    und = canonicalize(edges)  # src < dst, one row per undirected edge
    sym = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = degrees(sym)  # true undirected degree per vertex
    d1 = deg.select(F.col("v").alias("_v1"), F.col("degree").alias("_d1"))
    d2 = deg.select(F.col("v").alias("_v2"), F.col("degree").alias("_d2"))
    lower_first = (F.col("_d1") < F.col("_d2")) | (
        (F.col("_d1") == F.col("_d2")) & (F.col("src") < F.col("dst"))
    )
    return (
        und.join(d1, F.col("src") == F.col("_v1"))
        .join(d2, F.col("dst") == F.col("_v2"))
        .select(
            F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
            F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
            F.when(lower_first, F.col("_d1")).otherwise(F.col("_d2")).alias("dlo"),
            F.when(lower_first, F.col("_d2")).otherwise(F.col("_d1")).alias("dhi"),
        )
    )


def enumerate_triangles(edges: DataFrame) -> DataFrame:
    """DataFrame[a, b, c]: one row per triangle; a = apex in degree order,
    (b, c) ordered by the same (degree, id) total order. Public: the
    driver contract and downstream per-triangle analyses consume it
    directly, not just the two count reductions below."""
    # EAGER localCheckpoint, not scoped_persist: the oriented table is
    # consumed three ways, and its logical tree embeds the (already deep)
    # edge-derivation tree ~5x — with a persist, every downstream
    # transformation re-ANALYZES that repeated tree (Spark analyzes eagerly
    # per transformation), measured 21.8s of driver-side analysis per
    # triangles_per_vertex call at sf0.01 vs 5.9s of actual execution.
    # Checkpointing truncates the plan to an RDD leaf: same 28.7s query
    # drops to 2.4s, identical rows. The materialization this forces is
    # the |E|-sized oriented table — exactly what the persist stored too.
    o = _oriented(edges).localCheckpoint()
    w1 = o.select(
        F.col("lo").alias("a"),
        F.col("hi").alias("n1"),
        F.col("dhi").alias("dn1"),
    )
    w2 = o.select(
        F.col("lo").alias("a2"),
        F.col("hi").alias("n2"),
        F.col("dhi").alias("dn2"),
    )
    first_lower = (F.col("dn1") < F.col("dn2")) | (
        (F.col("dn1") == F.col("dn2")) & (F.col("n1") < F.col("n2"))
    )
    wedges = (
        w1.join(w2, (F.col("a") == F.col("a2")) & (F.col("n1") < F.col("n2")))
        .select(
            "a",
            F.when(first_lower, F.col("n1")).otherwise(F.col("n2")).alias("b"),
            F.when(first_lower, F.col("n2")).otherwise(F.col("n1")).alias("c"),
        )
    )
    closing = o.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    return wedges.join(closing, ["b", "c"], "left_semi")


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """DataFrame[v, triangles] — triangle participation counts."""
    tri = enumerate_triangles(edges)
    longf = (
        tri.select(F.col("a").alias("v"))
        .unionByName(tri.select(F.col("b").alias("v")))
        .unionByName(tri.select(F.col("c").alias("v")))
    )
    return longf.groupBy("v").agg(F.count(F.lit(1)).alias("triangles"))


def triangle_count(edges: DataFrame) -> int:
    """Exact global triangle count."""
    return int(enumerate_triangles(edges).count())


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over a symmetric edge table:

        lcc(v) = 2 * T(v) / (deg(v) * (deg(v) - 1))     (0.0 when deg < 2)

    where T(v) is the triangle participation count from the degree-ordered
    node-iterator above — so the hub guard (wedge fan-out bounded by the
    SMALLER endpoint degree) carries over unchanged; the only additions are
    one |V|-sized hash aggregate for degrees and one left join to attach the
    (sparse) triangle counts to every vertex.

    Returns DataFrame[v, degree, triangles, lcc]. ``edges`` must be the
    symmetric deduplicated shape operators/graph.symmetrize emits (degree ==
    row count per src)."""
    deg = degrees(edges)
    tri = triangles_per_vertex(edges)
    d = F.col("degree").cast("double")
    return deg.join(tri, "v", "left").select(
        "v",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            2.0 * F.coalesce("triangles", F.lit(0)) / (d * (d - 1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def transitivity(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient (transitivity) of the simple
    undirected graph:

        C = 3 * |triangles| / |wedges|,   wedges = sum_v C(deg(v), 2)

    the whole-graph companion to ``clustering_coefficients`` (per-vertex)
    — the standard summary a link-graph report pairs with the degree
    histogram and component stats (reference analogue: the same
    degree-census inputs as degreeDistInfo.hpp:92-166 feed parconnect's
    strategy decision; here they feed the closed-form wedge count, so
    transitivity costs ONE extra hash aggregate on top of the triangle
    pass).

    Determinism discipline: both counts are exact int64 — the triangle
    pass is the degree-ordered node-iterator (hub-guarded), the wedge sum
    uses integer ``div`` (d*(d-1) is always even; a double quotient would
    lose bits past 2^53, which sum_v d^2 exceeds long before 100 TB) —
    and the ratio is the ONLY double, computed engine-side in a single
    expression so a SQL oracle reproduces it bit-for-bit.

    Returns one row: (n_triangles bigint, n_wedges bigint,
    transitivity double rounded 6dp; 0.0 for a wedge-free graph).
    ``edges`` must be the symmetric deduplicated shape (degree == row
    count per src)."""
    tri = enumerate_triangles(edges).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    wed = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("_d"))
        .agg(
            F.coalesce(
                F.expr("sum(_d * (_d - 1) div 2)"), F.lit(0).cast("bigint")
            ).alias("n_wedges")
        )
    )
    # two 1-row aggregates; the cross join is scalar-by-scalar
    return tri.crossJoin(wed).select(
        "n_triangles",
        "n_wedges",
        F.when(
            F.col("n_wedges") > 0,
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("transitivity"),
    )
