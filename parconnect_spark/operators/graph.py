"""Edge-table primitives.

The reference stores every undirected edge twice — (u,v) and (v,u) — as a
hard invariant (/root/reference/src/graphGen/common/utils.hpp:61-101,
doubling at generation /root/reference/src/graphGen/graph500/graph500Gen.hpp:93-99).
Here the same invariant is one ``union`` of a swapped projection; all the
MPI bucketing/boundary-stitching code it protects disappears into Spark's
shuffle.

All functions are lazy DataFrame transforms: filters and projections push
down to the parquet scan, aggregations get map-side partial combine from
Catalyst automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def symmetrize(edges: DataFrame, deduplicate: bool = True) -> DataFrame:
    """Ensure every undirected edge is present in both directions.

    Mirrors the reference's add-reverse-edge path
    (/root/reference/src/graphGen/fileIO/graphReader.hpp:248-251). Self-loops
    are dropped — parconnect's generators filter them too
    (/root/reference/src/graphGen/graph500/graph500Gen.hpp:100-104).
    """
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    out = fwd.unionByName(rev).where(F.col("src") != F.col("dst"))
    return out.distinct() if deduplicate else out


def canonicalize(edges: DataFrame) -> DataFrame:
    """One row per undirected edge with src < dst (the reference's binary
    export filter, /root/reference/src/graphGen/common/binaryEdgeListExport.hpp:48-70).
    """
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids as DataFrame[v: long].

    On a symmetric edge table the SRC set equals the DEST set, so a single
    column scan suffices — the same symmetry assumption reduceVertexIds
    relies on (/root/reference/src/graphGen/common/reduceIds.hpp:125-231).
    """
    return edges.select(F.col("src").alias("v")).distinct()


def degrees(edges: DataFrame, distinct_neighbors: bool = False) -> DataFrame:
    """Per-vertex out-degree DataFrame[v, degree] — the adjacency row-sums of
    /root/reference/src/bfs/bfsRunner.hpp:128 as one hash aggregate."""
    agg = (
        F.countDistinct("dst") if distinct_neighbors else F.count(F.lit(1))
    ).alias("degree")
    return edges.groupBy(F.col("src").alias("v")).agg(agg)


def degree_histogram(edges: DataFrame) -> DataFrame:
    """degree → frequency histogram over distinct neighbors.

    Replaces the reference's sort + per-run unique + rank-boundary patching +
    vector reduce (/root/reference/src/dynamic/degreeDistInfo.hpp:92-166) with
    two hash aggregates; the +1 Laplace smoothing the reference applies for
    plfit stays in plans/decision.py where it is consumed.
    """
    return (
        edges.groupBy("src")
        .agg(F.countDistinct("dst").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Per-vertex mean neighbor degree DataFrame[v, avg_nbr_deg] — the
    standard k_nn(v) structural feature (and the per-vertex view of the
    assortativity measurement below).

    One degree aggregate + one hash join keyed on the edge dst + one
    map-side-combined avg; the degree table is |V|-sized so AQE broadcasts
    it when small and hash-joins otherwise. ``edges`` must be symmetric
    deduplicated (degree == row count per src)."""
    deg = degrees(edges)
    return (
        edges.join(deg, edges["dst"] == deg["v"])
        .groupBy(F.col("src").alias("v"))
        .agg(F.avg(F.col("degree").cast("double")).alias("avg_nbr_deg"))
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): Pearson correlation
    of (deg(src), deg(dst)) over the directed occurrences of every
    undirected edge — which is exactly one pass over the symmetric edge
    table, so each undirected edge contributes both orientations as the
    definition requires.

    Returns a single row DataFrame[assortativity: double, n_edges: long]
    (n_edges = directed row count = 2x undirected). Two joins against the
    |V|-sized degree table + one global corr aggregate (map-side partial
    moments, one scalar shuffle) — no windows, no collect."""
    deg = degrees(edges)
    ds = deg.select(F.col("v").alias("_sv"), F.col("degree").alias("_sd"))
    dd = deg.select(F.col("v").alias("_dv"), F.col("degree").alias("_dd"))
    joined = edges.join(ds, edges["src"] == F.col("_sv")).join(
        dd, edges["dst"] == F.col("_dv")
    )
    return joined.agg(
        F.corr(F.col("_sd").cast("double"), F.col("_dd").cast("double")).alias(
            "assortativity"
        ),
        F.count(F.lit(1)).alias("n_edges"),
    )


def contract_graph(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Coarsen the graph by a vertex->group assignment: the contraction
    step of multilevel partitioning / Louvain-style community pipelines.

    ``edges`` is the symmetric long table [src, dst]; ``labels`` is
    DataFrame[v: long, label: long] (a CC or label-propagation output).
    Returns one row per SUPER-edge between DISTINCT groups,
    DataFrame[ca: long, cb: long, weight: long] with ca < cb, where weight
    counts the undirected input edges collapsing onto that group pair
    (parallel edges accumulate — the multiplicity a coarsened Louvain /
    partitioning pass needs).

    Physical shape: the src < dst filter picks each undirected edge once
    from the symmetric table (pushed to the scan), two |V|-row label joins
    (AQE broadcasts the label side when it fits), one hash aggregate with
    map-side combine. Intra-group edges drop out before the shuffle, so at
    a good community assignment the aggregate input is a small fraction of
    |E| — the whole point of coarsening at 100-TB scale.
    """
    ls = labels.select(F.col("v").alias("_cv"), F.col("label").alias("_cs"))
    ld = labels.select(F.col("v").alias("_dv"), F.col("label").alias("_cd"))
    once = edges.where(F.col("src") < F.col("dst"))
    tagged = (
        once.join(ls, once["src"] == F.col("_cv"))
        .join(ld, once["dst"] == F.col("_dv"))
        .where(F.col("_cs") != F.col("_cd"))
    )
    return (
        tagged.select(
            F.least("_cs", "_cd").alias("ca"), F.greatest("_cs", "_cd").alias("cb")
        )
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def filter_visited_edges(edges: DataFrame, visited: DataFrame) -> DataFrame:
    """Drop every edge whose SRC was visited (post-BFS residual edges).

    The reference does this with sort + allgather splitters + all2all +
    boundary left_shift + merge (/root/reference/src/bfs/bfsRunner.hpp:272-357,
    86 LoC); the splitter machinery *is* Spark's shuffle, so it reduces to a
    single anti join. ``visited`` must have column ``v``.
    """
    vis = visited.select("v")
    return edges.join(vis, on=edges["src"] == vis["v"], how="left_anti")


def check_bidirectional(edges: DataFrame) -> bool:
    """Invariant checker: every (u,v) has its (v,u) twin
    (/root/reference/src/graphGen/common/utils.hpp:68-101)."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.exceptAll(rev).limit(1).count() == 0


def project_bipartite(
    pairs: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """Weighted one-mode projection of a bipartite membership table:
    two items that share a group get an undirected edge weighted by the
    number of groups they share. Returns DataFrame[a, b, weight] with
    ``a < b`` (one row per unordered pair).

    ``max_group_size`` excludes groups with more members — the scale
    guard: a group of m members fans out m·(m−1)/2 pair rows, so one
    viral group can dominate the whole shuffle (the same capped-candidate
    discipline as the link-prediction wedge cap and the dedup df cap; the
    cap is part of the declared semantics, not an approximation knob a
    caller can ignore). None disables it.

    Plan: dedupe memberships, one self-equi-join on the group key
    (co-partitioned by construction — both sides shuffle on group once),
    one map-side-combined count aggregate on the pair. No windows, no
    collect."""
    mem = pairs.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_v")
    ).dropDuplicates(["_g", "_v"])
    if max_group_size is not None:
        sizes = mem.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
        mem = mem.join(
            sizes.where(F.col("_n") <= max_group_size).select("_g"), "_g"
        )
    a = mem.select("_g", F.col("_v").alias("a"))
    b = mem.select("_g", F.col("_v").alias("b"))
    return (
        a.join(b, "_g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def count_butterflies(
    pairs: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """Bipartite butterfly count — the (2,2)-biclique motif (two items
    sharing two groups), the bipartite analogue of the triangle and the
    standard cohesion statistic for membership graphs (conv x entity,
    user x document). Counted in closed form over the weighted one-mode
    projection:

        butterflies = sum over item pairs C(w, 2),  w = shared-group count

    so the physical plan is ``project_bipartite`` (one group-key self-join
    + one pair aggregate, viral groups excluded by ``max_group_size`` —
    the cap is declared semantics shared with the projection) plus ONE
    scalar aggregate; no 4-vertex enumeration ever materializes. Per-pair
    C(w,2) uses integer ``div`` (w*(w-1) is even; exact past 2^53).

    Returns one row: (n_pairs bigint — co-occurring item pairs,
    n_butterflies bigint)."""
    proj = project_bipartite(pairs, group_col, item_col, max_group_size)
    return proj.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(
            F.expr("sum(weight * (weight - 1) div 2)"),
            F.lit(0).cast("bigint"),
        ).alias("n_butterflies"),
    )


def reciprocity(
    directed: DataFrame, src_col: str = "a", dst_col: str = "b"
) -> DataFrame:
    """Edge reciprocity of a simple directed graph: the fraction of
    ordered edges whose reverse edge also exists — the standard
    directionality summary next to SCC and HITS for a directed link
    graph (1.0 = effectively undirected, 0.0 = purely one-way).

    Plan: dedupe, one (src,dst)-keyed LEFT SEMI self-join against the
    reversed view (both sides shuffle on the same composite key — one
    exchange each, no fan-out since rows are distinct), then two scalar
    counts. Counts are exact int64; the ratio is the only double,
    computed engine-side in one expression (rounded 6dp). Returns one
    row: (n_edges, n_reciprocal, reciprocity); (0, 0, 0.0) for an empty
    graph. Self-loops are excluded — a loop is its own reverse and would
    inflate the statistic."""
    d = (
        directed.select(
            F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
        )
        .where(F.col(src_col) != F.col(dst_col))
        .distinct()
    )
    rev = d.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
    tot = d.agg(F.count(F.lit(1)).alias("n_edges"))
    rec = d.join(rev, ["_s", "_d"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    return tot.crossJoin(rec).select(
        "n_edges",
        "n_reciprocal",
        F.when(
            F.col("n_edges") > 0,
            F.round(
                F.col("n_reciprocal") / F.col("n_edges").cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("reciprocity"),
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient φ(k) for every degree value present in the
    graph: with N_k = #vertices of degree > k and E_k = #undirected edges
    whose BOTH endpoints have degree > k, φ(k) = 2·E_k / (N_k·(N_k−1)) —
    the density of the subgraph induced by the "rich" vertices (Zhou &
    Mondragón 2004). Rising φ(k) means hubs preferentially interlink —
    for a transcript link graph, whether heavy tools/roles form a core.

    All thresholds are computed in ONE pass — no per-k subgraph scan:
    E_k and N_k are complementary cumulative counts, so two histograms
    suffice. (1) the vertex degree histogram; (2) the edge min-endpoint-
    degree histogram (canonical src<dst half joined to the degree table
    twice — co-partitioned equi-joins, broadcast when |V| is small). The
    suffix sums run in a window over the MERGED HISTOGRAM rows (≤
    #distinct degree values — thousands at web scale, never corpus-sized),
    the same bounded-window discipline as group_quantile_filter.

    ``edges`` must be symmetric deduplicated (the CC/pagerank input
    shape). Returns DataFrame[k, n_k, e_k, phi] for every k in the union
    of observed vertex/min-edge degree values with n_k ≥ 2 (φ undefined
    below two rich vertices); counts are exact int64, φ is the one
    derived double (rounded 6dp, identical IEEE expression on any
    engine)."""
    from pyspark.sql import Window

    # no persist: the function returns a LAZY frame, so a scoped persist
    # could never be released safely; the degree aggregate appears three
    # times in the plan and Spark's ReuseExchange collapses the repeated
    # shuffle instead (asserted in test)
    deg = degrees(edges)
    vh = deg.groupBy(F.col("degree").alias("k")).agg(
        F.count(F.lit(1)).alias("_vc")
    )
    canon = edges.where(F.col("src") < F.col("dst"))
    du = deg.select(F.col("v").alias("src"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("v").alias("dst"), F.col("degree").alias("_dv"))
    eh = (
        canon.join(du, "src")
        .join(dv, "dst")
        .select(F.least("_du", "_dv").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("_ec"))
    )
    merged = vh.join(eh, "k", "full_outer").select(
        "k",
        F.coalesce("_vc", F.lit(0)).alias("_vc"),
        F.coalesce("_ec", F.lit(0)).alias("_ec"),
    )
    # strict suffix sums: rows with degree value > k, i.e. the preceding
    # rows in descending order, current row excluded
    w = (
        Window.orderBy(F.desc("k"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = merged.select(
        "k",
        F.coalesce(F.sum("_vc").over(w), F.lit(0)).alias("n_k"),
        F.coalesce(F.sum("_ec").over(w), F.lit(0)).alias("e_k"),
    )
    return out.where(F.col("n_k") >= 2).select(
        "k",
        "n_k",
        "e_k",
        F.round(
            2.0 * F.col("e_k") / (F.col("n_k") * (F.col("n_k") - 1)).cast("double"),
            6,
        ).alias("phi"),
    )


def snapshot_diff(tagged_edges: DataFrame, sep: str = "|") -> DataFrame:
    """Consecutive-snapshot edge-set delta over window-tagged edges (the
    derive_windowed_string_edges shape, endpoints ``<window><sep><name>``
    with both endpoints in the same window): for every consecutive window
    pair, how many distinct undirected edges were added, removed, and
    kept — the day-over-day structural-churn report of a temporal link
    graph.

    Exact integers throughout. Scale shape: one distinct over the tagged
    edges (map-side combined), then ONE full-outer join co-partitioned on
    (window pair, edge) — never a driver loop over windows; the
    window-successor table is #windows rows (the only single-partition
    window, same bound as the exscan offset table) and broadcasts."""
    from pyspark.sql import Window
    from parconnect_spark.cache import scoped_persist

    strip = lambda c: F.expr(f"substring({c}, instr({c}, '{sep}') + 1)")
    snap = scoped_persist(
        tagged_edges.select(
            F.substring_index("a", sep, 1).alias("w"),
            strip("a").alias("ea"),
            strip("b").alias("eb"),
        ).distinct()
    )
    pairs = (
        snap.select("w")
        .distinct()
        .withColumn("w_to", F.lead("w").over(Window.orderBy("w")))
        .where(F.col("w_to").isNotNull())
        .withColumnRenamed("w", "w_from")
    )
    cur = snap.join(F.broadcast(pairs), snap["w"] == pairs["w_from"]).select(
        "w_from", "w_to", "ea", "eb", F.lit(1).alias("_c")
    )
    nxt = snap.join(F.broadcast(pairs), snap["w"] == pairs["w_to"]).select(
        "w_from", "w_to", "ea", "eb", F.lit(1).alias("_n")
    )
    j = cur.join(nxt, ["w_from", "w_to", "ea", "eb"], "full_outer")
    return j.groupBy("w_from", "w_to").agg(
        F.sum(F.when(F.col("_c").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_added"),
        F.sum(F.when(F.col("_n").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_n").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_kept"),
    )


def sparsify_topk(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    salt_buckets: int = 16,
) -> DataFrame:
    """EXACT per-vertex top-k out-neighbors by (weight DESC, dst ASC) —
    degree-capping graph sparsification, the standard preprocessing that
    makes kNN-graph algorithms survive power-law degree at 100 TB.

    Skew design: the naive single window over ``src`` serializes every
    hub vertex into one task (the same straggler the CC hub split
    removes). Two-phase instead: phase 1 ranks within (src, salt) — salt
    = dst-hash bucket, so a hub's neighbors spread over ``salt_buckets``
    bounded windows — and keeps k per bucket; phase 2 ranks the ≤
    salt_buckets·k survivors per src globally. The global top-k is a
    subset of the per-bucket top-ks, so the result is exactly the
    single-window answer at bounded parallel window width; the salt
    choice affects only the plan, never the output. Deterministic under
    ties via the dst tie-break."""
    from pyspark.sql import Window

    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).alias("weight"),
    )
    salt = F.pmod(F.xxhash64("dst"), F.lit(salt_buckets))
    w1 = Window.partitionBy("src", "_salt").orderBy(
        F.desc("weight"), F.asc("dst")
    )
    phase1 = (
        e.withColumn("_salt", salt)
        .withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= k)
        .drop("_salt", "_rk")
    )
    w2 = Window.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
    return (
        phase1.withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def partition_stats(edges: DataFrame, n_parts: int) -> DataFrame:
    """Hash-partitioning quality report for a graph at a given
    parallelism: assign every vertex to md5int('part:' || v) % n_parts (a
    replicable stand-in for the shuffle partitioner) and measure what a
    real cluster would feel — the EDGE CUT (fraction of edges whose
    endpoints land on different partitions = the all-to-all traffic every
    superstep pays) and the balance factors (max/mean partition load; the
    straggler multiplier). One row:

        (n_parts, n_vertices, n_edges, cut_edges, cut_frac,
         vertex_imbalance, edge_imbalance)

    Edge load is attributed to the SRC endpoint's partition (where the
    propagate-side work happens). Two aggregate passes, both map-side
    combinable; nothing scales with n_parts. The reference's answer to
    this concern is the Wang-hash id permutation
    (/root/reference/src/graphGen/common/reduceIds.hpp:104-114 — hash ids
    so block partitions look random); this operator MEASURES what that
    buys: random-hash cut ~ 1 - 1/P on a sparse graph, balance ~ 1."""
    from parconnect_spark.functions.dedup import md5int

    def part(col: str) -> F.Column:
        return F.pmod(
            md5int(F.concat(F.lit("part:"), F.col(col).cast("string"))),
            F.lit(n_parts),
        )

    e = edges.select(
        part("src").alias("pa"), part("dst").alias("pb")
    ).persist()
    tot = e.groupBy().agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum((F.col("pa") != F.col("pb")).cast("long")).alias("cut_edges"),
    )
    eload = e.groupBy("pa").agg(F.count(F.lit(1)).alias("_n"))
    e_imb = eload.agg(
        (F.max("_n") / F.avg("_n")).alias("edge_imbalance")
    )
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .select(part("v").alias("p"))
        .persist()
    )
    nv = verts.groupBy().agg(F.count(F.lit(1)).alias("n_vertices"))
    vload = verts.groupBy("p").agg(F.count(F.lit(1)).alias("_n"))
    v_imb = vload.agg(
        (F.max("_n") / F.avg("_n")).alias("vertex_imbalance")
    )
    def round6(col: F.Column) -> F.Column:
        # Binary half-away rounding, bit-identical to the C++-side
        # ROUND(double, 6) the DuckDB oracle evaluates (verified on 200k
        # samples incl. half-boundary adversaries). Spark's own ROUND goes
        # through BigDecimal.valueOf (decimal shortest-repr, HALF_UP) and
        # can land one ulp away near 6dp half boundaries — the exact flake
        # the round-5 driver hash caught on this query. Positive, < 2^51/1e6
        # here, where floor(x*1e6 + 0.5)/1e6 == round-half-away exactly.
        return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    out = (
        tot.crossJoin(nv)
        .crossJoin(v_imb)
        .crossJoin(e_imb)
        .select(
            F.lit(n_parts).alias("n_parts"),
            "n_vertices",
            "n_edges",
            "cut_edges",
            round6(F.col("cut_edges") / F.col("n_edges")).alias("cut_frac"),
            round6(F.col("vertex_imbalance")).alias("vertex_imbalance"),
            round6(F.col("edge_imbalance")).alias("edge_imbalance"),
        )
    )
    rows = out.collect()
    e.unpersist()
    verts.unpersist()
    return edges.sparkSession.createDataFrame(rows, out.schema)


def hub_knockout(edges: DataFrame, k: int) -> DataFrame:
    """Robustness probe: remove the k highest-degree vertices (ties to
    the smaller id) and report the component structure of what remains —
    the scale-free-fragility measurement (power-law graphs shatter under
    hub removal where random graphs shrug; the reference's decision step
    fits exactly that degree shape, `src/dynamic/degreeDistInfo.hpp`).

    Vertices left edgeless by the knockout count as singleton
    components — the honest robustness semantics (they are still
    nodes, just disconnected). One row:
    (removed, components, largest, isolated).

    Scale shape: hub selection is a TakeOrdered over the degree census
    (no window); the knockout is two broadcast anti-joins (k ids);
    the rest is the CC engine on the surviving edges."""
    from pyspark.sql import functions as F

    from parconnect_spark.plans.connectivity import connected_components

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    hubs = (
        deg.orderBy(F.desc("_d"), F.asc("src")).limit(k).select("src")
    )
    hubs = hubs.localCheckpoint()
    kept = edges.join(F.broadcast(hubs), "src", "left_anti").join(
        F.broadcast(hubs.withColumnRenamed("src", "dst")), "dst", "left_anti"
    )
    n_verts = vertices(edges).count()
    res = connected_components(kept)
    comp = res.labels.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    row = comp.agg(
        F.count(F.lit(1)).alias("c"), F.max("n").alias("m")
    ).collect()[0]
    survivors = res.labels.count()
    isolated = n_verts - k - survivors
    comps = (row["c"] or 0) + isolated
    largest = max(row["m"] or 0, 1 if isolated > 0 else 0)
    return edges.sparkSession.createDataFrame(
        [(k, comps, largest, isolated)],
        "removed long, components long, largest long, isolated long",
    )


def negative_samples(edges: DataFrame, k: int, n_vertices: int) -> DataFrame:
    """Deterministic NEGATIVE edge sampling for link-prediction /
    contrastive training: per vertex v, up to ``k`` non-neighbors drawn
    by a replayable hash stream — the training-pair generator that
    complements plans/linkpred.py's positive scoring.

    Mechanics: candidate i for vertex v is md5int('neg:' v ':' i) mod
    ``n_vertices`` (ids must be dense 0..n-1 — the relabel operator's
    output contract); 2k candidates are drawn, self-pairs and true
    edges anti-joined away, and the first k by draw index survive. The
    undersampling case (a near-complete neighborhood leaves fewer than
    k survivors) yields fewer rows rather than a rejection loop — at
    training scale the k-vs-2k gap makes it vanishingly rare, and the
    determinism (same graph → same pairs, any partitioning) is worth
    more than exact-k. One explode + one co-partitioned anti-join + one
    bounded per-vertex window over ≤ 2k rows."""
    from pyspark.sql import Window, functions as F

    from parconnect_spark.functions.dedup import md5int

    verts = vertices(edges)
    cand = verts.select(
        F.col("v"),
        F.explode(F.sequence(F.lit(1), F.lit(2 * k))).alias("i"),
    ).select(
        "v",
        "i",
        F.pmod(
            md5int(
                F.concat(
                    F.lit("neg:"),
                    F.col("v").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            ),
            F.lit(n_vertices),
        ).alias("dst"),
    ).where(F.col("v") != F.col("dst"))
    non_edges = cand.join(
        edges.select(
            F.col("src").alias("v"), F.col("dst")
        ),
        ["v", "dst"],
        "left_anti",
    )
    w = Window.partitionBy("v").orderBy("i")
    return (
        non_edges.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("v", F.col("dst").alias("neg"), F.col("i").alias("draw"))
    )


def rank_correlation(
    scores_a: DataFrame,
    scores_b: DataFrame,
    key: str = "v",
    col_a: str = "a",
    col_b: str = "b",
) -> DataFrame:
    """Spearman-style rank correlation between two per-vertex score
    tables ("do the PageRank leaders coincide with the degree
    leaders?"): Pearson over TOTAL-ORDER ranks — row_number by (score
    DESC, key ASC). The key tiebreak is the load-bearing convention:
    classic min/average ranks leave tied DOUBLES ranked by comparison of
    values two engines may disagree about in the last ulp, and a single
    adjacent-rank swap moves the coefficient by ~1/n² — far above a 6dp
    gate. A declared total order is bit-stable everywhere. Inner-joined
    on ``key``; one global sort per side (a report-scale operation:
    ranking |V| values is the same repartitionByRange sort any top-k
    report pays), then one scalar corr aggregate. Returns one row
    (n, spearman) at 6dp."""
    from pyspark.sql import Window

    j = scores_a.select(
        F.col(key).alias("k"), F.col(col_a).alias("_a")
    ).join(
        scores_b.select(F.col(key).alias("k"), F.col(col_b).alias("_b")),
        "k",
    )
    ra = F.row_number().over(Window.orderBy(F.desc("_a"), F.asc("k")))
    rb = F.row_number().over(Window.orderBy(F.desc("_b"), F.asc("k")))
    ranked = j.select(ra.alias("ra"), rb.alias("rb"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("ra", "rb"), 6).alias("spearman"),
    )


def snowball_sample(
    edges: DataFrame, seed: int, depth: int = 2, k: int = 3
) -> DataFrame:
    """Deterministic snowball sample: from ``seed``, expand ``depth``
    levels taking per frontier vertex its ``k`` lowest-hash unvisited
    neighbors — the reproducible "give me a small representative
    neighborhood" every debugging session wants from a 100-TB graph
    (a random sample re-rolls every run; the md5 order is the same
    everywhere, so a bug report's subgraph is reconstructible).

    Per-vertex selection reuses the skew-proof two-phase salted top-k
    (sparsify_topk) with weight = −hash, so a hub frontier vertex never
    serializes a task. Returns (v, level), level 0 = the seed."""
    from parconnect_spark.functions.dedup import md5int

    spark = edges.sparkSession
    visited = spark.createDataFrame([(int(seed), 0)], "v long, level long")
    frontier = visited.select("v")
    for lvl in range(1, depth + 1):
        cand = (
            edges.join(frontier, edges["src"] == frontier["v"], "left_semi")
            .join(
                visited.select(F.col("v").alias("dst")), "dst", "left_anti"
            )
            .select(
                "src",
                "dst",
                (
                    -md5int(
                        F.concat(
                            F.lit("sb:"), F.col("dst").cast("string")
                        )
                    )
                ).alias("weight"),
            )
        )
        picked = (
            sparsify_topk(cand, k)
            .select(F.col("dst").alias("v"))
            .distinct()
            .withColumn("level", F.lit(lvl).cast("long"))
            .localCheckpoint()
        )
        if picked.limit(1).isEmpty():
            break
        visited = visited.unionByName(picked).localCheckpoint()
        frontier = picked.select("v")
    return visited
