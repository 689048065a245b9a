"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs the engine's DataFrame/plan implementation;
``oracle_sql()`` holds an equivalent DuckDB SQL statement over the same
parquet views. The transcripts table (BASELINE.json input_hint shape) is
derived deterministically from the driver's ``events`` table by a shared
ANSI-SQL fragment (valid in both Spark and DuckDB), so both sides operate
on byte-identical inputs — no external data.

Graph queries run on the entity graph derived per operators/derive.py
(E1 sequential-turn edges + E2 conversation-membership edges, dense-rank
relabeled). Iterative algorithms are compared at FIXED iteration counts
(the oracle unrolls the same recurrence); connected components are compared
at the fixpoint via a recursive-CTE min-reach oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

PR_ITERS = 8
HITS_ITERS = 8
EIGEN_ITERS = 8
LP_MIN_ITERS = 4
LP_MAJ_ITERS = 2
# community_graph contracts at lp-min depth 1 — the FIRST level of a
# multilevel coarsening. Depth >=2 collapses this graph's communities all
# the way to components (every super-edge vanishes; measured 297 super-
# edges at depth 1, 0 at depth 2), which would make the contract vacuous.
COMMUNITY_GRAPH_ITERS = 1
KCORE_K = 3
# Fixed unroll depth for the k-core oracle: peeling is a no-op after the
# fixpoint, so any depth >= the actual peel depth is exact. The sf0.01
# transcript graph peels in ~3 rounds; 16 is asserted-ample headroom.
KCORE_ORACLE_ROUNDS = 16
# Fixed unroll depth for the coreness (iterated H-index) oracle: the
# iteration is monotone non-increasing and a no-op past its fixpoint, so
# any depth >= the actual convergence round count is exact. The sf0.01
# entity graph converges in 2 rounds (measured; max coreness 14); 8 is
# asserted-ample headroom.
CORENESS_ORACLE_ROUNDS = 8
# Katz centrality: exact int64 fixed point (plans/katz.py) — alpha_inv of
# the order of the hub in-degree (1513 at sf0.1), so the truncated series
# contracts and the recurrence stays far inside int64 (measured max
# 2.53e6 at K=6, sf0.1)
KATZ_ITERS = 6
KATZ_ALPHA_INV = 1000
# First-touch funnel over the events table: step chain within 7 days of
# the signup anchor (150 -> 139 -> 117 -> 85 users at sf0.01)
FUNNEL_STEPS = ("signup", "view", "click", "purchase")
FUNNEL_WITHIN_S = 7 * 86_400
# Duplicated-span detection: 8-token grams in >= 2 distinct docs (1015
# duplicated grams across 47 docs at sf0.01 — measured, non-vacuous)
DUPSPAN_N = 8
DUPSPAN_MIN_DOCS = 2
# fixed unroll for the Brandes betweenness oracle: exact when >= the true
# BFS depth from the source sample (measured 2 at sf0.01; empty tail
# levels are no-op CTEs)
BETWEENNESS_ORACLE_LEVELS = 6
# fixed unroll for the Bellman-Ford oracle (monotone min-plus relaxation,
# no-op past fixpoint; sf0.01 converges in 3 rounds)
SSSP_ORACLE_ROUNDS = 8
# fixed unroll for the Luby MIS oracle: rounds past the empty active set
# are no-ops (every CTE empty); sf0.01 finishes in 2 rounds, 5 is headroom
MIS_ORACLE_ROUNDS = 5
# fixed unroll for the Jones-Plassmann coloring oracle: rounds past the
# empty active set are no-ops; sf0.01's entity graph colors in 27 rounds /
# 15 colors (measured — per-conversation cliques serialize, a JP
# property), 32 is headroom
COLORING_ORACLE_ROUNDS = 32
# fixed depth for the 1-WL refinement contract: round-R labels separate
# rooted R-neighborhoods; 3 saturates the entity graph's shallow diameter
WL_ORACLE_ROUNDS = 3
# fixed unroll for the DAG-layering oracle: rounds past the fixpoint are
# no-ops (GREATEST with an unchanged max); the sf0.01 condensation's
# longest path is 1 edge (measured — the giant SCC absorbs nearly
# everything, leaves hang off it), 12 is headroom for deeper fixtures
DAG_ORACLE_ROUNDS = 12
# HyperANF contract: per-vertex HLL registers of the distance-<=ANF_HOPS
# ball, p = ANF_P (64 registers/vertex) — registers pinned exactly, the
# estimate is the one deterministic double (rounded like sketch_distinct)
ANF_HOPS = 3
ANF_P = 6
# k-means contract: fixed-iteration Lloyd on the non-negative integer
# grid (functions/cluster.py) — every assignment + exact int64 distance
# compared; k lowest-id seeds, empty clusters drop (both engines replay
# the identical integer recurrence)
KMEANS_K = 8
KMEANS_ITERS = 4
# hopping-window contract: 24 h windows sliding every 12 h (each event in
# exactly 2 windows); all window arithmetic in exact int64 microseconds
HOP_SIZE_US = 86_400_000_000
HOP_SLIDE_US = 43_200_000_000
# retention contract: weekly activity buckets (int64 µs floor division)
RETENTION_BUCKET_US = 7 * 86_400_000_000
# synchronous Louvain move rounds (plans/louvain.py): compared at a fixed
# round count like pagerank/labelprop; gains are exact integer comparisons
LOUVAIN_ROUNDS = 2
# fixed unroll for the maximal-matching oracle: rounds past the empty live
# set are no-ops; sf0.01 finishes in 2 rounds, 5 is headroom
MATCHING_ORACLE_ROUNDS = 5
# densest-subgraph peel: (1+eps)*avg-degree batch removal, O(log n) rounds
# (sf0.01 empties in 2; unroll 6 — empty tail rounds contribute no stats)
DENSEST_EPSILON = 0.1
DENSEST_ORACLE_ROUNDS = 6
# k for the k-truss contract query: at sf0.01 the co-occurrence graph is
# near-clique-dense (every edge has support >= 10), so k=14 is the first
# value that both peels (738 edges die in round 1) and keeps a non-empty
# truss (1244 edges) — the contract exercises the actual peel loop.
KTRUSS_K = 14
# Fixed unroll depth for the k-truss oracle (same no-op-past-fixpoint
# argument as KCORE_ORACLE_ROUNDS; sf0.01 peels in 1 round).
KTRUSS_ORACLE_ROUNDS = 4
TFIDF_TOPK = 3
# gap for the sessionization contract: the sf0.01 per-user inter-event gap
# has median ~26.4ks, so 21600s (6 h) merges roughly half the adjacent
# pairs — sessions average ~2 events and both branches of the gap rule run.
SESSION_GAP_SECONDS = 21600
# viral-group fan-out guard for the bipartite projection contract (a group
# of m members yields m(m-1)/2 pairs); inert at sf0.01, load-bearing at scale
BIPARTITE_MAX_GROUP = 64
# boilerplate threshold for the turn-dedup contract: sf0.01 has 100 distinct
# turn texts spanning 59..85 distinct conversations each (median 73), so 78
# exercises both branches — 82 texts pass through, 18 collapse to a keeper
BOILERPLATE_MAX_CONVS = 78
# count-min / HLL contract parameters (functions/sketch.py)
TRIM_LO = 0.05
TRIM_HI = 0.95
CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOPK = 20
HLL_P = 10
# rolling HLL window: "7-day distinct users as of each day" by register
# merge over per-day sketches (one raw scan; windows never re-scan)
ROLL_BUCKET_US = 86_400_000_000
ROLL_WINDOW_BUCKETS = 7
# heavy-hitters threshold over the pair-stream endpoint multiset: sf0.01
# has 164 distinct endpoints; >=80 keeps 27 (roles, tools, and only the
# longest conversations) so both the sketch prune and the exact verify
# branch carry real weight
HH_MIN_COUNT = 80
# trending terms: top-k per trailing ROLL_WINDOW_BUCKETS-day window
TREND_K = 5
# term bursts: >=2x the trailing-7-day per-day baseline at >=8 occurrences
# (56 bursts at sf0.01 — selective but non-vacuous)
BURST_RATIO = (2, 1)
BURST_MIN_COUNT = 8
QUANT_VECS = 50
SAMPLE_K = 25
# mutual-kNN embedding clustering: k=2 keeps the graph sparse enough for
# real structure at sf0.01 (188 clusters, largest 14, 90 singletons —
# measured; k=5 merges 493 of 500 vectors into one blob)
KNN_CLUSTER_K = 2
# PMI collocations: df band [2, 390] (the 5 hottest boilerplate terms of
# sf0.01's 31-term vocabulary drop out, so the band filter carries
# weight), pair floor 20 (108 of 120 candidate pairs survive), top 50 (a
# real top-k cut)
COLLOC_MIN_DF = 2
COLLOC_MAX_DF = 390
COLLOC_MIN_COUNT = 20
COLLOC_TOPK = 50
# sequence packing: chunk capacity 64 tokens with a 1-token separator —
# docs average ~55 whitespace tokens at sf0.01, so roughly half of them
# cross a chunk boundary and both the spanning and in-chunk branches of
# the map carry weight
PACK_SEQ_LEN = 64
BIGRAM_MIN_HEAD = 5
LINKPRED_WEDGE_CAP = 64
LINKPRED_TOPK = 50
WALK_LEN = 4
HARMONIC_SOURCES = 4
# harmonic/bfs oracles cap the recursive-CTE depth at 64 — exact whenever
# eccentricities < 64 (this graph's pseudo-diameter is single-digit).

# ---------------------------------------------------------------------------
# shared SQL fragments (ANSI subset valid in BOTH Spark and DuckDB)
# ---------------------------------------------------------------------------

TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT 'conv_' || CAST(user_id AS STRING) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
         CASE WHEN event_type IN ('view', 'click') THEN 'user'
              WHEN event_type IN ('purchase', 'signup') THEN 'assistant'
              ELSE 'system' END AS role,
         props AS text,
         CASE WHEN event_type IN ('purchase', 'signup')
              THEN 'tool_' || CAST(CAST(FLOOR(value) AS BIGINT) % 12 AS STRING)
              ELSE NULL END AS tool,
         ts
  FROM events
)"""

GRAPH_CTES = """
turns AS (
  SELECT conv_id, turn_idx, text,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool ELSE 'r:' || role END AS entity
  FROM transcripts
),
seq AS (
  SELECT conv_id, turn_idx, text, entity,
         LEAD(entity) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_entity
  FROM turns
),
pairs AS (
  SELECT entity AS a, next_entity AS b FROM seq WHERE next_entity IS NOT NULL
  UNION ALL
  SELECT 'c:' || conv_id AS a, entity AS b FROM turns
),
und AS (
  SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM pairs WHERE a <> b
),
names AS (
  -- explicit DISTINCT: DuckDB 1.0 treats UNION as UNION ALL for
  -- non-recursive CTEs inside a WITH RECURSIVE block
  SELECT DISTINCT name
  FROM (SELECT a AS name FROM und UNION ALL SELECT b AS name FROM und) nn
),
ids AS (
  SELECT name, CAST(DENSE_RANK() OVER (ORDER BY name) - 1 AS BIGINT) AS id
  FROM names
),
undl AS (
  SELECT s.id AS src, d.id AS dst
  FROM und JOIN ids s ON und.a = s.name JOIN ids d ON und.b = d.name
),
edges AS (
  SELECT src, dst FROM undl UNION ALL SELECT dst AS src, src AS dst FROM undl
)"""

CHAIN_CTES = """
users AS (SELECT DISTINCT user_id AS u FROM events),
chain0 AS (
  SELECT ou.u AS src, ou.u + 1 AS dst FROM users ou
  WHERE ou.u % 10 <> 9 AND EXISTS (SELECT 1 FROM users x WHERE x.u = ou.u + 1)
),
chain_edges AS (
  SELECT src, dst FROM chain0 UNION ALL SELECT dst AS src, src AS dst FROM chain0
)"""

_GRAPH_PREFIX = "WITH RECURSIVE " + TRANSCRIPTS_CTE + "," + GRAPH_CTES


# ---------------------------------------------------------------------------
# Spark-side helpers
# ---------------------------------------------------------------------------

def _views(spark: SparkSession, sf_dir: str, names=("events", "documents", "embeddings")):
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("events",))
    return spark.sql("WITH " + TRANSCRIPTS_CTE + " SELECT * FROM transcripts")


_GRAPH_CACHE: dict = {}


def _graph(spark: SparkSession, sf_dir: str):
    """(transcripts, symmetric long edges, id_map) via the engine operators.

    Memoized per (session, sf_dir): every graph query needs the same
    derivation, and re-deriving per query roughly doubled several headline
    wall-clocks. Each query stays independently runnable — a fresh session
    just repopulates the cache."""
    from parconnect_spark.operators.derive import derive_edges

    key = (spark.sparkContext.applicationId, sf_dir)
    t = _transcripts(spark, sf_dir)
    if key not in _GRAPH_CACHE:
        edges, id_map = derive_edges(t)
        _GRAPH_CACHE[key] = (edges.persist(), id_map.persist())
    edges, id_map = _GRAPH_CACHE[key]
    return t, edges, id_map


_DIRECTED_CACHE: dict = {}


def _directed_graph(spark: SparkSession, sf_dir: str):
    """(directed long edges, id_map) for the direction-sensitive queries.

    Memoized per (session, sf_dir) exactly like _graph: hits, scc and katz
    all run the identical directed derivation + relabel, and in a bench
    session each repetition of each of them re-paid it (~2-3s of the
    per-query wall at sf0.1). Same session-memo discipline as _GRAPH_CACHE —
    rep 1 of the first directed query pays the derivation, the rest reuse
    the persisted tables; a fresh session repopulates."""
    from parconnect_spark.operators.derive import derive_directed_string_edges
    from parconnect_spark.operators.relabel import relabel_edges

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DIRECTED_CACHE:
        t = _transcripts(spark, sf_dir)
        directed = derive_directed_string_edges(t)
        edges, id_map = relabel_edges(directed, "a", "b")
        _DIRECTED_CACHE[key] = (edges.persist(), id_map.persist())
    return _DIRECTED_CACHE[key]


def _with_names(labels: DataFrame, id_map: DataFrame, value_col: str) -> DataFrame:
    return (
        labels.join(id_map, labels["v"] == id_map["id"])
        .select(F.col("name"), F.col(value_col))
        .orderBy("name")
    )


def _chain_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("events",))
    return spark.sql("WITH " + CHAIN_CTES + " SELECT src, dst FROM chain_edges")


# ---------------------------------------------------------------------------
# queries (engine implementations)
# ---------------------------------------------------------------------------

def _q_derived_edges(spark, sf_dir):
    from parconnect_spark.operators.derive import derive_string_edges

    return derive_string_edges(_transcripts(spark, sf_dir)).orderBy("a", "b")


def _q_relabel_map(spark, sf_dir):
    _, _, id_map = _graph(spark, sf_dir)
    return id_map.orderBy("name")


def _q_text_invariant(spark, sf_dir):
    from parconnect_spark.operators.derive import transcripts_to_entity_turns

    t = _transcripts(spark, sf_dir)
    derived = transcripts_to_entity_turns(t).select(
        "conv_id", "turn_idx", F.col("text").alias("dtext")
    )
    joined = t.join(derived, ["conv_id", "turn_idx"])
    return joined.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(
            F.when(
                ~F.col("text").eqNullSafe(F.col("dtext")), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("violations"),
    )


def _q_degree_histogram(spark, sf_dir):
    from parconnect_spark.operators.graph import degree_histogram

    _, edges, _ = _graph(spark, sf_dir)
    return degree_histogram(edges).orderBy("degree")


def _q_cc_labels(spark, sf_dir):
    from parconnect_spark.plans.connectivity import connected_components

    _, edges, id_map = _graph(spark, sf_dir)
    res = connected_components(edges, algorithm="two_phase")
    return _with_names(res.labels, id_map, "label")


def _q_cc_labels_local_contract(spark, sf_dir):
    """Same fixpoint as cc_labels via the Arrow union-find kernel
    (plans/csr.local_contract_cc) — verifies the third CC algorithm against
    the identical recursive-CTE oracle."""
    from parconnect_spark.plans.connectivity import connected_components

    _, edges, id_map = _graph(spark, sf_dir)
    res = connected_components(edges, algorithm="local_contract")
    return _with_names(res.labels, id_map, "label")


def _q_cc_labels_salted_fused(spark, sf_dir):
    """Same fixpoint as cc_labels via the salted_fused physical strategy —
    both noskew two-phase minima folded into one linear plan behind the
    size-gated broadcast join-back — verified against the identical
    recursive-CTE oracle (cf. reference coloring path,
    /root/reference/src/coloring/labelProp.hpp)."""
    from parconnect_spark.plans.connectivity import connected_components

    _, edges, id_map = _graph(spark, sf_dir)
    res = connected_components(
        edges, algorithm="two_phase", materialize="salted_fused"
    )
    return _with_names(res.labels, id_map, "label")


def _q_cc_incremental(spark, sf_dir):
    """Incremental CC: a deterministic 80/20 edge split plays 'base graph +
    delta batch'. Full CC runs on the base edges only; plans/connectivity.
    incremental_cc folds the delta in through the contracted delta graph
    (sized by the delta, never rescanning the base). The oracle is the
    FULL-graph recursive-CTE min-reach — incremental must equal recompute."""
    from parconnect_spark.plans.connectivity import (
        connected_components,
        incremental_cc,
    )

    _, edges, id_map = _graph(spark, sf_dir)
    old = edges.where((F.col("src") + F.col("dst")) % 5 != 4)
    delta = edges.where((F.col("src") + F.col("dst")) % 5 == 4)
    base = connected_components(old, algorithm="two_phase")
    res = incremental_cc(base.labels, delta)
    return _with_names(res.labels, id_map, "label")


def _q_hub_knockout(spark, sf_dir):
    """Scale-free-fragility probe (operators/graph.hub_knockout): remove
    the 3 highest-degree entities (ties to the smaller id) and report
    the surviving component structure, edgeless survivors counted as
    singletons. Hub selection is a TakeOrdered over the degree census,
    the knockout two broadcast anti-joins, the rest the CC engine."""
    from parconnect_spark.operators.graph import hub_knockout

    _t, edges, _m = _graph(spark, sf_dir)
    return hub_knockout(edges, 3)


def _q_negative_samples(spark, sf_dir):
    """Deterministic negative-edge sampling (operators/graph.
    negative_samples) over the relabeled entity graph: per vertex, up to
    3 hash-drawn non-neighbors -- the contrastive training-pair
    generator complementing link_prediction's positive scoring. Same
    graph -> same pairs at any partitioning; the md5 draw stream replays
    exactly in SQL."""
    from parconnect_spark.operators.graph import negative_samples

    _t, edges, id_map = _graph(spark, sf_dir)
    nv = id_map.count()
    return negative_samples(edges, 3, nv).orderBy("v", "draw")


def _q_snowball(spark, sf_dir):
    """Deterministic snowball sample (operators/graph.snowball_sample):
    2 levels from vertex 0, 3 lowest-md5 unvisited neighbors per
    frontier vertex through the skew-proof salted top-k -- the
    reproducible debug-neighborhood extraction (same subgraph on every
    engine and partitioning)."""
    from parconnect_spark.operators.graph import snowball_sample

    _t, edges, _m = _graph(spark, sf_dir)
    return snowball_sample(edges, 0, depth=2, k=3).orderBy("level", "v")


def _q_cc_stats(spark, sf_dir):
    from parconnect_spark.plans.connectivity import connected_components

    _, edges, _ = _graph(spark, sf_dir)
    res = connected_components(edges, algorithm="two_phase")
    comp = res.labels.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return comp.agg(
        F.count(F.lit(1)).alias("components"), F.max("n").alias("largest")
    )


def _q_cc_chains(spark, sf_dir):
    from parconnect_spark.plans.connectivity import connected_components

    edges = _chain_graph(spark, sf_dir)
    res = connected_components(edges, algorithm="min_label", pointer_doubling=True)
    return res.labels.orderBy("v")


def _q_bfs_chain(spark, sf_dir):
    from parconnect_spark.plans.bfs import bfs

    edges = _chain_graph(spark, sf_dir)
    res = bfs(edges, num_runs=1)
    return res.parents.orderBy("v")


def _q_bfs_chain_csr(spark, sf_dir):
    """Same BFS sweep expanded against the cached hash-partitioned CSR
    adjacency blocks (plans/csr.adjacency_blocks via use_csr) — verifies
    the reference's build-once/reuse-per-SpMV adjacency structure
    (bfsRunner.hpp:111-160) against the identical oracle."""
    from parconnect_spark.plans.bfs import bfs

    edges = _chain_graph(spark, sf_dir)
    res = bfs(edges, num_runs=1, use_csr=True)
    return res.parents.orderBy("v")


def _q_pagerank(spark, sf_dir):
    from parconnect_spark.plans.pagerank import pagerank

    _, edges, id_map = _graph(spark, sf_dir)
    # salt_buckets=1: uniform salting is a measured trap (NOTES.md item 3 —
    # it defeats map-side combining for cold keys; A/B at sf0.1: salt1
    # 16.4-17.8s vs salt4 18.7-23.2s vs degree-thresholded 24-25s over 3
    # interleaved reps). Spark's partial aggregation already bounds a hot
    # dst to ≤1 partial row per input partition; salting remains available
    # for true reducer-memory hotspots.
    ranks = pagerank(edges, damping=0.85, tol=None, num_iters=PR_ITERS, salt_buckets=1)
    named = ranks.select("v", F.round("rank", 6).alias("rank"))
    return _with_names(named, id_map, "rank")


def _q_rank_corr(spark, sf_dir):
    """Spearman-style correlation between PageRank and degree
    (operators/graph.rank_correlation): Pearson over total-order ranks
    (row_number by score DESC, vertex ASC -- the declared tiebreak that
    makes the coefficient bit-stable across engines where min-rank over
    doubles is not). Answers "are the rank leaders the hubs"."""
    import pyspark.sql.functions as F

    from parconnect_spark.operators.graph import rank_correlation
    from parconnect_spark.plans.pagerank import pagerank

    _t, edges, _m = _graph(spark, sf_dir)
    pr = pagerank(
        edges, damping=0.85, tol=None, num_iters=PR_ITERS, salt_buckets=1
    ).select("v", F.round("rank", 6).alias("a"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("b")).select(
        F.col("src").alias("v"), F.col("b").cast("double").alias("b")
    )
    return rank_correlation(pr, deg)


def _q_scc(spark, sf_dir):
    """Strongly connected components of the DIRECTED entity graph (turn →
    next-turn, conversation → member): mutual-reachability clusters, the
    direction-sensitive refinement of cc_labels. Same id space as hits
    (the directed and undirected derivations share one name set)."""
    from parconnect_spark.plans.scc import strongly_connected_components

    edges, id_map = _directed_graph(spark, sf_dir)
    labels = strongly_connected_components(edges)
    return (
        labels.join(id_map, labels["v"] == id_map["id"])
        .select("name", "scc")
        .orderBy("name")
    )


def _q_reciprocity(spark, sf_dir):
    """Edge reciprocity of the DIRECTED entity graph (turn → next-turn,
    conversation → member): fraction of ordered edges whose reverse
    exists — the directionality summary beside scc/hits
    (operators/graph.reciprocity; one semi self-join + two counts)."""
    from parconnect_spark.operators.derive import derive_directed_string_edges
    from parconnect_spark.operators.graph import reciprocity

    t = _transcripts(spark, sf_dir)
    return reciprocity(derive_directed_string_edges(t))


def _q_rich_club(spark, sf_dir):
    """Rich-club coefficient table (operators/graph.rich_club): φ(k) =
    density of the subgraph induced by vertices of degree > k, for every
    degree value with ≥ 2 rich vertices — do heavy roles/tools
    preferentially interlink? All thresholds come from TWO histograms +
    strict suffix sums in one bounded window (≤ #distinct degrees rows);
    no per-k subgraph scan. Counts exact int64; φ the one rounded double."""
    from parconnect_spark.operators.graph import rich_club

    _, edges, _ = _graph(spark, sf_dir)
    return rich_club(edges).orderBy("k")


def _q_bfs_distances(spark, sf_dir):
    """Hop distances from vertex 0 (the lexicographically-smallest entity)
    over the undirected entity graph — distance labeling as a feature."""
    from parconnect_spark.plans.bfs import bfs_distances

    _, edges, id_map = _graph(spark, sf_dir)
    d = bfs_distances(edges, 0)
    return _with_names(d, id_map, "dist")


def _q_landmark_distances(spark, sf_dir):
    """Landmark distance-oracle sketch (plans/bfs.
    landmark_distance_table): exact hop distances from the 3 highest-
    degree entities via ONE shared MS-BFS frontier loop -- k|V| stored
    distances answering pairwise queries by triangle-inequality lookups.
    Top-degree landmarks sit where scale-free shortest paths
    concentrate."""
    from parconnect_spark.plans.bfs import landmark_distance_table

    _t, edges, _m = _graph(spark, sf_dir)
    return landmark_distance_table(edges, 3).orderBy("root", "v")


def _q_pseudo_diameter(spark, sf_dir):
    """Double-sweep diameter lower bound on the entity graph (start pinned
    to vertex 0; far-vertex ties break to the smaller id, so the scalar row
    is deterministic across engines and partitionings)."""
    from parconnect_spark.plans.bfs import pseudo_diameter

    _, edges, _ = _graph(spark, sf_dir)
    r = pseudo_diameter(edges, start=0)
    return spark.createDataFrame(
        [(r["start"], r["start_ecc"], r["far_vertex"], r["diameter_lb"])],
        "start long, start_ecc int, far_vertex long, diameter_lb int",
    )


def _q_pagerank_seeded(spark, sf_dir):
    """Personalized PageRank: restart to the two lexicographically-smallest
    tool entities — random-walk-with-restart proximity to a seed set, the
    recommendation/expansion primitive. Fixed iterations for the unrolled
    SQL oracle, like pagerank."""
    from parconnect_spark.plans.pagerank import pagerank

    _, edges, id_map = _graph(spark, sf_dir)
    seeds = [
        int(r["id"])
        for r in id_map.where(F.col("name").startswith("t:"))
        .orderBy("name")
        .limit(2)
        .collect()
    ]
    ranks = pagerank(edges, damping=0.85, tol=None, num_iters=PR_ITERS, seeds=seeds)
    named = ranks.select("v", F.round("rank", 6).alias("rank"))
    return _with_names(named, id_map, "rank")


def _q_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank over the DIRECTED co-occurrence graph: rank flows
    out proportionally to co-occurrence counts (weight / Σ out-weights).
    Runs on the directed derivation, so the dangling-redistribution path is
    live (entities with no outgoing transition) — the oracle replicates it
    via a mass-balance subquery per unrolled iteration."""
    from parconnect_spark.operators.derive import derive_weighted_directed_edges
    from parconnect_spark.operators.relabel import relabel_edges
    from parconnect_spark.plans.pagerank import pagerank

    t = _transcripts(spark, sf_dir)
    wd = derive_weighted_directed_edges(t)
    edges, id_map = relabel_edges(wd, "a", "b", keep_cols=("weight",))
    ranks = pagerank(
        edges, damping=0.85, tol=None, num_iters=PR_ITERS, weight_col="weight"
    )
    named = ranks.select("v", F.round("rank", 6).alias("rank"))
    return _with_names(named, id_map, "rank")


def _q_eigencentrality(spark, sf_dir):
    """Eigenvector centrality (plans/eigen.py) on the SYMMETRIZED entity
    graph: undamped power iteration x <- A x with per-iteration L1
    normalization (the rescale preserves the eigendirection and keeps the
    unrolled oracle free of cross-engine sqrt). EIGEN_ITERS unrolled
    rounds, scores rounded to 6dp, same discipline as hits/pagerank."""
    from parconnect_spark.plans.eigen import eigencentrality

    _t, edges, id_map = _graph(spark, sf_dir)
    scores = eigencentrality(edges, num_iters=EIGEN_ITERS)
    return (
        scores.join(id_map, scores["v"] == id_map["id"])
        .select("name", F.round("score", 6).alias("score"))
        .orderBy("name")
    )


def _q_hits(spark, sf_dir):
    from parconnect_spark.plans.hits import hits

    edges, id_map = _directed_graph(spark, sf_dir)
    scores = hits(edges, num_iters=HITS_ITERS)
    return (
        scores.join(id_map, scores["v"] == id_map["id"])
        .select(
            "name",
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
        .orderBy("name")
    )


def _q_katz(spark, sf_dir):
    """Katz centrality over the DIRECTED entity graph (plans/katz.py):
    truncated path counting in exact int64 fixed point — β=1, α=1/1000,
    floor division per hop as declared semantics, so ``katz6`` is an
    exact-hash column (a Σ of int64 is partition-order-free where the
    textbook double recurrence is not) and the oracle replays the
    identical unrolled integer recurrence."""
    from parconnect_spark.plans.katz import katz

    edges, id_map = _directed_graph(spark, sf_dir)
    scores = katz(edges, num_iters=KATZ_ITERS, alpha_inv=KATZ_ALPHA_INV)
    return (
        scores.join(id_map, scores["v"] == id_map["id"])
        .select("name", "katz6", "katz")
        .orderBy("name")
    )


def _q_link_prediction(spark, sf_dir):
    """Bipartite membership graph (c:conv — entity): the collaborative-
    filtering setting. On the FULL transcript graph the sequential edges
    make every co-occurring entity pair directly adjacent, so the
    candidate set is empty at contract scale; on the bipartite graph
    entity—entity pairs are non-adjacent by construction and score via
    conversation middles (whose degree is conversation length, safely
    under the wedge cap), while the hub entities are capped out as
    middles — so conv—conv pairs don't explode."""
    from parconnect_spark.operators.derive import transcripts_to_entity_turns
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.operators.relabel import relabel_edges
    from parconnect_spark.plans.linkpred import link_prediction

    t = _transcripts(spark, sf_dir)
    turns = transcripts_to_entity_turns(t)
    member = turns.select(
        F.concat(F.lit("c:"), F.col("conv_id")).alias("a"),
        F.col("entity").alias("b"),
    ).distinct()
    long_edges, id_map = relabel_edges(member, "a", "b")
    edges = symmetrize(long_edges)
    scored = link_prediction(edges, max_wedge_degree=LINKPRED_WEDGE_CAP)
    u_names = id_map.select(F.col("id").alias("_uid"), F.col("name").alias("u_name"))
    v_names = id_map.select(F.col("id").alias("_vid"), F.col("name").alias("v_name"))
    out = (
        scored.join(u_names, scored["u"] == F.col("_uid"))
        .join(v_names, scored["v"] == F.col("_vid"))
        .select(
            "u_name",
            "v_name",
            "cn",
            F.round("aa", 6).alias("aa"),
            F.round("jaccard", 6).alias("jaccard"),
            "pa",
        )
    )
    # Total deterministic order: ties in the ROUNDED score (which both
    # engines sort on) fall through to cn, then the name pair.
    return out.orderBy(
        F.desc("aa"), F.desc("cn"), "u_name", "v_name"
    ).limit(LINKPRED_TOPK)


def _q_kcore(spark, sf_dir):
    from parconnect_spark.plans.kcore import kcore

    _, edges, id_map = _graph(spark, sf_dir)
    core, _rounds = kcore(edges, k=KCORE_K)
    return (
        core.join(id_map, core["v"] == id_map["id"])
        .select("name", "core_deg")
        .orderBy("name")
    )


def _q_coreness(spark, sf_dir):
    """Full core decomposition via the iterated-H-index fixpoint
    (plans/kcore.coreness): per-round, one histogram aggregate (map-side
    combined — a hub contributes rows bounded by max-coreness, not degree)
    + one window over the compressed histogram. Oracle unrolls the same
    recurrence CORENESS_ORACLE_ROUNDS times (no-op past the fixpoint)."""
    from parconnect_spark.plans.kcore import coreness

    _, edges, id_map = _graph(spark, sf_dir)
    core, _rounds = coreness(edges)
    return (
        core.join(id_map, core["v"] == id_map["id"])
        .select("name", "coreness")
        .orderBy("name")
    )


def _q_ktruss(spark, sf_dir):
    """k-truss of the co-occurrence graph: edges whose endpoints share
    >= k-2 common neighbors within the truss, with within-truss support.
    Incremental-support edge peel (plans/ktruss.py) over the same
    degree-ordered triangle enumeration the triangle queries use."""
    from parconnect_spark.plans.ktruss import ktruss

    _, edges, id_map = _graph(spark, sf_dir)
    truss, _rounds = ktruss(edges, k=KTRUSS_K)
    u_names = id_map.select(F.col("id").alias("_uid"), F.col("name").alias("u_name"))
    v_names = id_map.select(F.col("id").alias("_vid"), F.col("name").alias("v_name"))
    return (
        truss.join(u_names, truss["src"] == F.col("_uid"))
        .join(v_names, truss["dst"] == F.col("_vid"))
        .select("u_name", "v_name", "support")
        .orderBy("u_name", "v_name")
    )


def _q_graph_walks(spark, sf_dir):
    from parconnect_spark.plans.walks import random_walks

    _, edges, id_map = _graph(spark, sf_dir)
    seeds = id_map.where(F.col("name").startswith("c:")).select(
        F.col("id").alias("v")
    )
    walks = random_walks(edges, seeds, length=WALK_LEN)
    iw = id_map.select(F.col("id").alias("_wid"), F.col("name").alias("walk_name"))
    iv = id_map.select(F.col("id").alias("_vid"), F.col("name").alias("v_name"))
    return (
        walks.join(iw, walks["walk_id"] == F.col("_wid"))
        .join(iv, walks["v"] == F.col("_vid"))
        .select("walk_name", "step", "v_name")
        .orderBy("walk_name", "step")
    )


def _q_walk_pairs(spark, sf_dir):
    """Skip-gram positive pairs from the deterministic random walks
    (plans/walks.walk_skipgram_pairs): forward-context co-occurrence
    counts at window 2 -- with negative_samples, the complete
    node2vec-style embedding-training feed. Self-join keyed on walk_id
    (bounded groups), one map-side-combined count."""
    from parconnect_spark.plans.walks import random_walks, walk_skipgram_pairs

    _, edges, id_map = _graph(spark, sf_dir)
    seeds = id_map.where(F.col("name").startswith("c:")).select(
        F.col("id").alias("v")
    )
    walks = random_walks(edges, seeds, length=WALK_LEN)
    pairs = walk_skipgram_pairs(walks, window=2)
    ia = id_map.select(F.col("id").alias("_ia"), F.col("name").alias("a_name"))
    ib = id_map.select(F.col("id").alias("_ib"), F.col("name").alias("b_name"))
    return (
        pairs.join(ia, pairs["a"] == F.col("_ia"))
        .join(ib, pairs["b"] == F.col("_ib"))
        .select(
            F.col("a_name").alias("a"), F.col("b_name").alias("b"), "n"
        )
        .orderBy("a", "b")
    )


def _q_labelprop_min(spark, sf_dir):
    from parconnect_spark.plans.labelprop import label_propagation

    _, edges, id_map = _graph(spark, sf_dir)
    labels = label_propagation(edges, num_iters=LP_MIN_ITERS, rule="min")
    return _with_names(labels, id_map, "label")


def _q_labelprop_majority(spark, sf_dir):
    from parconnect_spark.plans.labelprop import label_propagation

    _, edges, id_map = _graph(spark, sf_dir)
    labels = label_propagation(edges, num_iters=LP_MAJ_ITERS, rule="majority")
    return _with_names(labels, id_map, "label")


def _q_modularity(spark, sf_dir):
    """Modularity of the labelprop_min communities at LP_MIN_ITERS — the
    evaluation metric for the community assignment the contract already
    verifies per-vertex."""
    from parconnect_spark.plans.labelprop import label_propagation, modularity

    _, edges, _ = _graph(spark, sf_dir)
    labels = label_propagation(edges, num_iters=LP_MIN_ITERS, rule="min")
    out = modularity(edges, labels)
    return out.select(
        F.round("modularity", 6).alias("modularity"), "n_communities", "two_m"
    )


def _q_conductance(spark, sf_dir):
    """Per-community conductance of the labelprop_min communities
    (plans/labelprop.conductance) — the cut-quality score beside
    modularity: exact int64 cut/volume counts per community, the ratio
    the one rounded double."""
    from parconnect_spark.plans.labelprop import conductance, label_propagation

    _, edges, id_map = _graph(spark, sf_dir)
    # depth 1, the community_graph rationale: deeper lp-min collapses this
    # graph to one community and the contract would only ever exercise the
    # whole-graph 0.0 branch
    labels = label_propagation(edges, num_iters=COMMUNITY_GRAPH_ITERS, rule="min")
    out = conductance(edges, labels)
    return (
        out.join(id_map, out["label"] == id_map["id"])
        .select(
            F.col("name").alias("community"),
            "cut",
            "volume",
            F.round("conductance", 6).alias("conductance"),
        )
        .orderBy("community")
    )


def _q_harmonic_centrality(spark, sf_dir):
    """Sampled harmonic centrality: one multi-source BFS (MS-BFS — all
    sources share one frontier loop) from the HARMONIC_SOURCES smallest
    vertex ids, then h(v) = sum of 1/d(s, v)."""
    from parconnect_spark.plans.bfs import harmonic_centrality

    _, edges, id_map = _graph(spark, sf_dir)
    h = harmonic_centrality(edges, sources=list(range(HARMONIC_SOURCES)))
    return (
        h.join(id_map, h["v"] == id_map["id"])
        .select("name", F.round("harmonic", 6).alias("harmonic"))
        .orderBy("name")
    )


def _q_bipartite_cooccur(spark, sf_dir):
    """Weighted one-mode projection of the conv×entity membership table
    (operators/graph.project_bipartite): entities sharing a conversation
    get an edge weighted by the number of shared conversations. The
    max_group_size=64 cap is part of the declared semantics (the viral-
    group fan-out guard; inert at sf0.01 where convs are small, load-
    bearing at web scale) and the oracle applies it identically."""
    from parconnect_spark.operators.derive import transcripts_to_entity_turns
    from parconnect_spark.operators.graph import project_bipartite

    t = _transcripts(spark, sf_dir)
    mem = transcripts_to_entity_turns(t).select("conv_id", "entity")
    return project_bipartite(
        mem, "conv_id", "entity", max_group_size=BIPARTITE_MAX_GROUP
    ).orderBy("a", "b")


def _q_closeness(spark, sf_dir):
    """Sampled closeness centrality on the same MS-BFS substrate as
    harmonic_centrality: one shared frontier loop for all sources, one
    hash aggregate. n_sources/total_dist are exact integers; the ratio is
    rounded at 6dp on both engines."""
    from parconnect_spark.plans.bfs import closeness_centrality

    _, edges, id_map = _graph(spark, sf_dir)
    c = closeness_centrality(edges, sources=list(range(HARMONIC_SOURCES)))
    return (
        c.join(id_map, c["v"] == id_map["id"])
        .select(
            "name",
            "n_sources",
            "total_dist",
            F.round("closeness", 6).alias("closeness"),
        )
        .orderBy("name")
    )


def _q_densest(spark, sf_dir):
    """Densest subgraph via the Bahmani parallel greedy peel
    (plans/densest.py): members of the best-density round plus its stats.
    The peel thresholds are single double expressions over exact integers,
    so the oracle (a DENSEST_ORACLE_ROUNDS-unrolled replay of the peel +
    an argmax over per-round densities) reproduces every decision."""
    from parconnect_spark.plans.densest import densest_subgraph

    _, edges, id_map = _graph(spark, sf_dir)
    members, st = densest_subgraph(edges, epsilon=DENSEST_EPSILON)
    return (
        members.join(id_map, members["v"] == id_map["id"])
        .select(
            "name",
            F.lit(st["round"]).cast("int").alias("round"),
            F.lit(st["n_vertices"]).cast("long").alias("n_vertices"),
            F.lit(st["n_edges"]).cast("long").alias("n_edges"),
            # rounding stays engine-side (Spark HALF_UP == DuckDB ROUND for
            # positives); Python's round() is banker's and would diverge
            # exactly at half cases
            F.round(F.lit(st["density"]), 6).alias("density"),
        )
        .orderBy("name")
    )


def _q_sssp(spark, sf_dir):
    """Weighted single-source shortest paths (plans/sssp.py, synchronous
    Bellman–Ford) from vertex 0 over the DIRECTED co-occurrence-weighted
    graph — exact int64 min-plus distances, no float accumulation. The
    oracle unrolls the same relaxation SSSP_ORACLE_ROUNDS times (no-op
    past the fixpoint; sf0.01 converges in 3)."""
    from parconnect_spark.operators.derive import derive_weighted_directed_edges
    from parconnect_spark.operators.relabel import relabel_edges
    from parconnect_spark.plans.sssp import sssp

    t = _transcripts(spark, sf_dir)
    wd = derive_weighted_directed_edges(t)
    edges, id_map = relabel_edges(wd, "a", "b", keep_cols=("weight",))
    d, _rounds = sssp(edges, 0)
    return (
        d.join(id_map, d["v"] == id_map["id"])
        .select("name", "dist")
        .orderBy("name")
    )


def _q_graph_sparsify(spark, sf_dir):
    """Skew-proof exact top-k neighbor sparsification
    (operators/graph.sparsify_topk) of the symmetrized co-occurrence-
    weighted entity graph: per-vertex top-3 by (weight DESC, dst ASC) via
    the two-phase salted-window pattern -- a hub's neighbors rank inside
    salt_buckets bounded windows first, then only the <= buckets*k
    survivors meet the per-vertex window, so no hub serializes a task.
    The salt changes the plan, never the answer (oracle = the single
    global window)."""
    import pyspark.sql.functions as F

    from parconnect_spark.operators.derive import derive_weighted_undirected_edges
    from parconnect_spark.operators.graph import sparsify_topk

    t = _transcripts(spark, sf_dir)
    wu = derive_weighted_undirected_edges(t)
    sym = wu.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "weight"
    ).unionByName(
        wu.select(F.col("b").alias("src"), F.col("a").alias("dst"), "weight")
    )
    return sparsify_topk(sym, 3).orderBy("src", "dst")


def _q_msf(spark, sf_dir):
    """Minimum spanning forest (plans/msf.py, Borůvka rounds) of the
    co-occurrence-weighted UNDIRECTED entity graph. Under the
    (weight, a, b) total order the MSF is unique, so the oracle checks the
    cycle property directly — an edge survives iff its endpoints are not
    connected by strictly smaller edges — a genuinely independent
    algorithm (neither Borůvka nor the engine's contraction substrate)."""
    from parconnect_spark.operators.derive import derive_weighted_undirected_edges
    from parconnect_spark.operators.relabel import relabel_edges
    from parconnect_spark.plans.msf import boruvka_msf

    t = _transcripts(spark, sf_dir)
    wu = derive_weighted_undirected_edges(t)
    # dense_rank relabel is monotone in name order, so name-canonical
    # a < b stays id-canonical src < dst.
    edges, id_map = relabel_edges(wu, "a", "b", keep_cols=("weight",))
    msf, _rounds = boruvka_msf(
        edges.select(
            F.col("src").alias("a"), F.col("dst").alias("b"), "weight"
        )
    )
    ia = id_map.select(F.col("id").alias("a"), F.col("name").alias("a_name"))
    ib = id_map.select(F.col("id").alias("b"), F.col("name").alias("b_name"))
    return (
        msf.join(ia, "a")
        .join(ib, "b")
        .select(
            F.col("a_name").alias("a"), F.col("b_name").alias("b"), "weight"
        )
        .orderBy("a", "b")
    )


def _q_matching(spark, sf_dir):
    """Locally-minimum maximal matching (plans/matching.py) over the
    undirected entity graph. Fixed portable md5 edge priorities make the
    fixpoint equal the sequential greedy matching in (p, a, b) order
    (tested against exactly that independent algorithm); the oracle
    replays the parallel rounds (MATCHING_ORACLE_ROUNDS unroll — no-op
    once the live edge set empties; sf0.01 finishes in 2)."""
    from parconnect_spark.plans.matching import maximal_matching

    _, edges, id_map = _graph(spark, sf_dir)
    und = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    m, _rounds = maximal_matching(und)
    ia = id_map.select(F.col("id").alias("a"), F.col("name").alias("a_name"))
    ib = id_map.select(F.col("id").alias("b"), F.col("name").alias("b_name"))
    return (
        m.join(ia, "a")
        .join(ib, "b")
        .select(
            F.col("a_name").alias("a"), F.col("b_name").alias("b"), "round"
        )
        .orderBy("a", "b")
    )


def _q_louvain(spark, sf_dir):
    """Synchronous Louvain move phase (plans/louvain.py) over the
    co-occurrence-weighted undirected entity graph — the
    modularity-OPTIMIZING community step beside labelprop (plain
    propagation), community_graph (the contraction level) and modularity
    (the scoring aggregate). Gains compare as exact integers
    (2m·k_in − k·Σtot'), ties to the smallest community id; the oracle
    unrolls the same LOUVAIN_ROUNDS synchronous rounds."""
    from parconnect_spark.operators.derive import derive_weighted_undirected_edges
    from parconnect_spark.operators.relabel import relabel_edges
    from parconnect_spark.plans.louvain import louvain_move

    t = _transcripts(spark, sf_dir)
    wu = derive_weighted_undirected_edges(t)
    edges, id_map = relabel_edges(wu, "a", "b", keep_cols=("weight",))
    sym = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    cm, _m2 = louvain_move(sym, rounds=LOUVAIN_ROUNDS)
    return (
        cm.join(id_map, cm["v"] == id_map["id"])
        .select("name", F.col("c").alias("community"))
        .orderBy("name")
    )


def _q_mis(spark, sf_dir):
    """Luby maximal independent set (plans/mis.py) over the undirected
    entity graph. Priorities are the portable md5 fold keyed by
    (round, vertex) with vertex-id tie-break, so the winner set AND the
    join round of every member are engine-independent; the oracle replays
    the rounds exactly (MIS_ORACLE_ROUNDS unroll — no-op once the active
    set empties; sf0.01 finishes in 2)."""
    from parconnect_spark.plans.mis import luby_mis

    _, edges, id_map = _graph(spark, sf_dir)
    mis, _rounds = luby_mis(edges)
    return (
        mis.join(id_map, mis["v"] == id_map["id"])
        .select("name", "round")
        .orderBy("name")
    )


def _q_coloring(spark, sf_dir):
    """Jones-Plassmann greedy coloring (plans/coloring.py) over the
    undirected entity graph: fixed md5-fold priorities with id tie-break,
    per-round ready set = local (priority, id) maxima among the uncolored,
    color = mex of the earlier-colored neighborhood. The full trajectory
    (color AND round per vertex) is engine-independent; the oracle unrolls
    the identical rounds (COLORING_ORACLE_ROUNDS — no-ops once everyone
    is colored)."""
    from parconnect_spark.plans.coloring import jones_plassmann_coloring

    _, edges, id_map = _graph(spark, sf_dir)
    col, _rounds = jones_plassmann_coloring(edges)
    return (
        col.join(id_map, col["v"] == id_map["id"])
        .select("name", "color", "round")
        .orderBy("name")
    )


def _q_dag_layers(spark, sf_dir):
    """Pipeline-depth layering of the directed entity graph: SCC
    condensation (plans/scc.py — the feedback clusters) then longest-path
    layers over the condensation DAG (plans/dag.py). Output: every
    entity's component label and its component's topological layer —
    which tools/roles sit in feedback loops vs pipeline stages. The
    oracle replays SCC by recursive mutual reachability and the layering
    by DAG_ORACLE_ROUNDS unrolled monotone-max rounds."""
    from parconnect_spark.operators.derive import derive_directed_string_edges
    from parconnect_spark.operators.relabel import relabel_edges
    from parconnect_spark.plans.dag import dag_layers
    from parconnect_spark.plans.scc import strongly_connected_components

    t = _transcripts(spark, sf_dir)
    directed = derive_directed_string_edges(t)
    edges, id_map = relabel_edges(directed, "a", "b")
    scc = strongly_connected_components(edges)
    sa = scc.select(F.col("v").alias("src"), F.col("scc").alias("_ca"))
    sb = scc.select(F.col("v").alias("dst"), F.col("scc").alias("_cb"))
    ce = (
        edges.join(sa, "src")
        .join(sb, "dst")
        .where(F.col("_ca") != F.col("_cb"))
        .select(F.col("_ca").alias("src"), F.col("_cb").alias("dst"))
        .distinct()
    )
    layers, _rounds = dag_layers(ce)
    lay = layers.withColumnRenamed("v", "_lv")
    return (
        scc.join(lay, scc["scc"] == lay["_lv"], "left")
        .join(id_map, scc["v"] == id_map["id"])
        .select(
            "name",
            F.col("scc").alias("comp"),
            F.coalesce("layer", F.lit(0)).cast("int").alias("layer"),
        )
        .orderBy("name")
    )


def _q_wl_refinement(spark, sf_dir):
    """1-WL color refinement (plans/wl.py) over the undirected entity
    graph: round-0 color = degree, each round folds the vertex's label
    with the commutative mod-2^60 multiset hash of its neighbors' labels
    (md5 folds throughout — bit-replayable). Output: every vertex's
    round-WL_ORACLE_ROUNDS structural label plus its equivalence-class
    size; the oracle unrolls the identical rounds."""
    from parconnect_spark.plans.wl import wl_refinement

    _, edges, id_map = _graph(spark, sf_dir)
    wl = wl_refinement(edges, rounds=WL_ORACLE_ROUNDS)
    cls = wl.groupBy("wl").agg(F.count("*").cast("long").alias("class_size"))
    return (
        wl.join(cls, "wl")
        .join(id_map, wl["v"] == id_map["id"])
        .select("name", "wl", "class_size")
        .orderBy("name")
    )


def _q_anf(spark, sf_dir):
    """HyperANF registers (plans/anf.py): every vertex's HLL sketch of its
    distance-≤ANF_HOPS ball, max-merged one hop per round — the
    approximate-neighborhood-function machinery that replaces exact
    per-vertex BFS balls at web scale. The contract pins the REGISTER
    state exactly (nonzero count + exact-bigint raw sum per vertex); the
    estimate column is the deterministic HLL estimator on top."""
    from parconnect_spark.plans.anf import anf_estimates, neighborhood_registers

    _, edges, id_map = _graph(spark, sf_dir)
    regs = neighborhood_registers(edges, hops=ANF_HOPS, p=ANF_P)
    est = anf_estimates(regs, p=ANF_P)
    return (
        est.join(id_map, est["v"] == id_map["id"])
        .select("name", "nonzero_regs", "raw_sum", "estimate")
        .orderBy("name")
    )


def _q_betweenness(spark, sf_dir):
    """Source-sampled Brandes betweenness (plans/betweenness.py): batched
    forward sigma pass + backward dependency accumulation over composite
    (root, v) keys — the MS-BFS amortization shape. Oracle unrolls both
    passes level-by-level (fixed depth BETWEENNESS_ORACLE_LEVELS, a no-op
    past the true BFS depth of 2 at sf0.01)."""
    from parconnect_spark.plans.betweenness import betweenness_centrality

    _, edges, id_map = _graph(spark, sf_dir)
    bc = betweenness_centrality(edges, sources=list(range(HARMONIC_SOURCES)))
    return (
        bc.join(id_map, bc["v"] == id_map["id"])
        .select("name", F.round("bc", 6).alias("bc"))
        .orderBy("name")
    )


def _q_cc_temporal(spark, sf_dir):
    """Per-time-window component stats in ONE connectivity run: every edge
    endpoint carries its conversation's week prefix, so per-window graphs
    are disjoint by construction and the single CC fixpoint labels all
    windows at once — the hypertable-rollup shape (no driver loop over
    windows)."""
    from parconnect_spark.operators.derive import derive_windowed_string_edges
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.operators.relabel import relabel_edges
    from parconnect_spark.plans.connectivity import connected_components

    t = _transcripts(spark, sf_dir)
    se = derive_windowed_string_edges(t, granularity="week")
    long_edges, id_map = relabel_edges(se, "a", "b")
    res = connected_components(symmetrize(long_edges))
    vw = res.labels.join(id_map, res.labels["v"] == id_map["id"]).select(
        F.substring_index("name", "|", 1).alias("week"), "label"
    )
    comp = vw.groupBy("week", "label").agg(F.count(F.lit(1)).alias("n"))
    stats = comp.groupBy("week").agg(
        F.count(F.lit(1)).alias("components"),
        F.max("n").alias("largest"),
        F.sum("n").alias("n_vertices"),
    )
    # undirected edge count per window pins the snapshot EDGE SET too —
    # the component aggregate alone is insensitive to which window a
    # boundary-crossing sequential edge lands in (hub entities keep each
    # weekly graph connected either way).
    ecnt = se.groupBy(
        F.substring_index("a", "|", 1).alias("week")
    ).agg(F.count(F.lit(1)).alias("n_edges"))
    return stats.join(ecnt, "week").orderBy("week")


def _q_graph_diff(spark, sf_dir):
    """Consecutive-snapshot structural churn (operators/graph.snapshot_diff
    over derive_windowed_string_edges): distinct undirected edges added /
    removed / kept between each pair of consecutive weekly snapshots —
    exact integers, one full-outer join co-partitioned on (window pair,
    edge), no driver loop over windows."""
    from parconnect_spark.operators.derive import derive_windowed_string_edges
    from parconnect_spark.operators.graph import snapshot_diff

    t = _transcripts(spark, sf_dir)
    se = derive_windowed_string_edges(t, granularity="week")
    return snapshot_diff(se).orderBy("w_from")


def _q_community_graph(spark, sf_dir):
    """Coarsened community super-graph: contract the entity graph by the
    labelprop_min assignment (the communities modularity already scores)
    into weighted super-edges — the contraction step of a multilevel
    partitioning / Louvain pipeline."""
    from parconnect_spark.operators.graph import contract_graph
    from parconnect_spark.plans.labelprop import label_propagation

    _, edges, id_map = _graph(spark, sf_dir)
    labels = label_propagation(
        edges, num_iters=COMMUNITY_GRAPH_ITERS, rule="min"
    )
    sup = contract_graph(edges, labels)
    ia = id_map.select(F.col("id").alias("ca"), F.col("name").alias("ca_name"))
    ib = id_map.select(F.col("id").alias("cb"), F.col("name").alias("cb_name"))
    return (
        sup.join(ia, "ca")
        .join(ib, "cb")
        .select(
            F.col("ca_name").alias("ca"), F.col("cb_name").alias("cb"), "weight"
        )
        .orderBy("ca", "cb")
    )


def _q_triangle_count(spark, sf_dir):
    from parconnect_spark.plans.triangles import enumerate_triangles

    _, edges, _ = _graph(spark, sf_dir)
    return enumerate_triangles(edges).agg(F.count(F.lit(1)).alias("n_triangles"))


def _q_triangles_per_vertex(spark, sf_dir):
    from parconnect_spark.plans.triangles import triangles_per_vertex

    _, edges, id_map = _graph(spark, sf_dir)
    tri = triangles_per_vertex(edges)
    return _with_names(tri, id_map, "triangles")


def _q_vertex_features(spark, sf_dir):
    """Per-vertex structural features: degree, triangle participation,
    local clustering coefficient, mean neighbor degree — the per-vertex
    feature block a graph-ML training pipeline exports."""
    from parconnect_spark.operators.graph import avg_neighbor_degree
    from parconnect_spark.plans.triangles import clustering_coefficients

    _, edges, id_map = _graph(spark, sf_dir)
    feats = clustering_coefficients(edges).join(avg_neighbor_degree(edges), "v")
    return (
        feats.join(id_map, feats["v"] == id_map["id"])
        .select(
            "name",
            "degree",
            "triangles",
            F.round("lcc", 6).alias("lcc"),
            F.round("avg_nbr_deg", 6).alias("avg_nbr_deg"),
        )
        .orderBy("name")
    )


def _q_assortativity(spark, sf_dir):
    from parconnect_spark.operators.graph import degree_assortativity

    _, edges, _ = _graph(spark, sf_dir)
    return degree_assortativity(edges).select(
        F.round("assortativity", 6).alias("assortativity"), "n_edges"
    )


def _q_transitivity(spark, sf_dir):
    """Global clustering coefficient: 3·|triangles| / Σ_v C(deg_v, 2) —
    exact int64 counts (degree-ordered node-iterator + one degree
    aggregate), the ratio the only double (plans/triangles.transitivity)."""
    from parconnect_spark.plans.triangles import transitivity

    _, edges, _ = _graph(spark, sf_dir)
    return transitivity(edges)


def _q_butterflies(spark, sf_dir):
    """Bipartite butterfly ((2,2)-biclique) count over the conv×entity
    membership table, in closed form over the weighted one-mode projection
    (Σ_pairs C(w,2), integer div) — shares bipartite_cooccur's declared
    max_group_size=64 viral-group cap (operators/graph.count_butterflies)."""
    from parconnect_spark.operators.derive import transcripts_to_entity_turns
    from parconnect_spark.operators.graph import count_butterflies

    t = _transcripts(spark, sf_dir)
    mem = transcripts_to_entity_turns(t).select("conv_id", "entity")
    return count_butterflies(
        mem, "conv_id", "entity", max_group_size=BIPARTITE_MAX_GROUP
    )


def _q_turn_dedup(spark, sf_dir):
    """Corpus-level boilerplate removal over the transcript turns (CCNet-
    style paragraph dedup re-expressed for conversations): texts in more
    than BOILERPLATE_MAX_CONVS distinct conversations keep exactly one
    canonical occurrence — min (conv_id, turn_idx) — everything else
    passes through (functions/dedup.boilerplate_dedup; hash-aggregate +
    join-back, NO windows — the viral-text skew guard)."""
    from parconnect_spark.functions.dedup import boilerplate_dedup

    t = _transcripts(spark, sf_dir)
    return boilerplate_dedup(
        t, "text", "conv_id", "turn_idx", max_groups=BOILERPLATE_MAX_CONVS
    ).orderBy("conv_id", "turn_idx")


KRON_SCALE = 8
KRON_EF = 16


def _q_cc_kronecker(spark, sf_dir):
    """CC per-vertex membership on the reference's own Kronecker test graph
    (bit-parity graph500 generator, seeds {1,2} — the north_star's
    'match parconnect's outputs on its Kronecker test graphs')."""
    from parconnect_spark.plans.connectivity import connected_components
    from parconnect_spark.sources.graph500 import kronecker_edges_graph500

    edges = kronecker_edges_graph500(spark, KRON_SCALE, KRON_EF)
    res = connected_components(edges, algorithm="two_phase")
    return res.labels.orderBy("v")


def _cc_kronecker_oracle() -> str:
    """DuckDB oracle: the SAME deterministic edge stream (generated by the
    bit-parity port, itself fixture-verified against the compiled reference
    generator) embedded as literals, labeled by a recursive-CTE min-reach."""
    from parconnect_spark.sources.graph500 import generate_window

    M = KRON_EF << KRON_SCALE
    edges = generate_window(KRON_SCALE, M, 0, M)
    values = ",".join(f"({a},{b})" for a, b in edges)
    return f"""
WITH RECURSIVE raw(src, dst) AS (VALUES {values}),
sym AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
verts AS (SELECT DISTINCT src AS v FROM sym),
reach(v, lbl) AS (
  SELECT v, v FROM verts
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN sym e ON e.src = r.v
)
SELECT v, MIN(lbl) AS label FROM reach GROUP BY v ORDER BY v"""


def _q_cc_hybrid(spark, sf_dir):
    """The reference's shipped binary end-to-end: statistics-driven decision
    (CSN-MLE power-law KS fit) → BFS peel of the giant component → label-
    propagation coloring of the residual (benchmark_parconnect_auto.cpp:
    194-267), on a deterministic scale-free graph built so the KS fit
    actually fires (measured 0.034 < 0.05) and BOTH stages do real work.
    Verified against the same recursive-CTE min-reach oracle as the other
    CC entries; tests/test_pipeline.py asserts ran_bfs=True on this graph."""
    from parconnect_spark.pipeline import parconnect_pipeline
    from parconnect_spark.sources.generators import powerlaw_star_edges

    edges = powerlaw_star_edges(spark)
    res = parconnect_pipeline(edges)
    return res.labels.orderBy("v")


def _cc_hybrid_oracle() -> str:
    """Min-reach ground truth over the SAME deterministic edge list,
    embedded as literals (the graph500-oracle pattern)."""
    from parconnect_spark.sources.generators import powerlaw_star_edge_list

    und = powerlaw_star_edge_list()
    values = ",".join(f"({a},{b})" for a, b in und)
    return f"""
WITH RECURSIVE raw(src, dst) AS (VALUES {values}),
sym AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
verts AS (SELECT DISTINCT src AS v FROM sym),
reach(v, lbl) AS (
  SELECT v, v FROM verts
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN sym e ON e.src = r.v
)
SELECT v, MIN(lbl) AS label FROM reach GROUP BY v ORDER BY v"""


def _q_dedup_exact(spark, sf_dir):
    from parconnect_spark.functions.dedup import exact_dup_groups

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return exact_dup_groups(docs).orderBy("id")


def _q_dedup_ngram(spark, sf_dir):
    from parconnect_spark.functions.dedup import ngram_jaccard_pairs

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    # stop-shingle cap set explicitly (mirrored in the oracle): bounds the
    # candidate join's per-key fan-out on boilerplate-heavy corpora
    return ngram_jaccard_pairs(docs, threshold=0.6, max_shingle_df=1000).orderBy(
        "id_a", "id_b"
    )


def _q_dedup_prefix(spark, sf_dir):
    """PPJoin-style prefix-filtered exact Jaccard join
    (functions/dedup.prefix_filter_pairs): candidates from rarest-first
    shingle prefixes (lossless by the prefix lemma), verification exact,
    every threshold an integer comparison (den*inter >= num*union). The
    oracle is algorithm-independent ground truth -- the brute shared-
    shingle join over the FULL universe -- so it checks that the prefix
    filter changed the plan, not the answer."""
    from parconnect_spark.functions.dedup import prefix_filter_pairs

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return prefix_filter_pairs(docs, threshold=(3, 5)).orderBy("id_a", "id_b")


def _q_blocklist_filter(spark, sf_dir):
    """Bloom-prefiltered EXACT blocklist anti-join
    (functions/dedup.bloom_blocklist_filter): the blocklist's bitmap
    classifies every corpus row map-side (no false negatives -> "no" rows
    never shuffle); only bloom-positives pay the exact anti-join that
    kills false positives, so the output is exact regardless of bitmap
    size. Blocklist = every 7th doc's content fingerprint, derived from
    the corpus itself (deterministic, self-contained)."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.dedup import bloom_blocklist_filter

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    bl = docs.where("doc_id % 7 = 0").select(F.md5(norm).alias("fp"))
    return (
        bloom_blocklist_filter(docs, bl)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def _q_curation_funnel(spark, sf_dir):
    """Four-stage corpus-curation funnel (functions/curation.py): quality
    gate -> exact dedup -> near-dup canonicalization (ngram pairs closed
    by the CC engine) -> Bloom-prefiltered blocklist, reporting per-stage
    survivor counts. The composition query: it proves the pipeline
    operators compose end to end with exactly the semantics each one's
    own contract entry pins. Blocklist = every 13th doc's fingerprint."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.curation import curation_funnel

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    bl = docs.where("doc_id % 13 = 0").select(F.md5(norm).alias("fp"))
    return curation_funnel(docs, blocklist=bl).orderBy("stage_idx")


def _q_doc_chunks(spark, sf_dir):
    """Fixed-window training-sequence chunking with overlap
    (functions/text.chunk_documents): windows of 64 tokens every 48 (16
    overlap), final chunk short-but-never-empty, every token covered.
    Pure Catalyst sequence/slice/array_join -- a flat map over the
    corpus, fan-out bounded by doc length."""
    from parconnect_spark.functions.text import chunk_documents

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return (
        chunk_documents(docs, window=64, stride=48)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_idx")
    )


def _q_partition_stats(spark, sf_dir):
    """Hash-partitioning quality report (operators/graph.partition_stats)
    of the symmetric entity graph at 8 partitions: edge-cut fraction (the
    per-superstep all-to-all traffic a real cluster pays), plus
    vertex/edge balance factors (the straggler multiplier). The reference
    ANSWERS this concern with the Wang-hash id permutation
    (reduceIds.hpp:104-114); this MEASURES what that buys, with an
    md5-replicable stand-in partitioner so DuckDB replays it exactly."""
    from parconnect_spark.operators.graph import partition_stats

    _t, edges, _m = _graph(spark, sf_dir)
    return partition_stats(edges, 8)


def _q_incremental_dedup(spark, sf_dir):
    """Delta-vs-corpus dedup check (functions/dedup.incremental_dedup):
    new batch = every 5th doc, corpus = the rest. Each new doc gets an
    exact-dup flag (fingerprint present in corpus), a near-dup flag
    (MinHash band-bucket candidate verified at Jaccard >= 0.6), and its
    best corpus match -- the production shape where the delta probes the
    corpus instead of re-clustering it."""
    from parconnect_spark.functions.dedup import incremental_dedup

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    new = docs.where("doc_id % 5 = 0")
    corpus = docs.where("doc_id % 5 <> 0")
    return incremental_dedup(new, corpus).orderBy("id")


def _q_inverted_index(spark, sf_dir):
    """Capped inverted index (functions/text.inverted_index): per term,
    exact document frequency plus the top-5 postings by (tf DESC,
    doc_id) -- the retrieval-side artifact. Postings lists are truncated
    through the skew-proof two-phase salted window (sparsify_topk), so a
    stopword posting in every doc never serializes one task; df stays
    exact from one map-side-combined aggregate."""
    from parconnect_spark.functions.text import inverted_index

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return inverted_index(docs, k_postings=5).orderBy("term", "rank")


def _q_bm25(spark, sf_dir):
    """Okapi BM25 relevance (functions/text.bm25_scores) of every doc
    matching the fixed query (data, model, join) -- the scoring half of
    retrieval next to inverted_index's candidate lookup. Tokens filter
    to the query terms at the explode; df/N/avg_len are scalar
    aggregates; one grouped sum of <= |q| contributions per doc."""
    from parconnect_spark.functions.text import bm25_scores

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return (
        bm25_scores(docs, ["data", "model", "join"])
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def _q_fuzzy_terms(spark, sf_dir):
    """Edit-distance-2 term pairs over the corpus vocabulary
    (functions/text.fuzzy_pairs): sound q-gram blocking (an edit
    destroys <= q grams, so near strings of length >= q(d+1) share one)
    plus bounded length-bucket residuals for short strings; exact
    levenshtein verify. The oracle is brute force over all vocab pairs
    -- algorithm-independent ground truth for the blocking's
    losslessness."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.text import fuzzy_pairs, tokens_col

    _views(spark, sf_dir, ("documents",))
    vocab = (
        spark.table("documents")
        .select(F.explode(tokens_col(F.col("text"))).alias("s"))
        .distinct()
    )
    return fuzzy_pairs(vocab, max_dist=2, q=2).orderBy("a", "b")


def _q_frequent_itemsets(spark, sf_dir):
    """Apriori frequent itemsets to size 3
    (functions/itemsets.frequent_itemsets) over conversation->entity
    baskets: the anti-monotone prune (transaction trim to frequent-1,
    C3 only from triples whose member pairs are all frequent) is what
    keeps candidates from going combinatorial -- the algorithm IS the
    scale argument. Absolute min_support 10."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.itemsets import frequent_itemsets

    t = _transcripts(spark, sf_dir)
    ent = F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("t:"), F.col("tool"))
    ).otherwise(F.concat(F.lit("r:"), F.col("role")))
    baskets = t.select(F.col("conv_id").alias("basket_id"), ent.alias("item"))
    return frequent_itemsets(baskets, 10).orderBy("size", "i1", "i2", "i3")


def _q_association_rules(spark, sf_dir):
    """Pairwise association rules a->b over conversation-entity baskets
    (functions/itemsets.association_rules): confidence sup(ab)/sup(a),
    lift against the consequent's base rate. Both directions scored;
    one frequent-itemsets pass plus broadcast L1 joins."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.itemsets import association_rules

    t = _transcripts(spark, sf_dir)
    ent = F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("t:"), F.col("tool"))
    ).otherwise(F.concat(F.lit("r:"), F.col("role")))
    baskets = t.select(F.col("conv_id").alias("basket_id"), ent.alias("item"))
    return association_rules(baskets, 10, min_confidence=0.5).orderBy(
        "antecedent", "consequent"
    )


def _q_k_anonymity(spark, sf_dir):
    """k-anonymity audit (operators/dq.k_anonymity) of the events table
    on the (user_id, event_type) quasi-identifier at k=3: group census +
    one aggregate over the group table; rows_at_risk is the
    re-identifiable population a release gate blocks on."""
    from parconnect_spark.operators.dq import k_anonymity

    _views(spark, sf_dir, ("events",))
    return k_anonymity(spark.table("events"), ["user_id", "event_type"], 3)


def _q_dp_counts(spark, sf_dir):
    """Seeded Laplace DP release (operators/dq.dp_counts) of per-type
    event counts at epsilon=1: noise drawn by inverse-CDF from an
    md5-derived uniform, deterministic per (seed, group) so the release
    is reproducible and auditable -- change the seed per release. The
    oracle replays the identical noise stream."""
    from parconnect_spark.operators.dq import dp_counts

    _views(spark, sf_dir, ("events",))
    return dp_counts(
        spark.table("events"), "event_type", epsilon=1.0, seed="r5"
    ).orderBy("group")


def _q_ab_test(spark, sf_dir):
    """Two-proportion z-test (operators/dq.ab_test): arms by
    user_id % 2, success = purchase events -- the experimentation
    readout in one conditional aggregate."""
    import pyspark.sql.functions as F

    from parconnect_spark.operators.dq import ab_test

    _views(spark, sf_dir, ("events",))
    return ab_test(
        spark.table("events"),
        (F.col("user_id") % 2).cast("int"),
        F.col("event_type") == "purchase",
    )


def _q_changepoint(spark, sf_dir):
    """CUSUM change-point per event type (operators/events.
    cusum_changepoint): the day where cumulative deviation from the
    series mean peaks -- sustained level shifts, complementing
    term_bursts' spike detector. Cumulative window over the per-group
    DAY table only."""
    from parconnect_spark.operators.events import cusum_changepoint

    _views(spark, sf_dir, ("events",))
    return cusum_changepoint(spark.table("events")).orderBy("group")


def _q_forecast(spark, sf_dir):
    """Closed-form EWMA next-day forecast per event type
    (operators/events.ewma_forecast): the recursion unrolled into ONE
    weighted sum with exact rational-power weights (alpha = 1/4),
    missing days zero-filled -- no sequential state at any
    parallelism."""
    from parconnect_spark.operators.events import ewma_forecast

    _views(spark, sf_dir, ("events",))
    return ewma_forecast(spark.table("events")).orderBy("group")


def _q_pca_projection(spark, sf_dir):
    """First-principal-component projection
    (functions/cluster.pca_project): Arrow-batched Gram partials, the
    UNNORMALIZED power iteration v = G^8 * 1 (closed form -- no
    eigensolver, no sign ambiguity, every step a sum the oracle
    replays), L2-normalized direction, one dot per vector."""
    from parconnect_spark.functions.cluster import pca_project

    _views(spark, sf_dir, ("embeddings",))
    return (
        pca_project(spark.table("embeddings"))
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    )


def _q_range_splits(spark, sf_dir):
    """Exact equi-depth range splitters (functions/sampling.range_splits)
    over event user_ids at 8 ranges -- the boundaries a range
    partitioner wants, computed exactly by rank arithmetic over the
    per-value count table (Spark's own partitioner samples; this is the
    ground truth it approximates)."""
    from parconnect_spark.functions.sampling import range_splits

    _views(spark, sf_dir, ("events",))
    return range_splits(spark.table("events"), "user_id", 8).orderBy(
        "split_idx"
    )


def _q_jl_projection(spark, sf_dir):
    """Seeded Johnson-Lindenstrauss sign projection to 16-d
    (functions/cluster.jl_project): the md5-drawn sign matrix folds into
    one narrow zero-shuffle Catalyst projection and replays exactly in
    SQL. Long form (vec_id, dim, y) so the oracle compares scalar
    cells."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.cluster import jl_project

    _views(spark, sf_dir, ("embeddings",))
    out = jl_project(spark.table("embeddings"), out_dim=16)
    return (
        out.select(
            F.col("id").alias("vec_id"),
            F.posexplode("y").alias("dim", "y"),
        )
        .orderBy("vec_id", "dim")
    )


def _q_publish_audit(spark, sf_dir):
    """Write-audit-publish roundtrip (sources/tables.publish_with_audit):
    the documents table stages to parquet, the audit runs over the
    STAGED files (what readers would see), and only a green report
    promotes via atomic rename. Output = the audit report rows; the
    promoted table's row count rides along as its own audit line."""
    import shutil
    import tempfile

    from parconnect_spark.sources.tables import publish_with_audit

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    tmp = tempfile.mkdtemp(prefix="wap_")
    try:
        rep = publish_with_audit(
            docs,
            f"{tmp}/docs",
            [
                ("documents", "unique", "doc_id"),
                ("documents", "not_null", "text"),
            ],
        )
        n = spark.read.parquet(f"{tmp}/docs").count()
        rows = [
            (r["table"], r["check"], r["column"], r["violations"], r["passed"])
            for r in rep.collect()
        ] + [("documents", "published_rows", "*", n, True)]
        return spark.createDataFrame(
            sorted(rows),
            "table string, check string, column string, "
            "violations long, passed boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_hybrid_rank(spark, sf_dir):
    """Hybrid retrieval reranking (functions/text.rrf_fuse): BM25
    relevance ranks for the fixed query fused with per-doc quality-score
    ranks by reciprocal-rank fusion -- the standard combiner that reads
    only ranks, so incomparable score scales cannot skew it. Both input
    rankings use the total-order tiebreak."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from parconnect_spark.functions.text import (
        bm25_scores,
        quality_score,
        rrf_fuse,
    )

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    wa = Window.orderBy(F.desc("score"), F.asc("id"))
    bm = bm25_scores(docs, ["data", "model", "join"]).select(
        "id", F.row_number().over(wa).alias("rank")
    )
    q = quality_score(docs)
    wb = Window.orderBy(F.desc("quality"), F.asc("doc_id"))
    qr = q.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(wb).alias("rank"),
    )
    return (
        rrf_fuse(bm, qr)
        .withColumnRenamed("id", "doc_id")
        .orderBy("fused_rank")
    )


def _q_language_confusion(spark, sf_dir):
    """Language-ID evaluation harness: confusion counts of the shipped
    heuristic (functions/text.language_id) against the documents
    table's ground-truth lang column -- the same measure-what-ships
    discipline as ann_recall, for the text side."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.text import language_id

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    pred = language_id(docs)
    return (
        pred.groupBy(
            F.col("lang").alias("true_lang"),
            F.col("lang_guess").alias("predicted"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "predicted")
    )


def _q_ks_drift(spark, sf_dir):
    """Pairwise two-sample KS statistic between sources over the token-
    count distribution (functions/text.ks_drift): exact rational
    cumulative-fraction gaps over the per-(group, length) count table --
    the corpus-composition drift monitor."""
    from parconnect_spark.functions.text import ks_drift

    _views(spark, sf_dir, ("documents",))
    return ks_drift(spark.table("documents")).orderBy(
        "source_a", "source_b"
    )


def _q_token_entropy(spark, sf_dir):
    """Per-source token Shannon entropy (functions/text.token_entropy):
    the diversity monitor next to ks_drift's shape monitor -- a source
    whose entropy collapses is templating even if its length profile
    holds."""
    from parconnect_spark.functions.text import token_entropy

    _views(spark, sf_dir, ("documents",))
    return token_entropy(spark.table("documents")).orderBy("group")


def _q_transition_entropy(spark, sf_dir):
    """Per-state conditional entropy of the entity transition chain
    (operators/derive.transition_entropy): conversation predictability,
    the distribution-level companion to markov_stationary."""
    from parconnect_spark.operators.derive import transition_entropy

    t = _transcripts(spark, sf_dir)
    return transition_entropy(t).orderBy("entity")


def _q_tpch_pricing(spark, sf_dir):
    """TPC-H Q1-shape pricing summary over lineitem: grouped conditional
    aggregates with derived measures -- the classic OLAP rollup,
    included to pin that the engine's surface covers the standard
    relational shapes alongside the graph/pipeline operators. Pure
    Catalyst; one map-side-combined aggregate over the scan (the
    shipdate filter pushes into the parquet reader)."""
    import pyspark.sql.functions as F

    _views(spark, sf_dir, ())
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_tpch_priority(spark, sf_dir):
    """TPC-H Q3-shape shipping priority: the selective three-way
    join (customer segment filter broadcast into orders ⋈ lineitem)
    with revenue ranking -- the classic join-ordering benchmark shape.
    Top 10 by (revenue DESC, orderdate, orderkey), all tie-broken."""
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    seg = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(seg), o["o_custkey"] == seg["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(rev, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def _q_tpch_region_revenue(spark, sf_dir):
    """TPC-H Q5-shape local-supplier revenue: the six-table join chain
    (region -> nation -> supplier/customer -> orders -> lineitem) with
    the same-nation condition -- the deepest classic join-ordering
    test. Dimension chain broadcast end to end; one grouped sum."""
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    dims = (
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .where(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(su, li["l_suppkey"] == su["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dims), F.col("s_nationkey") == dims["n_nationkey"])
        .groupBy("n_name")
        .agg(F.round(rev, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def _q_tpch_custdist(spark, sf_dir):
    """TPC-H Q13-shape customer order-count distribution: LEFT join
    (customers with zero orders kept) -> per-customer count -> count-of-
    counts histogram -- the outer-join double-aggregation shape the
    other TPC-H entries don't cover."""
    import pyspark.sql.functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def _q_dedup_minhash(spark, sf_dir):
    from parconnect_spark.functions.dedup import minhash_near_dup_pairs

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return minhash_near_dup_pairs(docs, threshold=0.6).orderBy("id_a", "id_b")


def _q_dedup_simhash(spark, sf_dir):
    from parconnect_spark.functions.dedup import simhash_near_pairs

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return simhash_near_pairs(docs, max_hamming=3).orderBy("id_a", "id_b")


def _q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs → transitive duplicate clusters → canonical doc per
    cluster: the pair generators composed with the CC engine (the step a
    training pipeline runs before dropping duplicates)."""
    from parconnect_spark.functions.dedup import (
        minhash_near_dup_pairs,
        near_dup_clusters,
    )

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    pairs = minhash_near_dup_pairs(docs, threshold=0.6)
    return near_dup_clusters(docs, pairs).orderBy("doc_id")


def _q_leakage_split(spark, sf_dir):
    """Leakage-safe train/holdout assignment: minhash near-dup pairs →
    CC clusters → whole-cluster side assignment by salted hash of the
    canonical id (functions/sampling.cluster_split) — near-duplicates can
    never straddle the split boundary."""
    from parconnect_spark.functions.dedup import minhash_near_dup_pairs
    from parconnect_spark.functions.sampling import cluster_split

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    pairs = minhash_near_dup_pairs(docs, threshold=0.6)
    return cluster_split(docs, pairs, holdout_frac=0.2).orderBy("doc_id")


def _q_quality_features(spark, sf_dir):
    from parconnect_spark.functions.text import quality_features

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "text")
    return quality_features(docs).drop("text").orderBy("doc_id")


def _q_language_id(spark, sf_dir):
    from parconnect_spark.functions.text import language_id

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "text")
    return language_id(docs).select("doc_id", "lang_guess").orderBy("doc_id")


def _q_contamination(spark, sf_dir):
    """Eval-set leakage check: benchmark = every 20th doc, train = the
    rest; flags train docs containing >=30% of a benchmark doc's 4-gram
    shingles (catches the planted duplicates at this SF)."""
    from parconnect_spark.functions.dedup import contamination_check

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    return contamination_check(
        train, bench, min_overlap_frac=0.3, max_shingle_df=1000
    ).orderBy("train_id", "bench_id")


def _q_stratified_sample(spark, sf_dir):
    """Deterministic exact-quota per-language sample (25 docs per lang,
    md5-hash selection rule — reproducible across engines)."""
    from parconnect_spark.functions.sampling import stratified_sample

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    return stratified_sample(docs, "lang", quota=25).orderBy("lang", "sample_rank")


def _q_media_features(spark, sf_dir):
    """Multimodal real-decode pipeline (rows-only driver check: payload
    synthesis + decode aren't SQL-expressible): deterministic media table
    -> PPM/WAV/Y4M decode in Arrow batches -> per-row features, projected
    to the stable integer columns."""
    from parconnect_spark.functions.multimodal import extract_features, synth_media

    media = synth_media(spark, n=120)
    return (
        extract_features(media, fake=False)
        .select("media_id", "kind", "n_bytes", "checksum")
        .orderBy("media_id")
    )


def _q_media_frames(spark, sf_dir):
    """Video frame sampling (real Y4M decode): deterministic media table ->
    frame nearest each 250ms stride re-encoded as a standalone PPM still;
    the still is projected to its md5 so the driver's value hash covers the
    decoded bytes. Oracle = committed golden fixture (decode isn't
    SQL-expressible), same discipline as media_features."""
    from parconnect_spark.functions.multimodal import frame_sample, synth_media

    media = synth_media(spark, n=120)
    frames = frame_sample(media, every_ms=250)
    return frames.select(
        "media_id",
        "frame_ms",
        "width",
        "height",
        F.md5("payload").alias("frame_md5"),
    ).orderBy("media_id", "frame_ms")


def _q_similarity_topk(spark, sf_dir):
    from parconnect_spark.functions.similarity import brute_force_topk

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    queries = emb.where("vec_id < 5")
    out = brute_force_topk(emb, queries, k=10)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    ).orderBy("query_id", "rank")


def _q_neighbor_agg(spark, sf_dir):
    """kNN-graph neighborhood mean-embedding (GraphSAGE aggregation step)
    over the exact top-10 cosine graph of the first five query vectors —
    long form (query, dim, mean) so the oracle compares scalar cells."""
    from parconnect_spark.functions.similarity import (
        brute_force_topk,
        neighbor_mean_embedding,
    )

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    queries = emb.where("vec_id < 5")
    nn = brute_force_topk(emb, queries, k=10)
    out = neighbor_mean_embedding(emb, nn)
    return out.select(
        "query_id", "dim", F.round("mean_val", 6).alias("mean_val"), "n_neighbors"
    ).orderBy("query_id", "dim")


def _q_ann_recall(spark, sf_dir):
    """ANN evaluation harness: recall@10 of the hyperplane-LSH path
    against exact brute force, per query -- the number a production ANN
    rollout gates on. Composes the two shipped operators (and the
    oracle composes their two oracles verbatim), so the measurement is
    of exactly what ships."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.similarity import brute_force_topk, lsh_topk

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    queries = emb.where("vec_id < 5")
    ex = brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    ap = lsh_topk(emb, queries, k=10, bits=8, dim=64).select(
        "query_id", F.col("neighbor_id").alias("ap_n")
    )
    j = ex.join(
        ap,
        (ex["query_id"] == ap["query_id"]) & (ex["neighbor_id"] == ap["ap_n"]),
        "left",
    ).select(ex["query_id"], "neighbor_id", "ap_n")
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.col("ap_n").isNotNull().cast("long")).alias("n_hit"),
            F.round(
                F.sum(F.col("ap_n").isNotNull().cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def _q_ivf_recall(spark, sf_dir):
    """recall@10 of the IVF-flat path against exact brute force
    (completing the ANN evaluation harness next to ann_recall's LSH
    measurement; same composition discipline)."""
    import pyspark.sql.functions as F

    from parconnect_spark.functions.similarity import brute_force_topk, ivf_topk

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    queries = emb.where("vec_id < 5")
    ex = brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    ap = ivf_topk(emb, queries, k=10, n_lists=16, n_probe=4).select(
        "query_id", F.col("neighbor_id").alias("ap_n")
    )
    j = ex.join(
        ap,
        (ex["query_id"] == ap["query_id"]) & (ex["neighbor_id"] == ap["ap_n"]),
        "left",
    ).select(ex["query_id"], "neighbor_id", "ap_n")
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.col("ap_n").isNotNull().cast("long")).alias("n_hit"),
            F.round(
                F.sum(F.col("ap_n").isNotNull().cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def _q_similarity_lsh(spark, sf_dir):
    from parconnect_spark.functions.similarity import lsh_topk

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    queries = emb.where("vec_id < 5")
    out = lsh_topk(emb, queries, k=10, bits=8, dim=64)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    ).orderBy("query_id", "rank")


def _q_similarity_ivf(spark, sf_dir):
    from parconnect_spark.functions.similarity import ivf_topk

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    queries = emb.where("vec_id < 5")
    out = ivf_topk(emb, queries, k=10, n_lists=16, n_probe=4)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    ).orderBy("query_id", "rank")


def _similarity_ivf_oracle(k: int = 10, n_lists: int = 16, n_probe: int = 4) -> str:
    """Replicates ivf_topk exactly: centroids = the n_lists lowest-id
    vectors (pure SQL — no literals needed), max-cosine list assignment
    with (cosine DESC, cid ASC) ties, n_probe probed lists per query,
    exact cosine top-k over probed lists only."""
    return f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
cent AS (SELECT vec_id AS cid, ev AS cv FROM base WHERE vec_id < {n_lists}),
scored_lists AS (
  SELECT b.vec_id, b.ev, c.cid,
         list_cosine_similarity(b.ev, c.cv) AS ccos,
         ROW_NUMBER() OVER (PARTITION BY b.vec_id
                            ORDER BY list_cosine_similarity(b.ev, c.cv) DESC,
                                     c.cid ASC) AS rk
  FROM base b CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id AS neighbor_id, ev AS cv, cid AS list
  FROM scored_lists WHERE rk = 1
),
probed AS (
  SELECT vec_id AS query_id, ev AS qv, cid AS list
  FROM scored_lists WHERE vec_id < 5 AND rk <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.neighbor_id, p.qv, a.cv
  FROM probed p JOIN assigned a USING (list)
  WHERE p.query_id <> a.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(qv, cv) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, cv) DESC,
                                     neighbor_id ASC) AS rk
  FROM cand
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, CAST(rk AS INT) AS rank
FROM r WHERE rk <= {k} ORDER BY query_id, rank"""


def _q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs over LSH-bucketed candidates. The
    synthetic embeddings have no true near-dups (max pairwise cosine ≈0.51
    at sf0.01), so the threshold sits where the candidate set is non-trivial;
    the oracle replicates the same bucket codes, so the check is exact."""
    from parconnect_spark.functions.similarity import embedding_near_dup_pairs

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.42, bits=8, dim=64).orderBy(
        "id_a", "id_b"
    )


def _embedding_dedup_oracle(threshold: float = 0.42, bits: int = 8, dim: int = 64) -> str:
    from parconnect_spark.functions.similarity import _projection_matrix

    proj = _projection_matrix(bits, dim, seed=1234)
    bit_terms = []
    for i in range(bits):
        vec = "[" + ", ".join(f"{x:.1f}" for x in proj[i]) + "]::DOUBLE[]"
        bit_terms.append(
            f"CASE WHEN list_dot_product(ev, {vec}) >= 0 THEN {1 << i} ELSE 0 END"
        )
    bucket = " + ".join(bit_terms)
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << i})" for i in range(bits)])
    return f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
coded AS (SELECT vec_id, ev, {bucket} AS bucket FROM base),
probed AS (SELECT vec_id, ev, unnest([{probes}]) AS bucket FROM coded),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.ev AS va, b.ev AS vb
  FROM probed a JOIN coded b USING (bucket)
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(list_cosine_similarity(va, vb), 6) AS cosine
FROM cand WHERE list_cosine_similarity(va, vb) >= {threshold}
ORDER BY id_a, id_b"""


def _q_token_stats(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex segmentation) and
    document fingerprinting (md5 of the normalized full text) — the
    SURVEY §2.11 text-analysis row, previously pytest-only, now against an
    exact DuckDB oracle. All built-in column expressions (functions/text.py)."""
    from parconnect_spark.functions.text import fingerprint, token_count

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "text")
    return (
        fingerprint(docs)
        .select(
            "doc_id",
            token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
            token_count(F.col("text"), bpe_ish=True)
            .cast("long")
            .alias("n_bpe_tokens"),
            F.col("fp").alias("fingerprint"),
        )
        .orderBy("doc_id")
    )


def _q_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document (functions/text.tfidf_top_terms):
    smooth idf over the corpus, integer sort key (tf * round(ln*1e6)) so
    the ranking is bit-identical across engines. One explode + two hash
    aggregates + one per-doc window."""
    from parconnect_spark.functions.text import tfidf_top_terms

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "text")
    return tfidf_top_terms(docs, k=TFIDF_TOPK).orderBy("doc_id", "term")


def _q_redact(spark, sf_dir):
    """PII scrubbing (functions/text.redact_pii) over documents with
    deterministic synthetic PII injected per doc_id (the corpus itself is
    PII-free, which would make the contract vacuous): one URL, email, IPv4
    and phone each, built from doc_id, appended to the text. Counts are
    per-category on progressively-redacted text; fp pins the full redacted
    BYTES via md5."""
    from parconnect_spark.functions.text import redact_pii

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via https://example.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" at 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 tel +49"),
            (F.lit(1000000) + F.col("doc_id")).cast("string"),
        ).alias("text"),
    )
    return (
        redact_pii(docs)
        .select(
            "doc_id",
            "n_url",
            "n_email",
            "n_ipv4",
            "n_phone",
            F.md5("redacted").alias("fp"),
        )
        .orderBy("doc_id")
    )


def _q_sample_k(spark, sf_dir):
    """Exactly-k reproducible corpus sample
    (functions/sampling.deterministic_sample_k): smallest-k md5(id:salt)
    priorities — physically a TakeOrderedAndProject top-k (k rows per
    partition then merge), never a global sort; the reservoir-sampling
    replacement whose content is a pure function of the data."""
    from parconnect_spark.functions.sampling import deterministic_sample_k

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "text")
    return (
        deterministic_sample_k(docs, SAMPLE_K, salt="r5")
        .select("doc_id", F.md5("text").alias("fp"))
        .orderBy("doc_id")
    )


def _q_weighted_sample(spark, sf_dir):
    """Exactly-k token-weighted reproducible sample
    (functions/sampling.weighted_sample_k): Efraimidis–Spirakis
    exponential race with md5-derived uniforms and the integer-quantized
    race key round(-ln(u)/w * 1e6) — weighting by text length makes
    document sampling uniform at the character/token level, the
    training-data mixing primitive. Deterministic across engines,
    partitionings, and retries; physically a TakeOrderedAndProject."""
    from parconnect_spark.functions.sampling import weighted_sample_k

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(
        "doc_id", "text", F.length("text").alias("w")
    )
    return (
        weighted_sample_k(docs, SAMPLE_K, "w", salt="r5w")
        .select("doc_id", F.md5("text").alias("fp"))
        .orderBy("doc_id")
    )


def _q_quality_trim(spark, sf_dir):
    """Percentile-band corpus trim by exact ORDER STATISTIC
    (functions/sampling.quantile_trim): drop the shortest 5% and longest
    5% of documents by whitespace-token count under the total order
    (score, doc_id). Rank membership is integer-exact — no interpolated
    threshold double whose ulp could flip a boundary row — and the global
    rank is the two-phase exscan, never a single-partition window."""
    from parconnect_spark.functions.sampling import quantile_trim
    from parconnect_spark.functions.text import token_count

    _views(spark, sf_dir, ("documents",))
    scored = spark.table("documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("score")
    )
    return (
        quantile_trim(scored, "score", lo=TRIM_LO, hi=TRIM_HI)
        .select("doc_id", "score", "rank")
        .orderBy("rank")
    )


def _q_group_trim(spark, sf_dir):
    """Per-source quality cutoff (functions/sampling.group_quantile_filter):
    within each source, keep the smallest score-closed top set holding at
    least floor(n·3/10) documents by whitespace-token count — the
    per-domain curation pass. All rank arithmetic is rational/integer
    ((n*3) div 10), the window runs over per-(source, score) counts (score
    cardinality, not rows), and the one-row-per-source threshold broadcasts
    back into a map-side filter."""
    from parconnect_spark.functions.sampling import group_quantile_filter
    from parconnect_spark.functions.text import token_count

    _views(spark, sf_dir, ("documents",))
    scored = spark.table("documents").select(
        "doc_id", "source", token_count(F.col("text")).cast("long").alias("score")
    )
    return (
        group_quantile_filter(scored, "source", "score", 3, 10)
        .select("doc_id", "source", "score")
        .orderBy("doc_id")
    )


def _q_sequence_pack(spark, sf_dir):
    """Training-sequence packing map (functions/packing.sequence_pack):
    concatenate the corpus in doc_id order (one EOS separator per doc) and
    chunk every PACK_SEQ_LEN tokens — the last step of an LLM data
    pipeline. Each doc's global offset comes from the two-phase
    distributed exscan (range shuffle + per-partition cumsum + broadcast
    partition totals — no single-partition window, so the plan survives a
    10^14-token stream), and every boundary is int64 div/% — no doubles
    anywhere, so two engines cannot disagree on a chunk id."""
    from parconnect_spark.functions.packing import sequence_pack
    from parconnect_spark.functions.text import token_count

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return sequence_pack(docs, PACK_SEQ_LEN, sep_tokens=1).orderBy("doc_id")


def _q_embedding_gram(spark, sf_dir):
    """Exact Gram/second-moment matrix of the embedding corpus
    (functions/cluster.embedding_gram): the distributed aggregate behind
    PCA/whitening. One mapInPandas pass emits a 64×64 int64 partial per
    Arrow batch (numpy MᵀM — the §2.9 vectorized hot loop), global sums
    in DECIMAL(38,0) so the result is exact on any engine and any
    partitioning (int64 would overflow past ~10^5 vectors). The oracle
    replays the same integer grid by unnest self-join."""
    from parconnect_spark.functions.cluster import embedding_gram

    _views(spark, sf_dir, ("embeddings",))
    return embedding_gram(spark.table("embeddings")).orderBy(
        "dim_i", "dim_j"
    )


def _q_embedding_clusters(spark, sf_dir):
    """Mutual-kNN embedding clustering
    (functions/similarity.mutual_knn_clusters): connect vectors that are
    in EACH OTHER's top-k cosine neighbors, components via the two_phase
    CC plan, cluster = min member id. The kNN table here is the exact
    brute-force baseline (the declared quadratic contract path); at scale
    the ``neighbors=`` hook takes lsh_topk's bucketed candidates and the
    rest of the plan is unchanged. Mutuality is the hub-vector guard —
    k=2 yields 188 clusters at sf0.01, not one blob."""
    from parconnect_spark.functions.similarity import mutual_knn_clusters

    _views(spark, sf_dir, ("embeddings",))
    return mutual_knn_clusters(
        spark.table("embeddings"), k=KNN_CLUSTER_K
    ).orderBy("vec_id")


def _q_source_overlap(spark, sf_dir):
    """Cross-source overlap matrix (functions/dedup.source_overlap):
    exact distinct-4-token-shingle intersection + integer per-mille
    Jaccard for every source pair sharing a shingle (32 of 190 pairs at
    sf0.01 — non-vacuous and sparse, as a real corpus is). Candidates by
    shared-shingle equi-join with the group-frequency skew guard; all set
    arithmetic integer-exact."""
    from parconnect_spark.functions.dedup import source_overlap

    _views(spark, sf_dir, ("documents",))
    return source_overlap(spark.table("documents"), n=4).orderBy(
        "group_a", "group_b"
    )


def _q_collocations(spark, sf_dir):
    """Top-k PMI collocations (functions/text.collocations): distinct-term
    pairs co-occurring per document, df-banded against boilerplate and
    hapaxes, ranked by floor(n_pair·N·10^6 / (n_a·n_b)) — exact int64
    products widened to doubles (correctly-rounded division, so floor is
    engine-independent; no logarithm crosses the engine boundary). The
    pair join is keyed on doc_id (per-doc quadratic in KEPT terms, never
    corpus-quadratic) and the final cut is a TakeOrderedAndProject."""
    from parconnect_spark.functions.text import collocations

    _views(spark, sf_dir, ("documents",))
    return collocations(
        spark.table("documents"),
        min_count=COLLOC_MIN_COUNT,
        top_k=COLLOC_TOPK,
        min_df=COLLOC_MIN_DF,
        max_df=COLLOC_MAX_DF,
    )


def _q_kmeans(spark, sf_dir):
    """Fixed-iteration Lloyd k-means on the integer grid
    (functions/cluster.kmeans_quantized): quantized non-negative vectors,
    exact int64 squared distances with (dist, j) argmin tie-break, integer
    round-half-up centroid updates, k lowest-id seeds. The oracle unrolls
    the identical recurrence, so every (vector, cluster, distance) row
    matches bit-for-bit."""
    from parconnect_spark.functions.cluster import kmeans_quantized

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings")
    asg, _cents = kmeans_quantized(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    return asg.select("vec_id", "cluster", "dist").orderBy("vec_id")


def _q_quantize(spark, sf_dir):
    """Int8 embedding quantization (functions/similarity.quantize_int8),
    exploded to (vec_id, dim, q) scalars plus the per-vector scale — the
    rounding rule is floor(x·127/s + 0.5) on doubles, an expression both
    engines evaluate identically (no library rounding mode involved)."""
    from parconnect_spark.functions.similarity import quantize_int8

    _views(spark, sf_dir, ("embeddings",))
    emb = spark.table("embeddings").where(F.col("vec_id") < QUANT_VECS)
    q = quantize_int8(emb)
    return (
        q.select("vec_id", "scale", F.posexplode("qvec").alias("dim", "q"))
        .select("vec_id", F.col("dim").cast("int").alias("dim"), "q", "scale")
        .orderBy("vec_id", "dim")
    )


def _q_sketch_counts(spark, sf_dir):
    """Count–min sketch (functions/sketch.py) over the corpus token stream,
    point-estimated at the exact top-CMS_TOPK terms. The md5-fold hash
    makes the whole counter grid engine-replicable, so the oracle rebuilds
    the SAME sketch in SQL and every (exact, est) pair must match — the
    CMS overcount is deterministic, not a tolerance band."""
    from parconnect_spark.functions.sketch import cms_estimate, count_min_sketch

    _views(spark, sf_dir, ("documents",))
    toks = spark.table("documents").select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term")
    )
    sk = count_min_sketch(toks, "term", depth=CMS_DEPTH, width=CMS_WIDTH)
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.desc("exact"), "term")
        .limit(CMS_TOPK)
    )
    est = cms_estimate(
        sk, top.select("term"), "term", depth=CMS_DEPTH, width=CMS_WIDTH
    )
    return top.join(est, "term").select("term", "exact", "est").orderBy("term")


def _q_sketch_distinct(spark, sf_dir):
    """HyperLogLog distinct-token estimate next to the exact count: one
    row (m, nonzero_regs, raw_sum, estimate, exact). raw_sum is the exact
    integer register sum (Σ 2^(RMAX−rho)) — the register state itself is
    part of the contract, not just the rounded estimate."""
    from parconnect_spark.functions.sketch import hll_estimate, hll_registers

    _views(spark, sf_dir, ("documents",))
    toks = spark.table("documents").select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term")
    )
    est = hll_estimate(hll_registers(toks, "term", p=HLL_P), p=HLL_P)
    exact = toks.select(
        F.countDistinct("term").cast("long").alias("exact")
    )
    return est.crossJoin(exact).select(
        "m",
        "nonzero_regs",
        "raw_sum",
        F.round("estimate", 4).alias("estimate"),
        "exact",
    )


def _q_sketch_rolling(spark, sf_dir):
    """Rolling 7-day distinct users by HLL register merge
    (functions/sketch.hll_rolling_distinct): one raw scan builds per-day
    register tables; each trailing window is a register-max merge of ≤
    7·2^p rows — the mergeability property as a query, not just a pytest.
    raw_sum pins the merged register state exactly; the estimate is the
    one derived double."""
    from parconnect_spark.functions.sketch import hll_rolling_distinct

    _views(spark, sf_dir, ("events",))
    out = hll_rolling_distinct(
        spark.table("events"),
        bucket_us=ROLL_BUCKET_US,
        window_buckets=ROLL_WINDOW_BUCKETS,
        p=HLL_P,
    )
    return out.select(
        "asof_bucket_us",
        "n_buckets",
        "nonzero_regs",
        "raw_sum",
        F.round("estimate", 4).alias("estimate"),
    ).orderBy("asof_bucket_us")


def _q_heavy_hitters(spark, sf_dir):
    """Exact heavy hitters over the pair-stream endpoint multiset
    (functions/sketch.heavy_hitters): every graph entity whose endpoint
    multiplicity (degree with multiplicity, pre-dedup) reaches
    HH_MIN_COUNT, with its exact count. The count-min grid prunes the
    shuffle — light keys are dropped before the exact groupBy — but the
    RESULT is exact (CM never underestimates), so the oracle is the plain
    GROUP BY ... HAVING over the same endpoint stream. This is the
    sketch-as-physical-optimization discipline: hub detection whose
    answer a 100-TB corpus can afford."""
    from parconnect_spark.functions.sketch import heavy_hitters
    from parconnect_spark.operators.derive import transcripts_to_entity_turns

    turns = transcripts_to_entity_turns(_transcripts(spark, sf_dir))
    seq = turns.where(F.col("next_entity").isNotNull())
    eps = (
        seq.select(F.col("entity").alias("k"))
        .unionByName(seq.select(F.col("next_entity").alias("k")))
        .unionByName(
            turns.select(F.concat(F.lit("c:"), F.col("conv_id")).alias("k"))
        )
        .unionByName(turns.select(F.col("entity").alias("k")))
    )
    return heavy_hitters(
        eps, "k", min_count=HH_MIN_COUNT, depth=CMS_DEPTH, width=CMS_WIDTH
    ).orderBy("k")


def _q_graph_summary(spark, sf_dir):
    """The one-row link-graph dashboard: vertices, undirected edges,
    density, max/avg degree, component count + largest component, and the
    global triangle count — every number produced by the same engine
    operators the dedicated queries verify (degrees, two_phase CC,
    degree-ordered triangle enumeration) and cross-joined into a single
    row of exact int64s plus two derived 6dp doubles. The executive
    summary a 100-TB graph build publishes after every refresh."""
    from parconnect_spark.operators.graph import degrees
    from parconnect_spark.plans.connectivity import connected_components
    from parconnect_spark.plans.triangles import enumerate_triangles

    _, edges, _ = _graph(spark, sf_dir)
    deg = degrees(edges).agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.max("degree").cast("long").alias("max_degree"),
        F.sum("degree").cast("long").alias("_sumdeg"),
    )
    comp = (
        connected_components(edges, algorithm="two_phase")
        .labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.count(F.lit(1)).alias("components"),
            F.max("_n").cast("long").alias("largest"),
        )
    )
    tri = enumerate_triangles(edges).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return (
        deg.crossJoin(comp)
        .crossJoin(tri)
        .select(
            "n_vertices",
            (F.col("_sumdeg") / 2).cast("long").alias("n_edges"),
            F.round(
                F.col("_sumdeg")
                / (F.col("n_vertices").cast("double") * (F.col("n_vertices") - 1)),
                6,
            ).alias("density"),
            "max_degree",
            F.round(
                F.col("_sumdeg") / F.col("n_vertices").cast("double"), 6
            ).alias("avg_degree"),
            "components",
            "largest",
            "n_triangles",
        )
    )


def _q_profile(spark, sf_dir):
    """One-row exact numeric profile of events.value
    (operators/events.profile_numeric): counts, min/max, mean, population
    variance and the EXACT lower-median — every moment computed over the
    int64 µ-unit quantization with DECIMAL(38,0) accumulators, because
    floating-point SUMs are shuffle-order-dependent and a profile that
    changes between runs is worse than none. The median is an order
    statistic via the two-phase global rank (no single-partition window)."""
    from parconnect_spark.operators.events import profile_numeric

    _views(spark, sf_dir, ("events",))
    return profile_numeric(spark.table("events"), "value", "event_id")


def _q_trending_terms(spark, sf_dir):
    """Trending terms per trailing 7-day window
    (functions/text.rolling_topk_terms): top-5 terms by exact count
    (term-asc tiebreak) as of every touched day — the exact-count
    companion to sketch_rolling, same one-raw-scan /
    per-(bucket, term) pre-aggregate / bounded-window-merge shape. No
    doubles anywhere: the ranking is a total (int, string) order."""
    from parconnect_spark.functions.text import rolling_topk_terms

    t = _transcripts(spark, sf_dir)
    return rolling_topk_terms(
        t,
        bucket_us=ROLL_BUCKET_US,
        window_buckets=ROLL_WINDOW_BUCKETS,
        k=TREND_K,
    ).orderBy("asof_bucket_us", "rank")


def _q_term_bursts(spark, sf_dir):
    """Bursting terms (functions/text.term_bursts): a (day, term) bursts
    at ≥ BURST_MIN_COUNT occurrences AND ≥ 2× its trailing-7-day per-day
    baseline (new terms burst with baseline 0, NULL ratio). The burst
    predicate is pure integer arithmetic (cnt·W·den ≥ baseline·num) —
    membership can never flip on a double ulp; ratio is display only."""
    from parconnect_spark.functions.text import term_bursts

    t = _transcripts(spark, sf_dir)
    return term_bursts(
        t,
        bucket_us=ROLL_BUCKET_US,
        window_buckets=ROLL_WINDOW_BUCKETS,
        ratio_num=BURST_RATIO[0],
        ratio_den=BURST_RATIO[1],
        min_count=BURST_MIN_COUNT,
    ).orderBy("asof_bucket_us", "term")


def _q_bigram_lm(spark, sf_dir):
    """Corpus bigram LM table (functions/text.bigram_lm): top-3
    continuations per head token with conditional probability, bigrams
    never crossing document boundaries. Ranking is count-then-term integer
    ordering — engine-independent by construction."""
    from parconnect_spark.functions.text import bigram_lm

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "text")
    return bigram_lm(docs, k=3, min_head_count=BIGRAM_MIN_HEAD).orderBy(
        "w1", "w2"
    )


def _q_repetition_stats(spark, sf_dir):
    """Repetition-based quality features (functions/text.repetition_features):
    the Gopher-family duplicate-word / most-common-n-gram fractions used to
    screen boilerplate and degenerate text from a training corpus. Max-count
    only (never the argmax gram), so the DuckDB oracle replicates it
    bit-for-bit with no tie-break ambiguity."""
    from parconnect_spark.functions.text import repetition_features

    _views(spark, sf_dir, ("documents",))
    docs = spark.table("documents").select("doc_id", "text")
    return (
        repetition_features(docs)
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            "dup_word_frac",
            "top_bigram_frac",
            "top_trigram_frac",
        )
        .orderBy("doc_id")
    )


def _q_streaming_edges(spark, sf_dir):
    """Structured-Streaming derivation of the SAME canonical string edge
    set as derived_edges: transcripts snapshot → file-source readStream →
    stateless E2 membership edges + stateful E1 sequential edges
    (applyInPandasWithState keyed by conv_id, streaming/stream.py) → memory
    sinks, deduped at read-back. The oracle is the batch derived_edges SQL,
    so the stream≡batch equality contract is hash-checked by the driver,
    not just pytest. Two separate streaming queries (a stateful and a
    stateless stream cannot be unioned into one query plan)."""
    import shutil
    import tempfile

    from parconnect_spark.streaming.stream import (
        membership_edge_stream,
        sequential_edge_stream,
        stream_transcripts,
    )

    tmp = tempfile.mkdtemp(prefix="stream_edges_")
    try:
        _transcripts(spark, sf_dir).write.parquet(f"{tmp}/transcripts")
        st = stream_transcripts(spark, f"{tmp}/transcripts")
        for df, name in (
            (membership_edge_stream(st), "stream_e2"),
            (sequential_edge_stream(st), "stream_e1"),
        ):
            q = (
                df.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .start()
            )
            q.processAllAvailable()
            q.stop()
        # the memory sinks hold the rows driver-side — safe to drop the dir
        return spark.sql(
            "SELECT DISTINCT a, b FROM "
            "(SELECT a, b FROM stream_e1 UNION ALL SELECT a, b FROM stream_e2) u "
            "ORDER BY a, b"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_streaming_degrees(spark, sf_dir):
    """Stateful STREAMING AGGREGATION (state store across micro-batches,
    complete output mode): per-entity turn counts over the transcript
    stream; at end-of-stream equals the batch GROUP BY — the second
    stream≡batch contract next to streaming_edges (which covers row
    derivation; this covers incremental aggregation)."""
    import shutil
    import tempfile

    from parconnect_spark.streaming.stream import (
        entity_turn_counts_stream,
        stream_transcripts,
    )

    tmp = tempfile.mkdtemp(prefix="stream_deg_")
    try:
        _transcripts(spark, sf_dir).write.parquet(f"{tmp}/transcripts")
        st = stream_transcripts(spark, f"{tmp}/transcripts")
        q = (
            entity_turn_counts_stream(st)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("stream_entity_counts")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(
            "SELECT entity, turns FROM stream_entity_counts ORDER BY entity"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_streaming_terms(spark, sf_dir):
    """STREAMING event-time windowed aggregation
    (streaming/stream.term_counts_stream): per (UTC-day tumbling window,
    term) exact token counts over the transcript stream — the streaming
    substrate under trending_terms/term_bursts. End-of-stream output
    equals the batch per-day GROUP BY (the fourth stream≡batch contract:
    derivation, keyed aggregation, custom session state, and now
    event-time windows)."""
    import shutil
    import tempfile

    from parconnect_spark.streaming.stream import (
        stream_transcripts,
        term_counts_stream,
    )

    tmp = tempfile.mkdtemp(prefix="stream_terms_")
    try:
        _transcripts(spark, sf_dir).write.parquet(f"{tmp}/transcripts")
        st = stream_transcripts(spark, f"{tmp}/transcripts")
        q = (
            term_counts_stream(st)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("stream_term_counts")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(
            "SELECT bucket_us, term, cnt FROM stream_term_counts "
            "ORDER BY bucket_us, term"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_streaming_seq_join(spark, sf_dir):
    """STREAMING stream-stream event-time interval self-join
    (streaming/stream.seq_join_edge_stream): turn i matches turn i+1 of
    its conversation arriving within the interval SLA — state on BOTH
    join sides, the fifth stream≡batch shape. End-of-stream transition
    counts equal the batch LEAD() derivation (the oracle), because an
    inner join's output is a set independent of micro-batch boundaries."""
    import shutil
    import tempfile

    from parconnect_spark.streaming.stream import (
        seq_join_edge_stream,
        stream_transcripts,
    )

    tmp = tempfile.mkdtemp(prefix="stream_sj_")
    try:
        _transcripts(spark, sf_dir).write.parquet(f"{tmp}/transcripts")
        sa = stream_transcripts(spark, f"{tmp}/transcripts")
        sb = stream_transcripts(spark, f"{tmp}/transcripts")
        q = (
            seq_join_edge_stream(sa, sb)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_seq_join")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(
            "SELECT a, b, COUNT(*) AS n FROM stream_seq_join "
            "GROUP BY a, b ORDER BY a, b"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_streaming_dedup(spark, sf_dir):
    """STREAMING stateful deduplication (streaming/stream.dedup_stream):
    the transcripts land TWICE in the source directory (at-least-once
    upstream), the stream's keyed dropDuplicates state makes delivery
    exactly-once -- the sixth stream-equals-batch shape. End-of-stream
    per-conversation turn counts equal the batch derivation over the
    ORIGINAL (single-copy) table."""
    import shutil
    import tempfile

    from parconnect_spark.streaming.stream import dedup_stream, stream_transcripts

    tmp = tempfile.mkdtemp(prefix="stream_dd_")
    try:
        t = _transcripts(spark, sf_dir)
        t.write.parquet(f"{tmp}/transcripts")
        t.write.mode("append").parquet(f"{tmp}/transcripts")
        st = stream_transcripts(spark, f"{tmp}/transcripts")
        q = (
            dedup_stream(st)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_dedup")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(
            "SELECT conv_id, COUNT(*) AS n_turns FROM stream_dedup "
            "GROUP BY conv_id ORDER BY conv_id"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_cube_rollup(spark, sf_dir):
    """GROUP BY CUBE over (event_type, epoch-day)
    (operators/events.cube_rollup): every grouping set -- cell, both
    margins, grand total -- in one map-side-expanded pass; NULL
    dimension = the rolled-up margin, exactly the SQL CUBE semantics."""
    from parconnect_spark.operators.events import cube_rollup

    _views(spark, sf_dir, ("events",))
    return cube_rollup(spark.table("events")).orderBy("event_type", "day")


def _q_streaming_enriched(spark, sf_dir):
    """STREAMING stream-static enrichment join
    (streaming/stream.enriched_edge_stream): the turn stream joins a
    static broadcast entity dimension with no state -- the seventh
    stream-equals-batch shape (lookup tables on the streaming path).
    End-of-stream per-entity counts equal the batch join."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from parconnect_spark.streaming.stream import (
        enriched_edge_stream,
        stream_transcripts,
    )

    tmp = tempfile.mkdtemp(prefix="stream_en_")
    try:
        t = _transcripts(spark, sf_dir)
        t.write.parquet(f"{tmp}/transcripts")
        ent = F.when(
            F.col("tool").isNotNull(), F.concat(F.lit("t:"), F.col("tool"))
        ).otherwise(F.concat(F.lit("r:"), F.col("role")))
        dim = (
            t.select(ent.alias("entity"))
            .distinct()
            .withColumn("attr", F.length("entity"))
        )
        st = stream_transcripts(spark, f"{tmp}/transcripts")
        q = (
            enriched_edge_stream(st, dim)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_enriched")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(
            "SELECT entity, attr, COUNT(*) AS n FROM stream_enriched "
            "GROUP BY entity, attr ORDER BY entity"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_streaming_sessions(spark, sf_dir):
    """STREAMING gap sessionization (streaming/stream.session_stream —
    applyInPandasWithState keyed by user_id, the canonical custom stateful
    operator): events snapshot → file stream → per-session emissions →
    max_by(stats, n_events) read-back. The oracle is the batch `sessions`
    SQL — the third stream≡batch contract (row derivation, incremental
    aggregation, and now custom session state)."""
    import shutil
    import tempfile

    from parconnect_spark.streaming.stream import session_stream, stream_events

    _views(spark, sf_dir, ("events",))
    tmp = tempfile.mkdtemp(prefix="stream_sess_")
    try:
        spark.table("events").write.parquet(f"{tmp}/events")
        st = stream_events(spark, f"{tmp}/events")
        q = (
            session_stream(st, gap_seconds=SESSION_GAP_SECONDS)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_sessions")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(
            """SELECT user_id, session_idx, s.n_events, s.first_event,
                      s.last_event, s.duration_sec,
                      ROUND(s.sum_value, 4) AS sum_value
               FROM (
                 SELECT user_id, session_idx,
                        max_by(struct(n_events, first_event, last_event,
                                      duration_sec, sum_value), n_events) AS s
                 FROM stream_sessions GROUP BY user_id, session_idx)
               ORDER BY user_id, session_idx"""
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_zorder_events(spark, sf_dir):
    """Z-order (Morton) layout key over events (operators/layout): bits
    of the quantized (user_id, unix_micros(ts)) pair interleaved into one
    long, integer arithmetic end to end (fixed-bounds binning with `div`,
    shift/and/or interleave -- no floats), so the DuckDB oracle replays it
    bit-for-bit with `//`. Range-partitioning on this key gives every
    output file a tight min/max footprint on BOTH dims at once -- the
    multi-dimensional file-pruning layout (Delta/Iceberg ZORDER BY
    semantics) that one-dimensional sorting cannot provide."""
    import pyspark.sql.functions as F

    from parconnect_spark.operators.layout import zorder_key

    _views(spark, sf_dir, ("events",))
    ev = spark.table("events").withColumn(
        "tsu", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    return (
        zorder_key(ev, ["user_id", "tsu"], bits=16)
        .select("event_id", "zval")
        .orderBy("event_id")
    )


def _q_bucketed_join(spark, sf_dir):
    """Shuffle-free co-located join via bucketed table layout
    (sources/bucketed): events and a per-user dimension written with the
    SAME bucket count on user_id join bucket-to-bucket with zero
    Exchange (pytest asserts the plan property; this contract entry pins
    that the layout changes the plan, never the answer). Output: per-user
    event count x distinct event types."""
    import tempfile

    import pyspark.sql.functions as F

    from parconnect_spark.sources.bucketed import bucketed_join, write_bucketed

    _views(spark, sf_dir, ("events",))
    ev = spark.table("events").select("user_id", "event_type")
    dim = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )
    write_bucketed(
        ev, "q_ev_bucketed", "user_id", 8, path=tempfile.mkdtemp()
    )
    write_bucketed(
        dim, "q_dim_bucketed", "user_id", 8, path=tempfile.mkdtemp()
    )
    return (
        bucketed_join(spark, "q_ev_bucketed", "q_dim_bucketed", "user_id")
        .groupBy("user_id", "n_types")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events", "n_types")
        .orderBy("user_id")
    )


def _q_merge_upsert(spark, sf_dir):
    """Latest-wins CDC upsert merge (operators/merge.merge_upsert): a
    derived change batch (every 10th event re-stamped one hour later
    with doubled value, plus synthetic inserts above the max id) merges
    into events on event_id; base rows untouched by the batch pass
    through an anti-join verbatim, winners resolve in a window over the
    touched sliver only. Update wins order_col ties by the CDC
    convention."""
    import pyspark.sql.functions as F

    from parconnect_spark.operators.merge import merge_upsert

    _views(spark, sf_dir, ("events",))
    ev = spark.table("events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    upd = ev.where("event_id % 10 = 0").select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        "user_id",
        "event_type",
        (F.col("value") * 2).alias("value"),
    )
    merged = merge_upsert(ev, upd, ["event_id"], "ts")
    return merged.select(
        "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
    ).orderBy("event_id")


def _q_adoption(spark, sf_dir):
    """First-seen daily adoption curve (operators/events.adoption_curve):
    new users per UTC epoch-day plus the running cumulative -- "running
    distinct" computed with NO running state: per-user MIN day, per-day
    census, and the cumulative window runs over the tiny DAY table
    only."""
    from parconnect_spark.operators.events import adoption_curve

    _views(spark, sf_dir, ("events",))
    return adoption_curve(spark.table("events")).orderBy("day")


def _q_type_correlations(spark, sf_dir):
    """Behavioral correlation matrix (operators/events.type_correlations):
    pairwise Pearson over per-user total value of each fixed event type
    (missing type counts 0.0, every user in every pair). One pivot
    aggregate + one corr-aggregate pass; nothing scales with user count
    beyond two aggregates."""
    from parconnect_spark.operators.events import type_correlations

    _views(spark, sf_dir, ("events",))
    return type_correlations(
        spark.table("events"),
        ["click", "error", "purchase", "signup", "view"],
    ).orderBy("type_a", "type_b")


def _q_conversation_features(spark, sf_dir):
    """Per-conversation feature vector (operators/derive.
    conversation_features) straight off the input_hint table: turn/role/
    tool counts, char totals and ratios, longest inter-turn gap. One
    groupBy of conditional aggregates; the only window is the bounded
    per-conversation lag for the gap."""
    from parconnect_spark.operators.derive import conversation_features

    t = _transcripts(spark, sf_dir)
    return conversation_features(t).orderBy("conv_id")


def _q_dq_report(spark, sf_dir):
    """Data-quality expectations report (operators/dq.dq_report) over
    the ingest tables: uniqueness/not-null on documents, allow-list on
    event types, referential events.user_id -> customer.c_custkey (a
    broadcast anti-join). One aggregate or anti-join per check; the
    report row set is the publish gate."""
    from parconnect_spark.operators.dq import dq_report

    _views(spark, sf_dir, ("events", "documents"))
    docs = spark.table("documents")
    ev = spark.table("events")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return dq_report(
        [
            ("documents", docs, "unique", "doc_id"),
            ("documents", docs, "not_null", "text"),
            ("events", ev, "not_null", "value"),
            (
                "events",
                ev,
                "accepted_values",
                "event_type",
                ["click", "error", "purchase", "signup", "view"],
            ),
            ("events", ev, "referential", "user_id", (cust, "c_custkey")),
        ]
    ).orderBy("table", "check", "column")


def _q_table_stats(spark, sf_dir):
    """ANALYZE-style per-column statistics (sources/tables.table_stats)
    of the events table in ONE aggregate pass: null counts, exact
    distinct counts, stringified min/max -- the numbers broadcast gates,
    bucket sizing, and zorder bounds start from."""
    from parconnect_spark.sources.tables import table_stats

    _views(spark, sf_dir, ("events",))
    ev = spark.table("events").select(
        "event_id", "user_id", "event_type"
    )
    return table_stats(ev).orderBy("column")


def _q_scd2(spark, sf_dir):
    """Type-2 SCD history build (operators/merge.scd2_build) from the
    events feed: per user, the run-length history of event_type with
    validity intervals [valid_from, valid_to) in epoch-us; consecutive
    unchanged states collapse (idempotent feeds). Ordering tie-broken by
    event_id -- determinism is the caller's contract and the oracle
    replays the identical order."""
    import pyspark.sql.functions as F

    from parconnect_spark.operators.merge import scd2_build

    _views(spark, sf_dir, ("events",))
    ch = spark.table("events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
        "event_id",
        "event_type",
    )
    return (
        scd2_build(ch, ["user_id"], ["tsu", "event_id"], ["event_type"])
        .select("user_id", "event_type", "valid_from", "valid_to")
        .orderBy("user_id", "valid_from")
    )


def _q_temporal_reach(spark, sf_dir):
    """Time-respecting earliest-arrival reachability
    (plans/temporal.earliest_arrival over operators/derive.
    derive_temporal_edges): from r:user, the earliest epoch-us at which
    a non-time-decreasing transition path reaches each entity -- the
    temporal-graph semantics static CC/BFS overstate (they walk
    backwards in time). Label-correcting min fixpoint, checksum
    convergence; the oracle is a recursive (vertex, time) state
    exploration."""
    from parconnect_spark.operators.derive import derive_temporal_edges
    from parconnect_spark.plans.temporal import earliest_arrival

    t = _transcripts(spark, sf_dir)
    te = derive_temporal_edges(t)
    return earliest_arrival(te, "r:user").orderBy("v")


def _q_centroid_drift(spark, sf_dir):
    """Per-label embedding centroid cosines
    (functions/similarity.label_centroid_drift): the drift /
    cluster-separation monitor. Centroids are one posexplode mean whose
    key space is |labels| x dim (row-count independent); the pairwise
    step runs on the collected centroid table -- labels are a dimension,
    not data."""
    from parconnect_spark.functions.similarity import label_centroid_drift

    _views(spark, sf_dir, ("embeddings",))
    return label_centroid_drift(spark.table("embeddings")).orderBy(
        "label_a", "label_b"
    )


def _q_conversation_paths(spark, sf_dir):
    """Top-20 conversation flow patterns (operators/derive.
    conversation_paths): each conversation's ordered entity sequence as
    one path string, counted corpus-wide. The collect_list is grouped
    by CONVERSATION -- bounded by turns per conversation, the one safe
    place to collect -- and the top-k is a TakeOrdered, not a window."""
    from parconnect_spark.operators.derive import conversation_paths

    t = _transcripts(spark, sf_dir)
    return conversation_paths(t, top_k=20)


def _q_jsonl_ingest(spark, sf_dir):
    """JSONL ingestion with corrupt-record accounting
    (sources/jsonl.read_transcripts_jsonl): the transcripts round-trip
    through JSON lines with three garbage lines injected; PERMISSIVE
    parsing quarantines them without aborting or silently swallowing.
    Output: per-conversation clean-row counts plus one ('__corrupt__',
    n) audit row -- equal to the batch table plus exactly the injected
    garbage."""
    import shutil
    import tempfile

    from parconnect_spark.sources.jsonl import read_transcripts_jsonl

    tmp = tempfile.mkdtemp(prefix="jsonl_")
    try:
        t = _transcripts(spark, sf_dir)
        t.write.json(f"{tmp}/jl")
        with open(f"{tmp}/jl/part-garbage.json", "w") as fh:
            fh.write(
                "this is not json\n"
                '{"role": "user", "text": "no conv id"}\n'
                "{broken\n"
            )
        clean, corrupt = read_transcripts_jsonl(spark, f"{tmp}/jl")
        # materialize BEFORE the tmp dir is removed: the returned frame
        # must not lazily re-read deleted files when the driver collects
        rows = sorted(
            (r["conv_id"], r["n"])
            for r in clean.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        rows.append(("__corrupt__", corrupt.count()))
        return spark.createDataFrame(
            rows, "conv_id string, n long"
        ).orderBy("conv_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _q_transition_latency(spark, sf_dir):
    """Exact response-latency percentiles per entity transition
    (operators/derive.transition_latency): p50/p95 of the inter-turn
    gap in whole seconds, rank arithmetic over the per-(pair, gap)
    COUNT table (bounded by distinct gap values, not turns) -- the
    per-edge latency SLO readout, query #150 of the contract."""
    from parconnect_spark.operators.derive import transition_latency

    t = _transcripts(spark, sf_dir)
    return transition_latency(t).orderBy("a", "b")


def _q_readability(spark, sf_dir):
    """Flesch-style readability (functions/text.readability_features):
    words/sentences/vowel-group syllables from deterministic regex
    proxies (the declared metric, same stance as the language-ID
    heuristic) -- one narrow zero-shuffle projection."""
    from parconnect_spark.functions.text import readability_features

    _views(spark, sf_dir, ("documents",))
    return (
        readability_features(spark.table("documents"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def _q_markov_stationary(spark, sf_dir):
    """Stationary distribution of the per-user event-type Markov chain
    (operators/events.markov_stationary): distributed transition counts
    (bounded per-user lag), row-normalized, 16 closed-form chain
    iterations over the |types|^2 table -- the long-run behavioral
    mix."""
    from parconnect_spark.operators.events import markov_stationary

    _views(spark, sf_dir, ("events",))
    return markov_stationary(spark.table("events")).orderBy("event_type")


def _q_activity_gini(spark, sf_dir):
    """Gini coefficient of per-user event counts
    (operators/events.activity_gini): exact closed form over the
    ascending (count, user) total order -- the activity-concentration
    readout."""
    from parconnect_spark.operators.events import activity_gini

    _views(spark, sf_dir, ("events",))
    return activity_gini(spark.table("events"))


def _q_seasonality(spark, sf_dir):
    """Day-of-week chi-square per event type
    (operators/events.dow_seasonality): epoch-derived weekday (0 =
    Thursday, calendar-free), zero-count weekdays kept via the 7-row
    grid so the statistic is honest."""
    from parconnect_spark.operators.events import dow_seasonality

    _views(spark, sf_dir, ("events",))
    return dow_seasonality(spark.table("events")).orderBy("event_type")


def _q_schema_contract(spark, sf_dir):
    """Schema-contract diff (operators/dq.schema_diff) of the events
    table against its declared DDL plus one deliberately-wrong clause
    (value as string, props uncontracted) so every status is
    exercised -- pure metadata, no job runs."""
    from parconnect_spark.operators.dq import schema_diff

    _views(spark, sf_dir, ("events",))
    return schema_diff(
        spark.table("events"),
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value string, missing_col int",
    ).orderBy("column")


def _q_temporal_split(spark, sf_dir):
    """Leave-last-out temporal split (operators/events.
    leave_last_out_split): per-user last event to test, rest to train --
    the leakage-free next-event evaluation split. Output: per-split
    counts plus distinct users per split."""
    import pyspark.sql.functions as F

    from parconnect_spark.operators.events import leave_last_out_split

    _views(spark, sf_dir, ("events",))
    out = leave_last_out_split(spark.table("events"))
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("split")
    )


def _q_survival(spark, sf_dir):
    """User-lifetime survival curve (operators/events.survival_curve):
    S(d) = fraction of users whose last activity is >= d days after
    their first; cumulative over the lifetime histogram (bounded by
    distinct lifetimes)."""
    from parconnect_spark.operators.events import survival_curve

    _views(spark, sf_dir, ("events",))
    return survival_curve(spark.table("events")).orderBy("day")


def _q_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap CI for the mean event value
    (operators/dq.poisson_bootstrap_mean): per-replicate Poisson(1)
    weights from a seeded md5 stream through the inverse CDF (truncated
    at 8, P < 1.1e-5, declared) -- the distributed bootstrap that needs
    no per-replicate shuffle. Reproducible by seed; the oracle replays
    the identical weight stream."""
    from parconnect_spark.operators.dq import poisson_bootstrap_mean

    _views(spark, sf_dir, ("events",))
    return poisson_bootstrap_mean(
        spark.table("events"), "value", n_resamples=32, id_col="event_id"
    )


def _q_events_rollup(spark, sf_dir):
    _views(spark, sf_dir, ("events",))
    return (
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("event_type")
    )


def _q_events_hopping(spark, sf_dir):
    """Hopping (overlapping) window rollup (operators/events.hopping_rollup):
    24 h windows every 12 h, so each event lands in exactly two — the
    sliding-aggregation shape a tumbling GROUP BY can't express. One
    2-row explode + one map-side-combined aggregate; window membership is
    pure int64 µs arithmetic, bit-identical to the oracle's."""
    from parconnect_spark.operators.events import hopping_rollup

    _views(spark, sf_dir, ("events",))
    out = hopping_rollup(
        spark.table("events"),
        size_us=HOP_SIZE_US,
        slide_us=HOP_SLIDE_US,
    )
    return out.orderBy("window_start_us", "event_type")


def _q_retention(spark, sf_dir):
    """Weekly retention cohorts (operators/events.retention_cohorts):
    distinct (user, week) activity + a self equi-join against the
    previous week — exact counts, int64 µs bucket arithmetic, the rate is
    the one rounded double (NULL where no predecessor bucket exists)."""
    from parconnect_spark.operators.events import retention_cohorts

    _views(spark, sf_dir, ("events",))
    out = retention_cohorts(
        spark.table("events"), bucket_us=RETENTION_BUCKET_US
    )
    return out.orderBy("bucket_start_us")


def _q_funnel(spark, sf_dir):
    """First-touch funnel (operators/events.funnel): signup → view →
    click → purchase, each step strictly after the previous step's
    earliest qualifying event and within 7 days of the signup anchor.
    K−1 shrinking equi-joins + MIN aggregates — no per-user ordered
    window; all time arithmetic exact int64 µs."""
    from parconnect_spark.operators.events import funnel

    _views(spark, sf_dir, ("events",))
    out = funnel(
        spark.table("events"),
        steps=FUNNEL_STEPS,
        within_seconds=FUNNEL_WITHIN_S,
    )
    return out.orderBy("step_idx")


def _q_dup_spans(spark, sf_dir):
    """Cross-document duplicated 8-gram span statistics
    (functions/dedup.duplicated_spans) — the substring-level dedup signal
    document-level MinHash misses. Exact per-doc occurrence and
    coverage counts; the two ratios are the only doubles."""
    from parconnect_spark.functions.dedup import duplicated_spans

    _views(spark, sf_dir, ("documents",))
    return duplicated_spans(
        spark.table("documents"), n=DUPSPAN_N, min_docs=DUPSPAN_MIN_DOCS
    ).orderBy("doc_id")


def _q_lm_score(spark, sf_dir):
    """Per-document NLL under the corpus's own bigram LM
    (functions/text.lm_score) — the CCNet-style perplexity quality
    filter. ``nll6`` is the exact int64 Σ of per-bigram
    round(−ln(p)·10^6) (the tfidf integer-ranking discipline), ``ppl``
    the one derived double."""
    from parconnect_spark.functions.text import lm_score

    _views(spark, sf_dir, ("documents",))
    return lm_score(spark.table("documents")).orderBy("doc_id")


def _q_sessions(spark, sf_dir):
    """Gap-based sessionization rollup (operators/events.session_rollup):
    one hash shuffle on user_id, one ordered window pass (lag → gap flag →
    running sum), one co-partitioned aggregate. Integer-microsecond gap
    arithmetic keeps the session boundaries bit-identical to the oracle."""
    from parconnect_spark.operators.events import session_rollup

    _views(spark, sf_dir, ("events",))
    return session_rollup(
        spark.table("events"), gap_seconds=SESSION_GAP_SECONDS
    ).orderBy("user_id", "session_idx")


def _q_events_asof(spark, sf_dir):
    """Backward as-of join (operators/events.asof_join): each click gains
    the most recent error by the same user at-or-before it. The right side
    is pre-deduped to one row per (user, ts) — the same contract DuckDB's
    native ASOF JOIN (the oracle) assumes. Union-and-window plan: ONE hash
    shuffle, no range join."""
    from parconnect_spark.operators.events import asof_join

    _views(spark, sf_dir, ("events",))
    ev = spark.table("events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_event"))
    )
    j = asof_join(
        clicks, errors, on="user_id", right_cols=["err_event", "ts"]
    )
    return j.select(
        "event_id",
        "user_id",
        "err_event_r",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_r").cast("timestamp"))
        ).alias("lag_us"),
    ).orderBy("event_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "derived_edges": _q_derived_edges,
        "relabel_map": _q_relabel_map,
        "text_invariant": _q_text_invariant,
        "degree_histogram": _q_degree_histogram,
        "cc_labels": _q_cc_labels,
        "cc_labels_local_contract": _q_cc_labels_local_contract,
        "cc_labels_salted_fused": _q_cc_labels_salted_fused,
        "cc_incremental": _q_cc_incremental,
        "cc_temporal": _q_cc_temporal,
        "temporal_reach": _q_temporal_reach,
        "centroid_drift": _q_centroid_drift,
        "pca_projection": _q_pca_projection,
        "jl_projection": _q_jl_projection,
        "range_splits": _q_range_splits,
        "graph_diff": _q_graph_diff,
        "cc_stats": _q_cc_stats,
        "hub_knockout": _q_hub_knockout,
        "negative_samples": _q_negative_samples,
        "snowball": _q_snowball,
        "cc_chains": _q_cc_chains,
        "cc_kronecker": _q_cc_kronecker,
        "cc_hybrid": _q_cc_hybrid,
        "bfs_chain": _q_bfs_chain,
        "bfs_distances": _q_bfs_distances,
        "harmonic_centrality": _q_harmonic_centrality,
        "closeness": _q_closeness,
        "betweenness": _q_betweenness,
        "sssp": _q_sssp,
        "msf": _q_msf,
        "graph_sparsify": _q_graph_sparsify,
        "partition_stats": _q_partition_stats,
        "mis": _q_mis,
        "coloring": _q_coloring,
        "wl_refinement": _q_wl_refinement,
        "dag_layers": _q_dag_layers,
        "anf": _q_anf,
        "louvain": _q_louvain,
        "matching": _q_matching,
        "densest": _q_densest,
        "bipartite_cooccur": _q_bipartite_cooccur,
        "frequent_itemsets": _q_frequent_itemsets,
        "association_rules": _q_association_rules,
        "k_anonymity": _q_k_anonymity,
        "dp_counts": _q_dp_counts,
        "bootstrap_ci": _q_bootstrap_ci,
        "ab_test": _q_ab_test,
        "changepoint": _q_changepoint,
        "forecast": _q_forecast,
        "markov_stationary": _q_markov_stationary,
        "activity_gini": _q_activity_gini,
        "seasonality": _q_seasonality,
        "schema_contract": _q_schema_contract,
        "temporal_split": _q_temporal_split,
        "survival": _q_survival,
        "landmark_distances": _q_landmark_distances,
        "pseudo_diameter": _q_pseudo_diameter,
        "bfs_chain_csr": _q_bfs_chain_csr,
        "pagerank": _q_pagerank,
        "rank_corr": _q_rank_corr,
        "pagerank_seeded": _q_pagerank_seeded,
        "pagerank_weighted": _q_pagerank_weighted,
        "scc": _q_scc,
        "hits": _q_hits,
        "eigencentrality": _q_eigencentrality,
        "katz": _q_katz,
        "link_prediction": _q_link_prediction,
        "kcore": _q_kcore,
        "coreness": _q_coreness,
        "ktruss": _q_ktruss,
        "graph_walks": _q_graph_walks,
        "walk_pairs": _q_walk_pairs,
        "labelprop_min": _q_labelprop_min,
        "labelprop_majority": _q_labelprop_majority,
        "modularity": _q_modularity,
        "conductance": _q_conductance,
        "community_graph": _q_community_graph,
        "triangle_count": _q_triangle_count,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "vertex_features": _q_vertex_features,
        "assortativity": _q_assortativity,
        "transitivity": _q_transitivity,
        "butterflies": _q_butterflies,
        "turn_dedup": _q_turn_dedup,
        "reciprocity": _q_reciprocity,
        "rich_club": _q_rich_club,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram": _q_dedup_ngram,
        "dedup_prefix": _q_dedup_prefix,
        "blocklist_filter": _q_blocklist_filter,
        "curation_funnel": _q_curation_funnel,
        "doc_chunks": _q_doc_chunks,
        "incremental_dedup": _q_incremental_dedup,
        "inverted_index": _q_inverted_index,
        "bm25": _q_bm25,
        "readability": _q_readability,
        "hybrid_rank": _q_hybrid_rank,
        "language_confusion": _q_language_confusion,
        "ks_drift": _q_ks_drift,
        "token_entropy": _q_token_entropy,
        "transition_entropy": _q_transition_entropy,
        "tpch_pricing": _q_tpch_pricing,
        "tpch_priority": _q_tpch_priority,
        "tpch_region_revenue": _q_tpch_region_revenue,
        "tpch_custdist": _q_tpch_custdist,
        "fuzzy_terms": _q_fuzzy_terms,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_clusters": _q_dedup_clusters,
        "dup_spans": _q_dup_spans,
        "dedup_embedding": _q_dedup_embedding,
        "quality_features": _q_quality_features,
        "language_id": _q_language_id,
        "contamination": _q_contamination,
        "stratified_sample": _q_stratified_sample,
        "leakage_split": _q_leakage_split,
        "media_features": _q_media_features,
        "media_frames": _q_media_frames,
        "token_stats": _q_token_stats,
        "tfidf_topk": _q_tfidf,
        "bigram_lm": _q_bigram_lm,
        "lm_score": _q_lm_score,
        "repetition_stats": _q_repetition_stats,
        "redact": _q_redact,
        "sample_k": _q_sample_k,
        "weighted_sample": _q_weighted_sample,
        "quality_trim": _q_quality_trim,
        "group_trim": _q_group_trim,
        "sequence_pack": _q_sequence_pack,
        "collocations": _q_collocations,
        "source_overlap": _q_source_overlap,
        "embedding_clusters": _q_embedding_clusters,
        "embedding_gram": _q_embedding_gram,
        "quantize": _q_quantize,
        "kmeans": _q_kmeans,
        "sketch_counts": _q_sketch_counts,
        "sketch_distinct": _q_sketch_distinct,
        "sketch_rolling": _q_sketch_rolling,
        "heavy_hitters": _q_heavy_hitters,
        "graph_summary": _q_graph_summary,
        "profile": _q_profile,
        "trending_terms": _q_trending_terms,
        "term_bursts": _q_term_bursts,
        "streaming_edges": _q_streaming_edges,
        "streaming_degrees": _q_streaming_degrees,
        "streaming_sessions": _q_streaming_sessions,
        "streaming_terms": _q_streaming_terms,
        "streaming_seq_join": _q_streaming_seq_join,
        "streaming_dedup": _q_streaming_dedup,
        "streaming_enriched": _q_streaming_enriched,
        "similarity_topk": _q_similarity_topk,
        "neighbor_agg": _q_neighbor_agg,
        "similarity_lsh": _q_similarity_lsh,
        "ann_recall": _q_ann_recall,
        "ivf_recall": _q_ivf_recall,
        "similarity_ivf": _q_similarity_ivf,
        "zorder_events": _q_zorder_events,
        "bucketed_join": _q_bucketed_join,
        "merge_upsert": _q_merge_upsert,
        "scd2": _q_scd2,
        "conversation_features": _q_conversation_features,
        "conversation_paths": _q_conversation_paths,
        "transition_latency": _q_transition_latency,
        "jsonl_ingest": _q_jsonl_ingest,
        "dq_report": _q_dq_report,
        "table_stats": _q_table_stats,
        "publish_audit": _q_publish_audit,
        "adoption": _q_adoption,
        "type_correlations": _q_type_correlations,
        "cube_rollup": _q_cube_rollup,
        "events_rollup": _q_events_rollup,
        "events_hopping": _q_events_hopping,
        "retention": _q_retention,
        "sessions": _q_sessions,
        "funnel": _q_funnel,
        "events_asof": _q_events_asof,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _zorder_events_oracle(bits: int = 16) -> str:
    """Replays operators/layout.zorder_key bit-for-bit: bounds = exact
    min/max of the data (the query's auto-bounds path), binning = long
    floor division, interleave = 2*bits shift/and/or terms."""
    terms = []
    for j, (v, lo, hi) in enumerate(
        (("user_id", "lo0", "hi0"), ("tsu", "lo1", "hi1"))
    ):
        b = f"((({v} - {lo}) * {1 << bits}) // ({hi} - {lo} + 1))"
        for i in range(bits):
            terms.append(f"((({b} >> {i}) & 1) << {i * 2 + j})")
    expr = " | ".join(terms)
    return f"""
WITH b AS (
  SELECT MIN(user_id) AS lo0, MAX(user_id) AS hi0,
         MIN(epoch_us(ts)) AS lo1, MAX(epoch_us(ts)) AS hi1
  FROM events
),
e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu FROM events)
SELECT event_id, CAST({expr} AS BIGINT) AS zval
FROM e, b ORDER BY event_id"""


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    sql = _GRAPH_PREFIX + """,
deg AS (SELECT src AS v, 1.0 / COUNT(*) AS w FROM edges GROUP BY src),
nv AS (SELECT COUNT(*) AS n FROM ids),
r0 AS (SELECT id AS v, 1.0 / nv.n AS rank FROM ids CROSS JOIN nv)"""
    for k in range(1, iters + 1):
        sql += f""",
r{k} AS (
  SELECT i.id AS v, (1.0 - 0.85) / nv.n + 0.85 * COALESCE(c.s, 0.0) AS rank
  FROM ids i CROSS JOIN nv
  LEFT JOIN (
    SELECT e.dst AS v, SUM(r.rank * d.w) AS s
    FROM edges e JOIN r{k-1} r ON e.src = r.v JOIN deg d ON d.v = e.src
    GROUP BY e.dst
  ) c ON c.v = i.id
)"""
    sql += (
        f"\nSELECT i.name AS name, ROUND(r.rank, 6) AS rank"
        f" FROM r{iters} r JOIN ids i ON i.id = r.v ORDER BY name"
    )
    return sql


def _ppr_oracle(iters: int = PR_ITERS) -> str:
    """Unrolled personalized PageRank: restart vector p = uniform over the
    two lexicographically-smallest t: entities, rank_0 = p, teleport AND
    (vacuously, on the symmetric graph) dangling mass weighted by p. Same
    linear CTE-expansion discipline as _pagerank_oracle."""
    sql = _GRAPH_PREFIX + """,
deg AS (SELECT src AS v, 1.0 / COUNT(*) AS w FROM edges GROUP BY src),
seeds AS (SELECT id FROM ids WHERE name LIKE 't:%' ORDER BY name LIMIT 2),
ns AS (SELECT COUNT(*) AS n FROM seeds),
pv AS (
  SELECT i.id AS v, CASE WHEN s.id IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END AS p
  FROM ids i CROSS JOIN ns LEFT JOIN seeds s ON s.id = i.id
),
r0 AS (SELECT v, p AS rank FROM pv)"""
    for k in range(1, iters + 1):
        sql += f""",
r{k} AS (
  SELECT pv.v AS v, (1.0 - 0.85) * pv.p + 0.85 * COALESCE(c.s, 0.0) AS rank
  FROM pv LEFT JOIN (
    SELECT e.dst AS v, SUM(r.rank * d.w) AS s
    FROM edges e JOIN r{k-1} r ON e.src = r.v JOIN deg d ON d.v = e.src
    GROUP BY e.dst
  ) c ON c.v = pv.v
)"""
    sql += (
        f"\nSELECT i.name AS name, ROUND(r.rank, 6) AS rank"
        f" FROM r{iters} r JOIN ids i ON i.id = r.v ORDER BY name"
    )
    return sql


def _wpr_oracle(iters: int = PR_ITERS) -> str:
    """Unrolled WEIGHTED PageRank on the directed multiplicity graph.
    Every r{k} references r{k-1} TWICE (dangling-mass subquery + weighted
    contribution sum), so all iteration CTEs are AS MATERIALIZED — the
    kcore-oracle discipline; plain CTEs would inline 2^iters times."""
    sql = _GRAPH_PREFIX + """,
wd AS MATERIALIZED (
  SELECT s.id AS src, d.id AS dst, CAST(COUNT(*) AS DOUBLE) AS wt
  FROM pairs p JOIN ids s ON p.a = s.name JOIN ids d ON p.b = d.name
  WHERE p.a <> p.b GROUP BY s.id, d.id
),
wdeg AS MATERIALIZED (SELECT src AS v, SUM(wt) AS tw FROM wd GROUP BY src),
nv AS (SELECT COUNT(*) AS n FROM ids),
r0 AS MATERIALIZED (SELECT id AS v, 1.0 / nv.n AS rank FROM ids CROSS JOIN nv)"""
    for k in range(1, iters + 1):
        sql += f""",
r{k} AS MATERIALIZED (
  SELECT i.id AS v,
         (1.0 - 0.85) / nv.n + 0.85 * (COALESCE(c.s, 0.0) + dg.m / nv.n) AS rank
  FROM ids i CROSS JOIN nv
  CROSS JOIN (
    SELECT COALESCE(SUM(r.rank), 0.0) AS m
    FROM r{k - 1} r LEFT JOIN wdeg w ON w.v = r.v WHERE w.v IS NULL
  ) dg
  LEFT JOIN (
    SELECT e.dst AS v, SUM(r.rank * e.wt / w.tw) AS s
    FROM wd e JOIN r{k - 1} r ON e.src = r.v JOIN wdeg w ON w.v = e.src
    GROUP BY e.dst
  ) c ON c.v = i.id
)"""
    sql += (
        f"\nSELECT i.name AS name, ROUND(r.rank, 6) AS rank"
        f" FROM r{iters} r JOIN ids i ON i.id = r.v ORDER BY name"
    )
    return sql


def _partition_stats_oracle(n_parts: int = 8) -> str:
    h = _md5int_duck("'part:' || CAST(v AS VARCHAR)")
    return _GRAPH_PREFIX + f""",
pe AS (
  SELECT {h.replace("v", "e.src")} % {n_parts} AS pa,
         {h.replace("v", "e.dst")} % {n_parts} AS pb
  FROM edges e
),
tot AS (
  SELECT COUNT(*) AS n_edges,
         SUM(CASE WHEN pa <> pb THEN 1 ELSE 0 END) AS cut_edges
  FROM pe
),
el AS (SELECT pa, COUNT(*) AS n FROM pe GROUP BY pa),
ei AS (SELECT MAX(n) * 1.0 / AVG(n) AS edge_imbalance FROM el),
pv AS (SELECT {h.replace("v", "i.id")} % {n_parts} AS p FROM ids i),
nv AS (SELECT COUNT(*) AS n_vertices FROM pv),
vl AS (SELECT p, COUNT(*) AS n FROM pv GROUP BY p),
vi AS (SELECT MAX(n) * 1.0 / AVG(n) AS vertex_imbalance FROM vl)
SELECT CAST({n_parts} AS INT) AS n_parts,
       nv.n_vertices, tot.n_edges, tot.cut_edges,
       ROUND(tot.cut_edges * 1.0 / tot.n_edges, 6) AS cut_frac,
       ROUND(vi.vertex_imbalance, 6) AS vertex_imbalance,
       ROUND(ei.edge_imbalance, 6) AS edge_imbalance
FROM tot, nv, vi, ei"""


def _incremental_dedup_oracle(
    threshold: float = 0.6, k: int = 32, bands: int = 8
) -> str:
    """Replays incremental_dedup: fingerprint semi-join for exact, the
    _minhash_oracle signature/banding scheme restricted to new x corpus
    candidates, exact-Jaccard verify, best match by (jaccard DESC, id)."""
    from parconnect_spark.functions.dedup import _M31, _PERM_P, _minhash_perm_coeffs

    h = _md5int_duck("s") + f" % {_M31}"
    mins = ", ".join(
        f"MIN((h * {a} + {b}) % {_PERM_P}) AS m{i}"
        for i, (a, b) in enumerate(_minhash_perm_coeffs(k))
    )
    rows = k // bands
    band_keys = ",\n    ".join(
        "(" + str(bnd) + ", "
        + " || ',' || ".join(
            f"CAST(m{bnd * rows + r} AS VARCHAR)" for r in range(rows)
        )
        + ")"
        for bnd in range(bands)
    )
    return f"""
WITH {_DUCK_SHINGLES},
newd AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
corp AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 0),
fps AS (
  SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
  FROM documents
),
exact AS (
  SELECT fn.doc_id FROM newd n JOIN fps fn ON fn.doc_id = n.doc_id
  WHERE fn.fp IN (SELECT f.fp FROM fps f JOIN corp c ON f.doc_id = c.doc_id)
),
hashed AS (SELECT doc_id, {h} AS h FROM sh),
sigs AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
banded AS (
  SELECT doc_id, b.* FROM sigs, LATERAL (VALUES
    {band_keys}
  ) AS b(band, bh)
),
cands AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corp_id
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bh = b.bh
  JOIN newd na ON na.doc_id = a.doc_id
  JOIN corp cb ON cb.doc_id = b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT cd.new_id, cd.corp_id, COUNT(*) AS c
  FROM cands cd
  JOIN sh a ON a.doc_id = cd.new_id
  JOIN sh b ON b.doc_id = cd.corp_id AND b.s = a.s
  GROUP BY 1, 2
),
ver AS (
  SELECT new_id, corp_id,
         ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
  FROM shared
  JOIN sizes sa ON sa.doc_id = new_id
  JOIN sizes sb ON sb.doc_id = corp_id
  WHERE ROUND(c * 1.0 / (sa.n + sb.n - c), 6) >= {threshold}
),
best AS (
  SELECT new_id, corp_id, jaccard,
         ROW_NUMBER() OVER (PARTITION BY new_id
                            ORDER BY jaccard DESC, corp_id) AS rk
  FROM ver
)
SELECT n.doc_id AS id,
       n.doc_id IN (SELECT doc_id FROM exact) AS exact_dup,
       b.corp_id IS NOT NULL AS near_dup,
       b.corp_id AS match_id,
       b.jaccard AS jaccard
FROM newd n
LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.new_id = n.doc_id
ORDER BY id"""


def _negative_samples_oracle(k: int = 3) -> str:
    h = _md5int_duck("'neg:' || CAST(i.id AS VARCHAR) || ':' || CAST(g.g AS VARCHAR)")
    return _GRAPH_PREFIX + f""",
nv AS (SELECT COUNT(*) AS n FROM ids),
cand AS (
  SELECT i.id AS v, g.g AS i, {h} % nv.n AS dst
  FROM ids i, (SELECT unnest(generate_series(1, {2 * k})) AS g) g, nv
),
ne AS (
  SELECT c.v, c.i, c.dst FROM cand c
  WHERE c.v <> c.dst
    AND NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = c.v AND e.dst = c.dst)
),
r AS (
  SELECT v, dst, i,
         ROW_NUMBER() OVER (PARTITION BY v ORDER BY i) AS rk
  FROM ne
)
SELECT v, dst AS neg, CAST(i AS INT) AS draw
FROM r WHERE rk <= {k} ORDER BY v, draw"""


def _dp_counts_oracle(seed: str = "r5") -> str:
    h = _md5int_duck(f"'{seed}:' || CAST(g AS VARCHAR)", 1, 12)
    return f"""
WITH c AS (
  SELECT event_type AS g, COUNT(*) AS n FROM events GROUP BY event_type
),
uu AS (SELECT g, n, ({h} + 0.5) / 281474976710656.0 AS u FROM c)
SELECT g AS "group",
       ROUND(n + CASE WHEN u < 0.5 THEN ln(2 * u)
                      ELSE -ln(2 * (1 - u)) END, 6) AS noisy_count
FROM uu ORDER BY "group" """


def _pca_oracle(iters: int = 8, dim: int = 64) -> str:
    sql = f"""
WITH idx AS (SELECT unnest(generate_series(1, {dim})) AS i),
g AS MATERIALIZED (
  SELECT p.i AS p, q.i AS q,
         SUM(CAST(e.embedding[p.i] AS DOUBLE)
             * CAST(e.embedding[q.i] AS DOUBLE)) AS g
  FROM embeddings e, idx p, idx q GROUP BY p.i, q.i
),
v0 AS (SELECT i.i AS p, 1.0 AS v FROM idx i)"""
    for k in range(1, iters + 1):
        sql += f""",
v{k} AS MATERIALIZED (
  SELECT g.p, SUM(g.g * x.v) AS v FROM g JOIN v{k - 1} x ON x.p = g.q
  GROUP BY g.p
)"""
    sql += f""",
nrm AS (SELECT SQRT(SUM(v * v)) AS n FROM v{iters})
SELECT e.vec_id AS vec_id,
       ROUND(SUM(CAST(e.embedding[vv.p] AS DOUBLE) * vv.v) / MAX(nrm.n), 6)
         AS pc1
FROM embeddings e, v{iters} vv, nrm
GROUP BY e.vec_id ORDER BY vec_id"""
    return sql


def _jl_oracle(out_dim: int = 16, in_dim: int = 64, seed: str = "jl") -> str:
    import math

    inv = 1.0 / math.sqrt(out_dim)
    dims = []
    for j in range(out_dim):
        terms = []
        for i in range(in_dim):
            h = _md5int_duck(f"'{seed}:{j}:{i}'")
            terms.append(
                f"(CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END"
                f" * CAST(embedding[{i + 1}] AS DOUBLE))"
            )
        dims.append(
            f"SELECT vec_id, {j} AS dim, "
            f"ROUND(({' + '.join(terms)}) * {inv!r}, 6) AS y "
            f"FROM embeddings"
        )
    return (
        "SELECT vec_id, CAST(dim AS INT) AS dim, y FROM ("
        + " UNION ALL ".join(dims)
        + ") _ ORDER BY vec_id, dim"
    )


def _markov_oracle(iters: int = 16) -> str:
    sql = """
WITH tr AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS a,
         event_type AS b
  FROM events
),
cnts AS (SELECT a, b, COUNT(*) AS n FROM tr WHERE a IS NOT NULL GROUP BY a, b),
tot AS (SELECT a, SUM(n) AS t FROM cnts GROUP BY a),
pm AS (SELECT c.a, c.b, c.n * 1.0 / tot.t AS pn FROM cnts c JOIN tot ON tot.a = c.a),
types AS (SELECT DISTINCT a AS ty FROM cnts UNION SELECT DISTINCT b FROM cnts),
kk AS (SELECT COUNT(*) AS c FROM types),
p0 AS (SELECT ty, 1.0 / kk.c AS p FROM types, kk)"""
    for k in range(1, iters + 1):
        sql += f""",
p{k} AS (
  SELECT pm.b AS ty, SUM(x.p * pm.pn) AS p
  FROM p{k - 1} x JOIN pm ON pm.a = x.ty GROUP BY pm.b
)"""
    sql += f"""
SELECT ty AS event_type, ROUND(p, 6) AS pi FROM p{iters} ORDER BY event_type"""
    return sql


def _rank_corr_oracle(iters: int = PR_ITERS) -> str:
    """The _pagerank_oracle chain, ended with the total-order rank
    correlation against degree instead of the rank listing."""
    sql = _GRAPH_PREFIX + """,
deg AS (SELECT src AS v, 1.0 / COUNT(*) AS w FROM edges GROUP BY src),
nv AS (SELECT COUNT(*) AS n FROM ids),
r0 AS (SELECT id AS v, 1.0 / nv.n AS rank FROM ids CROSS JOIN nv)"""
    for k in range(1, iters + 1):
        sql += f""",
r{k} AS (
  SELECT i.id AS v, (1.0 - 0.85) / nv.n + 0.85 * COALESCE(c.s, 0.0) AS rank
  FROM ids i CROSS JOIN nv
  LEFT JOIN (
    SELECT e.dst AS v, SUM(r.rank * d.w) AS s
    FROM edges e JOIN r{k - 1} r ON e.src = r.v JOIN deg d ON d.v = e.src
    GROUP BY e.dst
  ) c ON c.v = i.id
)"""
    sql += f""",
dv AS (SELECT src AS v, COUNT(*) * 1.0 AS b FROM edges GROUP BY src),
jj AS (
  SELECT r.v, ROUND(r.rank, 6) AS a, dv.b
  FROM r{iters} r JOIN dv ON dv.v = r.v
),
rk AS (
  SELECT ROW_NUMBER() OVER (ORDER BY a DESC, v) AS ra,
         ROW_NUMBER() OVER (ORDER BY b DESC, v) AS rb
  FROM jj
)
SELECT CAST(COUNT(*) AS BIGINT) AS n, ROUND(corr(ra, rb), 6) AS spearman
FROM rk"""
    return sql


def _snowball_oracle(depth: int = 2, k: int = 3) -> str:
    h = _md5int_duck("'sb:' || CAST(e.dst AS VARCHAR)")
    sql = _GRAPH_PREFIX + """,
l0 AS (SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS level)"""
    vis = "SELECT v FROM l0"
    for i in range(1, depth + 1):
        sql += f""",
c{i} AS (
  SELECT e.dst AS v,
         ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY {h}, e.dst) AS rk
  FROM edges e
  WHERE e.src IN (SELECT v FROM l{i - 1})
    AND e.dst NOT IN ({vis})
),
l{i} AS (
  SELECT DISTINCT v, CAST({i} AS BIGINT) AS level FROM c{i} WHERE rk <= {k}
)"""
        vis += f" UNION SELECT v FROM l{i}"
    sel = " UNION ALL ".join(
        f"SELECT v, level FROM l{i}" for i in range(depth + 1)
    )
    return sql + f"\nSELECT v, level FROM ({sel}) _ ORDER BY level, v"


_TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cosine
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM s
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, CAST(rk AS INT) AS rank
FROM r WHERE rk <= 10 ORDER BY query_id, rank"""


def _ann_recall_oracle() -> str:
    """recall@10 of the LSH path against exact brute force: composes the
    two existing oracles verbatim (each as a nested-WITH CTE body), so
    the harness measures exactly the shipped algorithms."""
    return f"""
WITH ex AS MATERIALIZED ({_TOPK_ORACLE}),
ap AS MATERIALIZED ({_similarity_lsh_oracle()})
SELECT ex.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       ROUND(SUM(CASE WHEN ap.neighbor_id IS NOT NULL
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS recall
FROM ex LEFT JOIN ap
  ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
GROUP BY ex.query_id ORDER BY ex.query_id"""


def _ivf_recall_oracle() -> str:
    return f"""
WITH ex AS MATERIALIZED ({_TOPK_ORACLE}),
ap AS MATERIALIZED ({_similarity_ivf_oracle()})
SELECT ex.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       ROUND(SUM(CASE WHEN ap.neighbor_id IS NOT NULL
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS recall
FROM ex LEFT JOIN ap
  ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
GROUP BY ex.query_id ORDER BY ex.query_id"""


def _bootstrap_oracle(n_resamples: int = 32, seed: str = "boot") -> str:
    from parconnect_spark.operators.dq import _POIS1_CDF

    h = _md5int_duck(
        f"'{seed}:' || CAST(b.b AS VARCHAR) || ':' || CAST(e.event_id AS VARCHAR)",
        1,
        12,
    )
    w = "8"
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = f"CASE WHEN u < {_POIS1_CDF[k]!r} THEN {k} ELSE {w} END"
    # percentile by min-rank over the replicate means, matching the
    # Python sorted-index pick: index ceil(q*B) (1-based)
    import math

    lo_i = max(1, math.ceil(0.025 * n_resamples))
    hi_i = max(1, math.ceil(0.975 * n_resamples))
    return f"""
WITH wts AS (
  SELECT b.b, e.value AS x,
         ({w}) AS w
  FROM events e,
       (SELECT unnest(generate_series(1, {n_resamples})) AS b) b,
       LATERAL (SELECT ({h} + 0.5) / 281474976710656.0 AS u) uu
),
means AS (SELECT b, SUM(w * x) / SUM(w) AS m FROM wts GROUP BY b),
rk AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS r FROM means),
base AS (SELECT COUNT(*) AS n, AVG(value) AS mean FROM events)
SELECT CAST(base.n AS BIGINT) AS n_rows, ROUND(base.mean, 6) AS mean,
       ROUND((SELECT m FROM rk WHERE r = {lo_i}), 6) AS ci_lo,
       ROUND((SELECT m FROM rk WHERE r = {hi_i}), 6) AS ci_hi,
       CAST({n_resamples} AS INT) AS n_resamples
FROM base"""


_BM25_ORACLE = """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
stats AS (SELECT COUNT(*) AS n, AVG(len(t)) AS avg_len FROM base),
toks AS (
  SELECT doc_id, len(t) AS dlen, unnest(t) AS term FROM base
),
tf AS (
  SELECT doc_id, dlen, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('data', 'model', 'join')
  GROUP BY doc_id, dlen, term
),
dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       ROUND(SUM(
         ln(1 + (s.n - dfc.df + 0.5) / (dfc.df + 0.5))
         * (tf.tf * 2.2)
         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dlen / s.avg_len))
       ), 6) AS score
FROM tf JOIN dfc ON dfc.term = tf.term CROSS JOIN stats s
GROUP BY tf.doc_id ORDER BY tf.doc_id"""


def _hybrid_rank_oracle() -> str:
    return f"""
WITH bmr AS MATERIALIZED ({_BM25_ORACLE}),
bma AS (
  SELECT doc_id AS id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bmr
),
qf AS (
  SELECT doc_id, len(toks) AS nt,
         ROUND(len(list_distinct(toks)) * 1.0
               / GREATEST(len(toks), 1), 6) AS dr,
         ROUND(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
               / GREATEST(length(text), 1), 6) AS pr
  FROM (SELECT doc_id, text,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents)
),
qs AS (
  SELECT doc_id,
         ROUND(LEAST(nt / 64.0, 1.0) * 0.4 + dr * 0.4
               + (1 - LEAST(pr * 4, 1.0)) * 0.2, 6) AS quality
  FROM qf
),
qa AS (
  SELECT doc_id AS id,
         ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id) AS r
  FROM qs
),
fused AS (
  SELECT COALESCE(bma.id, qa.id) AS doc_id,
         ROUND(COALESCE(1.0 / (60 + bma.r), 0)
               + COALESCE(1.0 / (60 + qa.r), 0), 6) AS rrf_score
  FROM bma FULL OUTER JOIN qa ON qa.id = bma.id
)
SELECT doc_id, rrf_score,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
         AS fused_rank
FROM fused ORDER BY fused_rank"""


def _eigen_oracle(iters: int = EIGEN_ITERS) -> str:
    """Unrolled power iteration over the symmetric `edges` CTE
    (plans/eigen.py semantics exactly): one propagate + L1 normalize per
    round, isolated vertices 0, SUM() OVER () normalizer for linear CTE
    expansion (see _hits_oracle's inlining note)."""
    sql = _GRAPH_PREFIX + """,
nv AS (SELECT COUNT(*) AS n FROM ids),
x0 AS (SELECT id AS v, 1.0 / nv.n AS score FROM ids CROSS JOIN nv)"""
    for k in range(1, iters + 1):
        sql += f""",
xn{k} AS (
  SELECT v, s / SUM(s) OVER () AS score FROM (
    SELECT e.dst AS v, SUM(x.score) AS s
    FROM edges e JOIN x{k - 1} x ON e.src = x.v GROUP BY e.dst
  ) r
),
x{k} AS (
  SELECT i.id AS v, COALESCE(n.score, 0.0) AS score
  FROM ids i LEFT JOIN xn{k} n ON n.v = i.id
)"""
    sql += (
        f"\nSELECT i.name AS name, ROUND(x.score, 6) AS score"
        f"\nFROM ids i JOIN x{iters} x ON x.v = i.id ORDER BY name"
    )
    return sql


def _hits_oracle(iters: int = HITS_ITERS) -> str:
    """Unrolled HITS power iteration (plans/hits.py semantics, exactly):
    a_k from h_{k-1}, h_k from a_k, L1-normalized by the sum over receiving
    vertices each half-step; vertices with no in-(out-)edges score 0."""
    sql = _GRAPH_PREFIX + """,
dedges AS (
  SELECT DISTINCT s.id AS src, d.id AS dst
  FROM pairs p JOIN ids s ON p.a = s.name JOIN ids d ON p.b = d.name
  WHERE p.a <> p.b
),
nv AS (SELECT COUNT(*) AS n FROM ids),
h0 AS (SELECT id AS v, 1.0 / nv.n AS hub FROM ids CROSS JOIN nv)"""
    # Every CTE below is referenced exactly ONCE by its successor: DuckDB
    # inlines CTEs, so a half-step that referenced its predecessor twice
    # (join + scalar-subquery normalizer) would expand 4^iters times and
    # exhaust file handles re-opening events.parquet. The normalizer is a
    # SUM() OVER () on the raw half-step instead — same quantity (sum over
    # receiving vertices), linear expansion.
    for k in range(1, iters + 1):
        sql += f""",
an{k} AS (
  SELECT v, s / SUM(s) OVER () AS authority FROM (
    SELECT e.dst AS v, SUM(h.hub) AS s
    FROM dedges e JOIN h{k - 1} h ON e.src = h.v GROUP BY e.dst
  ) r
),
a{k} AS (
  SELECT i.id AS v, COALESCE(x.authority, 0.0) AS authority
  FROM ids i LEFT JOIN an{k} x ON x.v = i.id
),
hn{k} AS (
  SELECT v, s / SUM(s) OVER () AS hub FROM (
    SELECT e.src AS v, SUM(a.authority) AS s
    FROM dedges e JOIN a{k} a ON e.dst = a.v GROUP BY e.src
  ) r
),
h{k} AS (
  SELECT i.id AS v, COALESCE(x.hub, 0.0) AS hub
  FROM ids i LEFT JOIN hn{k} x ON x.v = i.id
)"""
    sql += (
        f"\nSELECT i.name AS name, ROUND(h.hub, 6) AS hub,"
        f" ROUND(a.authority, 6) AS authority"
        f"\nFROM ids i JOIN h{iters} h ON h.v = i.id"
        f" JOIN a{iters} a ON a.v = i.id ORDER BY name"
    )
    return sql


def _katz_oracle(
    iters: int = KATZ_ITERS, alpha_inv: int = KATZ_ALPHA_INV
) -> str:
    """Unrolled Katz fixed-point recurrence (plans/katz.py semantics,
    exactly): s_1 = 10^6, s_k = 10^6 + (Σ in-neighbor s_{k-1}) // alpha_inv
    — every intermediate an exact non-negative int64, so ``//`` (floor)
    here ≡ Spark's ``div`` (truncate). Each CTE is referenced once
    (linear expansion; the hits-oracle lesson)."""
    sql = _GRAPH_PREFIX + """,
dedges AS (
  SELECT DISTINCT s.id AS src, d.id AS dst
  FROM pairs p JOIN ids s ON p.a = s.name JOIN ids d ON p.b = d.name
  WHERE p.a <> p.b
),
ks1 AS (SELECT id AS v, CAST(1000000 AS BIGINT) AS s FROM ids)"""
    for k in range(2, iters + 1):
        sql += f""",
kr{k} AS (
  SELECT e.dst AS v, CAST(SUM(p.s) AS BIGINT) AS si
  FROM dedges e JOIN ks{k - 1} p ON e.src = p.v GROUP BY e.dst
),
ks{k} AS (
  SELECT i.id AS v,
         CAST(1000000 + COALESCE(r.si, 0) // {alpha_inv} AS BIGINT) AS s
  FROM ids i LEFT JOIN kr{k} r ON r.v = i.id
)"""
    sql += (
        f"\nSELECT i.name AS name, k.s AS katz6,"
        f" CAST(k.s AS DOUBLE) / 1000000 AS katz"
        f"\nFROM ids i JOIN ks{iters} k ON k.v = i.id ORDER BY name"
    )
    return sql


def _funnel_oracle(
    steps: tuple = FUNNEL_STEPS, within_s: int = FUNNEL_WITHIN_S
) -> str:
    """Chained first-touch funnel (operators/events.funnel semantics,
    exactly): step k = MIN qualifying event strictly after step k-1's
    time and at-or-before the signup-anchored deadline, all in int64 µs.
    Every fk is MATERIALIZED (referenced by the next step AND its own
    count)."""
    win_us = within_s * 1_000_000
    sql = f"""
WITH ev AS (
  SELECT user_id AS u, event_type AS ty, epoch_us(ts) AS us FROM events
),
f1 AS MATERIALIZED (
  SELECT u, MIN(us) AS t, MIN(us) + {win_us} AS dl
  FROM ev WHERE ty = '{steps[0]}' GROUP BY u
)"""
    for i, st in enumerate(steps[1:], start=2):
        sql += f""",
f{i} AS MATERIALIZED (
  SELECT e.u, MIN(e.us) AS t, MIN(s.dl) AS dl
  FROM ev e JOIN f{i - 1} s
    ON e.u = s.u AND e.us > s.t AND e.us <= s.dl
  WHERE e.ty = '{st}' GROUP BY e.u
)"""
    unions = "\n  UNION ALL ".join(
        f"SELECT {i + 1} AS step_idx, '{st}' AS step,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM f{i + 1}) AS n_users"
        for i, st in enumerate(steps)
    )
    sql += f""",
srows AS (
  {unions}
)
SELECT step_idx, step, n_users,
       ROUND(CAST(n_users AS DOUBLE) / (SELECT COUNT(*) FROM f1), 6)
         AS conversion
FROM srows ORDER BY step_idx"""
    return sql


def _linkpred_oracle(
    cap: int = LINKPRED_WEDGE_CAP, top_k: int = LINKPRED_TOPK
) -> str:
    """Wedge self-join through capped-degree middles (plans/linkpred.py
    semantics, exactly) over the bipartite MEMBERSHIP graph — see
    _q_link_prediction for why. The id space is dense-rank over the
    membership-graph names (matching the Spark side's relabel_edges on the
    same edge set) so u < v resolves identically. ``mnb`` is MATERIALIZED:
    it is referenced twice by the self-join and DuckDB inlines CTEs."""
    return _GRAPH_PREFIX + f""",
mpairs AS (
  SELECT DISTINCT 'c:' || conv_id AS a, entity AS b FROM turns
),
mnames AS (
  SELECT DISTINCT name
  FROM (SELECT a AS name FROM mpairs UNION ALL SELECT b AS name FROM mpairs) nn
),
mids AS MATERIALIZED (
  SELECT name, CAST(DENSE_RANK() OVER (ORDER BY name) - 1 AS BIGINT) AS id
  FROM mnames
),
medges AS MATERIALIZED (
  SELECT s.id AS src, d.id AS dst
  FROM mpairs JOIN mids s ON mpairs.a = s.name JOIN mids d ON mpairs.b = d.name
  UNION ALL
  SELECT d.id AS src, s.id AS dst
  FROM mpairs JOIN mids s ON mpairs.a = s.name JOIN mids d ON mpairs.b = d.name
),
mdeg AS (SELECT src AS w, COUNT(*) AS d FROM medges GROUP BY src),
mnb AS MATERIALIZED (
  SELECT e.src AS w, e.dst AS n, d.d
  FROM medges e JOIN mdeg d ON d.w = e.src WHERE d.d <= {cap}
),
cand AS (
  SELECT l.n AS u, r.n AS v, COUNT(*) AS cn, SUM(1.0 / LN(l.d)) AS aa
  FROM mnb l JOIN mnb r ON l.w = r.w AND l.n < r.n
  GROUP BY l.n, r.n
),
fresh AS (
  SELECT c.u, c.v, c.cn, c.aa
  FROM cand c LEFT JOIN medges e ON e.src = c.u AND e.dst = c.v
  WHERE e.src IS NULL
),
fdeg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM medges GROUP BY src)
SELECT iu.name AS u_name, iv.name AS v_name, f.cn AS cn, ROUND(f.aa, 6) AS aa,
       ROUND(CAST(f.cn AS DOUBLE) / CAST(du.d + dv.d - f.cn AS DOUBLE), 6) AS jaccard,
       CAST(du.d * dv.d AS BIGINT) AS pa
FROM fresh f JOIN mids iu ON iu.id = f.u JOIN mids iv ON iv.id = f.v
     JOIN fdeg du ON du.v = f.u JOIN fdeg dv ON dv.v = f.v
ORDER BY aa DESC, cn DESC, u_name, v_name LIMIT {top_k}"""


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ORACLE_ROUNDS) -> str:
    """Unrolled synchronous peel: s_i = vertices of s_{i-1}-subgraph with
    degree >= k; a no-op after the fixpoint, so a fixed unroll >= the real
    peel depth is exact (plans/kcore.py runs the same peel to fixpoint).
    Every s_i is MATERIALIZED — each round references its predecessor twice
    (both endpoints), which would inline 2^rounds times otherwise; medges
    pins the derived edge table to one expansion total."""
    sql = _GRAPH_PREFIX + """,
medges AS MATERIALIZED (SELECT src, dst FROM edges),
s0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM medges)"""
    for i in range(1, rounds + 1):
        sql += f""",
s{i} AS MATERIALIZED (
  SELECT e.src AS v
  FROM medges e
  JOIN s{i - 1} a ON e.src = a.v
  JOIN s{i - 1} b ON e.dst = b.v
  GROUP BY e.src HAVING COUNT(*) >= {k}
)"""
    sql += f"""
SELECT i.name AS name, d.core_deg AS core_deg
FROM (
  SELECT e.src AS v, COUNT(*) AS core_deg
  FROM medges e
  JOIN s{rounds} a ON e.src = a.v
  JOIN s{rounds} b ON e.dst = b.v
  GROUP BY e.src
) d JOIN ids i ON i.id = d.v ORDER BY name"""
    return sql


def _densest_oracle(rounds: int = None, epsilon: float = None) -> str:
    """Unrolled Bahmani peel: per round, degrees -> scalar stats -> the
    (1+eps)*avg-degree survivor filter -> both-endpoint semi join. The
    per-round threshold is the same single double expression the engine
    computes; the final argmax (density desc, round asc) picks the same
    round. Empty tail rounds yield empty CTEs and no stats rows."""
    rounds = DENSEST_ORACLE_ROUNDS if rounds is None else rounds
    factor = repr(1.0 + (DENSEST_EPSILON if epsilon is None else epsilon))
    sql = _GRAPH_PREFIX + """,
g0 AS MATERIALIZED (SELECT src, dst FROM edges)"""
    for i in range(rounds):
        sql += f""",
deg{i} AS MATERIALIZED (
  SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg FROM g{i} GROUP BY src
),
st{i} AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS nv,
         COALESCE(CAST(SUM(deg) AS BIGINT), 0) AS rows_ FROM deg{i}
),
surv{i} AS MATERIALIZED (
  SELECT d.v FROM deg{i} d, st{i} s
  WHERE d.deg > {factor} * (CAST(s.rows_ AS DOUBLE) / s.nv)
),
g{i + 1} AS MATERIALIZED (
  SELECT g.src, g.dst FROM g{i} g
  JOIN surv{i} a ON a.v = g.src JOIN surv{i} b ON b.v = g.dst
)"""
    unions = " UNION ALL ".join(
        f"SELECT {i} AS r, nv, rows_ FROM st{i} WHERE nv > 0"
        for i in range(rounds)
    )
    vunions = " UNION ALL ".join(
        f"SELECT {i} AS r, v FROM deg{i}" for i in range(rounds)
    )
    sql += f""",
allst AS ({unions}),
best AS (
  SELECT r, nv, rows_ FROM allst
  ORDER BY CAST(rows_ AS DOUBLE) / (2.0 * nv) DESC, r LIMIT 1
),
allv AS ({vunions})
SELECT i.name AS name, CAST(b.r AS INT) AS round, b.nv AS n_vertices,
       b.rows_ // 2 AS n_edges,
       ROUND(CAST(b.rows_ AS DOUBLE) / (2.0 * b.nv), 6) AS density
FROM allv a JOIN best b ON a.r = b.r JOIN ids i ON i.id = a.v
ORDER BY name"""
    return sql


def _sssp_oracle(rounds: int = None) -> str:
    """Unrolled synchronous Bellman-Ford over the directed multiplicity
    graph (the _wpr_oracle wd CTE, integer weights): each round min-merges
    the previous table with one relaxation expansion. Monotone, no-op past
    the fixpoint — a fixed unroll >= the true round count is exact."""
    rounds = SSSP_ORACLE_ROUNDS if rounds is None else rounds
    sql = _GRAPH_PREFIX + """,
wd AS MATERIALIZED (
  SELECT s.id AS src, d.id AS dst, CAST(COUNT(*) AS BIGINT) AS wt
  FROM pairs p JOIN ids s ON p.a = s.name JOIN ids d ON p.b = d.name
  WHERE p.a <> p.b GROUP BY s.id, d.id
),
d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS dist)"""
    for i in range(1, rounds + 1):
        sql += f""",
d{i} AS MATERIALIZED (
  SELECT v, MIN(dist) AS dist FROM (
    SELECT v, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS v, p.dist + e.wt AS dist
    FROM d{i - 1} p JOIN wd e ON e.src = p.v
  ) u GROUP BY v
)"""
    sql += f"""
SELECT i.name AS name, d.dist AS dist
FROM d{rounds} d JOIN ids i ON i.id = d.v ORDER BY name"""
    return sql


def _mis_oracle(rounds: int = None) -> str:
    """Unrolled Luby rounds: per round, the neighbor minimum is computed as
    (MIN priority, MIN dst among the argmin priorities) — exactly the
    lexicographic min(struct(p, dst)) the engine aggregates — then winners,
    their neighborhoods, and the shrunken active vertex/edge tables. The
    md5-fold priority is rebuilt positionally (_md5int_duck), so every
    (vertex, round) row must match the engine bit-for-bit."""
    rounds = MIS_ORACLE_ROUNDS if rounds is None else rounds
    sql = _GRAPH_PREFIX + """,
a0 AS MATERIALIZED (SELECT id AS v FROM ids),
ae0 AS MATERIALIZED (SELECT src, dst FROM edges)"""
    for r in range(rounds):
        fold_dst = _md5int_duck(f"'mis{r}:' || CAST(dst AS VARCHAR)", 1, 15)
        fold_edst = _md5int_duck(f"'mis{r}:' || CAST(e.dst AS VARCHAR)", 1, 15)
        fold_v = _md5int_duck(f"'mis{r}:' || CAST(a.v AS VARCHAR)", 1, 15)
        sql += f""",
nm{r} AS MATERIALIZED (
  SELECT src, MIN({fold_dst}) AS mp FROM ae{r} GROUP BY src
),
nmv{r} AS MATERIALIZED (
  SELECT n.src, n.mp, MIN(e.dst) AS mv
  FROM nm{r} n JOIN ae{r} e ON e.src = n.src AND {fold_edst} = n.mp
  GROUP BY n.src, n.mp
),
win{r} AS MATERIALIZED (
  SELECT a.v FROM a{r} a LEFT JOIN nmv{r} n ON n.src = a.v
  WHERE n.src IS NULL OR ({fold_v}, a.v) < (n.mp, n.mv)
),
rem{r} AS MATERIALIZED (
  SELECT v FROM win{r}
  UNION
  SELECT e.dst AS v FROM ae{r} e JOIN win{r} w ON e.src = w.v
),
a{r + 1} AS MATERIALIZED (
  SELECT v FROM a{r} WHERE v NOT IN (SELECT v FROM rem{r})
),
ae{r + 1} AS MATERIALIZED (
  SELECT src, dst FROM ae{r}
  WHERE src NOT IN (SELECT v FROM rem{r})
    AND dst NOT IN (SELECT v FROM rem{r})
)"""
    unions = " UNION ALL ".join(
        f"SELECT v, {r} AS round FROM win{r}" for r in range(rounds)
    )
    sql += f""",
allw AS ({unions})
SELECT i.name AS name, CAST(w.round AS INT) AS round
FROM allw w JOIN ids i ON i.id = w.v
ORDER BY name"""
    return sql


def _coloring_oracle(rounds: int = None) -> str:
    """Unrolled Jones-Plassmann rounds: per round the readiness test is the
    lexicographic neighbor MAXIMUM of the fixed md5-fold priority (the
    mirror of _mis_oracle's minimum), and the color is the mex of the
    earlier-colored neighborhood — computed as the smallest candidate in
    0..|used| absent from the used set (a per-ready-vertex lateral range
    anti-join; |used| candidates always suffice by pigeonhole). Every
    (vertex, color, round) row must match the engine bit-for-bit."""
    rounds = COLORING_ORACLE_ROUNDS if rounds is None else rounds
    fold_dst = _md5int_duck("'jp:' || CAST(dst AS VARCHAR)", 1, 15)
    fold_edst = _md5int_duck("'jp:' || CAST(e.dst AS VARCHAR)", 1, 15)
    fold_v = _md5int_duck("'jp:' || CAST(a.v AS VARCHAR)", 1, 15)
    sql = _GRAPH_PREFIX + """,
a0 AS MATERIALIZED (SELECT id AS v FROM ids),
ae0 AS MATERIALIZED (SELECT src, dst FROM edges),
col0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS v, CAST(NULL AS INT) AS color,
         CAST(NULL AS INT) AS round
  WHERE FALSE
)"""
    for r in range(rounds):
        sql += f""",
nm{r} AS MATERIALIZED (
  SELECT src, MAX({fold_dst}) AS mp FROM ae{r} GROUP BY src
),
nmv{r} AS MATERIALIZED (
  SELECT n.src, n.mp, MAX(e.dst) AS mv
  FROM nm{r} n JOIN ae{r} e ON e.src = n.src AND {fold_edst} = n.mp
  GROUP BY n.src, n.mp
),
rdy{r} AS MATERIALIZED (
  SELECT a.v FROM a{r} a LEFT JOIN nmv{r} n ON n.src = a.v
  WHERE n.src IS NULL OR ({fold_v}, a.v) > (n.mp, n.mv)
),
used{r} AS MATERIALIZED (
  SELECT DISTINCT e.src AS v, c.color
  FROM edges e
  JOIN rdy{r} rd ON rd.v = e.src
  JOIN col{r} c ON c.v = e.dst
),
mexc{r} AS MATERIALIZED (
  SELECT t.v, u.c
  FROM (
    SELECT rd.v, COALESCE(k.k, 0) AS k
    FROM rdy{r} rd
    LEFT JOIN (SELECT v, COUNT(*) AS k FROM used{r} GROUP BY v) k
      ON k.v = rd.v
  ) t, UNNEST(range(0, t.k + 1)) AS u(c)
),
mex{r} AS MATERIALIZED (
  SELECT m.v, CAST(MIN(m.c) AS INT) AS color
  FROM mexc{r} m LEFT JOIN used{r} u ON u.v = m.v AND u.color = m.c
  WHERE u.v IS NULL GROUP BY m.v
),
col{r + 1} AS MATERIALIZED (
  SELECT v, color, round FROM col{r}
  UNION ALL
  SELECT v, color, CAST({r} AS INT) AS round FROM mex{r}
),
a{r + 1} AS MATERIALIZED (
  SELECT v FROM a{r} WHERE v NOT IN (SELECT v FROM rdy{r})
),
ae{r + 1} AS MATERIALIZED (
  SELECT src, dst FROM ae{r}
  WHERE src NOT IN (SELECT v FROM rdy{r})
    AND dst NOT IN (SELECT v FROM rdy{r})
)"""
    sql += f"""
SELECT i.name AS name, c.color, c.round
FROM col{rounds} c JOIN ids i ON i.id = c.v
ORDER BY name"""
    return sql


def _dag_layers_oracle(rounds: int = None) -> str:
    """SCC by recursive mutual reachability (the scc oracle's CTEs),
    condensation edges by component-label join, then DAG_ORACLE_ROUNDS
    unrolled monotone-max layer rounds — rounds past the fixpoint are
    no-ops, so the unroll only needs to exceed the condensation depth.
    Every (entity, component, layer) row must match bit-for-bit."""
    rounds = DAG_ORACLE_ROUNDS if rounds is None else rounds
    sql = _GRAPH_PREFIX + """,
dedges AS (
  SELECT DISTINCT s.id AS src, d.id AS dst
  FROM pairs p JOIN ids s ON p.a = s.name JOIN ids d ON p.b = d.name
  WHERE p.a <> p.b
),
dreach(a, b) AS (
  SELECT src, dst FROM dedges
  UNION
  SELECT r.a, e.dst FROM dreach r JOIN dedges e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS u, r1.b AS v
  FROM dreach r1 JOIN dreach r2 ON r2.a = r1.b AND r2.b = r1.a
),
sccmap AS MATERIALIZED (
  SELECT i.id, CAST(LEAST(i.id, COALESCE(MIN(m.u), i.id)) AS BIGINT) AS comp
  FROM ids i LEFT JOIN mutual m ON m.v = i.id GROUP BY i.id
),
cedges AS MATERIALIZED (
  SELECT DISTINCT sa.comp AS src, sb.comp AS dst
  FROM dedges e
  JOIN sccmap sa ON sa.id = e.src
  JOIN sccmap sb ON sb.id = e.dst
  WHERE sa.comp <> sb.comp
),
dl0 AS MATERIALIZED (
  SELECT v, CAST(0 AS INT) AS layer FROM (
    SELECT DISTINCT src AS v FROM cedges
    UNION
    SELECT DISTINCT dst AS v FROM cedges
  ) t
)"""
    for r in range(rounds):
        sql += f""",
dl{r + 1} AS MATERIALIZED (
  SELECT l.v, CAST(GREATEST(l.layer, COALESCE(m.ml, 0)) AS INT) AS layer
  FROM dl{r} l LEFT JOIN (
    SELECT e.dst AS v, MAX(l2.layer) + 1 AS ml
    FROM cedges e JOIN dl{r} l2 ON l2.v = e.src GROUP BY e.dst
  ) m ON m.v = l.v
)"""
    sql += f"""
SELECT i.name AS name, s.comp,
       CAST(COALESCE(l.layer, 0) AS INT) AS layer
FROM ids i
JOIN sccmap s ON s.id = i.id
LEFT JOIN dl{rounds} l ON l.v = s.comp
ORDER BY name"""
    return sql


def _wl_oracle(rounds: int = None) -> str:
    """Unrolled 1-WL rounds: label_0 = degree; per round the neighbor
    multiset hashes commutatively (SUM of md5 folds, DuckDB's HUGEINT sum
    is exact, mod 2^60 matches Spark's DECIMAL(38,0) % path) and the new
    label is the same positional md5 fold the engine computes. Every
    (vertex, label, class size) row must match bit-for-bit."""
    rounds = WL_ORACLE_ROUNDS if rounds is None else rounds
    mod = 1 << 60
    sql = _GRAPH_PREFIX + """,
wl0 AS MATERIALIZED (
  SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS lab FROM edges GROUP BY src
)"""
    for r in range(rounds):
        fold_n = _md5int_duck(f"'wln{r}:' || CAST(l.lab AS VARCHAR)", 1, 15)
        fold_l = _md5int_duck(
            f"'wl{r}:' || CAST(l.lab AS VARCHAR) || ':' ||"
            f" CAST(COALESCE(h.msum, 0) AS VARCHAR)",
            1,
            15,
        )
        sql += f""",
wh{r} AS MATERIALIZED (
  SELECT e.dst AS v, CAST(SUM({fold_n}) % {mod} AS BIGINT) AS msum
  FROM edges e JOIN wl{r} l ON l.v = e.src GROUP BY e.dst
),
wl{r + 1} AS MATERIALIZED (
  SELECT l.v, {fold_l} AS lab
  FROM wl{r} l LEFT JOIN wh{r} h ON h.v = l.v
)"""
    sql += f"""
SELECT i.name AS name, l.lab AS wl,
       COUNT(*) OVER (PARTITION BY l.lab) AS class_size
FROM wl{rounds} l JOIN ids i ON i.id = l.v
ORDER BY name"""
    return sql


def _anf_oracle(hops: int = None, p: int = None) -> str:
    """Replays the HyperANF register evolution hop by hop (md5-fold seed
    hash, reg = h mod m, rho = leading-zero rank; max-merge per hop) and
    applies the per-vertex HLL estimator — the _hll_oracle math grouped by
    vertex. Registers are pinned via exact bigints; only the estimate
    column is a (rounded) double."""
    hops = ANF_HOPS if hops is None else hops
    p = ANF_P if p is None else p
    m = 1 << p
    wbits = 60 - p
    rmax = wbits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    k_lit = repr(alpha * m * m * float(1 << rmax))
    fold15 = _md5int_duck("'anf:' || CAST(id AS VARCHAR)", 1, 15)
    sql = _GRAPH_PREFIX + f""",
h0 AS (SELECT id AS v, {fold15} AS h FROM ids),
r0 AS MATERIALIZED (
  SELECT v, h % {m} AS reg,
         CASE WHEN h // {m} = 0 THEN {rmax}
              ELSE {wbits} - length(bin(h // {m})) + 1 END AS rho
  FROM h0
)"""
    for t in range(1, hops + 1):
        sql += f""",
r{t} AS MATERIALIZED (
  SELECT v, reg, MAX(rho) AS rho FROM (
    SELECT v, reg, rho FROM r{t - 1}
    UNION ALL
    SELECT e.src AS v, x.reg, x.rho FROM r{t - 1} x JOIN edges e ON e.dst = x.v
  ) u GROUP BY v, reg
)"""
    sql += f""",
agg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS nz,
         CAST(SUM(CAST(POWER(2.0, {rmax} - rho) AS BIGINT)) AS BIGINT) AS s_occ
  FROM r{hops} GROUP BY v
),
fin AS (
  SELECT v, nz, s_occ + ({m} - nz) * {1 << rmax} AS raw_sum,
         {k_lit} / (s_occ + ({m} - nz) * {1 << rmax}) AS est_raw
  FROM agg
)
SELECT i.name AS name, nz AS nonzero_regs, raw_sum,
       ROUND(CASE WHEN est_raw <= {2.5 * m} AND ({m} - nz) > 0
                  THEN {float(m)!r} * LN({float(m)!r} / ({m} - nz))
                  ELSE est_raw END, 4) AS estimate
FROM fin JOIN ids i ON i.id = fin.v
ORDER BY name"""
    return sql


def _louvain_oracle(rounds: int = None) -> str:
    """Unrolled synchronous Louvain move rounds (plans/louvain.py
    semantics): per round k_in per (vertex, neighbour community), Σtot per
    community, exact-integer gains G = m2·kin − k·(tot − k·[cc = c]), and
    ROW_NUMBER(ORDER BY g DESC, cc) = the engine's max(struct(g, −cc))
    argmax; a vertex moves only on a STRICT improvement over its stay
    gain. Every SUM is cast back to BIGINT (DuckDB widens to HUGEINT)."""
    rounds = LOUVAIN_ROUNDS if rounds is None else rounds
    sql = _GRAPH_PREFIX + """,
wund2 AS MATERIALIZED (
  SELECT s.id AS a, d.id AS b, CAST(COUNT(*) AS BIGINT) AS wt
  FROM (SELECT LEAST(a, b) AS na, GREATEST(a, b) AS nb
        FROM pairs WHERE a <> b) p
  JOIN ids s ON p.na = s.name JOIN ids d ON p.nb = d.name
  GROUP BY s.id, d.id
),
wsym AS MATERIALIZED (
  SELECT a AS src, b AS dst, wt FROM wund2
  UNION ALL
  SELECT b AS src, a AS dst, wt FROM wund2
),
wdeg AS MATERIALIZED (
  SELECT src AS v, CAST(SUM(wt) AS BIGINT) AS k FROM wsym GROUP BY src
),
msum AS MATERIALIZED (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM wdeg),
cm0 AS MATERIALIZED (SELECT v, v AS c FROM wdeg)"""
    for r in range(1, rounds + 1):
        sql += f""",
kin{r} AS MATERIALIZED (
  SELECT e.src AS v, cm.c AS cc, CAST(SUM(e.wt) AS BIGINT) AS kin
  FROM wsym e JOIN cm{r - 1} cm ON cm.v = e.dst GROUP BY e.src, cm.c
),
tot{r} AS MATERIALIZED (
  SELECT cm.c AS cc, CAST(SUM(d.k) AS BIGINT) AS tot
  FROM cm{r - 1} cm JOIN wdeg d ON d.v = cm.v GROUP BY cm.c
),
cand{r} AS MATERIALIZED (
  SELECT v, cc, MAX(kin) AS kin FROM (
    SELECT v, cc, kin FROM kin{r}
    UNION ALL
    SELECT v, c AS cc, CAST(0 AS BIGINT) AS kin FROM cm{r - 1}
  ) u GROUP BY v, cc
),
g{r} AS MATERIALIZED (
  SELECT cd.v, cd.cc, cm.c,
         m.m2 * cd.kin
         - d.k * (t.tot - CASE WHEN cd.cc = cm.c THEN d.k ELSE 0 END) AS g
  FROM cand{r} cd
  JOIN cm{r - 1} cm ON cm.v = cd.v
  JOIN wdeg d ON d.v = cd.v
  JOIN tot{r} t ON t.cc = cd.cc, msum m
),
best{r} AS MATERIALIZED (
  SELECT v, cc AS c_best, g AS g_best FROM (
    SELECT v, cc, g,
           ROW_NUMBER() OVER (PARTITION BY v ORDER BY g DESC, cc) AS rn
    FROM g{r} WHERE cc <> c
  ) x WHERE rn = 1
),
cm{r} AS MATERIALIZED (
  SELECT s.v,
         CASE WHEN b.g_best > s.g THEN b.c_best ELSE s.c END AS c
  FROM (SELECT v, c, g FROM g{r} WHERE cc = c) s
  LEFT JOIN best{r} b ON b.v = s.v
)"""
    sql += f"""
SELECT i.name AS name, cm.c AS community
FROM cm{rounds} cm JOIN ids i ON i.id = cm.v
ORDER BY name"""
    return sql


def _matching_oracle(rounds: int = None) -> str:
    """Unrolled locally-minimum matching rounds: per round the per-vertex
    minimum incident edge key (p, a, b) via ROW_NUMBER — the engine's
    lexicographic min(struct) — then the both-endpoints test and the
    retirement of matched vertices' edges. Priorities are FIXED (computed
    once in le0), exactly like the engine."""
    rounds = MATCHING_ORACLE_ROUNDS if rounds is None else rounds
    fold = _md5int_duck(
        "'match:' || CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)", 1, 15
    )
    sql = _GRAPH_PREFIX + f""",
le0 AS MATERIALIZED (
  SELECT src AS a, dst AS b, {fold} AS p
  FROM (SELECT src, dst FROM undl) e0
)"""
    for r in range(rounds):
        sql += f""",
vmin{r} AS MATERIALIZED (
  SELECT v, a, b FROM (
    SELECT v, p, a, b,
           ROW_NUMBER() OVER (PARTITION BY v ORDER BY p, a, b) AS rn
    FROM (
      SELECT a AS v, p, a, b FROM le{r}
      UNION ALL
      SELECT b AS v, p, a, b FROM le{r}
    ) i
  ) x WHERE rn = 1
),
mt{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM le{r} e
  JOIN vmin{r} va ON va.v = e.a AND va.a = e.a AND va.b = e.b
  JOIN vmin{r} vb ON vb.v = e.b AND vb.a = e.a AND vb.b = e.b
),
mv{r} AS MATERIALIZED (
  SELECT a AS v FROM mt{r} UNION SELECT b AS v FROM mt{r}
),
le{r + 1} AS MATERIALIZED (
  SELECT a, b, p FROM le{r}
  WHERE a NOT IN (SELECT v FROM mv{r}) AND b NOT IN (SELECT v FROM mv{r})
)"""
    unions = " UNION ALL ".join(
        f"SELECT a, b, {r} AS round FROM mt{r}" for r in range(rounds)
    )
    sql += f""",
allm AS ({unions})
SELECT ia.name AS a, ib.name AS b, CAST(m.round AS INT) AS round
FROM allm m JOIN ids ia ON ia.id = m.a JOIN ids ib ON ib.id = m.b
ORDER BY a, b"""
    return sql


def _kmeans_oracle(k: int = None, iters: int = None) -> str:
    """Unrolled integer-grid Lloyd (functions/cluster.py semantics): the
    same floor(x·scale + 0.5) + shift grid, exact int64 distances with
    ROW_NUMBER(ORDER BY d, j) = the engine's lexicographic (dist, j)
    argmin, and the (2·Σ + n) // (2·n) round-half-up centroid update —
    floor == truncate because the shifted grid is non-negative. Every
    SUM is cast back to BIGINT (DuckDB widens to HUGEINT)."""
    from parconnect_spark.functions.cluster import QUANT_SCALE, QUANT_SHIFT

    k = KMEANS_K if k is None else k
    iters = KMEANS_ITERS if iters is None else iters
    sql = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {float(QUANT_SCALE)!r} + 0.5)
                AS BIGINT) + {QUANT_SHIFT}) AS qv
  FROM embeddings
),
gs AS (SELECT unnest(generate_series(1, 256)) AS g),
pe AS (
  SELECT vec_id, g - 1 AS dim, qv[g] AS val FROM q, gs WHERE g <= len(qv)
),
seeds AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT {k})
),
cd0 AS MATERIALIZED (
  SELECT s.j, p.dim, p.val FROM seeds s JOIN pe p USING (vec_id)
)"""
    for t in range(1, iters + 1):
        sql += f""",
dist{t} AS MATERIALIZED (
  SELECT p.vec_id, c.j,
         CAST(SUM((p.val - c.val) * (p.val - c.val)) AS BIGINT) AS d
  FROM pe p JOIN cd{t - 1} c ON c.dim = p.dim
  GROUP BY p.vec_id, c.j
),
asg{t} AS MATERIALIZED (
  SELECT vec_id, j, d FROM (
    SELECT vec_id, j, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
    FROM dist{t}
  ) r WHERE rn = 1
),
cd{t} AS MATERIALIZED (
  SELECT a.j, p.dim,
         CAST((2 * CAST(SUM(p.val) AS BIGINT) + COUNT(*))
              // (2 * COUNT(*)) AS BIGINT) AS val
  FROM asg{t} a JOIN pe p USING (vec_id) GROUP BY a.j, p.dim
)"""
    sql += f"""
SELECT vec_id, CAST(j AS INT) AS cluster, d AS dist
FROM asg{iters} ORDER BY vec_id"""
    return sql


def _betweenness_oracle(levels: int = None, n_sources: int = None) -> str:
    """Unrolled Brandes: forward level CTEs carry σ (SUM of predecessor σ
    behind a NOT EXISTS visited guard — exactly the engine's anti join),
    backward level CTEs carry δ = Σ σ(v)/σ(w)·(1+δ(w)) through the edge
    table. Fixed ``levels`` unroll is exact when ≥ the true BFS depth
    (empty tail levels contribute empty CTEs). Undirected halving and the
    v ≠ root exclusion applied in the final aggregate, like the engine."""
    levels = BETWEENNESS_ORACLE_LEVELS if levels is None else levels
    n_sources = HARMONIC_SOURCES if n_sources is None else n_sources
    sql = _GRAPH_PREFIX + f""",
roots AS (SELECT id AS root FROM ids WHERE id < {n_sources}),
f0 AS MATERIALIZED (
  SELECT root, root AS v, CAST(1 AS BIGINT) AS sigma FROM roots
),
vis0 AS MATERIALIZED (SELECT root, v FROM f0)"""
    for l in range(1, levels + 1):
        sql += f""",
f{l} AS MATERIALIZED (
  SELECT p.root, e.dst AS v, SUM(p.sigma) AS sigma
  FROM f{l - 1} p JOIN edges e ON e.src = p.v
  WHERE NOT EXISTS (
    SELECT 1 FROM vis{l - 1} x WHERE x.root = p.root AND x.v = e.dst
  )
  GROUP BY p.root, e.dst
),
vis{l} AS MATERIALIZED (
  SELECT * FROM vis{l - 1} UNION ALL SELECT root, v FROM f{l}
)"""
    sql += f""",
d{levels} AS MATERIALIZED (
  SELECT root, v, CAST(0.0 AS DOUBLE) AS delta FROM f{levels}
)"""
    for l in range(levels - 1, -1, -1):
        sql += f""",
d{l} AS MATERIALIZED (
  SELECT f.root, f.v,
         COALESCE(SUM(CAST(f.sigma AS DOUBLE) / z.sigma_w * (1.0 + z.delta)),
                  0.0) AS delta
  FROM f{l} f
  LEFT JOIN (
    SELECT e.src AS pv, n.root AS zroot, n.sigma AS sigma_w, dd.delta
    FROM edges e
    JOIN f{l + 1} n ON n.v = e.dst
    JOIN d{l + 1} dd ON dd.root = n.root AND dd.v = n.v
  ) z ON z.pv = f.v AND z.zroot = f.root
  GROUP BY f.root, f.v
)"""
    unions = " UNION ALL ".join(
        f"SELECT * FROM d{l}" for l in range(levels + 1)
    )
    sql += f""",
alld AS ({unions})
SELECT i.name AS name, ROUND(SUM(delta) / 2.0, 6) AS bc
FROM alld a JOIN ids i ON i.id = a.v
WHERE a.v <> a.root
GROUP BY i.name
HAVING SUM(delta) / 2.0 > 0
ORDER BY name"""
    return sql


def _coreness_oracle(rounds: int = CORENESS_ORACLE_ROUNDS) -> str:
    """Unrolled iterated-H-index recurrence: c0 = degree; each round
    aggregates neighbor values into a per-vertex histogram and takes
    H = max(min(value, cumulative_count)) over values descending — the
    textbook H-index over the compressed histogram, exactly what
    plans/kcore.coreness computes. Monotone and a no-op past the fixpoint,
    so a fixed unroll >= the convergence round count is exact. MATERIALIZED
    per the kcore discipline (each c_i feeds the next round's join)."""
    sql = _GRAPH_PREFIX + """,
medges AS MATERIALIZED (SELECT src, dst FROM edges),
c0 AS MATERIALIZED (SELECT src AS v, COUNT(*) AS c FROM medges GROUP BY src)"""
    for i in range(1, rounds + 1):
        sql += f""",
h{i} AS MATERIALIZED (
  SELECT e.src AS v, p.c AS val, COUNT(*) AS cnt
  FROM medges e JOIN c{i - 1} p ON p.v = e.dst GROUP BY e.src, p.c
),
c{i} AS MATERIALIZED (
  SELECT v, MAX(LEAST(val, cum)) AS c FROM (
    SELECT v, val,
           SUM(cnt) OVER (PARTITION BY v ORDER BY val DESC
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM h{i}
  ) GROUP BY v
)"""
    sql += f"""
SELECT i.name AS name, c.c AS coreness
FROM c{rounds} c JOIN ids i ON i.id = c.v ORDER BY name"""
    return sql


def _ktruss_oracle(k: int = KTRUSS_K, rounds: int = KTRUSS_ORACLE_ROUNDS) -> str:
    """Unrolled synchronous edge peel: round i re-enumerates the surviving
    graph's triangles (id-oriented triple join — each triangle x<y<z once),
    counts per-edge support, and keeps edges with support >= k-2. A no-op
    past the fixpoint, so a fixed unroll >= the real peel depth is exact
    (plans/ktruss.py runs the same synchronous peel to fixpoint; its
    incremental support maintenance is plan-level only). The final support
    column is computed on the fixpoint graph — identical to the engine's
    within-truss support. Every CTE is MATERIALIZED: each e_i feeds three
    self-joins in its round's triangle CTE plus the next round."""
    sql = _GRAPH_PREFIX + """,
e0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM edges WHERE src < dst)"""
    for i in range(1, rounds + 1):
        sql += f""",
tri{i} AS MATERIALIZED (
  SELECT p.u AS x, p.v AS y, q.v AS z
  FROM e{i - 1} p
  JOIN e{i - 1} q ON p.u = q.u AND p.v < q.v
  JOIN e{i - 1} r ON r.u = p.v AND r.v = q.v
),
s{i} AS MATERIALIZED (
  SELECT e.u, e.v, COUNT(t.m) AS sup
  FROM e{i - 1} e LEFT JOIN (
    SELECT x AS u, y AS v, 1 AS m FROM tri{i}
    UNION ALL SELECT x AS u, z AS v, 1 AS m FROM tri{i}
    UNION ALL SELECT y AS u, z AS v, 1 AS m FROM tri{i}
  ) t ON t.u = e.u AND t.v = e.v
  GROUP BY e.u, e.v
),
e{i} AS MATERIALIZED (SELECT u, v FROM s{i} WHERE sup >= {k - 2})"""
    sql += f"""
SELECT iu.name AS u_name, iv.name AS v_name, s.sup AS support
FROM s{rounds} s
JOIN ids iu ON iu.id = s.u
JOIN ids iv ON iv.id = s.v
WHERE s.sup >= {k - 2}
ORDER BY u_name, v_name"""
    return sql


def _walks_oracle(length: int = WALK_LEN, salt: str = "w") -> str:
    """Replays plans/walks.py exactly: at step i the walk moves to the
    neighbor minimizing md5('walk:step:dst:salt'). MATERIALIZED CTEs —
    each step is referenced by the next step AND the final union."""
    sql = _GRAPH_PREFIX + """,
medges AS MATERIALIZED (SELECT src, dst FROM edges),
mids AS MATERIALIZED (SELECT name, id FROM ids),
w0 AS MATERIALIZED (
  SELECT id AS walk_id, 0 AS step, id AS v FROM mids WHERE name LIKE 'c:%'
)"""
    for i in range(1, length + 1):
        sql += f""",
w{i} AS MATERIALIZED (
  SELECT w.walk_id, {i} AS step,
         MIN_BY(e.dst, MD5(CONCAT_WS(':',
           CAST(w.walk_id AS VARCHAR), CAST({i} AS VARCHAR),
           CAST(e.dst AS VARCHAR), '{salt}'))) AS v
  FROM w{i - 1} w JOIN medges e ON e.src = w.v
  GROUP BY w.walk_id
)"""
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, v FROM w{i}" for i in range(length + 1)
    )
    sql += f"""
SELECT iw.name AS walk_name, u.step AS step, iv.name AS v_name
FROM ({union}) u
JOIN mids iw ON iw.id = u.walk_id
JOIN mids iv ON iv.id = u.v
ORDER BY walk_name, step"""
    return sql


def _walk_pairs_oracle(length: int = WALK_LEN, window: int = 2, salt: str = "w") -> str:
    """The _walks_oracle chain, ended with the skip-gram pair count
    instead of the walk listing."""
    sql = _GRAPH_PREFIX + """,
medges AS MATERIALIZED (SELECT src, dst FROM edges),
mids AS MATERIALIZED (SELECT name, id FROM ids),
w0 AS MATERIALIZED (
  SELECT id AS walk_id, 0 AS step, id AS v FROM mids WHERE name LIKE 'c:%'
)"""
    for i in range(1, length + 1):
        sql += f""",
w{i} AS MATERIALIZED (
  SELECT w.walk_id, {i} AS step,
         MIN_BY(e.dst, MD5(CONCAT_WS(':',
           CAST(w.walk_id AS VARCHAR), CAST({i} AS VARCHAR),
           CAST(e.dst AS VARCHAR), '{salt}'))) AS v
  FROM w{i - 1} w JOIN medges e ON e.src = w.v
  GROUP BY w.walk_id
)"""
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, step, v FROM w{i}" for i in range(length + 1)
    )
    sql += f""",
wu AS MATERIALIZED ({union}),
p AS (
  SELECT x.v AS av, y.v AS bv
  FROM wu x JOIN wu y ON x.walk_id = y.walk_id
   AND y.step - x.step BETWEEN 1 AND {window}
)
SELECT ia.name AS a, ib.name AS b, CAST(COUNT(*) AS BIGINT) AS n
FROM p JOIN mids ia ON ia.id = p.av JOIN mids ib ON ib.id = p.bv
GROUP BY ia.name, ib.name ORDER BY a, b"""
    return sql


def _lp_min_oracle(iters: int = LP_MIN_ITERS) -> str:
    sql = _GRAPH_PREFIX + ",\nl0 AS (SELECT id AS v, id AS label FROM ids)"
    for k in range(1, iters + 1):
        sql += f""",
l{k} AS (
  SELECT l.v, LEAST(l.label, COALESCE(m.mn, l.label)) AS label
  FROM l{k-1} l LEFT JOIN (
    SELECT e.src AS v2, MIN(x.label) AS mn
    FROM edges e JOIN l{k-1} x ON e.dst = x.v GROUP BY e.src
  ) m ON m.v2 = l.v
)"""
    sql += (
        f"\nSELECT i.name AS name, l.label AS label FROM l{iters} l"
        " JOIN ids i ON i.id = l.v ORDER BY name"
    )
    return sql


def _modularity_oracle(iters: int = LP_MIN_ITERS) -> str:
    """Newman modularity of the unrolled lp-min communities. ``comm`` is
    MATERIALIZED: it is referenced three times (both edge-endpoint joins +
    the degree aggregate), and the l{k} chain is quadratic-ish to inline —
    materializing the final labels keeps the chain evaluated once."""
    sql = _GRAPH_PREFIX + ",\nl0 AS (SELECT id AS v, id AS label FROM ids)"
    for k in range(1, iters + 1):
        sql += f""",
l{k} AS (
  SELECT l.v, LEAST(l.label, COALESCE(m.mn, l.label)) AS label
  FROM l{k-1} l LEFT JOIN (
    SELECT e.src AS v2, MIN(x.label) AS mn
    FROM edges e JOIN l{k-1} x ON e.dst = x.v GROUP BY e.src
  ) m ON m.v2 = l.v
)"""
    sql += f""",
comm AS MATERIALIZED (SELECT v, label FROM l{iters}),
degs AS (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
t1 AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS two_m,
         CAST(SUM(CASE WHEN cs.label = cd.label THEN 1 ELSE 0 END) AS DOUBLE) AS e_in
  FROM edges e JOIN comm cs ON cs.v = e.src JOIN comm cd ON cd.v = e.dst
),
t2 AS (
  SELECT SUM(dc * dc) AS sum_dc2, CAST(COUNT(*) AS BIGINT) AS n_communities
  FROM (SELECT c.label, SUM(d.d) AS dc FROM comm c JOIN degs d ON d.v = c.v GROUP BY c.label) g
)
SELECT ROUND(t1.e_in / t1.two_m - t2.sum_dc2 / (t1.two_m * t1.two_m), 6) AS modularity,
       t2.n_communities AS n_communities,
       CAST(t1.two_m AS BIGINT) AS two_m
FROM t1 CROSS JOIN t2"""
    return sql


def _conductance_oracle(iters: int = COMMUNITY_GRAPH_ITERS) -> str:
    """Per-community conductance of the unrolled lp-min communities
    (plans/labelprop.conductance semantics, exactly). ``comm`` is
    MATERIALIZED for the _modularity_oracle reason (two endpoint joins
    over a quadratic-to-inline label chain); cut/volume are exact BIGINTs
    and the ratio is the one rounded double."""
    sql = _GRAPH_PREFIX + ",\nl0 AS (SELECT id AS v, id AS label FROM ids)"
    for k in range(1, iters + 1):
        sql += f""",
l{k} AS (
  SELECT l.v, LEAST(l.label, COALESCE(m.mn, l.label)) AS label
  FROM l{k-1} l LEFT JOIN (
    SELECT e.src AS v2, MIN(x.label) AS mn
    FROM edges e JOIN l{k-1} x ON e.dst = x.v GROUP BY e.src
  ) m ON m.v2 = l.v
)"""
    sql += f""",
comm AS MATERIALIZED (SELECT v, label FROM l{iters}),
per AS (
  SELECT cs.label AS label, CAST(COUNT(*) AS BIGINT) AS volume,
         CAST(SUM(CASE WHEN cs.label <> cd.label THEN 1 ELSE 0 END) AS BIGINT) AS cut
  FROM edges e JOIN comm cs ON cs.v = e.src JOIN comm cd ON cd.v = e.dst
  GROUP BY cs.label
),
tm AS (SELECT CAST(COUNT(*) AS BIGINT) AS two_m FROM edges)
SELECT i.name AS community, p.cut, p.volume,
       CASE WHEN LEAST(p.volume, tm.two_m - p.volume) > 0
            THEN ROUND(CAST(p.cut AS DOUBLE)
                       / LEAST(p.volume, tm.two_m - p.volume), 6)
            ELSE 0.0 END AS conductance
FROM per p CROSS JOIN tm JOIN ids i ON i.id = p.label
ORDER BY community"""
    return sql


def _dup_spans_oracle(
    n: int = DUPSPAN_N, min_docs: int = DUPSPAN_MIN_DOCS
) -> str:
    """Duplicated n-gram spans (functions/dedup.duplicated_spans
    semantics, exactly): positions are 1-based on both engines
    (Spark sequence/slice ≡ DuckDB range/list-slice), the gram key is the
    md5 of the space-joined tokens, and coverage is the distinct union of
    each duplicated occurrence's n token positions. ``grams``/``dgrams``
    are MATERIALIZED (each referenced more than once)."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
  FROM documents
),
grams AS MATERIALIZED (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens, pos,
         md5(array_to_string(l[pos : pos + {n} - 1], ' ')) AS g
  FROM (SELECT doc_id, l, unnest(range(1, len(l) - {n} + 2)) AS pos
        FROM toks)
),
dupg AS (
  SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
  WHERE nd >= {min_docs}
),
dgrams AS MATERIALIZED (
  SELECT doc_id, pos FROM grams JOIN dupg USING (g)
),
perg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams
  FROM dgrams GROUP BY doc_id
),
cov AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_tokens FROM (
    SELECT DISTINCT d.doc_id, d.pos + o.off AS i
    FROM dgrams d CROSS JOIN (SELECT unnest(range(0, {n})) AS off) o
  ) GROUP BY doc_id
),
base AS (
  SELECT doc_id, MAX(n_tokens) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM grams GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.n_grams,
       CAST(COALESCE(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(COALESCE(c.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       ROUND(CAST(COALESCE(p.n_dup_grams, 0) AS DOUBLE) / b.n_grams, 6)
         AS dup_gram_ratio,
       ROUND(CAST(COALESCE(c.n_dup_tokens, 0) AS DOUBLE) / b.n_tokens, 6)
         AS dup_token_ratio
FROM base b LEFT JOIN perg p USING (doc_id) LEFT JOIN cov c USING (doc_id)
ORDER BY b.doc_id"""


def _community_graph_oracle(iters: int = COMMUNITY_GRAPH_ITERS) -> str:
    """Weighted super-graph of the unrolled lp-min communities. ``comm`` is
    MATERIALIZED for the same reason as _modularity_oracle's (two endpoint
    joins over a quadratic-to-inline chain)."""
    sql = _GRAPH_PREFIX + ",\nl0 AS (SELECT id AS v, id AS label FROM ids)"
    for k in range(1, iters + 1):
        sql += f""",
l{k} AS (
  SELECT l.v, LEAST(l.label, COALESCE(m.mn, l.label)) AS label
  FROM l{k-1} l LEFT JOIN (
    SELECT e.src AS v2, MIN(x.label) AS mn
    FROM edges e JOIN l{k-1} x ON e.dst = x.v GROUP BY e.src
  ) m ON m.v2 = l.v
)"""
    sql += f""",
comm AS MATERIALIZED (SELECT v, label FROM l{iters}),
sup AS (
  SELECT LEAST(cs.label, cd.label) AS ca_id,
         GREATEST(cs.label, cd.label) AS cb_id,
         CAST(COUNT(*) AS BIGINT) AS weight
  FROM edges e JOIN comm cs ON cs.v = e.src JOIN comm cd ON cd.v = e.dst
  WHERE e.src < e.dst AND cs.label <> cd.label
  GROUP BY 1, 2
)
SELECT ia.name AS ca, ib.name AS cb, sup.weight AS weight
FROM sup JOIN ids ia ON ia.id = sup.ca_id JOIN ids ib ON ib.id = sup.cb_id
ORDER BY ca, cb"""
    return sql


def _lp_majority_oracle(iters: int = LP_MAJ_ITERS) -> str:
    sql = _GRAPH_PREFIX + ",\nm0 AS (SELECT id AS v, id AS label FROM ids)"
    for k in range(1, iters + 1):
        sql += f""",
m{k} AS (
  SELECT v, label FROM (
    SELECT e.src AS v, x.label AS label, COUNT(*) AS c,
           ROW_NUMBER() OVER (
             PARTITION BY e.src ORDER BY COUNT(*) DESC, x.label ASC
           ) AS rn
    FROM edges e JOIN m{k-1} x ON e.dst = x.v
    GROUP BY e.src, x.label
  ) t WHERE rn = 1
)"""
    sql += (
        f"\nSELECT i.name AS name, m.label AS label FROM m{iters} m"
        " JOIN ids i ON i.id = m.v ORDER BY name"
    )
    return sql


# ---------------------------------------------------------------------------
# portable-hash oracle fragments (DuckDB side of functions/dedup.py's md5int)
# ---------------------------------------------------------------------------

def _md5int_duck(expr: str, offset: int = 1, chars: int = 8) -> str:
    """DuckDB expression equal to Spark's conv(substring(md5(x),off,n),16,10):
    positional hex fold of md5 digits — bit-identical integers on both sides."""
    terms = [
        f"(CAST(POSITION(SUBSTR(md5({expr}), {offset + i}, 1) IN"
        f" '0123456789abcdef') AS BIGINT) - 1) * {16 ** (chars - 1 - i)}"
        for i in range(chars)
    ]
    return "(" + " + ".join(terms) + ")"


def _cms_oracle(
    depth: int = None, width: int = None, topk: int = None
) -> str:
    """Rebuilds the count–min grid in SQL (same md5-fold slot hash as
    functions/sketch._cms_slot) and point-estimates the same exact top-k
    terms — every (exact, est) pair must match the engine bit-for-bit."""
    depth = CMS_DEPTH if depth is None else depth
    width = CMS_WIDTH if width is None else width
    topk = CMS_TOPK if topk is None else topk
    fold_g = _md5int_duck("'cms' || CAST(r.r AS VARCHAR) || ':' || term")
    fold_q = _md5int_duck("'cms' || CAST(r.r AS VARCHAR) || ':' || t.term")
    rs = ", ".join(str(i) for i in range(depth))
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
rows_ AS (SELECT unnest([{rs}]) AS r),
grid AS (
  SELECT r.r AS row, {fold_g} % {width} AS slot, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks, rows_ r GROUP BY 1, 2
),
top AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact FROM toks GROUP BY term
  ORDER BY exact DESC, term LIMIT {topk}
),
qslots AS (
  SELECT t.term, t.exact, r.r AS row, {fold_q} % {width} AS slot
  FROM top t, rows_ r
),
est AS (
  SELECT q.term, q.exact, MIN(COALESCE(g.cnt, 0)) AS est
  FROM qslots q LEFT JOIN grid g ON g.row = q.row AND g.slot = q.slot
  GROUP BY q.term, q.exact
)
SELECT term, exact, est FROM est ORDER BY term"""


def _hll_oracle(p: int = None) -> str:
    """Rebuilds the HLL register table in SQL (15-hex-digit md5 fold,
    reg = h mod m, rho = leading zeros of h div m within 60−p bits) and
    applies the identical estimator: raw_sum is an EXACT bigint so the
    estimate is one deterministic double expression; the small-range
    linear-counting branch condition evaluates on the same double."""
    p = HLL_P if p is None else p
    m = 1 << p
    wbits = 60 - p
    rmax = wbits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    k_lit = repr(alpha * m * m * float(1 << rmax))
    fold15 = _md5int_duck("term", 1, 15)
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
dt AS (SELECT DISTINCT term FROM toks),
hv AS (SELECT {fold15} AS h FROM dt),
rv AS (SELECT h % {m} AS reg, h // {m} AS w FROM hv),
rr AS (
  SELECT reg,
         MAX(CASE WHEN w = 0 THEN {rmax}
                  ELSE {wbits} - length(bin(w)) + 1 END) AS rho
  FROM rv GROUP BY reg
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nz,
         CAST(SUM(CAST(POWER(2.0, {rmax} - rho) AS BIGINT)) AS BIGINT) AS s_occ
  FROM rr
),
fin AS (
  SELECT nz, s_occ + ({m} - nz) * {1 << rmax} AS raw_sum,
         {k_lit} / (s_occ + ({m} - nz) * {1 << rmax}) AS est_raw
  FROM agg
)
SELECT CAST({m} AS INT) AS m, nz AS nonzero_regs, raw_sum,
       ROUND(CASE WHEN est_raw <= {2.5 * m} AND ({m} - nz) > 0
                  THEN {float(m)!r} * LN({float(m)!r} / ({m} - nz))
                  ELSE est_raw END, 4) AS estimate,
       (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) FROM toks) AS exact
FROM fin"""


def _hll_rolling_oracle(
    p: int = None,
    bucket_us: int = None,
    window_buckets: int = None,
) -> str:
    """Rebuilds the per-day register tables and the trailing-window
    register-max merge in SQL (functions/sketch.hll_rolling_distinct
    semantics, exactly): same md5 fold on CAST(user_id AS VARCHAR), int64
    µs floor-division buckets (non-negative epochs), the window explode a
    constant-table cross join, and the identical exact-bigint estimator
    per window."""
    p = HLL_P if p is None else p
    bucket_us = ROLL_BUCKET_US if bucket_us is None else bucket_us
    window_buckets = (
        ROLL_WINDOW_BUCKETS if window_buckets is None else window_buckets
    )
    m = 1 << p
    wbits = 60 - p
    rmax = wbits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    k_lit = repr(alpha * m * m * float(1 << rmax))
    fold15 = _md5int_duck("k", 1, 15)
    return f"""
WITH ev AS (
  SELECT epoch_us(ts) // {bucket_us} AS b, CAST(user_id AS VARCHAR) AS k
  FROM events
),
dk AS (SELECT DISTINCT b, k FROM ev),
hv AS (SELECT b, {fold15} AS h FROM dk),
rv AS (SELECT b, h % {m} AS reg, h // {m} AS w FROM hv),
rb AS MATERIALIZED (
  SELECT b, reg,
         MAX(CASE WHEN w = 0 THEN {rmax}
                  ELSE {wbits} - length(bin(w)) + 1 END) AS rho
  FROM rv GROUP BY b, reg
),
offs AS (SELECT unnest(range(0, {window_buckets})) AS off),
mg AS (
  SELECT rb.b + o.off AS wd, rb.reg, MAX(rb.rho) AS rho
  FROM rb CROSS JOIN offs o GROUP BY rb.b + o.off, rb.reg
),
nb AS (
  SELECT db.b + o.off AS wd, CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM (SELECT DISTINCT b FROM ev) db CROSS JOIN offs o
  GROUP BY db.b + o.off
),
agg AS (
  SELECT wd, CAST(COUNT(*) AS BIGINT) AS nz,
         CAST(SUM(CAST(POWER(2.0, {rmax} - rho) AS BIGINT)) AS BIGINT) AS s_occ
  FROM mg GROUP BY wd
),
fin AS (
  SELECT wd, nz, s_occ + ({m} - nz) * {1 << rmax} AS raw_sum,
         {k_lit} / (s_occ + ({m} - nz) * {1 << rmax}) AS est_raw
  FROM agg
)
SELECT f.wd * {bucket_us} AS asof_bucket_us, nb.n_buckets,
       f.nz AS nonzero_regs, f.raw_sum,
       ROUND(CASE WHEN f.est_raw <= {2.5 * m} AND ({m} - f.nz) > 0
                  THEN {float(m)!r} * LN({float(m)!r} / ({m} - f.nz))
                  ELSE f.est_raw END, 4) AS estimate
FROM fin f JOIN nb ON nb.wd = f.wd
ORDER BY asof_bucket_us"""


# shared DuckDB shingle CTE (4-gram whitespace shingles, distinct per doc) —
# mirrors functions/dedup.py shingles()
_DUCK_SHINGLES = """
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[g.g:g.g+3], ' ') AS s
  FROM toks, (SELECT unnest(generate_series(1, 4096)) AS g) g
  WHERE g.g <= len(t) - 3
)"""


def _minhash_oracle(threshold: float = 0.6, k: int = 32, bands: int = 8) -> str:
    """Replicates minhash_near_dup_pairs exactly: md5int shingle hash,
    k affine permutations mod 2^31-1 (the well-mixed wrap — see
    functions/dedup._PERM_P), banded candidates, exact-Jaccard
    verification over the full shingle sets."""
    from parconnect_spark.functions.dedup import _M31, _PERM_P, _minhash_perm_coeffs

    h = _md5int_duck("s") + f" % {_M31}"
    mins = []
    for i, (a, b) in enumerate(_minhash_perm_coeffs(k)):
        mins.append(f"MIN((h * {a} + {b}) % {_PERM_P}) AS m{i}")
    rows = k // bands
    band_keys = ",\n    ".join(
        "(" + str(bnd) + ", "
        + " || ',' || ".join(f"CAST(m{bnd * rows + r} AS VARCHAR)" for r in range(rows))
        + ")"
        for bnd in range(bands)
    )
    return f"""
WITH {_DUCK_SHINGLES},
hashed AS (SELECT doc_id, {h} AS h FROM sh),
sigs AS (SELECT doc_id, {', '.join(mins)} FROM hashed GROUP BY doc_id),
banded AS (
  SELECT doc_id, b.* FROM sigs, LATERAL (VALUES
    {band_keys}
  ) AS b(band, bh)
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT cd.id_a, cd.id_b, COUNT(*) AS nshared
  FROM cands cd
  JOIN sh a ON a.doc_id = cd.id_a
  JOIN sh b ON b.doc_id = cd.id_b AND b.s = a.s
  GROUP BY cd.id_a, cd.id_b
)
SELECT id_a, id_b, ROUND(nshared * 1.0 / (sa.n + sb.n - nshared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(nshared * 1.0 / (sa.n + sb.n - nshared), 6) >= {threshold}
ORDER BY id_a, id_b"""


def _minhash_cluster_prefix(threshold: float = 0.6, k: int = 32, bands: int = 8) -> str:
    """Shared CTE chain: minhash pairs (same CTEs as _minhash_oracle)
    followed by a recursive min-reach closure over the pair graph — the SQL
    twin of near_dup_clusters (CC labels = min reachable id; singletons
    self). Ends with the ``reach`` CTE; callers append their final SELECT
    (dedup_clusters reads the canonical map, leakage_split hashes it into
    train/holdout sides)."""
    from parconnect_spark.functions.dedup import _M31, _PERM_P, _minhash_perm_coeffs

    h = _md5int_duck("s") + f" % {_M31}"
    mins = []
    for i, (a, b) in enumerate(_minhash_perm_coeffs(k)):
        mins.append(f"MIN((h * {a} + {b}) % {_PERM_P}) AS m{i}")
    rows = k // bands
    band_keys = ",\n    ".join(
        "(" + str(bnd) + ", "
        + " || ',' || ".join(f"CAST(m{bnd * rows + r} AS VARCHAR)" for r in range(rows))
        + ")"
        for bnd in range(bands)
    )
    return f"""
WITH RECURSIVE {_DUCK_SHINGLES},
hashed AS (SELECT doc_id, {h} AS h FROM sh),
sigs AS (SELECT doc_id, {', '.join(mins)} FROM hashed GROUP BY doc_id),
banded AS (
  SELECT doc_id, b.* FROM sigs, LATERAL (VALUES
    {band_keys}
  ) AS b(band, bh)
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT cd.id_a, cd.id_b, COUNT(*) AS nshared
  FROM cands cd
  JOIN sh a ON a.doc_id = cd.id_a
  JOIN sh b ON b.doc_id = cd.id_b AND b.s = a.s
  GROUP BY cd.id_a, cd.id_b
),
dpairs AS (
  SELECT id_a, id_b
  FROM shared
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(nshared * 1.0 / (sa.n + sb.n - nshared), 6) >= {threshold}
),
de AS (
  SELECT id_a AS src, id_b AS dst FROM dpairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM dpairs
),
reach(v, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN de e ON e.src = r.v
)"""


def _dedup_clusters_oracle(threshold: float = 0.6, k: int = 32, bands: int = 8) -> str:
    return _minhash_cluster_prefix(threshold, k, bands) + """
SELECT v AS doc_id, MIN(lbl) AS canonical_id
FROM reach GROUP BY v ORDER BY doc_id"""


def _leakage_split_oracle(
    holdout_frac: float = 0.2, threshold: float = 0.6, k: int = 32, bands: int = 8
) -> str:
    """cluster_split's SQL twin: the cluster canonical map, then the salted
    md5 hash of the canonical id picks the side — whole clusters move as
    one unit (functions/sampling.cluster_split)."""
    u = _md5int_duck("'split:' || CAST(canonical_id AS VARCHAR)")
    return _minhash_cluster_prefix(threshold, k, bands) + f""",
canon AS (SELECT v AS doc_id, MIN(lbl) AS canonical_id FROM reach GROUP BY v)
SELECT doc_id, canonical_id,
       CASE WHEN {u} / 4294967296.0 < {holdout_frac}
            THEN 'holdout' ELSE 'train' END AS side
FROM canon ORDER BY doc_id"""


def _simhash_oracle(max_hamming: int = 3) -> str:
    """Replicates simhash_near_pairs exactly: 60-bit md5int token hash,
    per-bit vote sums, 4×15-bit quarter banding, bit_count Hamming verify."""
    from parconnect_spark.functions.dedup import SIMHASH_BITS

    h = _md5int_duck("tok", 1, 15)
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    acc = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(SIMHASH_BITS)
    )
    quarters = ",\n    ".join(
        f"({q}, (simhash >> {q * 15}) & 32767)" for q in range(4)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
hashed AS (SELECT doc_id, {h} AS h FROM tok),
votes AS (
  SELECT doc_id,
    {votes}
  FROM hashed GROUP BY doc_id
),
sims AS (SELECT doc_id, {acc} AS simhash FROM votes),
quarters AS (
  SELECT doc_id, simhash, q.* FROM sims, LATERAL (VALUES
    {quarters}
  ) AS q(q, qh)
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS ha, b.simhash AS hb
  FROM quarters a JOIN quarters b ON a.q = b.q AND a.qh = b.qh
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cands WHERE bit_count(xor(ha, hb)) <= {max_hamming}
ORDER BY id_a, id_b"""


def _similarity_lsh_oracle(k: int = 10, bits: int = 8, dim: int = 64) -> str:
    """Replicates lsh_topk exactly: the ±1 hyperplane matrix is embedded as
    literals (same splitmix64 derivation as functions/similarity.py), bucket
    codes from dot-product signs, Hamming-1 multiprobe, cosine top-k."""
    from parconnect_spark.functions.similarity import _projection_matrix

    proj = _projection_matrix(bits, dim, seed=1234)
    bit_terms = []
    for i in range(bits):
        vec = "[" + ", ".join(f"{x:.1f}" for x in proj[i]) + "]::DOUBLE[]"
        bit_terms.append(
            f"CASE WHEN list_dot_product(ev, {vec}) >= 0 THEN {1 << i} ELSE 0 END"
        )
    bucket = " + ".join(bit_terms)
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << i})" for i in range(bits)])
    return f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
coded AS (SELECT vec_id, ev, {bucket} AS bucket FROM base),
q AS (
  SELECT vec_id AS query_id, ev AS qv, unnest([{probes}]) AS bucket
  FROM coded WHERE vec_id < 5
),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id, q.qv, c.ev AS cv
  FROM q JOIN coded c USING (bucket)
  WHERE q.query_id <> c.vec_id
),
scored AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cosine
  FROM cand
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, CAST(rk AS INT) AS rank
FROM r WHERE rk <= {k} ORDER BY query_id, rank"""


_CC_REACH = """,
reach(v, lbl) AS (
  SELECT id, id FROM ids
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.v
),
vlabels AS (SELECT v, MIN(lbl) AS label FROM reach GROUP BY v)"""

_TRI_CTE = """,
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM undl e1
  JOIN undl e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN undl e3 ON e3.src = e1.dst AND e3.dst = e2.dst
)"""


def oracle_sql() -> dict[str, str]:
    return {
        "derived_edges": _GRAPH_PREFIX + "\nSELECT a, b FROM und ORDER BY a, b",
        "relabel_map": _GRAPH_PREFIX + "\nSELECT name, id FROM ids ORDER BY name",
        "text_invariant": _GRAPH_PREFIX
        + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN s.text IS DISTINCT FROM t.text THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM seq s JOIN transcripts t ON s.conv_id = t.conv_id AND s.turn_idx = t.turn_idx""",
        "degree_histogram": _GRAPH_PREFIX
        + """
SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS frequency
FROM (SELECT src, CAST(COUNT(DISTINCT dst) AS BIGINT) AS deg FROM edges GROUP BY src) d
GROUP BY deg ORDER BY degree""",
        "cc_labels": _GRAPH_PREFIX
        + _CC_REACH
        + """
SELECT i.name AS name, l.label AS label
FROM vlabels l JOIN ids i ON i.id = l.v ORDER BY name""",
        "cc_labels_local_contract": _GRAPH_PREFIX
        + _CC_REACH
        + """
SELECT i.name AS name, l.label AS label
FROM vlabels l JOIN ids i ON i.id = l.v ORDER BY name""",
        "cc_labels_salted_fused": _GRAPH_PREFIX
        + _CC_REACH
        + """
SELECT i.name AS name, l.label AS label
FROM vlabels l JOIN ids i ON i.id = l.v ORDER BY name""",
        # incremental_cc must equal a full recompute on the edge union, so
        # its oracle IS the cc_labels full-graph min-reach.
        "cc_incremental": _GRAPH_PREFIX
        + _CC_REACH
        + """
SELECT i.name AS name, l.label AS label
FROM vlabels l JOIN ids i ON i.id = l.v ORDER BY name""",
        # window-tagged graph: same derivation chain as GRAPH_CTES with the
        # conversation's week prefixed onto every entity, then the cc_labels
        # min-reach, aggregated per window.
        # graph_diff: same wund snapshot fragment as cc_temporal, then
        # pure set algebra between consecutive weeks.
        "graph_diff": "WITH "
        + TRANSCRIPTS_CTE
        + """,
wturns AS (
  SELECT conv_id, turn_idx,
         CAST(CAST(date_trunc('week', ts) AS DATE) AS STRING) AS w,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS raw
  FROM transcripts
),
wseq AS (
  SELECT conv_id, w, raw,
         LEAD(raw) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_raw
  FROM wturns
),
wpairs AS (
  SELECT w || '|' || raw AS a, w || '|' || next_raw AS b
  FROM wseq WHERE next_raw IS NOT NULL
  UNION ALL
  SELECT w || '|' || 'c:' || conv_id AS a, w || '|' || raw AS b FROM wturns
),
wund AS (
  SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM wpairs WHERE a <> b
),
snap AS (
  SELECT DISTINCT split_part(a, '|', 1) AS w,
         split_part(a, '|', 2) AS ea, split_part(b, '|', 2) AS eb
  FROM wund
),
wk AS (
  SELECT w AS w_from, LEAD(w) OVER (ORDER BY w) AS w_to
  FROM (SELECT DISTINCT w FROM snap) t
),
wkp AS (SELECT w_from, w_to FROM wk WHERE w_to IS NOT NULL),
cur AS (
  SELECT p.w_from, p.w_to, s.ea, s.eb, 1 AS c
  FROM wkp p JOIN snap s ON s.w = p.w_from
),
nxt AS (
  SELECT p.w_from, p.w_to, s.ea, s.eb, 1 AS n
  FROM wkp p JOIN snap s ON s.w = p.w_to
),
j AS (
  SELECT COALESCE(c.w_from, n.w_from) AS w_from,
         COALESCE(c.w_to, n.w_to) AS w_to,
         c.c AS c, n.n AS n
  FROM cur c FULL OUTER JOIN nxt n
    ON c.w_from = n.w_from AND c.w_to = n.w_to
   AND c.ea = n.ea AND c.eb = n.eb
)
SELECT w_from, w_to,
       CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN c IS NOT NULL AND n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM j GROUP BY w_from, w_to ORDER BY w_from""",
        "cc_temporal": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
wturns AS (
  SELECT conv_id, turn_idx,
         CAST(CAST(date_trunc('week', ts) AS DATE) AS STRING) AS w,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS raw
  FROM transcripts
),
wseq AS (
  -- LEAD over the UNTAGGED entity: a sequential edge belongs to its
  -- EARLIER turn's window, so both endpoints take the current row's w
  -- (599 week-crossing consecutive pairs at sf0.01 — tagging next_entity
  -- with its own week would leak edges across snapshot boundaries).
  SELECT conv_id, w, raw,
         LEAD(raw) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_raw
  FROM wturns
),
wpairs AS (
  SELECT w || '|' || raw AS a, w || '|' || next_raw AS b
  FROM wseq WHERE next_raw IS NOT NULL
  UNION ALL
  SELECT w || '|' || 'c:' || conv_id AS a, w || '|' || raw AS b FROM wturns
),
wund AS (
  SELECT DISTINCT LEAST(a, b) AS a, GREATEST(a, b) AS b FROM wpairs WHERE a <> b
),
wnames AS (
  SELECT DISTINCT name
  FROM (SELECT a AS name FROM wund UNION ALL SELECT b AS name FROM wund) nn
),
wids AS (
  SELECT name, CAST(DENSE_RANK() OVER (ORDER BY name) - 1 AS BIGINT) AS id
  FROM wnames
),
wundl AS (
  SELECT s.id AS src, d.id AS dst
  FROM wund JOIN wids s ON wund.a = s.name JOIN wids d ON wund.b = d.name
),
wedges AS (
  SELECT src, dst FROM wundl UNION ALL SELECT dst AS src, src AS dst FROM wundl
),
wreach(v, lbl) AS (
  SELECT id, id FROM wids
  UNION
  SELECT e.dst, r.lbl FROM wreach r JOIN wedges e ON e.src = r.v
),
wvlabels AS (SELECT v, MIN(lbl) AS label FROM wreach GROUP BY v),
vw AS (
  SELECT SPLIT_PART(i.name, '|', 1) AS win, l.label
  FROM wvlabels l JOIN wids i ON i.id = l.v
),
comp AS (SELECT win, label, COUNT(*) AS n FROM vw GROUP BY win, label),
stats AS (
  SELECT win AS week, CAST(COUNT(*) AS BIGINT) AS components,
         CAST(MAX(n) AS BIGINT) AS largest,
         CAST(SUM(n) AS BIGINT) AS n_vertices
  FROM comp GROUP BY win
),
ecnt AS (
  SELECT SPLIT_PART(a, '|', 1) AS week, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM wund GROUP BY 1
)
SELECT s.week AS week, s.components, s.largest, s.n_vertices, e.n_edges
FROM stats s JOIN ecnt e ON e.week = s.week ORDER BY week""",
        "negative_samples": _negative_samples_oracle(),
        "snowball": _snowball_oracle(),
        "hub_knockout": _GRAPH_PREFIX
        + """,
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
hubs AS (SELECT src FROM deg ORDER BY d DESC, src LIMIT 3),
kept AS (
  SELECT e.src, e.dst FROM edges e
  WHERE e.src NOT IN (SELECT src FROM hubs)
    AND e.dst NOT IN (SELECT src FROM hubs)
),
kverts AS (SELECT DISTINCT src AS v FROM kept),
kreach(v, lbl) AS (
  SELECT v, v FROM kverts
  UNION
  SELECT e.dst, r.lbl FROM kreach r JOIN kept e ON e.src = r.v
),
klabels AS (SELECT v, MIN(lbl) AS label FROM kreach GROUP BY v),
comp AS (SELECT label, COUNT(*) AS n FROM klabels GROUP BY label),
stats AS (
  SELECT COUNT(*) AS c, COALESCE(MAX(n), 0) AS m,
         COALESCE(SUM(n), 0) AS survivors
  FROM comp
),
tot AS (SELECT COUNT(*) AS nv FROM ids)
SELECT CAST(3 AS BIGINT) AS removed,
       CAST(s.c + (t.nv - 3 - s.survivors) AS BIGINT) AS components,
       CAST(GREATEST(s.m, CASE WHEN t.nv - 3 - s.survivors > 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS largest,
       CAST(t.nv - 3 - s.survivors AS BIGINT) AS isolated
FROM stats s, tot t""",
        "cc_stats": _GRAPH_PREFIX
        + _CC_REACH
        + """,
comp AS (SELECT label, COUNT(*) AS n FROM vlabels GROUP BY label)
SELECT CAST(COUNT(*) AS BIGINT) AS components, CAST(MAX(n) AS BIGINT) AS largest FROM comp""",
        "cc_chains": "WITH RECURSIVE "
        + CHAIN_CTES.strip()
        + """,
cverts AS (SELECT DISTINCT src AS v FROM chain_edges),
reach(v, lbl) AS (
  SELECT v, v FROM cverts
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN chain_edges e ON e.src = r.v
)
SELECT v, MIN(lbl) AS label FROM reach GROUP BY v ORDER BY v""",
        "bfs_chain": "WITH "
        + CHAIN_CTES.strip()
        + """,
mn AS (SELECT MIN(u) AS m FROM users)
SELECT u AS v, CASE WHEN u = mn.m THEN u ELSE u - 1 END AS parent
FROM users CROSS JOIN mn
WHERE u - mn.m < 10 ORDER BY v""",
        "bfs_chain_csr": "WITH "
        + CHAIN_CTES.strip()
        + """,
mn AS (SELECT MIN(u) AS m FROM users)
SELECT u AS v, CASE WHEN u = mn.m THEN u ELSE u - 1 END AS parent
FROM users CROSS JOIN mn
WHERE u - mn.m < 10 ORDER BY v""",
        "cc_kronecker": _cc_kronecker_oracle(),
        "cc_hybrid": _cc_hybrid_oracle(),
        "pagerank": _pagerank_oracle(),
        "rank_corr": _rank_corr_oracle(),
        "pagerank_seeded": _ppr_oracle(),
        "pagerank_weighted": _wpr_oracle(),
        # fixed 64-hop recursion caps: exact whenever eccentricities < 64
        # (the sf0.01 entity graph's diameter is single-digit; the cap only
        # bounds the recursive row growth (v, d) per level).
        "harmonic_centrality": _GRAPH_PREFIX
        + f""",
roots AS (SELECT id AS root FROM ids WHERE id < {HARMONIC_SOURCES}),
mreach(root, v, d) AS (
  SELECT root, root, 0 FROM roots
  UNION
  SELECT r.root, e.dst, r.d + 1 FROM mreach r JOIN edges e ON e.src = r.v WHERE r.d < 64
),
mind AS (SELECT root, v, MIN(d) AS d FROM mreach GROUP BY root, v)
SELECT i.name AS name, ROUND(SUM(1.0 / d), 6) AS harmonic
FROM mind JOIN ids i ON i.id = mind.v WHERE d > 0
GROUP BY i.name ORDER BY name""",
        "bipartite_cooccur": "WITH " + TRANSCRIPTS_CTE + f""",
turns AS (
  SELECT conv_id,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool ELSE 'r:' || role END AS entity
  FROM transcripts
),
mem AS (SELECT DISTINCT conv_id, entity FROM turns),
keep AS (
  SELECT conv_id FROM mem GROUP BY conv_id HAVING COUNT(*) <= {BIPARTITE_MAX_GROUP}
),
m2 AS (SELECT mem.conv_id, mem.entity FROM mem JOIN keep USING (conv_id))
SELECT a.entity AS a, b.entity AS b, CAST(COUNT(*) AS BIGINT) AS weight
FROM m2 a JOIN m2 b ON a.conv_id = b.conv_id AND a.entity < b.entity
GROUP BY a.entity, b.entity ORDER BY a, b""",
        "closeness": _GRAPH_PREFIX
        + f""",
roots AS (SELECT id AS root FROM ids WHERE id < {HARMONIC_SOURCES}),
mreach(root, v, d) AS (
  SELECT root, root, 0 FROM roots
  UNION
  SELECT r.root, e.dst, r.d + 1 FROM mreach r JOIN edges e ON e.src = r.v WHERE r.d < 64
),
mind AS (SELECT root, v, MIN(d) AS d FROM mreach GROUP BY root, v)
SELECT i.name AS name, CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM(d) AS BIGINT) AS total_dist,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(d), 6) AS closeness
FROM mind JOIN ids i ON i.id = mind.v WHERE d > 0
GROUP BY i.name ORDER BY name""",
        "bfs_distances": _GRAPH_PREFIX
        + """,
dist(v, d) AS (
  SELECT CAST(0 AS BIGINT) AS v, 0 AS d
  UNION
  SELECT e.dst, r.d + 1 FROM dist r JOIN edges e ON e.src = r.v WHERE r.d < 64
)
SELECT i.name AS name, CAST(MIN(r.d) AS INT) AS dist
FROM dist r JOIN ids i ON i.id = r.v GROUP BY i.name ORDER BY name""",
        "landmark_distances": _GRAPH_PREFIX
        + """,
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
lm AS (SELECT src AS root FROM deg ORDER BY d DESC, src LIMIT 3),
walk(root, v, d) AS (
  SELECT root, root, 0 FROM lm
  UNION
  SELECT w.root, e.dst, w.d + 1
  FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.d < 32
)
SELECT root, v, CAST(MIN(d) AS INT) AS dist
FROM walk GROUP BY root, v ORDER BY root, v""",
        "pseudo_diameter": _GRAPH_PREFIX
        + """,
dist0(v, d) AS (
  SELECT CAST(0 AS BIGINT) AS v, 0 AS d
  UNION
  SELECT e.dst, r.d + 1 FROM dist0 r JOIN edges e ON e.src = r.v WHERE r.d < 64
),
d0 AS MATERIALIZED (SELECT v, MIN(d) AS d FROM dist0 GROUP BY v),
far AS MATERIALIZED (SELECT v, d FROM d0 ORDER BY d DESC, v ASC LIMIT 1),
dist1(v, d) AS (
  SELECT v, 0 AS d FROM far
  UNION
  SELECT e.dst, r.d + 1 FROM dist1 r JOIN edges e ON e.src = r.v WHERE r.d < 64
),
d1 AS (SELECT v, MIN(d) AS d FROM dist1 GROUP BY v)
SELECT CAST(0 AS BIGINT) AS start,
       CAST((SELECT d FROM far) AS INT) AS start_ecc,
       CAST((SELECT v FROM far) AS BIGINT) AS far_vertex,
       CAST(MAX(d) AS INT) AS diameter_lb
FROM d1""",
        "scc": _GRAPH_PREFIX
        + """,
dedges AS (
  SELECT DISTINCT s.id AS src, d.id AS dst
  FROM pairs p JOIN ids s ON p.a = s.name JOIN ids d ON p.b = d.name
  WHERE p.a <> p.b
),
dreach(a, b) AS (
  SELECT src, dst FROM dedges
  UNION
  SELECT r.a, e.dst FROM dreach r JOIN dedges e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS u, r1.b AS v
  FROM dreach r1 JOIN dreach r2 ON r2.a = r1.b AND r2.b = r1.a
)
SELECT i.name AS name, CAST(LEAST(i.id, COALESCE(MIN(m.u), i.id)) AS BIGINT) AS scc
FROM ids i LEFT JOIN mutual m ON m.v = i.id
GROUP BY i.name, i.id ORDER BY name""",
        "hits": _hits_oracle(),
        "eigencentrality": _eigen_oracle(),
        "partition_stats": _partition_stats_oracle(),
        "katz": _katz_oracle(),
        "funnel": _funnel_oracle(),
        "link_prediction": _linkpred_oracle(),
        "kcore": _kcore_oracle(),
        "coreness": _coreness_oracle(),
        "betweenness": _betweenness_oracle(),
        "sssp": _sssp_oracle(),
        # cycle property: under the (weight, a, b) total order the MSF is
        # unique, and an edge belongs to it iff its endpoints are NOT
        # connected using only strictly smaller edges. One recursive CTE
        # carries per-candidate-edge reachability over smaller edges —
        # an algorithm independent of both Borůvka and union-find.
        "msf": _GRAPH_PREFIX
        + """,
wund AS MATERIALIZED (
  SELECT s.id AS a, d.id AS b, CAST(COUNT(*) AS BIGINT) AS wt
  FROM (SELECT LEAST(a, b) AS na, GREATEST(a, b) AS nb
        FROM pairs WHERE a <> b) p
  JOIN ids s ON p.na = s.name JOIN ids d ON p.nb = d.name
  GROUP BY s.id, d.id
),
reach(ea, eb, ew, v) AS (
  SELECT a, b, wt, a FROM wund
  UNION
  SELECT r.ea, r.eb, r.ew,
         CASE WHEN w.a = r.v THEN w.b ELSE w.a END
  FROM reach r JOIN wund w ON (w.a = r.v OR w.b = r.v)
  WHERE (w.wt, w.a, w.b) < (r.ew, r.ea, r.eb)
)
SELECT ia.name AS a, ib.name AS b, m.wt AS weight
FROM wund m JOIN ids ia ON ia.id = m.a JOIN ids ib ON ib.id = m.b
WHERE NOT EXISTS (
  SELECT 1 FROM reach r WHERE r.ea = m.a AND r.eb = m.b AND r.v = m.b
)
ORDER BY a, b""",
        "graph_sparsify": _GRAPH_PREFIX
        + """,
w AS (
  SELECT LEAST(a, b) AS na, GREATEST(a, b) AS nb,
         CAST(COUNT(*) AS BIGINT) AS weight
  FROM pairs WHERE a <> b GROUP BY 1, 2
),
sym AS (
  SELECT na AS src, nb AS dst, weight FROM w
  UNION ALL
  SELECT nb AS src, na AS dst, weight FROM w
),
r AS (
  SELECT src, dst, weight,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY weight DESC, dst) AS rk
  FROM sym
)
SELECT src, dst, weight FROM r WHERE rk <= 3 ORDER BY src, dst""",
        "mis": _mis_oracle(),
        "coloring": _coloring_oracle(),
        "wl_refinement": _wl_oracle(),
        "dag_layers": _dag_layers_oracle(),
        "anf": _anf_oracle(),
        "kmeans": _kmeans_oracle(),
        "louvain": _louvain_oracle(),
        "matching": _matching_oracle(),
        "densest": _densest_oracle(),
        "ktruss": _ktruss_oracle(),
        "graph_walks": _walks_oracle(),
        "walk_pairs": _walk_pairs_oracle(),
        "labelprop_min": _lp_min_oracle(),
        "labelprop_majority": _lp_majority_oracle(),
        "modularity": _modularity_oracle(),
        "conductance": _conductance_oracle(),
        "community_graph": _community_graph_oracle(COMMUNITY_GRAPH_ITERS),
        "triangle_count": _GRAPH_PREFIX
        + _TRI_CTE
        + "\nSELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri",
        "triangles_per_vertex": _GRAPH_PREFIX
        + _TRI_CTE
        + """,
longf AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT i.name AS name, CAST(COUNT(*) AS BIGINT) AS triangles
FROM longf l JOIN ids i ON i.id = l.v GROUP BY i.name ORDER BY name""",
        "vertex_features": _GRAPH_PREFIX
        + _TRI_CTE
        + """,
deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src),
tpv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
    SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) t GROUP BY v
),
annd AS (
  SELECT e.src AS v, AVG(CAST(d.degree AS DOUBLE)) AS avg_nbr_deg
  FROM edges e JOIN deg d ON d.v = e.dst GROUP BY e.src
)
SELECT i.name AS name, g.degree AS degree,
       CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
       ROUND(CASE WHEN g.degree >= 2
                  THEN 2.0 * COALESCE(t.triangles, 0)
                       / (CAST(g.degree AS DOUBLE) * (g.degree - 1.0))
                  ELSE 0.0 END, 6) AS lcc,
       ROUND(a.avg_nbr_deg, 6) AS avg_nbr_deg
FROM deg g JOIN ids i ON i.id = g.v
LEFT JOIN tpv t ON t.v = g.v
JOIN annd a ON a.v = g.v
ORDER BY name""",
        "assortativity": _GRAPH_PREFIX
        + """,
deg AS (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src)
SELECT ROUND(CORR(s.d, t.d), 6) AS assortativity,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM edges e JOIN deg s ON s.v = e.src JOIN deg t ON t.v = e.dst""",
        # transitivity: triangle CTE + closed-form wedge sum; both counts
        # exact int64 (// is DuckDB integer division — d*(d-1) is even so
        # the halving is exact; a double quotient would lose bits past 2^53
        # at web scale), the ratio the only double, rounded 6dp both sides.
        "transitivity": _GRAPH_PREFIX
        + _TRI_CTE
        + """,
tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri),
wc AS (
  SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) AS n_wedges
  FROM (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
)
SELECT n_triangles, n_wedges,
       CASE WHEN n_wedges > 0
            THEN ROUND(3.0 * n_triangles / n_wedges, 6)
            ELSE 0.0 END AS transitivity
FROM tc, wc""",
        # butterflies: bipartite_cooccur's projection + one scalar
        # aggregate (sum of per-pair C(w,2), integer //) — same declared
        # max-group-size cap.
        "butterflies": "WITH " + TRANSCRIPTS_CTE + f""",
turns AS (
  SELECT conv_id,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool ELSE 'r:' || role END AS entity
  FROM transcripts
),
mem AS (SELECT DISTINCT conv_id, entity FROM turns),
keep AS (
  SELECT conv_id FROM mem GROUP BY conv_id HAVING COUNT(*) <= {BIPARTITE_MAX_GROUP}
),
m2 AS (SELECT mem.conv_id, mem.entity FROM mem JOIN keep USING (conv_id)),
proj AS (
  SELECT a.entity AS a, b.entity AS b, COUNT(*) AS w
  FROM m2 a JOIN m2 b ON a.conv_id = b.conv_id AND a.entity < b.entity
  GROUP BY a.entity, b.entity
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COALESCE(SUM(w * (w - 1) // 2), 0) AS BIGINT) AS n_butterflies
FROM proj""",
        # reciprocity: distinct directed pairs (the scc oracle's edge set,
        # pre-relabel) self-joined against their reverse; counts exact
        # int64, the ratio the only double.
        "reciprocity": _GRAPH_PREFIX
        + """,
dpairs AS (SELECT DISTINCT a, b FROM pairs WHERE a <> b),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM dpairs),
rec AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_reciprocal
  FROM dpairs e JOIN dpairs r ON r.a = e.b AND r.b = e.a
)
SELECT n_edges, n_reciprocal,
       CASE WHEN n_edges > 0
            THEN ROUND(n_reciprocal / CAST(n_edges AS DOUBLE), 6)
            ELSE 0.0 END AS reciprocity
FROM tot, rec""",
        # rich_club: strict suffix sums over the merged degree-value
        # histogram (undl rows already have src<dst — ids are dense ranks
        # of lexicographically ordered names, so the canonical half is
        # undl itself); phi is the identical 2.0*e/(n*(n-1)) IEEE expression
        "rich_club": _GRAPH_PREFIX
        + """,
deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src),
vh AS (SELECT degree AS k, COUNT(*) AS vc FROM deg GROUP BY degree),
eh AS (
  SELECT LEAST(d1.degree, d2.degree) AS k, COUNT(*) AS ec
  FROM undl JOIN deg d1 ON undl.src = d1.v JOIN deg d2 ON undl.dst = d2.v
  GROUP BY 1
),
merged AS (
  SELECT COALESCE(vh.k, eh.k) AS k, COALESCE(vc, 0) AS vc, COALESCE(ec, 0) AS ec
  FROM vh FULL OUTER JOIN eh ON vh.k = eh.k
),
suff AS (
  SELECT k,
         CAST(COALESCE(SUM(vc) OVER (ORDER BY k DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_k,
         CAST(COALESCE(SUM(ec) OVER (ORDER BY k DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS e_k
  FROM merged
)
SELECT k, n_k, e_k,
       ROUND(2.0 * e_k / CAST(n_k * (n_k - 1) AS DOUBLE), 6) AS phi
FROM suff WHERE n_k >= 2 ORDER BY k""",
        # turn_dedup: the oracle picks the canonical keeper with a window
        # (fine at oracle scale); the engine uses the skew-safe
        # hash-aggregate + join-back (no windows) — same keeper by the
        # same (conv_id, turn_idx) lexicographic rule.
        "turn_dedup": "WITH " + TRANSCRIPTS_CTE + f""",
st AS (
  SELECT text, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_groups
  FROM transcripts GROUP BY text
),
rn AS (
  SELECT conv_id, turn_idx, text,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY conv_id, turn_idx) AS rn
  FROM transcripts
)
SELECT r.conv_id, r.turn_idx, r.text, s.n_groups
FROM rn r JOIN st s USING (text)
WHERE s.n_groups <= {BOILERPLATE_MAX_CONVS} OR r.rn = 1
ORDER BY conv_id, turn_idx""",
        "dedup_exact": """
WITH fps AS (
  SELECT doc_id AS id,
         md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
  FROM documents
)
SELECT id, fp, CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS group_size
FROM fps ORDER BY id""",
        "dedup_ngram": f"""
WITH {_DUCK_SHINGLES},
hot AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) > 1000),
shf AS (SELECT doc_id, s FROM sh ANTI JOIN hot USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(c * 1.0 / (sa.n + sb.n - c), 6) >= 0.6
ORDER BY id_a, id_b""",
        "dedup_prefix": f"""
WITH {_DUCK_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 5 * c >= 3 * (sa.n + sb.n - c)
ORDER BY id_a, id_b""",
        # blocklist_filter: ground truth is the plain exact anti-join by
        # content fingerprint — algorithm-independent, so it proves the
        # Bloom prefilter changed the shuffle, not the answer.
        "blocklist_filter": r"""
WITH fps AS (
  SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
  FROM documents
),
bl AS (SELECT fp FROM fps WHERE doc_id % 7 = 0)
SELECT doc_id, fp FROM fps ANTI JOIN bl USING (fp) ORDER BY doc_id""",
        # curation_funnel: full staged replay — quality gate, min-per-fp
        # exact dedup, ngram pair graph transitively closed by a recursive
        # min-reach CTE, fingerprint blocklist; counts per stage.
        "curation_funnel": "WITH RECURSIVE "
        + _DUCK_SHINGLES.lstrip()
        + r""",
fps AS (
  SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok
  FROM documents
),
q AS (SELECT doc_id, fp FROM fps WHERE ntok >= 20),
ex AS (
  SELECT doc_id FROM q
  WHERE doc_id = (SELECT MIN(q2.doc_id) FROM q q2 WHERE q2.fp = q.fp)
),
shx AS (SELECT sh.doc_id, sh.s FROM sh JOIN ex USING (doc_id)),
hot AS (SELECT s FROM shx GROUP BY s HAVING COUNT(*) > 1000),
shf AS (SELECT doc_id, s FROM shx ANTI JOIN hot USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dpairs AS (
  SELECT id_a, id_b FROM shared
  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(c * 1.0 / (sa.n + sb.n - c), 6) >= 0.6
),
de AS (
  SELECT id_a AS src, id_b AS dst FROM dpairs
  UNION ALL SELECT id_b AS src, id_a AS dst FROM dpairs
),
reach(v, lbl) AS (
  SELECT doc_id, doc_id FROM ex
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN de e ON e.src = r.v
),
canon AS (SELECT v AS doc_id, MIN(lbl) AS canonical_id FROM reach GROUP BY v),
nd AS (SELECT doc_id FROM canon WHERE doc_id = canonical_id),
bl AS (SELECT fp FROM fps WHERE doc_id % 13 = 0),
fin AS (
  SELECT nd.doc_id FROM nd JOIN fps USING (doc_id) ANTI JOIN bl USING (fp)
)
SELECT * FROM (
  SELECT 1 AS stage_idx, 'input' AS stage,
         (SELECT COUNT(*) FROM documents) AS n_docs
  UNION ALL SELECT 2, 'quality', (SELECT COUNT(*) FROM q)
  UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM ex)
  UNION ALL SELECT 4, 'near_dedup', (SELECT COUNT(*) FROM nd)
  UNION ALL SELECT 5, 'blocklist', (SELECT COUNT(*) FROM fin)
) ORDER BY stage_idx""",
        "doc_chunks": """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
base AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
ch AS (
  SELECT doc_id, g.g AS chunk_idx,
         t[g.g * 48 + 1 : g.g * 48 + 64] AS c
  FROM base, (SELECT unnest(generate_series(0, 4096)) AS g) g
  WHERE g.g <= (GREATEST(n - 64, 0) + 47) // 48
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(len(c) AS INT) AS n_tokens,
       array_to_string(c, ' ') AS chunk
FROM ch ORDER BY doc_id, chunk_idx""",
        "inverted_index": """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
p AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY term, doc_id
),
dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM p GROUP BY term),
r AS (
  SELECT term, doc_id, tf,
         CAST(ROW_NUMBER() OVER (PARTITION BY term
                                 ORDER BY tf DESC, doc_id) AS INT) AS rank
  FROM p
)
SELECT r.term, dfc.df, r.rank, r.doc_id, r.tf
FROM r JOIN dfc ON dfc.term = r.term
WHERE r.rank <= 5 ORDER BY r.term, r.rank""",
        "bm25": _BM25_ORACLE,
        "hybrid_rank": _hybrid_rank_oracle(),
        "fuzzy_terms": """
WITH vocab AS (
  SELECT DISTINCT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS s
  FROM documents
)
SELECT a.s AS a, b.s AS b, CAST(levenshtein(a.s, b.s) AS INT) AS dist
FROM vocab a JOIN vocab b
  ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 2
WHERE levenshtein(a.s, b.s) <= 2
ORDER BY a, b""",
        "frequent_itemsets": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
bk AS (
  SELECT DISTINCT conv_id AS bid,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS item
  FROM transcripts
),
l1 AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS support
  FROM bk GROUP BY item HAVING COUNT(*) >= 10
),
bf AS (SELECT b.* FROM bk b SEMI JOIN l1 ON b.item = l1.item),
l2 AS (
  SELECT a.item AS i1, b.item AS i2, CAST(COUNT(*) AS BIGINT) AS support
  FROM bf a JOIN bf b ON a.bid = b.bid AND a.item < b.item
  GROUP BY 1, 2 HAVING COUNT(*) >= 10
),
l3 AS (
  SELECT x.i1, x.i2, y.i2 AS i3, CAST(COUNT(*) AS BIGINT) AS support
  FROM l2 x JOIN l2 y ON x.i1 = y.i1 AND x.i2 < y.i2
  SEMI JOIN l2 z ON z.i1 = x.i2 AND z.i2 = y.i2
  JOIN bf t1 ON t1.item = x.i1
  JOIN bf t2 ON t2.bid = t1.bid AND t2.item = x.i2
  JOIN bf t3 ON t3.bid = t1.bid AND t3.item = y.i2
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 10
)
SELECT * FROM (
  SELECT 1 AS size, item AS i1, CAST(NULL AS VARCHAR) AS i2,
         CAST(NULL AS VARCHAR) AS i3, support FROM l1
  UNION ALL
  SELECT 2, i1, i2, CAST(NULL AS VARCHAR), support FROM l2
  UNION ALL
  SELECT 3, i1, i2, i3, support FROM l3
) _ ORDER BY size, i1, i2, i3""",
        "association_rules": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
bk AS (
  SELECT DISTINCT conv_id AS bid,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS item
  FROM transcripts
),
n AS (SELECT COUNT(DISTINCT bid) AS nb FROM bk),
l1 AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM bk
  GROUP BY item HAVING COUNT(*) >= 10
),
l2 AS (
  SELECT a.item AS i1, b.item AS i2, CAST(COUNT(*) AS BIGINT) AS support
  FROM bk a SEMI JOIN l1 x ON a.item = x.item
  JOIN bk b ON a.bid = b.bid AND a.item < b.item
  SEMI JOIN l1 y ON b.item = y.item
  GROUP BY 1, 2 HAVING COUNT(*) >= 10
),
rl AS (
  SELECT i1, i2, support FROM l2
  UNION ALL SELECT i2, i1, support FROM l2
)
SELECT b.i1 AS antecedent, b.i2 AS consequent, b.support,
       ROUND(b.support * 1.0 / sa.s, 6) AS confidence,
       ROUND((b.support * 1.0 / sa.s) / (sb.s * 1.0 / n.nb), 6) AS lift
FROM rl b
JOIN l1 sa ON sa.item = b.i1
JOIN l1 sb ON sb.item = b.i2
CROSS JOIN n
WHERE b.support * 1.0 / sa.s >= 0.5
ORDER BY antecedent, consequent""",
        "dp_counts": _dp_counts_oracle(),
        "bootstrap_ci": _bootstrap_oracle(),
        "ab_test": """
WITH a AS (
  SELECT CAST(user_id % 2 AS INT) AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
  FROM events
),
agg AS (
  SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
         SUM(CASE WHEN arm = 0 THEN s ELSE 0 END) AS s0,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN arm = 1 THEN s ELSE 0 END) AS s1
  FROM a
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(s0 AS BIGINT) AS s0,
       CAST(n1 AS BIGINT) AS n1, CAST(s1 AS BIGINT) AS s1,
       ROUND(s0 * 1.0 / n0, 6) AS p0,
       ROUND(s1 * 1.0 / n1, 6) AS p1,
       ROUND((s1 * 1.0 / n1 - s0 * 1.0 / n0)
             / SQRT((s0 + s1) * 1.0 / (n0 + n1)
                    * (1 - (s0 + s1) * 1.0 / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 6) AS z
FROM agg""",
        "changepoint": """
WITH daily AS (
  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT g, d,
         AVG(n) OVER (PARTITION BY g) AS m,
         SUM(n) OVER (PARTITION BY g ORDER BY d)
           - ROW_NUMBER() OVER (PARTITION BY g ORDER BY d)
             * AVG(n) OVER (PARTITION BY g) AS s
  FROM daily
),
best AS (
  SELECT g, d, s, m,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY ABS(s) DESC, d) AS rk
  FROM scored
)
SELECT g AS "group", d AS change_day, ROUND(s, 6) AS cusum_peak,
       ROUND(m, 6) AS series_mean
FROM best WHERE rk = 1 ORDER BY "group" """,
        "activity_gini": """
WITH cnt AS (SELECT user_id AS u, COUNT(*) AS x FROM events GROUP BY user_id),
rk AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, u) AS i FROM cnt)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(x) AS BIGINT) AS total,
       ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM rk""",
        "seasonality": """
WITH daily AS (
  SELECT event_type AS t, (epoch_us(ts) // 86400000000) % 7 AS dw,
         COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT t, g.g AS dw
  FROM (SELECT DISTINCT t FROM daily),
       (SELECT unnest(generate_series(0, 6)) AS g) g
),
filled AS (
  SELECT gr.t, gr.dw, COALESCE(daily.o, 0) AS o
  FROM grid gr LEFT JOIN daily ON daily.t = gr.t AND daily.dw = gr.dw
),
tot AS (SELECT t, SUM(o) AS n FROM filled GROUP BY t)
SELECT f.t AS event_type, CAST(tot.n AS BIGINT) AS n,
       ROUND(SUM((f.o - tot.n / 7.0) * (f.o - tot.n / 7.0)
                 / (tot.n / 7.0)), 6) AS chi2
FROM filled f JOIN tot ON tot.t = f.t
GROUP BY f.t, tot.n ORDER BY event_type""",
        "schema_contract": """
SELECT * FROM (VALUES
  ('event_id', 'bigint', 'bigint', 'ok'),
  ('event_type', 'string', 'string', 'ok'),
  ('missing_col', 'int', NULL, 'missing'),
  ('props', NULL, 'string', 'extra'),
  ('ts', 'timestamp_ntz', 'timestamp_ntz', 'ok'),
  ('user_id', 'bigint', 'bigint', 'ok'),
  ('value', 'string', 'double', 'type_mismatch')
) AS t("column", expected_type, actual_type, status)
ORDER BY "column" """,
        "temporal_split": """
WITH r AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
)
SELECT CASE WHEN rk = 1 THEN 'test' ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM r GROUP BY 1 ORDER BY split""",
        "survival": """
WITH life AS (
  SELECT user_id,
         MAX(epoch_us(ts) // 86400000000)
           - MIN(epoch_us(ts) // 86400000000) AS lf
  FROM events GROUP BY user_id
),
n AS (SELECT COUNT(*) AS c FROM life),
mx AS (SELECT MAX(lf) AS m FROM life),
days AS (SELECT unnest(generate_series(0, (SELECT m FROM mx))) AS day)
SELECT d.day,
       CAST((SELECT COUNT(*) FROM life WHERE lf >= d.day) AS BIGINT)
         AS n_surviving,
       ROUND((SELECT COUNT(*) FROM life WHERE lf >= d.day) * 1.0
             / n.c, 6) AS frac
FROM days d, n ORDER BY day""",
        "markov_stationary": _markov_oracle(),
        "forecast": """
WITH daily AS (
  SELECT event_type AS g, epoch_us(ts) // 86400000000 AS d, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
spans AS (SELECT g, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY g),
grid AS (
  SELECT s.g, s.d0, s.d1, gg.g2 AS d
  FROM spans s, LATERAL (SELECT unnest(generate_series(s.d0, s.d1)) AS g2) gg
),
filled AS (
  SELECT gr.g, gr.d0, gr.d1, gr.d, COALESCE(daily.n, 0) AS n
  FROM grid gr LEFT JOIN daily ON daily.g = gr.g AND daily.d = gr.d
)
SELECT g AS "group", d1 AS last_day,
       ROUND(SUM(n * (0.25 * POWER(0.75, d1 - d)
                      + CASE WHEN d = d0
                             THEN POWER(0.75, d1 - d0 + 1)
                             ELSE 0 END)), 6) AS forecast
FROM filled GROUP BY g, d0, d1 ORDER BY "group" """,
        "k_anonymity": """
WITH g AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT CAST(3 AS INT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_k,
       CAST(MIN(n) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN n < 3 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       ROUND(SUM(CASE WHEN n < 3 THEN n ELSE 0 END) * 1.0 / SUM(n), 6)
         AS frac_at_risk
FROM g""",
        "readability": """
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS w,
         GREATEST(1, len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                     x -> x <> ''))) AS se,
         len(list_filter(regexp_split_to_array(lower(text), '[^aeiouy]+'),
                         x -> x <> '')) AS sy
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS n_words, CAST(se AS INT) AS n_sentences,
       CAST(sy AS INT) AS n_syllables,
       ROUND(206.835 - 1.015 * (w * 1.0 / se)
             - 84.6 * (sy * 1.0 / GREATEST(w, 1)), 6) AS flesch
FROM base WHERE w > 0 ORDER BY doc_id""",
        "ks_drift": """
WITH v AS (
  SELECT source AS g,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS x
  FROM documents
),
cnt AS (SELECT g, x, COUNT(*) AS n FROM v GROUP BY g, x),
tots AS (SELECT g, SUM(n) AS t FROM cnt GROUP BY g),
pairs AS (
  SELECT a.g AS ga, b.g AS gb
  FROM (SELECT DISTINCT g FROM cnt) a
  JOIN (SELECT DISTINCT g FROM cnt) b ON a.g < b.g
),
grid AS (SELECT p.ga, p.gb, xs.x FROM pairs p, (SELECT DISTINCT x FROM cnt) xs),
filled AS (
  SELECT gr.ga, gr.gb, gr.x,
         COALESCE(ca.n, 0) AS na, COALESCE(cb.n, 0) AS nb
  FROM grid gr
  LEFT JOIN cnt ca ON ca.g = gr.ga AND ca.x = gr.x
  LEFT JOIN cnt cb ON cb.g = gr.gb AND cb.x = gr.x
),
cum AS (
  SELECT ga, gb,
         SUM(na) OVER (PARTITION BY ga, gb ORDER BY x) AS ca,
         SUM(nb) OVER (PARTITION BY ga, gb ORDER BY x) AS cb
  FROM filled
)
SELECT c.ga AS source_a, c.gb AS source_b,
       ROUND(MAX(ABS(c.ca * 1.0 / ta.t - c.cb * 1.0 / tb.t)), 6) AS ks,
       CAST(ta.t AS BIGINT) AS n_a, CAST(tb.t AS BIGINT) AS n_b
FROM cum c JOIN tots ta ON ta.g = c.ga JOIN tots tb ON tb.g = c.gb
GROUP BY c.ga, c.gb, ta.t, tb.t ORDER BY source_a, source_b""",
        "token_entropy": """
WITH toks AS (
  SELECT source AS g,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
),
cnt AS (SELECT g, t, COUNT(*) AS n FROM toks GROUP BY g, t),
tot AS (SELECT g, SUM(n) AS tt, COUNT(*) AS nd FROM cnt GROUP BY g)
SELECT cnt.g AS "group", CAST(tot.tt AS BIGINT) AS n_tokens,
       CAST(tot.nd AS BIGINT) AS n_distinct,
       ROUND(-SUM((cnt.n * 1.0 / tot.tt) * ln(cnt.n * 1.0 / tot.tt)), 6)
         AS entropy
FROM cnt JOIN tot ON tot.g = cnt.g
GROUP BY cnt.g, tot.tt, tot.nd ORDER BY "group" """,
        "transition_entropy": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
tt AS (
  SELECT conv_id, turn_idx,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS entity
  FROM transcripts
),
tr AS (
  SELECT LAG(entity) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS a,
         entity AS b
  FROM tt
),
cnt AS (SELECT a, b, COUNT(*) AS n FROM tr WHERE a IS NOT NULL GROUP BY a, b),
tot AS (SELECT a, SUM(n) AS tt FROM cnt GROUP BY a)
SELECT cnt.a AS entity, CAST(tot.tt AS BIGINT) AS n_out,
       ROUND(-SUM((cnt.n * 1.0 / tot.tt) * ln(cnt.n * 1.0 / tot.tt)), 6)
         AS entropy
FROM cnt JOIN tot ON tot.a = cnt.a
GROUP BY cnt.a, tot.tt ORDER BY entity""",
        "tpch_pricing": """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
        "tpch_priority": """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10""",
        "tpch_region_revenue": """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE c.c_nationkey = s.s_nationkey AND r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name""",
        "tpch_custdist": """
WITH per AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""",
        "dedup_minhash": _minhash_oracle(),
        "incremental_dedup": _incremental_dedup_oracle(),
        "dedup_simhash": _simhash_oracle(),
        "dedup_clusters": _dedup_clusters_oracle(),
        "dup_spans": _dup_spans_oracle(),
        "leakage_split": _leakage_split_oracle(),
        # media_features: the decode itself (PPM/BMP/WAV/Y4M byte parsing)
        # is not expressible in SQL, so the oracle is a GOLDEN FIXTURE — a
        # parquet committed from a pinned run (tests/fixtures/, regenerated
        # + hash-compared by tests/test_multimodal.py::
        # test_media_features_golden_fixture_current), which DuckDB reads
        # like any other table. synth_media + the decoders are fully
        # deterministic (splitmix64 payloads, integer features), so the
        # comparison is exact, independent of sf: the query ignores sf_dir
        # by construction.
        "media_features": """
SELECT media_id, kind, n_bytes, checksum
FROM read_parquet('/root/repo/tests/fixtures/media_features_golden.parquet')
ORDER BY media_id""",
        # media_frames: same golden-fixture discipline (Y4M decode + PPM
        # re-encode is not SQL); the md5 column pins the decoded frame
        # BYTES, not just the row shape.
        "media_frames": """
SELECT media_id, frame_ms, width, height, frame_md5
FROM read_parquet('/root/repo/tests/fixtures/media_frames_golden.parquet')
ORDER BY media_id, frame_ms""",
        "dedup_embedding": _embedding_dedup_oracle(),
        "similarity_lsh": _similarity_lsh_oracle(),
        "similarity_ivf": _similarity_ivf_oracle(),
        "quality_features": """
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         length(replace(text, ' ', '')) AS ns
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars_total,
       CAST(ns AS INT) AS n_chars_nospace,
       ROUND(ns * 1.0 / GREATEST(len(toks), 1), 6) AS avg_token_len,
       ROUND(len(list_distinct(toks)) * 1.0 / GREATEST(len(toks), 1), 6) AS distinct_ratio,
       ROUND(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
             / GREATEST(length(text), 1), 6) AS punct_ratio
FROM base ORDER BY doc_id""",
        "language_confusion": """
WITH toks AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
  FROM documents
),
hits AS (
  SELECT doc_id, lang,
         len(list_intersect(t, ['the','and','of','to','a','in','is','that'])) AS h_en,
         len(list_intersect(t, ['el','la','de','que','y','los','en','un'])) AS h_es,
         len(list_intersect(t, ['le','la','et','les','des','un','une','dans'])) AS h_fr,
         len(list_intersect(t, ['der','die','und','das','ein','nicht','mit','ist'])) AS h_de
  FROM toks
),
pred AS (
  SELECT lang AS true_lang,
         CASE WHEN h_fr > 0 AND h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
              WHEN h_es > 0 AND h_es >= h_en AND h_es >= h_de THEN 'es'
              WHEN h_en > 0 AND h_en >= h_de THEN 'en'
              WHEN h_de > 0 THEN 'de'
              ELSE 'und' END AS predicted
  FROM hits
)
SELECT true_lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2 ORDER BY true_lang, predicted""",
        "language_id": """
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
  FROM documents
),
hits AS (
  SELECT doc_id,
         len(list_intersect(t, ['the','and','of','to','a','in','is','that'])) AS h_en,
         len(list_intersect(t, ['el','la','de','que','y','los','en','un'])) AS h_es,
         len(list_intersect(t, ['le','la','et','les','des','un','une','dans'])) AS h_fr,
         len(list_intersect(t, ['der','die','und','das','ein','nicht','mit','ist'])) AS h_de
  FROM toks
)
SELECT doc_id,
       CASE WHEN h_fr > 0 AND h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
            WHEN h_es > 0 AND h_es >= h_en AND h_es >= h_de THEN 'es'
            WHEN h_en > 0 AND h_en >= h_de THEN 'en'
            WHEN h_de > 0 THEN 'de'
            ELSE 'und' END AS lang_guess
FROM hits ORDER BY doc_id""",
        "contamination": f"""
WITH {_DUCK_SHINGLES},
tr AS (SELECT * FROM sh WHERE doc_id % 20 <> 0),
be AS (SELECT * FROM sh WHERE doc_id % 20 = 0),
hot AS (SELECT s FROM tr GROUP BY s HAVING COUNT(*) > 1000),
trf AS (SELECT doc_id, s FROM tr ANTI JOIN hot USING (s)),
bef AS (SELECT doc_id, s FROM be ANTI JOIN hot USING (s)),
bs AS (SELECT doc_id, COUNT(*) AS nb FROM bef GROUP BY doc_id),
shared AS (
  SELECT t.doc_id AS train_id, b.doc_id AS bench_id, COUNT(*) AS shared
  FROM trf t JOIN bef b ON t.s = b.s GROUP BY 1, 2
)
SELECT train_id, bench_id, shared,
       ROUND(shared * 1.0 / bs.nb, 6) AS overlap_frac
FROM shared JOIN bs ON bs.doc_id = bench_id
WHERE ROUND(shared * 1.0 / bs.nb, 6) >= 0.3
ORDER BY train_id, bench_id""",
        "stratified_sample": f"""
WITH u AS (
  SELECT *, {_md5int_duck("CAST(doc_id AS VARCHAR)")} / 4294967296.0 AS _u
  FROM documents
),
rates AS (
  SELECT lang, LEAST(1.0, 100.0 / COUNT(*)) AS tau FROM documents GROUP BY lang
),
surv AS (SELECT u.* FROM u JOIN rates USING (lang) WHERE _u < tau),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY _u ASC, doc_id ASC) AS rk
  FROM surv
)
SELECT doc_id, text, lang, source, n_chars, CAST(rk AS INT) AS sample_rank
FROM r WHERE rk <= 25 ORDER BY lang, sample_rank""",
        # redact: same progressive category order as
        # functions/text.PII_PATTERNS; RE2 (DuckDB) and Java regex (Spark)
        # agree on this conservative ASCII syntax, and the md5 fp pins the
        # redacted bytes.
        "redact": r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com via https://example.com/d/' || CAST(doc_id AS VARCHAR)
              || ' at 10.' || CAST(doc_id % 256 AS VARCHAR)
              || '.0.1 tel +49' || CAST(1000000 + doc_id AS VARCHAR) AS t0
  FROM documents
),
s1 AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(t0, 'https?://[A-Za-z0-9./_%+?=&#:-]+')) AS INT) AS n_url,
         regexp_replace(t0, 'https?://[A-Za-z0-9./_%+?=&#:-]+', '<URL>', 'g') AS t1
  FROM d
),
s2 AS (
  SELECT doc_id, n_url,
         CAST(length(regexp_extract_all(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
         regexp_replace(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_url, n_email,
         CAST(length(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
         regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t3
  FROM s2
),
s4 AS (
  SELECT doc_id, n_url, n_email, n_ipv4,
         CAST(length(regexp_extract_all(t3, '\+\d{7,15}\b')) AS INT) AS n_phone,
         regexp_replace(t3, '\+\d{7,15}\b', '<PHONE>', 'g') AS t4
  FROM s3
)
SELECT doc_id, n_url, n_email, n_ipv4, n_phone, md5(t4) AS fp
FROM s4 ORDER BY doc_id""",
        "sample_k": f"""
SELECT doc_id, md5(text) AS fp FROM (
  SELECT doc_id, text
  FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR) || ':r5'), doc_id
  LIMIT {SAMPLE_K}
) ORDER BY doc_id""",
        # weighted_sample: the Efraimidis–Spirakis race replayed exactly —
        # u from the same 13-hex-char md5 fold (52 bits: u and the key are
        # exact doubles), key = ROUND(-LN(u)/w * 1e6) AS BIGINT (non-negative,
        # so HALF_UP ≡ half-away-from-zero), id tiebreak
        "weighted_sample": f"""
SELECT doc_id, md5(text) AS fp FROM (
  SELECT doc_id, text
  FROM documents
  WHERE LENGTH(text) > 0
  ORDER BY CAST(ROUND(-LN(({_md5int_duck("CAST(doc_id AS VARCHAR) || ':r5w'", 1, 13)} + 0.5)
                      / 4503599627370496.0)
                / LENGTH(text) * 1000000) AS BIGINT),
           doc_id
  LIMIT {SAMPLE_K}
) ORDER BY doc_id""",
        # quality_trim: band membership by integer rank; the FLOOR/CEIL
        # boundary doubles are the same IEEE expression on both engines
        # (never pre-rounded driver-side).
        "quality_trim": f"""
WITH sc AS (
  SELECT doc_id,
         CAST(length(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS score
  FROM documents
),
rk AS (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score, doc_id) - 1 AS rank
  FROM sc
),
n AS (SELECT COUNT(*) AS n FROM sc)
SELECT doc_id, score, CAST(rank AS BIGINT) AS rank
FROM rk, n
WHERE rank >= FLOOR({TRIM_LO} * n.n) AND rank < CEIL({TRIM_HI} * n.n)
ORDER BY rank""",
        # group_trim: per-source top-30% by token count; rank arithmetic is
        # pure integer ((n*3)//10) and the threshold is the largest score
        # whose inclusive descending count reaches it — tie-closed, exact
        "group_trim": """
WITH sc AS (
  SELECT doc_id, source,
         CAST(length(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS score
  FROM documents
),
cnts AS (SELECT source, score, COUNT(*) AS c FROM sc GROUP BY source, score),
cum AS (
  SELECT source, score,
         SUM(c) OVER (PARTITION BY source ORDER BY score DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cge
  FROM cnts
),
tot AS (SELECT source, SUM(c) AS n FROM cnts GROUP BY source),
thr AS (
  SELECT cum.source, MAX(cum.score) AS thr
  FROM cum JOIN tot ON cum.source = tot.source
  WHERE (tot.n * 3) // 10 > 0 AND cum.cge >= (tot.n * 3) // 10
  GROUP BY cum.source
)
SELECT sc.doc_id, sc.source, sc.score
FROM sc JOIN thr ON sc.source = thr.source AND sc.score >= thr.thr
ORDER BY sc.doc_id""",
        # embedding_gram: same quantize grid as kmeans; DECIMAL(38,0)
        # sums are exact integers on both engines.
        "embedding_gram": """
WITH q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT) + 2000000) AS qv
  FROM embeddings
),
ex AS (
  SELECT vec_id, generate_subscripts(qv, 1) - 1 AS dim, UNNEST(qv) AS qq
  FROM q
),
pair AS (
  SELECT a.dim AS dim_i, b.dim AS dim_j,
         SUM(CAST(a.qq AS DECIMAL(38,0)) * b.qq) AS s_ij
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY 1, 2
),
sums AS (SELECT dim, SUM(CAST(qq AS DECIMAL(38,0))) AS s FROM ex GROUP BY dim),
nn AS (SELECT COUNT(*) AS n FROM q)
SELECT CAST(p.dim_i AS INT) AS dim_i, CAST(p.dim_j AS INT) AS dim_j,
       nn.n,
       CAST(sa.s AS DECIMAL(38,0)) AS s_i,
       CAST(sb.s AS DECIMAL(38,0)) AS s_j,
       CAST(p.s_ij AS DECIMAL(38,0)) AS s_ij
FROM pair p
JOIN sums sa ON sa.dim = p.dim_i
JOIN sums sb ON sb.dim = p.dim_j
CROSS JOIN nn
ORDER BY dim_i, dim_j""",
        # embedding_clusters: exact kNN ranks (the brute-force contract
        # baseline), mutuality by self-join, components by recursive CTE.
        "embedding_clusters": f"""
WITH RECURSIVE qv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
s AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb, list_cosine_similarity(a.v, b.v) AS cosine
  FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT qa, qb,
         ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cosine DESC, qb ASC) AS rk
  FROM s
),
nn AS (SELECT qa, qb FROM r WHERE rk <= {KNN_CLUSTER_K}),
mut AS (
  SELECT a.qa AS s0, a.qb AS d0
  FROM nn a JOIN nn b ON a.qa = b.qb AND a.qb = b.qa
  WHERE a.qa < a.qb
),
de AS (SELECT s0 AS src, d0 AS dst FROM mut
       UNION ALL SELECT d0, s0 FROM mut),
reach(v, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.dst, r2.lbl FROM reach r2 JOIN de e ON e.src = r2.v
),
canon AS (SELECT v, MIN(lbl) AS cluster FROM reach GROUP BY v),
sizes AS (SELECT cluster, COUNT(*) AS n_members FROM canon GROUP BY cluster)
SELECT CAST(c.v AS BIGINT) AS vec_id, CAST(c.cluster AS BIGINT) AS cluster,
       s2.n_members
FROM canon c JOIN sizes s2 ON s2.cluster = c.cluster
ORDER BY vec_id""",
        # source_overlap: DuckDB 1-based inclusive list slice ts[i:i+3]
        # = Spark slice(_toks, i, 4); both sides join 4 tokens by ' '.
        "source_overlap": """
WITH tok AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT source, list_aggregate(ts[i:i+3], 'string_agg', ' ') AS shingle
  FROM tok, UNNEST(range(1, len(ts) - 2)) AS r(i)
  WHERE len(ts) >= 4
),
sizes AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source),
common AS (
  SELECT a.source AS group_a, b.source AS group_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT c.group_a, c.group_b,
       c.n_common,
       sa.n_sh AS n_a, sb.n_sh AS n_b,
       (c.n_common * 1000) // (sa.n_sh + sb.n_sh - c.n_common) AS jaccard_pm
FROM common c
JOIN sizes sa ON sa.source = c.group_a
JOIN sizes sb ON sb.source = c.group_b
ORDER BY c.group_a, c.group_b""",
        # collocations: PMI rank key = floor of an exact-int64-product
        # double division — identical IEEE result on both engines; no ln.
        "collocations": f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
df AS (SELECT term, COUNT(*) AS n_t FROM tok GROUP BY term),
band AS (
  SELECT term, n_t FROM df
  WHERE n_t >= {COLLOC_MIN_DF} AND n_t <= {COLLOC_MAX_DF}
),
kept AS (SELECT tok.doc_id, tok.term, band.n_t FROM tok JOIN band USING (term)),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
pair AS (
  SELECT a.term AS term_a, b.term AS term_b,
         a.n_t AS n_a, b.n_t AS n_b, COUNT(*) AS n_pair
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) >= {COLLOC_MIN_COUNT}
)
SELECT term_a, term_b, n_pair, n_a, n_b,
       CAST(FLOOR(CAST(n_pair * n_docs * 1000000 AS DOUBLE)
                  / CAST(n_a * n_b AS DOUBLE)) AS BIGINT) AS pmi_score
FROM pair CROSS JOIN n
ORDER BY pmi_score DESC, term_a, term_b
LIMIT {COLLOC_TOPK}""",
        # sequence_pack: concatenate-then-chunk packing map — exscan of
        # (tokens + 1 separator) in doc_id order, chunk ids by int64
        # floor division. All-integer arithmetic on both engines.
        "sequence_pack": f"""
WITH toks AS (
  SELECT doc_id,
         CAST(length(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens + 1) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
  FROM toks
)
SELECT doc_id, n_tokens, start_tok,
       start_tok // {PACK_SEQ_LEN} AS seq_first,
       (start_tok + n_tokens + 1 - 1) // {PACK_SEQ_LEN} AS seq_last,
       start_tok % {PACK_SEQ_LEN} AS head_offset,
       (start_tok + n_tokens) // {PACK_SEQ_LEN} - start_tok // {PACK_SEQ_LEN} + 1 AS n_seqs
FROM cum ORDER BY doc_id""",
        # quantize: floor(x*127/s + 0.5) written as the same IEEE double
        # expression on both engines; scale is the float32 max|x| exactly
        # widened to double.
        "quantize": f"""
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         UNNEST(CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings WHERE vec_id < {QUANT_VECS}
),
sc AS (SELECT vec_id, MAX(ABS(x)) AS scale FROM ex GROUP BY vec_id)
SELECT e.vec_id, CAST(e.dim AS INT) AS dim,
       CAST(CASE WHEN s.scale = 0 THEN 0
                 ELSE FLOOR(e.x * 127.0 / s.scale + 0.5) END AS INT) AS q,
       s.scale
FROM ex e JOIN sc s ON s.vec_id = e.vec_id
ORDER BY e.vec_id, e.dim""",
        "sketch_counts": _cms_oracle(),
        "sketch_distinct": _hll_oracle(),
        "sketch_rolling": _hll_rolling_oracle(),
        # heavy_hitters: the sketch is a shuffle-pruning physical plan,
        # not a semantic approximation — the oracle is the exact
        # GROUP BY ... HAVING over the identical endpoint multiset
        "heavy_hitters": _GRAPH_PREFIX
        + f"""
, eps AS (SELECT a AS k FROM pairs UNION ALL SELECT b AS k FROM pairs)
SELECT k, COUNT(*) AS cnt FROM eps GROUP BY k
HAVING COUNT(*) >= {HH_MIN_COUNT} ORDER BY k""",
        # graph_summary: the dedicated queries' oracle CTEs composed into
        # one row — degree aggregate + recursive-CTE CC + the oriented
        # triangle join; the two doubles mirror the Spark expressions
        "graph_summary": _GRAPH_PREFIX
        + _CC_REACH
        + _TRI_CTE
        + """,
dg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
         CAST(MAX(d) AS BIGINT) AS max_degree,
         CAST(SUM(d) AS BIGINT) AS sumdeg
  FROM (SELECT src, COUNT(*) AS d FROM edges GROUP BY src) x
),
cmp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS components, CAST(MAX(n) AS BIGINT) AS largest
  FROM (SELECT label, COUNT(*) AS n FROM vlabels GROUP BY label) c
),
tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri)
SELECT dg.n_vertices,
       CAST(dg.sumdeg / 2 AS BIGINT) AS n_edges,
       ROUND(dg.sumdeg / (CAST(dg.n_vertices AS DOUBLE) * (dg.n_vertices - 1)), 6) AS density,
       dg.max_degree,
       ROUND(dg.sumdeg / CAST(dg.n_vertices AS DOUBLE), 6) AS avg_degree,
       cmp.components, cmp.largest, tc.n_triangles
FROM dg, cmp, tc""",
        # profile: int64 µ-unit quantization + DECIMAL(38,0) accumulators
        # (double SUMs are shuffle-order-dependent); derived doubles mirror
        # the Spark expressions division-by-division; median = lower order
        # statistic under (q, event_id)
        "profile": """
WITH nn AS (
  SELECT event_id, CAST(ROUND(value * 1000000) AS BIGINT) AS q
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
  FROM events
),
agg AS (
  SELECT MIN(q) AS qmin, MAX(q) AS qmax,
         SUM(CAST(q AS DECIMAL(38,0))) AS s1,
         SUM(CAST(q AS DECIMAL(38,0)) * q) AS s2,
         CAST(COUNT(*) AS BIGINT) AS nv
  FROM nn
),
rk AS (SELECT q, ROW_NUMBER() OVER (ORDER BY q, event_id) - 1 AS r FROM nn),
med AS (SELECT MAX(rk.q) AS qmed FROM rk, agg WHERE rk.r = (agg.nv - 1) // 2)
SELECT m.n, m.n_null,
       agg.qmin / 1000000 AS vmin,
       agg.qmax / 1000000 AS vmax,
       ROUND((CAST(agg.s1 AS DOUBLE) / agg.nv) / 1000000, 6) AS mean,
       ROUND(((CAST(agg.s2 AS DOUBLE) * agg.nv
               - CAST(agg.s1 AS DOUBLE) * CAST(agg.s1 AS DOUBLE))
              / (CAST(agg.nv AS DOUBLE) * agg.nv)) / 1000000000000.0, 6) AS variance,
       med.qmed / 1000000 AS median
FROM m, agg, med""",
        # trending_terms: per-(day, term) pre-aggregation merged per
        # trailing window (constant-table cross join, the sketch_rolling
        # shape); ranking is the total (cnt DESC, term ASC) integer/string
        # order — no doubles to reconcile
        "trending_terms": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + f""",
ev AS (
  SELECT epoch_us(ts) // {ROLL_BUCKET_US} AS b,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM transcripts
),
pb AS (SELECT b, term, COUNT(*) AS c FROM ev GROUP BY b, term),
offs AS (SELECT unnest(range(0, {ROLL_WINDOW_BUCKETS})) AS off),
mg AS (
  SELECT pb.b + o.off AS wd, term, CAST(SUM(c) AS BIGINT) AS cnt
  FROM pb CROSS JOIN offs o GROUP BY pb.b + o.off, term
),
rk AS (
  SELECT wd, term, cnt,
         ROW_NUMBER() OVER (PARTITION BY wd ORDER BY cnt DESC, term) AS rank
  FROM mg
)
SELECT wd * {ROLL_BUCKET_US} AS asof_bucket_us, CAST(rank AS INT) AS rank,
       term, cnt
FROM rk WHERE rank <= {TREND_K}
ORDER BY asof_bucket_us, rank""",
        # term_bursts: same per-(day, term) table, baseline = forward-
        # shifted constant-fan-out window merge; the burst predicate is
        # integer arithmetic, the ratio a display double (NULL for new terms)
        "term_bursts": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + f""",
ev AS (
  SELECT epoch_us(ts) // {ROLL_BUCKET_US} AS b,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM transcripts
),
pb AS (SELECT b, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY b, term),
offs AS (SELECT unnest(range(1, {ROLL_WINDOW_BUCKETS + 1})) AS off),
base AS (
  SELECT pb.b + o.off AS b, term, CAST(SUM(cnt) AS BIGINT) AS baseline
  FROM pb CROSS JOIN offs o GROUP BY pb.b + o.off, term
),
j AS (
  SELECT pb.b, pb.term, pb.cnt, COALESCE(base.baseline, 0) AS baseline
  FROM pb LEFT JOIN base ON pb.b = base.b AND pb.term = base.term
)
SELECT b * {ROLL_BUCKET_US} AS asof_bucket_us, term, cnt, baseline,
       CASE WHEN baseline > 0
            THEN ROUND(cnt * {float(ROLL_WINDOW_BUCKETS)!r} / baseline, 6)
            END AS ratio
FROM j
WHERE cnt >= {BURST_MIN_COUNT}
  AND cnt * {ROLL_WINDOW_BUCKETS * BURST_RATIO[1]} >= baseline * {BURST_RATIO[0]}
ORDER BY asof_bucket_us, term""",
        # lm_score: the per-bigram −ln(p)·10^6 is rounded to an int64 by
        # the IDENTICAL expression on both engines (non-negative, so
        # HALF_UP ≡ half-away-from-zero), and the document aggregate is an
        # exact int64 Σ — the tfidf_topk integer discipline. ``big`` is
        # MATERIALIZED: referenced by the LM build AND the scoring join.
        "lm_score": """
WITH toks AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS w1
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
        FROM documents)
),
big AS MATERIALIZED (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
lm AS (
  SELECT a.w1, a.w2,
         CAST(ROUND(-LN(CAST(a.c12 AS DOUBLE) / b.c1) * 1000000) AS BIGINT)
           AS nll6
  FROM c12 a JOIN c1 b ON a.w1 = b.w1
)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(l.nll6) AS BIGINT) AS nll6,
       ROUND(EXP(CAST(SUM(l.nll6) AS DOUBLE) / COUNT(*) / 1000000), 6)
         AS ppl
FROM big g JOIN lm l ON g.w1 = l.w1 AND g.w2 = l.w2
GROUP BY g.doc_id ORDER BY g.doc_id""",
        "bigram_lm": f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS w1
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
        FROM documents)
),
big AS (
  SELECT w1, w2 FROM (
    SELECT w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
rk AS (
  SELECT a.w1, a.w2, a.c12, b.c1,
         ROW_NUMBER() OVER (PARTITION BY a.w1 ORDER BY a.c12 DESC, a.w2) AS rn
  FROM c12 a JOIN c1 b ON a.w1 = b.w1
  WHERE b.c1 >= {BIGRAM_MIN_HEAD}
)
SELECT w1, w2, c12, c1, ROUND(CAST(c12 AS DOUBLE) / c1, 6) AS p
FROM rk WHERE rn <= 3 ORDER BY w1, w2""",
        # token_stats: DuckDB's RE2 and Spark's Java regex agree on this
        # ASCII-class pattern (verified row-exact at sf0.01); the 'g' flag
        # makes DuckDB's regexp_replace global like Spark's.
        # tfidf_topk: the sort key is the integer tf * round(ln*1e6) on
        # BOTH sides, so ulp differences between DuckDB's and the JVM's ln
        # cannot flip the per-doc ranking; tfidf = key/1e6 is the same
        # double on any IEEE engine.
        "tfidf_topk": f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * CAST(ROUND(LN((1.0 + n.n) / (1.0 + d.df)) * 1000000) AS BIGINT) AS skey
  FROM tf t JOIN dfreq d ON t.term = d.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, CAST(skey AS DOUBLE) / 1000000 AS tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY skey DESC, term) AS rn
  FROM scored
)
WHERE rn <= {TFIDF_TOPK}
ORDER BY doc_id, term""",
        "token_stats": r"""
SELECT doc_id,
       CAST(length(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
       CAST(length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
       md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id""",
        # repetition_stats: max n-gram COUNT only (no argmax gram), so
        # Spark and DuckDB agree exactly; DuckDB lists are 1-indexed and
        # range(1, n) is end-exclusive, hence the bounds below.
        "repetition_stats": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS words
  FROM documents
), base AS (
  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
         round((len(words) - len(list_distinct(words))) * 1.0
               / greatest(len(words), 1), 6) AS dup_word_frac
  FROM w
), g2 AS (
  SELECT doc_id, max(c) AS top2 FROM (
    SELECT doc_id, g, count(*) AS c FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(words)),
                                   i -> words[i] || ' ' || words[i+1])) AS g
      FROM w WHERE len(words) >= 2
    ) GROUP BY doc_id, g
  ) GROUP BY doc_id
), g3 AS (
  SELECT doc_id, max(c) AS top3 FROM (
    SELECT doc_id, g, count(*) AS c FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(words) - 1),
                                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS g
      FROM w WHERE len(words) >= 3
    ) GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT b.doc_id, b.n_words, b.dup_word_frac,
       round(coalesce(top2, 0) * 2.0 / greatest(b.n_words, 1), 6) AS top_bigram_frac,
       round(coalesce(top3, 0) * 3.0 / greatest(b.n_words, 1), 6) AS top_trigram_frac
FROM base b LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id)
ORDER BY doc_id""",
        # streaming_edges: identical to derived_edges by design — the
        # streaming path must reproduce the batch edge set exactly.
        "streaming_edges": _GRAPH_PREFIX + "\nSELECT a, b FROM und ORDER BY a, b",
        "similarity_topk": _TOPK_ORACLE,
        "ann_recall": _ann_recall_oracle(),
        "ivf_recall": _ivf_recall_oracle(),
        "streaming_degrees": _GRAPH_PREFIX
        + """
SELECT entity, CAST(COUNT(*) AS BIGINT) AS turns
FROM turns GROUP BY entity ORDER BY entity""",
        # streaming_terms: end-of-stream event-time day windows ≡ the
        # batch per-day token counts (UTC session tz makes Spark's 1-day
        # tumbling window the epoch_us floor-division bucket)
        "streaming_terms": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
ev AS (
  SELECT epoch_us(ts) // 86400000000 * 86400000000 AS bucket_us,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM transcripts
)
SELECT bucket_us, term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM ev GROUP BY bucket_us, term ORDER BY bucket_us, term""",
        # streaming_dedup: exactly-once despite doubled delivery — counts
        # equal the single-copy batch table.
        "streaming_dedup": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns
FROM transcripts GROUP BY conv_id ORDER BY conv_id""",
        # streaming_seq_join: the stream-stream interval self-join's
        # end-of-stream content is exactly the batch LEAD() transition
        # derivation (inner-join output is a set; the 90-day interval SLA
        # is far above the fixtures' measured ~4-day max adjacent gap).
        "streaming_seq_join": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
turns AS (
  SELECT conv_id, turn_idx,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool ELSE 'r:' || role END AS entity
  FROM transcripts
),
sq AS (
  SELECT entity AS a,
         LEAD(entity) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS b
  FROM turns
)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
FROM sq WHERE b IS NOT NULL GROUP BY a, b ORDER BY a, b""",
        "neighbor_agg": """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cosine
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id
),
r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM s
),
nn AS (SELECT query_id, neighbor_id FROM r WHERE rk <= 10),
ex AS (
  SELECT n.query_id AS query_id,
         generate_subscripts(e.embedding, 1) - 1 AS dim,
         UNNEST(CAST(e.embedding AS DOUBLE[])) AS val
  FROM nn n JOIN embeddings e ON e.vec_id = n.neighbor_id
)
SELECT query_id, CAST(dim AS INT) AS dim, ROUND(AVG(val), 6) AS mean_val,
       CAST(COUNT(*) AS BIGINT) AS n_neighbors
FROM ex GROUP BY query_id, dim ORDER BY query_id, dim""",
        # merge_upsert: the updated batch always carries ts + 1h > base ts,
        # so winners are exactly the update rows; untouched rows verbatim.
        "publish_audit": """
SELECT * FROM (
  SELECT 'documents' AS "table", 'not_null' AS "check", 'text' AS "column",
         CAST((SELECT COUNT(*) FROM documents WHERE text IS NULL) AS BIGINT)
           AS violations,
         TRUE AS passed
  UNION ALL
  SELECT 'documents', 'published_rows', '*',
         (SELECT COUNT(*) FROM documents), TRUE
  UNION ALL
  SELECT 'documents', 'unique', 'doc_id',
         (SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents), TRUE
) _ ORDER BY "check", "column" """,
        "table_stats": """
SELECT * FROM (
  SELECT '*' AS "column", CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_nulls,
         CAST(NULL AS BIGINT) AS n_distinct,
         CAST(NULL AS VARCHAR) AS min_repr, CAST(NULL AS VARCHAR) AS max_repr
  UNION ALL
  SELECT 'event_id',
         (SELECT COUNT(*) FROM events WHERE event_id IS NULL),
         (SELECT COUNT(DISTINCT event_id) FROM events),
         (SELECT CAST(MIN(event_id) AS VARCHAR) FROM events),
         (SELECT CAST(MAX(event_id) AS VARCHAR) FROM events)
  UNION ALL
  SELECT 'user_id',
         (SELECT COUNT(*) FROM events WHERE user_id IS NULL),
         (SELECT COUNT(DISTINCT user_id) FROM events),
         (SELECT CAST(MIN(user_id) AS VARCHAR) FROM events),
         (SELECT CAST(MAX(user_id) AS VARCHAR) FROM events)
  UNION ALL
  SELECT 'event_type',
         (SELECT COUNT(*) FROM events WHERE event_type IS NULL),
         (SELECT COUNT(DISTINCT event_type) FROM events),
         (SELECT MIN(event_type) FROM events),
         (SELECT MAX(event_type) FROM events)
) _ ORDER BY "column" """,
        "dq_report": """
SELECT "table", "check", "column", violations, violations = 0 AS passed
FROM (
  SELECT 'documents' AS "table", 'unique' AS "check", 'doc_id' AS "column",
         CAST((SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents) AS BIGINT) AS violations
  UNION ALL
  SELECT 'documents', 'not_null', 'text',
         (SELECT COUNT(*) FROM documents WHERE text IS NULL)
  UNION ALL
  SELECT 'events', 'not_null', 'value',
         (SELECT COUNT(*) FROM events WHERE value IS NULL)
  UNION ALL
  SELECT 'events', 'accepted_values', 'event_type',
         (SELECT COUNT(*) FROM events
          WHERE event_type IS NULL
             OR event_type NOT IN ('click','error','purchase','signup','view'))
  UNION ALL
  SELECT 'events', 'referential', 'user_id',
         (SELECT COUNT(*) FROM events e
          WHERE e.user_id NOT IN (SELECT c_custkey FROM customer))
) _
ORDER BY "table", "check", "column" """,
        "conversation_features": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
g AS (
  SELECT conv_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY conv_id
                                                ORDER BY turn_idx) AS gap,
         role, text, tool
  FROM transcripts
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN tool IS NULL AND role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
       CAST(SUM(CASE WHEN tool IS NULL AND role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
       CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,
       CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_distinct_tools,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       ROUND(AVG(length(text)), 6) AS avg_turn_chars,
       ROUND(SUM(CASE WHEN tool IS NULL AND role = 'assistant' THEN length(text) ELSE 0 END) * 1.0
             / NULLIF(SUM(CASE WHEN tool IS NULL AND role = 'user' THEN length(text) ELSE 0 END), 0),
             6) AS assistant_user_char_ratio,
       CAST(MAX(gap) // 1000000 AS BIGINT) AS max_gap_seconds
FROM g GROUP BY conv_id ORDER BY conv_id""",
        "temporal_reach": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
tt AS (
  SELECT conv_id, turn_idx,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS entity,
         epoch_us(ts) AS tsu
  FROM transcripts
),
seqed AS (
  SELECT entity AS src,
         LEAD(entity) OVER w AS dst,
         LEAD(tsu) OVER w AS t
  FROM tt WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
te AS (
  SELECT DISTINCT src, dst, t FROM seqed
  WHERE dst IS NOT NULL AND src <> dst
),
reach(v, t) AS (
  SELECT 'r:user', CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, e.t FROM reach r JOIN te e ON e.src = r.v AND e.t >= r.t
)
SELECT v, CAST(MIN(t) AS BIGINT) AS arrival
FROM reach GROUP BY v ORDER BY v""",
        "pca_projection": _pca_oracle(),
        "jl_projection": _jl_oracle(),
        "range_splits": """
WITH cnt AS (SELECT user_id AS v, COUNT(*) AS c FROM events GROUP BY user_id),
rk AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS n FROM cnt
)
SELECT CAST(i.i AS INT) AS split_idx,
       CAST((SELECT MIN(v) FROM rk WHERE 8 * cum >= i.i * n) AS BIGINT)
         AS boundary
FROM (SELECT unnest(generate_series(1, 7)) AS i) i
ORDER BY split_idx""",
        "centroid_drift": """
WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
ce AS (
  SELECT label, i.i AS pos,
         AVG(CAST(embedding[i.i] AS DOUBLE)) AS m
  FROM embeddings, idx i GROUP BY label, i.i
),
norms AS (SELECT label, SQRT(SUM(m * m)) AS n FROM ce GROUP BY label),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b, SUM(a.m * b.m) AS d
  FROM ce a JOIN ce b ON a.pos = b.pos AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT CAST(label_a AS INT) AS label_a, CAST(label_b AS INT) AS label_b,
       ROUND(CASE WHEN na.n > 0 AND nb.n > 0 THEN d / (na.n * nb.n)
                  ELSE 0.0 END, 6) AS cosine
FROM dots
JOIN norms na ON na.label = label_a
JOIN norms nb ON nb.label = label_b
ORDER BY label_a, label_b""",
        "cube_rollup": """
SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS value_sum
FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS day, value FROM events) _
GROUP BY CUBE (event_type, day)
ORDER BY event_type, day""",
        "streaming_enriched": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
turns AS (
  SELECT CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS entity
  FROM transcripts
)
SELECT entity, CAST(length(entity) AS INT) AS attr,
       CAST(COUNT(*) AS BIGINT) AS n
FROM turns GROUP BY entity ORDER BY entity""",
        "jsonl_ingest": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n
FROM transcripts GROUP BY conv_id
UNION ALL
SELECT '__corrupt__', CAST(3 AS BIGINT)
ORDER BY conv_id""",
        "transition_latency": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
tt AS (
  SELECT conv_id, turn_idx,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS entity,
         epoch_us(ts) AS tsu
  FROM transcripts
),
gp AS (
  SELECT LAG(entity) OVER w AS a, entity AS b,
         CAST((tsu - LAG(tsu) OVER w) // 1000000 AS BIGINT) AS gap_s
  FROM tt WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
cnt AS (
  SELECT a, b, gap_s, COUNT(*) AS c FROM gp WHERE a IS NOT NULL
  GROUP BY a, b, gap_s
),
rk AS (
  SELECT a, b, gap_s,
         SUM(c) OVER (PARTITION BY a, b ORDER BY gap_s) AS cum,
         SUM(c) OVER (PARTITION BY a, b) AS n
  FROM cnt
)
SELECT a, b, CAST(MAX(n) AS BIGINT) AS n,
       MIN(CASE WHEN 2 * cum >= n THEN gap_s END) AS p50_s,
       MIN(CASE WHEN 20 * cum >= 19 * n THEN gap_s END) AS p95_s
FROM rk GROUP BY a, b ORDER BY a, b""",
        "conversation_paths": "WITH RECURSIVE "
        + TRANSCRIPTS_CTE
        + """,
tt AS (
  SELECT conv_id, turn_idx,
         CASE WHEN tool IS NOT NULL THEN 't:' || tool
              ELSE 'r:' || role END AS entity
  FROM transcripts
),
paths AS (
  SELECT conv_id,
         string_agg(entity, '>' ORDER BY turn_idx) AS path,
         CAST(COUNT(*) AS BIGINT) AS n_turns
  FROM tt GROUP BY conv_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_convs, n_turns
FROM paths GROUP BY path, n_turns
ORDER BY n_convs DESC, path LIMIT 20""",
        "adoption": """
WITH first AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS d0
  FROM events GROUP BY user_id
),
pd AS (SELECT d0, CAST(COUNT(*) AS BIGINT) AS new_users FROM first GROUP BY d0)
SELECT d0 AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY d0) AS BIGINT) AS cum_users
FROM pd ORDER BY day""",
        "type_correlations": """
WITH types AS (
  SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS t
),
wide AS (
  SELECT u.user_id, t.t,
         COALESCE(SUM(e.value), 0.0) AS v
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN types t
  LEFT JOIN events e ON e.user_id = u.user_id AND e.event_type = t.t
  GROUP BY u.user_id, t.t
),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b FROM types a JOIN types b ON a.t < b.t
)
SELECT p.type_a, p.type_b,
       ROUND(corr(wa.v, wb.v), 6) AS corr
FROM pairs p
JOIN wide wa ON wa.t = p.type_a
JOIN wide wb ON wb.t = p.type_b AND wb.user_id = wa.user_id
GROUP BY p.type_a, p.type_b ORDER BY type_a, type_b""",
        "scd2": """
WITH ch AS (
  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
kept AS (
  SELECT user_id, tsu, event_id, event_type FROM ch
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, tsu AS valid_from,
       LEAD(tsu) OVER (PARTITION BY user_id
                       ORDER BY tsu, event_id) AS valid_to
FROM kept ORDER BY user_id, valid_from""",
        "merge_upsert": """
SELECT event_id, user_id, event_type,
       ROUND(CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END,
             6) AS value
FROM events ORDER BY event_id""",
        "bucketed_join": """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id ORDER BY user_id""",
        "zorder_events": _zorder_events_oracle(),
        "events_rollup": """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type""",
        # hopping windows: event at t belongs to windows i·S for
        # i = t//S - j, j < size/slide — pure int64 µs floor division on
        # non-negative epochs, identical on both engines.
        "events_hopping": f"""
WITH e AS (SELECT event_type, value, epoch_us(ts) AS t FROM events),
js AS (SELECT unnest(generate_series(0, {HOP_SIZE_US // HOP_SLIDE_US - 1})) AS j)
SELECT (t // {HOP_SLIDE_US} - j.j) * {HOP_SLIDE_US} AS window_start_us,
       event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM e, js j
GROUP BY 1, 2 ORDER BY window_start_us, event_type""",
        # retention: distinct (user, week) activity, self-join vs week-1;
        # exact counts, one rounded double; NULL rate where no predecessor
        # bucket appears in the data (division by a NULL prev count).
        "retention": f"""
WITH a AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // {RETENTION_BUCKET_US} AS b
  FROM events
),
na AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_active FROM a GROUP BY b),
ret AS (
  SELECT a.b, CAST(COUNT(*) AS BIGINT) AS n_retained
  FROM a JOIN a p ON p.u = a.u AND p.b = a.b - 1
  GROUP BY a.b
)
SELECT na.b * {RETENTION_BUCKET_US} AS bucket_start_us, na.n_active,
       COALESCE(ret.n_retained, 0) AS n_retained,
       ROUND(COALESCE(ret.n_retained, 0) / np.n_active, 6) AS retention_rate
FROM na
LEFT JOIN ret ON ret.b = na.b
LEFT JOIN na np ON np.b = na.b - 1
ORDER BY bucket_start_us""",
        # sessions: the gap rule runs on exact integer microseconds on both
        # sides (epoch_us here, unix_micros in Spark) and the duration is
        # INTEGER-divided — double-seconds epochs round differently across
        # engines and a double quotient can cross a second boundary.
        "sessions": f"""
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
s AS (
  SELECT *,
         SUM(CASE WHEN prev_us IS NULL
                    OR us - prev_us >= {SESSION_GAP_SECONDS * 1_000_000}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM e
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(event_id) AS first_event, MAX(event_id) AS last_event,
       (MAX(us) - MIN(us)) // 1000000 AS duration_sec,
       ROUND(SUM(value), 4) AS sum_value
FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",
        # streaming_sessions: stream==batch — the oracle IS the batch
        # sessionization SQL (same gap, same columns).
        "streaming_sessions": f"""
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
s AS (
  SELECT *,
         SUM(CASE WHEN prev_us IS NULL
                    OR us - prev_us >= {SESSION_GAP_SECONDS * 1_000_000}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM e
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(event_id) AS first_event, MAX(event_id) AS last_event,
       (MAX(us) - MIN(us)) // 1000000 AS duration_sec,
       ROUND(SUM(value), 4) AS sum_value
FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",
        # events_asof: DuckDB's NATIVE ASOF JOIN is the oracle — a genuinely
        # independent implementation of the backward-inclusive match the
        # union-and-window Spark plan computes. Right side deduped to one
        # row per (user, ts), the tie contract both engines share.
        "events_asof": """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
errs AS (
  SELECT user_id, ts, MAX(event_id) AS err_event
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, e.err_event AS err_event_r,
       epoch_us(c.ts) - epoch_us(e.ts) AS lag_us
FROM clicks c ASOF LEFT JOIN errs e
  ON c.user_id = e.user_id AND c.ts >= e.ts
ORDER BY c.event_id""",
    }


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: connected components of the transcript-derived entity graph
    at sf0.001 (exact per-vertex min-label membership)."""
    return _q_cc_labels(spark, "/root/testdata/sf0.001")
