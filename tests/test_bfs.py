"""BFS parity with /root/reference/test/test_bfsRunner.cpp: p disjoint
50-node chains; 1 run visits exactly 50 vertices and leaves 98*(p-1)
directed edge rows; p runs leave nothing."""

import pytest
from parconnect_spark.plans.bfs import bfs, bfs_peel


def disjoint_chains(spark, p=4, n=50):
    und = []
    for k in range(p):
        base = k * n
        und += [(base + i, base + i + 1) for i in range(n - 1)]
    rows = und + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src long, dst long"), und


@pytest.mark.slow
def test_single_run_visits_one_chain(spark):
    p = 4
    edges, _ = disjoint_chains(spark, p=p)
    res = bfs(edges, num_runs=1)
    assert res.runs == 1
    assert res.visited_count == 50
    assert res.residual_edges.count() == 98 * (p - 1)
    # root 0's chain: parents form a tree rooted at 0
    parents = {r["v"]: r["parent"] for r in res.parents.collect()}
    assert parents[0] == 0
    assert set(parents) == set(range(50))
    assert res.mteps > 0


@pytest.mark.slow
def test_all_runs_visit_everything(spark):
    p = 3
    edges, _ = disjoint_chains(spark, p=p)
    res = bfs(edges, num_runs=p)
    assert res.runs == p
    assert res.visited_count == p * 50
    assert res.residual_edges.count() == 0


@pytest.mark.slow
def test_extra_runs_noop(spark):
    edges, _ = disjoint_chains(spark, p=2)
    res = bfs(edges, num_runs=5)
    assert res.runs == 2  # stops when everything is visited
    assert res.visited_count == 100


@pytest.mark.slow
def test_bfs_peel_labels(spark):
    edges, und = disjoint_chains(spark, p=2)
    labels, residual, ncomp = bfs_peel(edges, num_runs=1)
    assert ncomp == 1
    got = {r["v"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(50)}
    assert residual.count() == 98


def test_label_parent_forest_pointer_jumping(spark):
    """Deep chain parent table collapses to the root in O(log depth) joins."""
    from parconnect_spark.plans.bfs import label_parent_forest

    rows = [(0, 0)] + [(i, i - 1) for i in range(1, 200)]
    parents = spark.createDataFrame(rows, "v long, parent long")
    labels = {r["v"]: r["label"] for r in label_parent_forest(parents).collect()}
    assert labels == {i: 0 for i in range(200)}


@pytest.mark.slow
def test_bfs_resume_equivalence(spark, tmp_path):
    """Kill after k levels, resume with the same checkpoint dir: identical
    parents/residual to an uninterrupted run (test_bfsRunner.cpp:150-200
    one-iteration-per-call state carry)."""
    from parconnect_spark.streaming.checkpoint import SuperstepCheckpoint

    edges, _ = disjoint_chains(spark, p=2)
    full = bfs(edges, num_runs=2)
    want = {r["v"]: r["parent"] for r in full.parents.collect()}

    ck1 = SuperstepCheckpoint(spark, str(tmp_path), "bfs")
    partial = bfs(edges, num_runs=2, max_levels=7, checkpoint=ck1)
    assert partial.levels == 7  # stopped mid-run

    ck2 = SuperstepCheckpoint(spark, str(tmp_path), "bfs")
    resumed = bfs(edges, num_runs=2, checkpoint=ck2)
    got = {r["v"]: r["parent"] for r in resumed.parents.collect()}
    assert got == want
    assert resumed.levels == full.levels
    assert resumed.residual_edges.count() == 0


@pytest.mark.slow
def test_bfs_one_iteration_per_call(spark, tmp_path):
    """The reference's per-iteration protocol: max_levels=1 per call, state
    carries across calls until convergence."""
    from parconnect_spark.streaming.checkpoint import SuperstepCheckpoint

    edges, _ = disjoint_chains(spark, p=1, n=12)
    full = bfs(edges, num_runs=1)
    want = {r["v"]: r["parent"] for r in full.parents.collect()}

    got = None
    for _ in range(40):
        ck = SuperstepCheckpoint(spark, str(tmp_path), "bfs1")
        res = bfs(edges, num_runs=1, max_levels=1, checkpoint=ck)
        if res.metrics and res.metrics[-1]["frontier"] == 0:
            got = {r["v"]: r["parent"] for r in res.parents.collect()}
            break
    assert got == want


@pytest.mark.slow
def test_bfs_csr_blocks_equivalent(spark):
    """use_csr expands frontiers against the cached CSR block table —
    identical parents/residual to the raw-edge path."""
    p = 3
    edges, _ = disjoint_chains(spark, p=p)
    base = bfs(edges, num_runs=2)
    csr = bfs(edges, num_runs=2, use_csr=True)
    want = {r["v"]: r["parent"] for r in base.parents.collect()}
    got = {r["v"]: r["parent"] for r in csr.parents.collect()}
    assert got == want
    assert csr.residual_edges.count() == base.residual_edges.count()
    assert csr.levels == base.levels


def test_bfs_csr_level_plan_fewer_exchanges(spark):
    """The CSR win when the frontier outgrows broadcast: the cached
    hash(v)-partitioned blocks satisfy the expansion join's distribution, so
    only the frontier side shuffles — the raw-edge plan must shuffle both
    sides. Assert on the physical plans with broadcast + AQE disabled (AQE
    would hide the initial exchanges inside AdaptiveSparkPlan)."""
    import pyspark.sql.functions as F

    from parconnect_spark.plans.csr import adjacency_blocks

    edges, _ = disjoint_chains(spark, p=4)
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        blocks = adjacency_blocks(edges, parts=8, layout="hash").persist()
        blocks.count()
        frontier = edges.select(F.col("src").alias("v")).distinct().limit(60)

        csr_level = (
            blocks.join(frontier, "v")
            .select(F.explode("nbrs").alias("nv"), F.col("v").alias("parent"))
            .groupBy("nv")
            .agg(F.min("parent").alias("parent"))
        )
        edge_level = (
            edges.join(frontier, edges["src"] == frontier["v"])
            .select(F.col("dst").alias("nv"), F.col("src").alias("parent"))
            .groupBy("nv")
            .agg(F.min("parent").alias("parent"))
        )

        def n_exchanges(df):
            # count only the exchanges EnsureRequirements inserts at runtime:
            # the cached blocks' plan string embeds its one-time build
            # exchange (REPARTITION_BY_NUM, paid once at persist time), which
            # is not a per-level shuffle
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("ENSURE_REQUIREMENTS")

        assert n_exchanges(csr_level) < n_exchanges(edge_level)
        blocks.unpersist()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bfs_distances_vs_networkx(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.bfs import bfs_distances
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    src = min(g.nodes)
    exp = nx.single_source_shortest_path_length(g, src)
    got = {r["v"]: r["dist"] for r in bfs_distances(edges, src).collect()}
    assert got == dict(exp)


def test_bfs_distances_unreachable_absent(spark):
    from parconnect_spark.plans.bfs import bfs_distances

    # two components; directed edges as given
    e = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "src long, dst long")
    got = {r["v"]: r["dist"] for r in bfs_distances(e, 0).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_pseudo_diameter_exact_on_path(spark):
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.bfs import pseudo_diameter

    # path 0-1-...-9 entered from the middle: double sweep finds the true
    # diameter 9 regardless of the start vertex
    e = symmetrize(
        spark.createDataFrame([(i, i + 1) for i in range(9)], "src long, dst long")
    )
    r = pseudo_diameter(e, start=4)
    assert r["diameter_lb"] == 9
    assert r["start_ecc"] == 5
    assert r["far_vertex"] in (0, 9)


def test_pseudo_diameter_empty(spark):
    from parconnect_spark.plans.bfs import pseudo_diameter

    e = spark.createDataFrame([], "src long, dst long")
    assert pseudo_diameter(e)["diameter_lb"] is None


@pytest.mark.slow
def test_multi_source_bfs_matches_single_source(spark):
    """MS-BFS (one batched frontier loop) must equal k independent
    bfs_distances sweeps."""
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.bfs import bfs_distances, multi_source_bfs
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    sources = [0, 1, 5]
    got = {
        (r["root"], r["v"]): r["dist"]
        for r in multi_source_bfs(edges, sources).collect()
    }
    exp = {}
    for s in sources:
        for r in bfs_distances(edges, s).collect():
            exp[(s, r["v"])] = r["dist"]
    assert got == exp


def test_harmonic_centrality_hand_example(spark):
    """Path graph 0-1-2-3, sources {0, 3}: h(1) = 1/1 + 1/2, h(2) = 1/2 +
    1/1, h(0) = 1/3 (from 3 only, d>0 excludes itself), h(3) = 1/3."""
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.bfs import harmonic_centrality

    und = [(0, 1), (1, 2), (2, 3)]
    edges = symmetrize(spark.createDataFrame(und, "src long, dst long"))
    got = {
        r["v"]: r["harmonic"]
        for r in harmonic_centrality(edges, [0, 3]).collect()
    }
    assert got == {0: 1 / 3, 1: 1.5, 2: 1.5, 3: 1 / 3}


@pytest.mark.slow
def test_harmonic_centrality_vs_networkx(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.bfs import harmonic_centrality
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    sources = sorted(g.nodes)[:4]
    exp = {}
    for s in sources:
        for v, d in nx.single_source_shortest_path_length(g, s).items():
            if d > 0:
                exp[v] = exp.get(v, 0.0) + 1.0 / d
    got = {
        r["v"]: r["harmonic"]
        for r in harmonic_centrality(edges, sources).collect()
    }
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9


def test_closeness_centrality_hand_example(spark):
    """Path graph 0-1-2-3, sources {0, 3}: vertex 1 is reached at d=1 (from
    0) and d=2 (from 3) -> n=2, total=3, c=2/3; endpoints see only the
    opposite source at d=3 -> c=1/3."""
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.bfs import closeness_centrality

    und = [(0, 1), (1, 2), (2, 3)]
    edges = symmetrize(spark.createDataFrame(und, "src long, dst long"))
    got = {
        r["v"]: (r["n_sources"], r["total_dist"], r["closeness"])
        for r in closeness_centrality(edges, [0, 3]).collect()
    }
    assert got == {
        0: (1, 3, 1 / 3),
        1: (2, 3, 2 / 3),
        2: (2, 3, 2 / 3),
        3: (1, 3, 1 / 3),
    }


@pytest.mark.slow
def test_closeness_centrality_vs_networkx(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.bfs import closeness_centrality
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    sources = sorted(g.nodes)[:4]
    exp: dict = {}
    for s in sources:
        for v, d in nx.single_source_shortest_path_length(g, s).items():
            if d > 0:
                n, t = exp.get(v, (0, 0))
                exp[v] = (n + 1, t + d)
    got = {
        r["v"]: (r["n_sources"], r["total_dist"], r["closeness"])
        for r in closeness_centrality(edges, sources).collect()
    }
    assert set(got) == set(exp)
    for v, (n, t) in exp.items():
        assert got[v][:2] == (n, t)
        assert abs(got[v][2] - n / t) < 1e-12


def test_landmark_distances_and_estimate(spark):
    from parconnect_spark.plans.bfs import (
        estimate_distance,
        landmark_distance_table,
    )

    # path 0-1-2-3-4 plus hub 2 connected to 5,6 (degree: 2 has 4)
    und = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5), (2, 6)]
    sym = sorted(set(und + [(b, a) for a, b in und]))
    e = spark.createDataFrame(sym, "src long, dst long")
    t = landmark_distance_table(e, k=1).persist()
    rows = {(r["root"], r["v"]): r["dist"] for r in t.collect()}
    # landmark = vertex 2 (highest degree)
    assert all(root == 2 for root, _ in rows)
    assert rows[(2, 2)] == 0 and rows[(2, 0)] == 2 and rows[(2, 4)] == 2
    # estimate d(0,4): true 4; via landmark 2: 2+2 = 4 (exact here)
    assert estimate_distance(t, 0, 4) == 4
    # estimate d(5,6): true 2 via hub; landmark gives 1+1 = 2
    assert estimate_distance(t, 5, 6) == 2
    t.unpersist()
