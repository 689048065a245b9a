from parconnect_spark.plans.labelprop import label_propagation


def lp_majority_oracle(pairs, iters):
    """Synchronous majority LP, ties toward smaller label, self label kept
    when a vertex has no neighbors."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    labels = {v: v for v in adj}
    for _ in range(iters):
        nxt = {}
        for v, nbrs in adj.items():
            counts = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[v] = best
        labels = nxt
    return labels


def test_majority_matches_oracle(spark):
    und = [(0, 1), (0, 2), (1, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    for iters in (1, 2, 4):
        got = {
            r["v"]: r["label"]
            for r in label_propagation(edges, num_iters=iters).collect()
        }
        assert got == lp_majority_oracle(pairs, iters)


def test_min_rule_converges_to_components(spark):
    und = [(10, 11), (11, 12), (20, 21)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["v"]: r["label"]
        for r in label_propagation(edges, num_iters=5, rule="min").collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_deterministic_across_partitioning(spark):
    import pyspark.sql.functions as F

    und = [(i, (i * 7) % 40) for i in range(40) if i != (i * 7) % 40]
    pairs = list({(a, b) for a, b in und} | {(b, a) for a, b in und})
    e1 = spark.createDataFrame(pairs, "src long, dst long")
    e2 = e1.orderBy(F.rand(seed=5)).repartition(7)
    l1 = {r["v"]: r["label"] for r in label_propagation(e1, num_iters=3).collect()}
    l2 = {r["v"]: r["label"] for r in label_propagation(e2, num_iters=3).collect()}
    assert l1 == l2


def test_modularity_vs_networkx(spark):
    import networkx as nx
    from networkx.algorithms.community import modularity as nx_modularity

    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.labelprop import modularity
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    # arbitrary deterministic partition: vertex id parity
    part = [
        {v for v in g.nodes if v % 2 == 0},
        {v for v in g.nodes if v % 2 == 1},
    ]
    part = [p for p in part if p]
    labels = spark.createDataFrame(
        [(v, v % 2) for v in g.nodes], "v long, label long"
    )
    row = modularity(edges, labels).collect()[0]
    exp = nx_modularity(g, part)
    assert abs(row["modularity"] - exp) < 1e-9
    assert row["n_communities"] == len(part)
    assert row["two_m"] == 2 * g.number_of_edges()


def test_modularity_perfect_split(spark):
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.labelprop import modularity

    # two disjoint triangles, labeled by component: Q = 1 - 1/2 = 0.5
    und = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    e = symmetrize(spark.createDataFrame(und, "src long, dst long"))
    labels = spark.createDataFrame(
        [(v, 0) for v in (0, 1, 2)] + [(v, 1) for v in (10, 11, 12)],
        "v long, label long",
    )
    row = modularity(e, labels).collect()[0]
    assert abs(row["modularity"] - 0.5) < 1e-12
