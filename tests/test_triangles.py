from itertools import combinations

from parconnect_spark.plans.triangles import triangle_count, triangles_per_vertex
from parconnect_spark.sources.generators import kronecker_edges


def brute_force_triangles(pairs):
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    count = 0
    per_v = {v: 0 for v in adj}
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            count += 1
            per_v[u] += 1
            per_v[v] += 1
            per_v[w] += 1
    return count, per_v


def test_single_triangle(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    assert triangle_count(e) == 1


def test_k4_has_four(spark):
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = spark.createDataFrame(pairs, "src long, dst long")
    assert triangle_count(e) == 4
    pv = {r["v"]: r["triangles"] for r in triangles_per_vertex(e).collect()}
    assert pv == {0: 3, 1: 3, 2: 3, 3: 3}


def test_chain_has_none(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(20)], "src long, dst long")
    assert triangle_count(e) == 0


def test_orientation_and_duplicates_irrelevant(spark):
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 3)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    assert triangle_count(e) == 1


def test_vs_bruteforce_on_rmat(spark):
    edges = kronecker_edges(spark, scale=6, edgefactor=4)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    exp_count, exp_pv = brute_force_triangles(pairs)
    assert triangle_count(edges) == exp_count
    got_pv = {r["v"]: r["triangles"] for r in triangles_per_vertex(edges).collect()}
    exp_pv_nonzero = {v: c for v, c in exp_pv.items() if c > 0}
    assert got_pv == exp_pv_nonzero


def test_clustering_coefficients_vs_networkx(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.triangles import clustering_coefficients

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    exp = nx.clustering(g)
    got = {
        r["v"]: (r["degree"], r["triangles"], r["lcc"])
        for r in clustering_coefficients(edges).collect()
    }
    assert set(got) == set(exp)
    exp_tri = nx.triangles(g)
    for v, (deg, tri, lcc) in got.items():
        assert deg == g.degree[v]
        assert tri == exp_tri[v]
        assert abs(lcc - exp[v]) < 1e-12


def test_clustering_coefficients_degree_one_is_zero(spark):
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.triangles import clustering_coefficients

    e = symmetrize(spark.createDataFrame([(0, 1)], "src long, dst long"))
    rows = {r["v"]: r["lcc"] for r in clustering_coefficients(e).collect()}
    assert rows == {0: 0.0, 1: 0.0}


def test_transitivity_triangle_with_pendant(spark):
    # triangle 0-1-2 plus pendant 2-3: T=1, wedges = C(2,2)*2 + C(3,2) = 5
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.triangles import transitivity

    e = symmetrize(
        spark.createDataFrame(
            [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
        )
    )
    row = transitivity(e).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_wedges"] == 5
    assert row["transitivity"] == round(3.0 / 5.0, 6)


def test_transitivity_complete_graph_is_one(spark):
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.triangles import transitivity

    pairs = list(combinations(range(5), 2))
    e = symmetrize(spark.createDataFrame(pairs, "src long, dst long"))
    row = transitivity(e).collect()[0]
    assert row["n_triangles"] == 10  # C(5,3)
    assert row["n_wedges"] == 30  # 5 * C(4,2)
    assert row["transitivity"] == 1.0


def test_transitivity_triangle_free(spark):
    # path graph: no triangles, wedges > 0 -> 0.0
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.triangles import transitivity

    e = symmetrize(
        spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    )
    row = transitivity(e).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 2
    assert row["transitivity"] == 0.0


def test_transitivity_wedge_free_graph(spark):
    # single edge: no wedges — the 0/0 guard
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.triangles import transitivity

    e = symmetrize(spark.createDataFrame([(0, 1)], "src long, dst long"))
    row = transitivity(e).collect()[0]
    assert (row["n_triangles"], row["n_wedges"], row["transitivity"]) == (
        0,
        0,
        0.0,
    )


def test_transitivity_vs_networkx(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.triangles import transitivity

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    row = transitivity(edges).collect()[0]
    assert abs(row["transitivity"] - round(nx.transitivity(g), 6)) < 1e-9
