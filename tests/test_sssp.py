import pytest

from parconnect_spark.plans.sssp import sssp


def test_sssp_prefers_lighter_multi_hop(spark):
    e = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 3), (2, 1, 4), (1, 3, 1), (4, 0, 5)],
        "src long, dst long, weight long",
    )
    d, rounds = sssp(e, 0)
    got = {r["v"]: r["dist"] for r in d.collect()}
    # 0->2->1 (7) beats 0->1 (10); vertex 4 unreachable FROM 0 (directed)
    assert got == {0: 0, 1: 7, 2: 3, 3: 8}
    assert rounds >= 2


def test_sssp_duplicate_edges_take_min(spark):
    e = spark.createDataFrame(
        [(0, 1, 9), (0, 1, 2)], "src long, dst long, weight long"
    )
    d, _ = sssp(e, 0)
    assert {r["v"]: r["dist"] for r in d.collect()} == {0: 0, 1: 2}


def test_sssp_round_budget_raises(spark):
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1)], "src long, dst long, weight long"
    )
    with pytest.raises(RuntimeError):
        sssp(e, 0, max_rounds=1)


def test_sssp_isolated_source(spark):
    e = spark.createDataFrame([(5, 6, 1)], "src long, dst long, weight long")
    d, rounds = sssp(e, 0)
    assert {r["v"]: r["dist"] for r in d.collect()} == {0: 0}


@pytest.mark.slow
def test_sssp_vs_networkx_dijkstra(spark):
    import random

    import networkx as nx

    rng = random.Random(11)
    raw = [
        (rng.randrange(40), rng.randrange(40), rng.randrange(1, 9))
        for _ in range(160)
    ]
    raw = [(a, b, w) for a, b, w in raw if a != b]
    g = nx.DiGraph()
    for a, b, w in raw:
        if not g.has_edge(a, b) or g[a][b]["weight"] > w:
            g.add_edge(a, b, weight=w)
    e = spark.createDataFrame(raw, "src long, dst long, weight long")
    d, _ = sssp(e, 0)
    exp = {k: int(v) for k, v in nx.single_source_dijkstra_path_length(g, 0).items()}
    assert {r["v"]: r["dist"] for r in d.collect()} == exp
