import itertools

import pytest

from parconnect_spark.operators.graph import symmetrize
from parconnect_spark.plans.densest import densest_subgraph


def _edges(spark, und):
    return symmetrize(spark.createDataFrame(und, "src long, dst long"))


def test_densest_finds_planted_clique(spark):
    clique = list(itertools.combinations(range(6), 2))  # K6, density 2.5
    path = [(i, i + 1) for i in range(6, 30)]           # periphery ~1
    members, st = densest_subgraph(_edges(spark, clique + [(0, 6)] + path))
    assert sorted(r["v"] for r in members.collect()) == list(range(6))
    assert (st["n_vertices"], st["n_edges"], st["density"]) == (6, 15, 2.5)


def test_densest_approximation_guarantee(spark):
    """(2+2eps)-approx vs the optimum: on K8 + noise the optimum is the
    clique at density 3.5; the peel must return >= 3.5 / (2+2*0.1)."""
    clique = list(itertools.combinations(range(8), 2))
    noise = [(i, i + 1) for i in range(8, 40)] + [(3, 20), (5, 30)]
    _, st = densest_subgraph(_edges(spark, clique + noise), epsilon=0.1)
    assert st["density"] >= 3.5 / 2.2


def test_densest_uniform_graph_is_round_zero(spark):
    # a cycle is degree-regular: peeling only destroys density, so the
    # argmax is the full graph at round 0
    cyc = [(i, (i + 1) % 10) for i in range(10)]
    members, st = densest_subgraph(_edges(spark, cyc))
    assert st["round"] == 0 and st["n_vertices"] == 10 and st["density"] == 1.0
    assert members.count() == 10


def test_densest_round_budget_raises(spark):
    und = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    with pytest.raises(RuntimeError):
        densest_subgraph(_edges(spark, und), max_rounds=0)
