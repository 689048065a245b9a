"""k-core peeling (plans/kcore.py) vs a sequential python peel."""

import pytest

from parconnect_spark.plans.kcore import kcore


def kcore_brute(und_pairs, k):
    """Sequential peel; returns {v: core_degree} for the k-core."""
    adj = {}
    for a, b in und_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if len(adj[v] & alive) < k:
                alive.discard(v)
                changed = True
    return {v: len(adj[v] & alive) for v in alive}


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


def _run(spark, und, k):
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    core, rounds = kcore(edges, k=k)
    got = {r["v"]: r["core_deg"] for r in core.collect()}
    assert got == kcore_brute(und, k)
    return got, rounds


def test_kcore_clique_with_tail(spark):
    # K4 on {0,1,2,3} plus tail 3-4-5: 3-core is exactly the clique.
    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    got, rounds = _run(spark, und, k=3)
    assert set(got) == {0, 1, 2, 3}
    assert all(d == 3 for d in got.values())
    assert rounds <= 3


def test_kcore_cycle_is_its_own_2core(spark):
    und = [(i, (i + 1) % 6) for i in range(6)]
    got, rounds = _run(spark, und, k=2)
    assert set(got) == set(range(6))
    assert rounds == 1  # already at fixpoint: one confirming round


def test_kcore_path_peels_empty(spark):
    # a path has no 2-core; peels one endpoint layer per round.
    und = [(i, i + 1) for i in range(5)]
    got, _ = _run(spark, und, k=2)
    assert got == {}


def test_kcore_max_rounds_raises(spark):
    und = [(i, i + 1) for i in range(8)]  # needs 4 peel rounds for k=2
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    with pytest.raises(RuntimeError):
        kcore(edges, k=2, max_rounds=2)


def test_kcore_rejects_bad_k(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore(edges, k=0)


@pytest.mark.slow
def test_kcore_matches_networkx_on_random_graphs(spark):
    import networkx as nx
    from hypothesis import given, settings, strategies as st

    edge_lists = st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=6, derandomize=True, deadline=None)
    @given(edge_lists, st.integers(1, 4))
    def prop(pairs, k):
        und = [(a, b) for a, b in pairs if a != b]
        if not und:
            return
        g = nx.Graph(und)
        expected = nx.k_core(g, k)
        edges = spark.createDataFrame(_sym(und), "src long, dst long").distinct()
        core, _ = kcore(edges, k=k)
        got = {r["v"]: r["core_deg"] for r in core.collect()}
        assert set(got) == set(expected.nodes)
        for v, d in got.items():
            assert d == expected.degree(v)

    prop()


def test_coreness_hand_example(spark):
    """Triangle {0,1,2} with tail 2-3-4 and isolated edge 5-6: the triangle
    is the 2-core, everything else coreness 1."""
    from parconnect_spark.plans.kcore import coreness

    und = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 6)]
    edges = spark.createDataFrame(_sym(und), "src long, dst long").distinct()
    got, rounds = coreness(edges)
    assert {r["v"]: r["coreness"] for r in got.collect()} == {
        0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 5: 1, 6: 1,
    }
    assert rounds >= 1


def test_coreness_max_rounds_raises(spark):
    from parconnect_spark.plans.kcore import coreness

    und = [(0, 1), (1, 2), (2, 0), (2, 3)]
    edges = spark.createDataFrame(_sym(und), "src long, dst long").distinct()
    with pytest.raises(RuntimeError):
        coreness(edges, max_rounds=0)


@pytest.mark.slow
def test_coreness_vs_networkx_kronecker(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.kcore import coreness
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    g.remove_edges_from(nx.selfloop_edges(g))
    got, _ = coreness(edges)
    assert {r["v"]: r["coreness"] for r in got.collect()} == nx.core_number(g)
