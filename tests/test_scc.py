import pytest

from parconnect_spark.plans.scc import strongly_connected_components


def nx_sccs(pairs):
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from(pairs)
    return {frozenset(c) for c in nx.strongly_connected_components(g)}


def run(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    rows = strongly_connected_components(e).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["scc"], set()).add(r["v"])
    # label must be the component min
    for scc, members in comps.items():
        assert scc == min(members)
    return {frozenset(m) for m in comps.values()}, rows


def test_scc_single_cycle(spark):
    got, rows = run(spark, [(0, 1), (1, 2), (2, 0)])
    assert got == {frozenset({0, 1, 2})}
    assert len(rows) == 3


def test_scc_chain_is_singletons(spark):
    pairs = [(i, i + 1) for i in range(10)]
    got, _ = run(spark, pairs)
    assert got == nx_sccs(pairs)


def test_scc_two_cycles_bridged(spark):
    # cycle {0,1,2} -> cycle {5,6} via a DAG bridge 2->3->5
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 5), (5, 6), (6, 5)]
    got, _ = run(spark, pairs)
    assert got == nx_sccs(pairs)


def test_scc_cycle_of_cycles_worst_case(spark):
    # adversarial for pure coloring: C_k -> C_{k+1}; trim never fires
    pairs = []
    for k in range(4):
        a, b, c = 3 * k, 3 * k + 1, 3 * k + 2
        pairs += [(a, b), (b, c), (c, a)]
        if k < 3:
            pairs.append((c, 3 * (k + 1)))
    got, _ = run(spark, pairs)
    assert got == nx_sccs(pairs)


def test_scc_self_loops_and_duplicates(spark):
    pairs = [(0, 0), (0, 1), (0, 1), (1, 0), (2, 2), (1, 2)]
    got, _ = run(spark, pairs)
    assert got == nx_sccs(pairs)


def test_scc_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert strongly_connected_components(e).count() == 0


@pytest.mark.slow
def test_scc_vs_networkx_on_rmat(spark):
    from parconnect_spark.sources.generators import kronecker_edges

    e = kronecker_edges(spark, scale=6, edgefactor=4, both_directions=False)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    got, rows = run(spark, pairs)
    assert got == nx_sccs(pairs)
    # exactly one row per vertex
    assert len(rows) == len({v for p in pairs for v in p if p[0] != p[1]} | {
        a for a, b in pairs if a != b} | {b for a, b in pairs if a != b})


def test_scc_round_budget_exhaustion_is_loud(spark):
    # cycle-of-cycles needs one outer round per cycle; budget of 1 must
    # raise rather than mislabel the remainder as singletons
    pairs = []
    for k in range(3):
        a, b, c = 3 * k, 3 * k + 1, 3 * k + 2
        pairs += [(a, b), (b, c), (c, a)]
        if k < 2:
            pairs.append((c, 3 * (k + 1)))
    e = spark.createDataFrame(pairs, "src long, dst long")
    with pytest.raises(RuntimeError, match="max_outer_rounds"):
        strongly_connected_components(e, max_outer_rounds=1)
