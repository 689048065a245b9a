"""BFS parity with /root/reference/test/test_bfsRunner.cpp: p disjoint
50-node chains; 1 run visits exactly 50 vertices and leaves 98*(p-1)
directed edge rows; p runs leave nothing."""

from parconnect_spark.plans.bfs import bfs, bfs_peel


def disjoint_chains(spark, p=4, n=50):
    und = []
    for k in range(p):
        base = k * n
        und += [(base + i, base + i + 1) for i in range(n - 1)]
    rows = und + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src long, dst long"), und


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


def test_all_runs_visit_everything(spark):
    p = 3
    edges, _ = disjoint_chains(spark, p=p)
    res = bfs(edges, num_runs=p)
    assert res.runs == p
    assert res.visited_count == p * 50
    assert res.residual_edges.count() == 0


def test_extra_runs_noop(spark):
    edges, _ = disjoint_chains(spark, p=2)
    res = bfs(edges, num_runs=5)
    assert res.runs == 2  # stops when everything is visited
    assert res.visited_count == 100


def test_bfs_peel_labels(spark):
    edges, und = disjoint_chains(spark, p=2)
    labels, residual, ncomp = bfs_peel(edges, num_runs=1)
    assert ncomp == 1
    got = {r["v"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(50)}
    assert residual.count() == 98
