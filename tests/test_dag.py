"""DAG longest-path layering (plans/dag.py): exact parity with a
pure-Python longest-path replay, the depth==rounds contract, the loud
cycle guard, and partition invariance."""

import pytest

from parconnect_spark.plans.dag import dag_layers


def _replay(dedges):
    adj_in = {}
    verts = set()
    for a, b in dedges:
        adj_in.setdefault(b, []).append(a)
        verts.update((a, b))
    lay = {v: 0 for v in verts}
    changed = True
    rounds = 0
    while changed:
        changed = False
        new = {}
        for v in verts:
            cand = max(
                (lay[u] + 1 for u in adj_in.get(v, [])), default=0
            )
            new[v] = max(lay[v], cand)
            changed |= new[v] != lay[v]
        if changed:
            rounds += 1
        lay = new
    return lay, rounds


def _df(spark, dedges):
    return spark.createDataFrame(dedges, "src long, dst long")


def test_dag_layers_matches_python_replay(spark):
    # diamond + a long tail: depth 4
    dedges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (1, 6)]
    lay, rounds = dag_layers(_df(spark, dedges))
    exp, exp_rounds = _replay(dedges)
    assert {r["v"]: r["layer"] for r in lay.collect()} == exp
    assert rounds == exp_rounds == 4


def test_dag_layers_zero_depth_and_empty(spark):
    # edgeless graph can't be expressed (verts come from edges); a single
    # edge gives depth 1, and the empty table gives (empty, 0)
    lay, rounds = dag_layers(_df(spark, [(7, 8)]))
    assert {r["v"]: r["layer"] for r in lay.collect()} == {7: 0, 8: 1}
    assert rounds == 1
    empty, rounds0 = dag_layers(_df(spark, []))
    assert empty.count() == 0 and rounds0 == 0


def test_dag_layers_cycle_raises(spark):
    with pytest.raises(ValueError, match="cycle"):
        dag_layers(_df(spark, [(1, 2), (2, 3), (3, 1)]), max_rounds=8)


def test_dag_layers_partition_invariance(spark):
    dedges = [(i, i + 1) for i in range(20)] + [(0, 10), (5, 15)]
    a, ra = dag_layers(_df(spark, dedges))
    b, rb = dag_layers(_df(spark, dedges).repartition(7, "dst"))
    assert ra == rb
    assert {r["v"]: r["layer"] for r in a.collect()} == {
        r["v"]: r["layer"] for r in b.collect()
    }
