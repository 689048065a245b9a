"""Synchronous Louvain move phase (plans/louvain.py) vs a sequential
replay of the identical integer gain rule, plus community-quality sanity
on planted structure."""

import random

import pytest

from parconnect_spark.plans.louvain import louvain_move


def louvain_brute(und_weighted, rounds):
    """Sequential replay: same singleton start, same synchronous rounds,
    same G = 2m*kin - k*tot' integer gains, same (g, -C) tie-break."""
    adj = {}
    for a, b, w in und_weighted:
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    k = {v: sum(ws.values()) for v, ws in adj.items()}
    m2 = sum(k.values())
    cm = {v: v for v in adj}
    for _ in range(rounds):
        tot = {}
        for v, c in cm.items():
            tot[c] = tot.get(c, 0) + k[v]
        new = {}
        for v in adj:
            kin = {}
            for u, w in adj[v].items():
                kin[cm[u]] = kin.get(cm[u], 0) + w
            kin.setdefault(cm[v], 0)

            def gain(C):
                t = tot[C] - (k[v] if C == cm[v] else 0)
                return m2 * kin[C] - k[v] * t

            g_own = gain(cm[v])
            others = [C for C in kin if C != cm[v]]
            if others:
                g_best, c_best = max((gain(C), -C) for C in others)
                c_best = -c_best
                new[v] = c_best if g_best > g_own else cm[v]
            else:
                new[v] = cm[v]
        cm = new
    return cm, m2


def _sym(wedges):
    return [(a, b, w) for a, b, w in wedges] + [
        (b, a, w) for a, b, w in wedges
    ]


def _run(spark, und_weighted, rounds):
    df = spark.createDataFrame(
        _sym(und_weighted), "src long, dst long, weight long"
    )
    cm, m2 = louvain_move(df, rounds=rounds)
    got = {r["v"]: r["c"] for r in cm.collect()}
    want, want_m2 = louvain_brute(und_weighted, rounds)
    assert m2 == want_m2
    assert got == want
    return got


def test_louvain_two_cliques_with_bridge(spark):
    cl1 = [(a, b, 5) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(10 + a, 10 + b, 5) for a in range(4) for b in range(a + 1, 4)]
    bridge = [(3, 10, 1)]
    got = _run(spark, cl1 + cl2 + bridge, rounds=2)
    # after two rounds each clique shares one community, cliques differ
    assert len({got[v] for v in range(4)}) == 1
    assert len({got[10 + v] for v in range(4)}) == 1
    assert got[0] != got[10]


def test_louvain_random_replay(spark):
    rng = random.Random(23)
    pairs = set()
    while len(pairs) < 90:
        a, b = rng.randrange(36), rng.randrange(36)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    wedges = [(a, b, rng.randrange(1, 6)) for a, b in sorted(pairs)]
    for rounds in (1, 3):
        _run(spark, wedges, rounds)


def test_louvain_partition_invariant(spark):
    import pyspark.sql.functions as F

    wedges = [(i, (i + 1) % 12, 2 + (i % 3)) for i in range(12)]
    df = spark.createDataFrame(_sym(wedges), "src long, dst long, weight long")
    a, _ = louvain_move(df, rounds=2)
    b, _ = louvain_move(df.orderBy(F.rand(seed=8)).repartition(7), rounds=2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_louvain_rejects_bad_rounds(spark):
    df = spark.createDataFrame(
        _sym([(0, 1, 1)]), "src long, dst long, weight long"
    )
    with pytest.raises(ValueError):
        louvain_move(df, rounds=0)
