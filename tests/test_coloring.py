"""Jones–Plassmann coloring (plans/coloring.py): structural validity
(proper coloring, palette ≤ Δ+1) plus EXACT sequential-replay parity —
the whole trajectory (who colors in which round, with which color) is a
deterministic function of the edge set under the fixed md5 priorities,
so a pure-Python replay must match row for row (the plans/mis.py test
discipline)."""

import hashlib

import pyspark.sql.functions as F
import pytest

from parconnect_spark.plans.coloring import jones_plassmann_coloring


def _prio(v, salt="jp"):
    return (int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16), v)


def _replay(und_edges, salt="jp"):
    """Pure-Python Jones-Plassmann under the same (md5, id) key."""
    adj = {}
    for a, b in und_edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    colored = {}
    rounds = {}
    rnd = 0
    while active:
        ready = [
            v
            for v in active
            if all(
                _prio(u, salt) < _prio(v, salt)
                for u in adj[v]
                if u in active
            )
        ]
        assert ready, "replay stalled"
        # ready vertices are pairwise non-adjacent, so computing every mex
        # against the PRE-round colored map is exactly the parallel step
        this_round = {}
        for v in ready:
            used = {colored[u] for u in adj[v] if u in colored}
            c = 0
            while c in used:
                c += 1
            this_round[v] = c
            rounds[v] = rnd
        colored.update(this_round)
        active -= set(ready)
        rnd += 1
    return colored, rounds, rnd


def _sym(spark, und):
    rows = und + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src long, dst long")


def test_coloring_matches_sequential_replay(spark):
    und = [
        (1, 2), (2, 3), (3, 4), (4, 1), (1, 3),   # near-clique
        (5, 6), (6, 7),                            # path
        (8, 9),                                    # edge
        (2, 5),                                    # bridge
    ]
    got = {
        r["v"]: (r["color"], r["round"])
        for r in jones_plassmann_coloring(_sym(spark, und))[0].collect()
    }
    colors, rounds, _ = _replay(und)
    assert got == {v: (colors[v], rounds[v]) for v in colors}


def test_coloring_proper_and_bounded(spark):
    import random

    rng = random.Random(11)
    und = list({tuple(sorted((rng.randrange(30), rng.randrange(30))))
                for _ in range(70)})
    und = [(a, b) for a, b in und if a != b]
    out, _ = jones_plassmann_coloring(_sym(spark, und))
    col = {r["v"]: r["color"] for r in out.collect()}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert set(col) == set(deg)
    for a, b in und:
        assert col[a] != col[b], (a, b)
    assert max(col.values()) <= max(deg.values())


def test_coloring_clique_serializes(spark):
    k = 5
    und = [(i, j) for i in range(k) for j in range(i + 1, k)]
    out, rounds = jones_plassmann_coloring(_sym(spark, und))
    rows = out.collect()
    assert rounds == k  # one clique vertex per round
    assert sorted(r["color"] for r in rows) == list(range(k))


def test_coloring_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out, rounds = jones_plassmann_coloring(empty)
    assert out.count() == 0 and rounds == 0


def test_coloring_round_budget(spark):
    und = [(i, i + 1) for i in range(6)]
    with pytest.raises(RuntimeError):
        jones_plassmann_coloring(_sym(spark, und), max_rounds=1)
