"""Luby maximal independent set (plans/mis.py) vs a sequential replay.

The priority sequence is the deterministic md5 fold, so a sequential
Python replay of Luby's rounds must produce the IDENTICAL (vertex, round)
set — plus the structural checks (independence, maximality) that hold for
any correct MIS."""

import hashlib
import random

import pytest

from parconnect_spark.plans.mis import luby_mis


def _p(v, rnd, salt="mis"):
    return int(hashlib.md5(f"{salt}{rnd}:{v}".encode()).hexdigest()[:15], 16)


def luby_brute(und_pairs, salt="mis", max_rounds=64):
    """Sequential replay of the engine's exact round semantics."""
    adj = {}
    for a, b in und_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    out = {}
    rnd = 0
    while active:
        assert rnd < max_rounds
        winners = set()
        for v in active:
            nbrs = adj[v] & active
            key = (_p(v, rnd, salt), v)
            if not nbrs or all(key < (_p(u, rnd, salt), u) for u in nbrs):
                winners.add(v)
        for w in winners:
            out[w] = rnd
        active -= winners
        for w in winners:
            active -= adj[w]
        rnd += 1
    return out, rnd


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


def _run(spark, und):
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    mis, rounds = luby_mis(edges)
    got = {r["v"]: r["round"] for r in mis.collect()}
    want, want_rounds = luby_brute(und)
    assert got == want
    assert rounds == want_rounds
    # structural: independence + maximality
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    m = set(got)
    assert all(not (adj[v] & m) for v in m)
    assert all(v in m or (adj[v] & m) for v in adj)
    return got, rounds


def test_mis_path(spark):
    _run(spark, [(i, i + 1) for i in range(9)])


def test_mis_clique_has_one_winner(spark):
    got, rounds = _run(spark, [(a, b) for a in range(6) for b in range(a + 1, 6)])
    assert len(got) == 1
    assert rounds == 1


def test_mis_star_center_or_all_leaves(spark):
    got, _ = _run(spark, [(0, i) for i in range(1, 12)])
    assert set(got) == {0} or set(got) == set(range(1, 12))


def test_mis_random_graph(spark):
    rng = random.Random(5)
    pairs = set()
    while len(pairs) < 120:
        a, b = rng.randrange(50), rng.randrange(50)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    _run(spark, sorted(pairs))


def test_mis_max_rounds_raises(spark):
    edges = spark.createDataFrame(_sym([(0, 1)]), "src long, dst long")
    with pytest.raises(RuntimeError):
        luby_mis(edges, max_rounds=0)
