"""Borůvka minimum spanning forest (plans/msf.py) vs a sequential Kruskal.

Under the (weight, a, b) total order the MSF is unique, so Kruskal — a
completely different algorithm — must return the identical edge set; this
is the same cross-algorithm discipline the CC suite uses (three strategies
vs one union-find oracle)."""

import random

import pytest

from parconnect_spark.plans.msf import boruvka_msf


def kruskal(wedges):
    """Sequential Kruskal over (weight, a, b)-ordered edges; returns the
    unique MSF edge set (textbook union-find, not the engine's code path)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, a, b in sorted((w, a, b) for a, b, w in wedges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.add((a, b, w))
    return out


def _run(spark, wedges):
    df = spark.createDataFrame(wedges, "a long, b long, weight long")
    msf, rounds = boruvka_msf(df)
    got = {(r["a"], r["b"], r["weight"]) for r in msf.collect()}
    assert got == kruskal(wedges)
    return got, rounds


def test_msf_hand_graph(spark):
    # two components: a weighted square + diagonal, and one separate edge.
    wedges = [
        (0, 1, 4),
        (1, 2, 1),
        (2, 3, 2),
        (0, 3, 3),
        (0, 2, 5),
        (10, 11, 7),
    ]
    got, rounds = _run(spark, wedges)
    # square keeps its three cheapest edges, diagonal and the 4-weight drop.
    assert got == {(1, 2, 1), (2, 3, 2), (0, 3, 3), (10, 11, 7)}
    assert rounds <= 3


def test_msf_tie_break_is_lexicographic(spark):
    # all weights equal: the unique MSF under (weight, a, b) keeps the
    # lexicographically smallest spanning edges of the triangle.
    wedges = [(0, 1, 5), (0, 2, 5), (1, 2, 5)]
    got, _ = _run(spark, wedges)
    assert got == {(0, 1, 5), (0, 2, 5)}


def test_msf_forest_shape_random(spark):
    rng = random.Random(17)
    n = 60
    pairs = set()
    while len(pairs) < 150:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    wedges = [(a, b, rng.randrange(1, 9)) for a, b in sorted(pairs)]
    got, _ = _run(spark, wedges)
    # forest invariant: |MSF| = |V| - #components.
    verts = {a for a, b, w in wedges} | {b for a, b, w in wedges}
    comp = {}

    def find(x):
        comp.setdefault(x, x)
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    for a, b, _w in wedges:
        ra, rb = find(a), find(b)
        if ra != rb:
            comp[ra] = rb
    n_comp = len({find(v) for v in verts})
    assert len(got) == len(verts) - n_comp


def test_msf_empty_and_selfloop_only(spark):
    df = spark.createDataFrame([(3, 3, 1)], "a long, b long, weight long")
    msf, rounds = boruvka_msf(df)
    assert msf.count() == 0
    assert rounds == 0


def test_msf_max_rounds_raises(spark):
    df = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1)], "a long, b long, weight long"
    )
    with pytest.raises(RuntimeError):
        boruvka_msf(df, max_rounds=0)
