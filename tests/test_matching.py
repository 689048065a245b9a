"""Locally-minimum maximal matching (plans/matching.py) vs the sequential
greedy matching in priority order — an independent algorithm the parallel
rounds must provably reproduce — plus structural matching checks."""

import hashlib
import random

import pytest

from parconnect_spark.plans.matching import maximal_matching


def _p(a, b, salt="match"):
    return int(hashlib.md5(f"{salt}:{a}:{b}".encode()).hexdigest()[:15], 16)


def greedy_matching(und_pairs, salt="match"):
    """Sequential greedy over (p, a, b)-sorted edges — NOT the engine's
    round algorithm."""
    taken = set()
    out = set()
    for _p_, a, b in sorted((_p(a, b, salt), a, b) for a, b in und_pairs):
        if a not in taken and b not in taken:
            out.add((a, b))
            taken.add(a)
            taken.add(b)
    return out


def _run(spark, und):
    df = spark.createDataFrame(und, "a long, b long")
    m, rounds = maximal_matching(df)
    got = {(r["a"], r["b"]) for r in m.collect()}
    assert got == greedy_matching(und)
    # structural: it is a matching (vertex-disjoint) and maximal
    seen = set()
    for a, b in got:
        assert a not in seen and b not in seen
        seen.add(a)
        seen.add(b)
    for a, b in und:
        assert a in seen or b in seen
    return got, rounds


def test_matching_path(spark):
    _run(spark, [(i, i + 1) for i in range(10)])


def test_matching_star_takes_one_edge(spark):
    got, rounds = _run(spark, [(0, i) for i in range(1, 9)])
    assert len(got) == 1
    assert rounds == 1


def test_matching_random(spark):
    rng = random.Random(31)
    pairs = set()
    while len(pairs) < 140:
        a, b = rng.randrange(48), rng.randrange(48)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    _run(spark, sorted(pairs))


def test_matching_symmetric_input_folds(spark):
    und = [(0, 1), (1, 2), (2, 3)]
    both = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(both, "a long, b long")
    m, _ = maximal_matching(df)
    got = {(r["a"], r["b"]) for r in m.collect()}
    assert got == greedy_matching(und)


def test_matching_max_rounds_raises(spark):
    df = spark.createDataFrame([(0, 1)], "a long, b long")
    with pytest.raises(RuntimeError):
        maximal_matching(df, max_rounds=0)
