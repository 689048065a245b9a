"""Deterministic random walks (plans/walks.py) vs a hashlib replay."""

import hashlib

import pytest

from parconnect_spark.plans.walks import random_walks


def walks_brute(pairs, seeds, length, salt="w"):
    """pairs: DIRECTED (src, dst). Returns {(walk_id, step): v}."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    out = {}
    for s in seeds:
        cur = s
        out[(s, 0)] = s
        for i in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(
                nbrs,
                key=lambda n: hashlib.md5(
                    f"{s}:{i}:{n}:{salt}".encode()
                ).hexdigest(),
            )
            out[(s, i)] = cur
    return out


def _run(spark, pairs, seeds, length, **kw):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    seed_df = spark.createDataFrame([(s,) for s in seeds], "v long")
    got = {
        (r["walk_id"], r["step"]): r["v"]
        for r in random_walks(edges, seed_df, length, **kw).collect()
    }
    assert got == walks_brute(pairs, seeds, length)
    return got


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


def test_walks_match_hash_replay(spark):
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)]
    got = _run(spark, _sym(und), seeds=[0, 3, 4], length=5)
    # every walk emits the full trace on a symmetric graph
    assert len(got) == 3 * 6


def test_walks_stop_at_dead_end(spark):
    # directed chain into a sink: 0 -> 1 -> 2, walk from 0 ends at step 2
    pairs = [(0, 1), (1, 2)]
    got = _run(spark, pairs, seeds=[0, 2], length=4)
    assert got[(0, 2)] == 2
    assert (0, 3) not in got
    assert (2, 1) not in got  # seed 2 is itself a sink: step-0 row only


def test_walks_length_zero(spark):
    got = _run(spark, [(0, 1), (1, 0)], seeds=[0, 1], length=0)
    assert got == {(0, 0): 0, (1, 0): 1}


def test_walks_shuffle_path_identical(spark):
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    pairs = _sym(und)
    a = _run(spark, pairs, seeds=[0, 1, 2, 3], length=4)
    edges = spark.createDataFrame(pairs, "src long, dst long")
    seed_df = spark.createDataFrame([(s,) for s in [0, 1, 2, 3]], "v long")
    b = {
        (r["walk_id"], r["step"]): r["v"]
        for r in random_walks(
            edges, seed_df, 4, broadcast_max_rows=0
        ).collect()
    }
    assert a == b


def test_walks_reject_negative_length(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "v long")
    with pytest.raises(ValueError):
        random_walks(edges, seeds, -1)


def test_walk_skipgram_pairs_window_semantics(spark):
    from parconnect_spark.plans.walks import walk_skipgram_pairs

    # two hand-written walks
    rows = [
        (0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 10),
        (1, 0, 11), (1, 1, 12),
    ]
    w = spark.createDataFrame(rows, "walk_id long, step int, v long")
    got = {
        (r["a"], r["b"]): r["n"]
        for r in walk_skipgram_pairs(w, window=2).collect()
    }
    exp = {}
    walks = {0: [10, 11, 12, 10], 1: [11, 12]}
    for seq in walks.values():
        for i, a in enumerate(seq):
            for j in range(i + 1, min(i + 3, len(seq))):
                exp[(a, seq[j])] = exp.get((a, seq[j]), 0) + 1
    assert got == exp
    # (11, 12) occurs in both walks -> count 2
    assert got[(11, 12)] == 2
