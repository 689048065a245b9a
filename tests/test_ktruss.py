"""k-truss decomposition (plans/ktruss.py) against brute-force and
networkx oracles."""

import pytest
from pyspark.sql import functions as F

from parconnect_spark.operators.graph import symmetrize
from parconnect_spark.plans.ktruss import ktruss


def _sym(spark, pairs):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return symmetrize(df)


def _brute_ktruss(pairs, k):
    """Sequential textbook peel: repeatedly drop edges with < k-2 common
    neighbors inside the surviving subgraph."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        bad = {
            (u, v)
            for u, v in edges
            if len(adj[u] & adj[v]) < k - 2
        }
        if not bad:
            break
        edges -= bad
    support = {}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for u, v in edges:
        support[(u, v)] = len(adj[u] & adj[v])
    return support


# two glued triangles + a pendant path + a 4-clique
PAIRS = [
    (0, 1), (1, 2), (0, 2),          # triangle A
    (2, 3), (3, 4), (2, 4),          # triangle B glued at 2
    (4, 5), (5, 6),                  # pendant path
    (10, 11), (10, 12), (10, 13),    # 4-clique
    (11, 12), (11, 13), (12, 13),
]


@pytest.mark.parametrize("k", [3, 4])
def test_ktruss_matches_brute_force(spark, k):
    got, _rounds = ktruss(_sym(spark, PAIRS), k=k)
    rows = {(r["src"], r["dst"]): r["support"] for r in got.collect()}
    assert rows == _brute_ktruss(PAIRS, k)


def test_ktruss_empties_out(spark):
    # k=5 demands 3 common neighbors per edge; even the 4-clique dies
    got, _ = ktruss(_sym(spark, PAIRS), k=5)
    assert got.count() == 0


def test_ktruss_k4_keeps_only_the_clique(spark):
    got, rounds = ktruss(_sym(spark, PAIRS), k=4)
    verts = {
        x for r in got.collect() for x in (r["src"], r["dst"])
    }
    assert verts == {10, 11, 12, 13}
    assert rounds >= 1  # the glued triangles peel


def test_ktruss_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        ktruss(_sym(spark, PAIRS), k=2)


def test_ktruss_max_rounds_raises(spark):
    with pytest.raises(RuntimeError):
        ktruss(_sym(spark, PAIRS), k=4, max_rounds=0)


@pytest.mark.slow
def test_ktruss_networkx_parity(spark):
    nx = pytest.importorskip("networkx")
    rng_pairs = []
    seed = 0x5EED
    for i in range(220):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % 2**64
        u = seed % 40
        v = (seed >> 17) % 40
        if u != v:
            rng_pairs.append((u, v))
    for k in (3, 4, 5):
        got, _ = ktruss(_sym(spark, rng_pairs), k=k)
        mine = {(r["src"], r["dst"]) for r in got.collect()}
        g = nx.Graph()
        g.add_edges_from(rng_pairs)
        theirs = {tuple(sorted(e)) for e in nx.k_truss(g, k).edges()}
        assert mine == theirs
