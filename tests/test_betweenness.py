"""Sampled Brandes betweenness vs an in-test reference implementation
(Brandes 2001, Alg. 1 restricted to a source subset, undirected halving) —
an oracle independent of both Spark and DuckDB."""

from collections import deque

import pytest

from parconnect_spark.operators.graph import symmetrize
from parconnect_spark.plans.betweenness import betweenness_centrality


def brandes_subset(adj, sources):
    bc = {v: 0.0 for v in adj}
    for s in sources:
        if s not in adj:
            continue
        S = []
        P = {v: [] for v in adj}
        sigma = {v: 0 for v in adj}
        dist = {v: -1 for v in adj}
        sigma[s], dist[s] = 1, 0
        q = deque([s])
        while q:
            v = q.popleft()
            S.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = {v: 0.0 for v in adj}
        while S:
            w = S.pop()
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: b / 2.0 for v, b in bc.items() if b > 0}


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    return adj


def _check(spark, und, sources):
    edges = symmetrize(spark.createDataFrame(und, "src long, dst long"))
    exp = brandes_subset(_adj(und), sources)
    got = {r["v"]: r["bc"] for r in betweenness_centrality(edges, sources).collect()}
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9


def test_betweenness_path_and_triangle(spark):
    und = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 4), (1, 5)]
    _check(spark, und, [0, 3])
    _check(spark, und, [0, 1, 2, 3, 4, 5])


def test_betweenness_star_center(spark):
    # star: every shortest path between leaves crosses the hub
    und = [(0, i) for i in range(1, 6)]
    edges = symmetrize(spark.createDataFrame(und, "src long, dst long"))
    got = {
        r["v"]: r["bc"]
        for r in betweenness_centrality(edges, list(range(6))).collect()
    }
    exp = brandes_subset(_adj(und), list(range(6)))
    assert got == pytest.approx(exp)
    assert set(got) == {0}  # only the hub carries traffic


def test_betweenness_disconnected_and_missing_sources(spark):
    und = [(0, 1), (1, 2), (10, 11)]
    _check(spark, und, [0, 10, 99])  # 99 absent: contributes nothing


def test_betweenness_requires_sources(spark):
    edges = symmetrize(spark.createDataFrame([(0, 1)], "src long, dst long"))
    with pytest.raises(ValueError):
        betweenness_centrality(edges, [])


@pytest.mark.slow
def test_betweenness_vs_reference_kronecker(spark):
    from parconnect_spark.sources.generators import kronecker_edges

    e2 = symmetrize(kronecker_edges(spark, scale=5, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in e2.collect()]
    adj = _adj(pairs)
    sources = sorted(adj)[:4]
    exp = brandes_subset(adj, sources)
    got = {r["v"]: r["bc"] for r in betweenness_centrality(e2, sources).collect()}
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9
