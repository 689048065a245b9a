"""HITS hubs & authorities (plans/hits.py) vs a dense numpy oracle."""

import numpy as np
import pytest

from parconnect_spark.plans.hits import hits


def hits_numpy(pairs, n, iters=8):
    """Dense power iteration with the same L1 normalization as hits()."""
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.zeros(n)
        for a, b in pairs:
            auth[b] += hub[a]
        s = auth.sum()
        auth = auth / s if s > 0 else auth
        hub = np.zeros(n)
        for a, b in pairs:
            hub[a] += auth[b]
        s = hub.sum()
        hub = hub / s if s > 0 else hub
    return hub, auth


PAIRS = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4), (4, 0)]


def _check(rows, pairs, n, iters):
    exp_hub, exp_auth = hits_numpy(pairs, n, iters)
    got = {r["v"]: (r["hub"], r["authority"]) for r in rows}
    assert sorted(got) == list(range(n))
    for v in range(n):
        assert abs(got[v][0] - exp_hub[v]) < 1e-9
        assert abs(got[v][1] - exp_auth[v]) < 1e-9
    assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-9


def test_hits_matches_numpy_broadcast_path(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    _check(hits(edges, num_iters=4).collect(), PAIRS, 5, 4)


def test_hits_matches_numpy_shuffle_path(spark):
    # broadcast_max_rows=0 forces the pre-hashed big-graph plan.
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    _check(
        hits(edges, num_iters=2, broadcast_max_rows=0).collect(), PAIRS, 5, 2
    )


def test_hits_sink_and_source_scores(spark):
    # 0 -> 1 -> 2: vertex 2 never points anywhere (hub 0), vertex 0 is
    # never pointed at (authority 0); neither is dropped from the output.
    pairs = [(0, 1), (1, 2)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = {r["v"]: r for r in hits(edges, num_iters=3).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[2]["hub"] == 0.0
    assert rows[0]["authority"] == 0.0
    _check(list(rows.values()), pairs, 3, 3)


def test_hits_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    out = hits(edges, num_iters=2)
    assert out.columns == ["v", "hub", "authority"]
    assert out.count() == 0


def test_hits_rejects_zero_iters(spark):
    edges = spark.createDataFrame(PAIRS, "src long, dst long")
    with pytest.raises(ValueError):
        hits(edges, num_iters=0)
