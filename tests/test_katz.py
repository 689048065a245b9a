"""Katz centrality (plans/katz.py): hand cases, a sequential integer-
recurrence replay oracle, path parity (broadcast vs pre-hashed), and
partition invariance."""

import pyspark.sql.functions as F
import pytest

from parconnect_spark.plans.katz import SCALE, katz


def _replay(edges, n_vertices, num_iters, alpha_inv):
    """Sequential replay of the exact integer recurrence (an oracle
    independent of Spark: plain dict arithmetic)."""
    verts = sorted({v for e in edges for v in e})
    s = {v: SCALE for v in verts}
    for _ in range(2, num_iters + 1):
        nxt = {}
        for v in verts:
            acc = sum(s[u] for (u, d) in edges if d == v)
            nxt[v] = SCALE + acc // alpha_inv
        s = nxt
    return s


def _katz_map(df):
    return {r["v"]: r["katz6"] for r in df.collect()}


def test_chain_hand_case(spark):
    # 0 -> 1 -> 2, alpha_inv = 2, K = 3:
    # s1 = (1e6, 1e6, 1e6)
    # s2 = (1e6, 1e6 + 1e6//2, 1e6 + 1e6//2) = (1e6, 1.5e6, 1.5e6)
    # s3 = (1e6, 1e6 + 1e6//2, 1e6 + 1.5e6//2) = (1e6, 1.5e6, 1.75e6)
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = _katz_map(katz(edges, num_iters=3, alpha_inv=2))
    assert got == {0: SCALE, 1: 1_500_000, 2: 1_750_000}


def test_matches_sequential_replay(spark):
    # small cyclic + hub graph exercises both feedback and fan-in
    e = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (0, 4), (2, 4), (3, 2)]
    df = spark.createDataFrame(e, "src long, dst long")
    got = _katz_map(katz(df, num_iters=5, alpha_inv=3))
    want = _replay(e, 5, 5, 3)
    assert got == want


def test_no_in_edge_vertex_scores_base(spark):
    edges = spark.createDataFrame([(7, 8)], "src long, dst long")
    got = _katz_map(katz(edges, num_iters=4, alpha_inv=10))
    assert got[7] == SCALE  # source: no in-edges, pure beta term
    assert got[8] > SCALE


def test_broadcast_and_prehashed_paths_agree(spark):
    e = [(i, (i * 3 + 1) % 17) for i in range(17)] + [(i, 0) for i in range(1, 17)]
    e = [p for p in e if p[0] != p[1]]
    df = spark.createDataFrame(e, "src long, dst long")
    a = _katz_map(katz(df, num_iters=6, alpha_inv=5))
    b = _katz_map(katz(df, num_iters=6, alpha_inv=5, broadcast_max_rows=0))
    assert a == b


def test_partition_invariance(spark):
    e = [(i % 11, (i * 7 + 3) % 11) for i in range(40)]
    e = [p for p in e if p[0] != p[1]]
    df = spark.createDataFrame(e, "src long, dst long").distinct()
    rows = [(r["src"], r["dst"]) for r in df.collect()]
    a = _katz_map(katz(df.repartition(1), num_iters=4, alpha_inv=4))
    b = _katz_map(katz(df.repartition(13, "dst"), num_iters=4, alpha_inv=4))
    assert a == b == _replay(rows, 11, 4, 4)


def test_katz_double_column_is_scaled_int(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = katz(edges, num_iters=3, alpha_inv=2)
    for r in out.collect():
        assert r["katz"] == r["katz6"] / SCALE


def test_rejects_bad_params(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        katz(edges, num_iters=0)
    with pytest.raises(ValueError):
        katz(edges, alpha_inv=0)


def test_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert katz(edges).count() == 0
