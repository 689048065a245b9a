import pytest

import numpy as np

from parconnect_spark.plans.pagerank import pagerank


def pagerank_numpy(pairs, n, damping=0.85, iters=200, tol=1e-12):
    """Dense power-iteration oracle with uniform dangling redistribution."""
    out = {}
    for a, b in pairs:
        out.setdefault(a, []).append(b)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - damping) / n)
        dangling = 0.0
        for v in range(n):
            targets = out.get(v)
            if targets:
                share = damping * r[v] / len(targets)
                for t in targets:
                    nxt[t] += share
            else:
                dangling += r[v]
        nxt += damping * dangling / n
        if np.abs(nxt - r).sum() < tol:
            r = nxt
            break
        r = nxt
    return r


@pytest.mark.slow
def test_pagerank_matches_oracle_undirected(spark):
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["v"]: r["rank"] for r in pagerank(edges, tol=1e-9).collect()}
    exp = pagerank_numpy(pairs, 5)
    assert sorted(got) == list(range(5))
    for v in range(5):
        assert abs(got[v] - exp[v]) < 1e-6  # BASELINE.json allclose 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_directed_with_dangling(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (3, 2)]  # 2 is dangling
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["v"]: r["rank"] for r in pagerank(edges, tol=1e-10).collect()}
    exp = pagerank_numpy(pairs, 4)
    for v in range(4):
        assert abs(got[v] - exp[v]) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_salted_equals_plain(spark):
    und = [(i, i + 1) for i in range(30)] + [(0, j) for j in range(2, 20)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    plain = {r["v"]: r["rank"] for r in pagerank(edges, num_iters=12, tol=None).collect()}
    salted = {
        r["v"]: r["rank"]
        for r in pagerank(edges, num_iters=12, tol=None, salt_buckets=8).collect()
    }
    for v in plain:
        assert abs(plain[v] - salted[v]) < 1e-12


@pytest.mark.slow
def test_pagerank_partitioned_path_equals_broadcast(spark):
    """broadcast_max_rows=0 forces the above-the-gate physical plan (edge
    cache pre-hashed on src, shuffle-hash rank join) — identical ranks."""
    und = [(i, i + 1) for i in range(25)] + [(0, j) for j in range(2, 15)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    bcast = {r["v"]: r["rank"] for r in pagerank(edges, tol=1e-10).collect()}
    parted = {
        r["v"]: r["rank"]
        for r in pagerank(edges, tol=1e-10, broadcast_max_rows=0).collect()
    }
    assert sorted(bcast) == sorted(parted)
    for v in bcast:
        assert abs(bcast[v] - parted[v]) < 1e-12


def test_pagerank_checkpoint_resume_parity(spark, tmp_path):
    """A run killed after k iterations resumes from the checkpoint and ends
    bit-identical to an uninterrupted fixed-iteration run."""
    from parconnect_spark.streaming.checkpoint import SuperstepCheckpoint

    pairs = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4)]  # 4 is dangling
    edges = spark.createDataFrame(pairs, "src long, dst long")
    full = {r["v"]: r["rank"] for r in pagerank(edges, tol=None, num_iters=6).collect()}

    ck1 = SuperstepCheckpoint(spark, str(tmp_path), "pr")
    pagerank(edges, tol=None, num_iters=3, checkpoint=ck1).collect()
    assert ck1.committed_steps()[-1] == 3
    assert ck1.latest_meta()["metrics"]["iteration"] == 3

    ck2 = SuperstepCheckpoint(spark, str(tmp_path), "pr")
    resumed = {
        r["v"]: r["rank"]
        for r in pagerank(edges, tol=None, num_iters=6, checkpoint=ck2).collect()
    }
    assert ck2.committed_steps()[-1] == 6
    for v in full:
        assert abs(full[v] - resumed[v]) < 1e-12


def test_pagerank_checkpoint_rejects_foreign_graph(spark, tmp_path):
    import pytest as _pytest

    from parconnect_spark.streaming.checkpoint import (
        CheckpointIdentityError,
        SuperstepCheckpoint,
    )

    e1 = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    e2 = spark.createDataFrame([(0, 2), (2, 0)], "src long, dst long")
    ck1 = SuperstepCheckpoint(spark, str(tmp_path), "prx")
    pagerank(e1, tol=None, num_iters=2, checkpoint=ck1).collect()
    ck2 = SuperstepCheckpoint(spark, str(tmp_path), "prx")
    with _pytest.raises(CheckpointIdentityError):
        pagerank(e2, tol=None, num_iters=2, checkpoint=ck2).collect()


def ppr_numpy(pairs, n, seeds, damping=0.85, iters=400, tol=1e-14):
    """Dense personalized-PageRank oracle: teleport AND dangling mass go to
    the seed set uniformly; ranks start at the restart vector."""
    p = np.zeros(n)
    p[list(seeds)] = 1.0 / len(seeds)
    out = {}
    for a, b in pairs:
        out.setdefault(a, []).append(b)
    r = p.copy()
    for _ in range(iters):
        nxt = (1 - damping) * p
        dangling = 0.0
        for v in range(n):
            targets = out.get(v)
            if targets:
                share = damping * r[v] / len(targets)
                for t in targets:
                    nxt[t] += share
            else:
                dangling += r[v]
        nxt += damping * dangling * p
        if np.abs(nxt - r).sum() < tol:
            return nxt
        r = nxt
    return r


def test_personalized_pagerank_directed_with_dangling(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4)]  # 4 is dangling
    edges = spark.createDataFrame(pairs, "src long, dst long")
    seeds = [0, 3]
    got = {
        r["v"]: r["rank"]
        for r in pagerank(edges, tol=1e-12, num_iters=500, seeds=seeds).collect()
    }
    exp = ppr_numpy(pairs, 5, seeds)
    for v in range(5):
        assert abs(got[v] - exp[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_personalized_pagerank_vs_networkx(spark):
    nx = pytest.importorskip("networkx")
    pytest.importorskip("scipy")  # nx.pagerank needs it

    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (4, 5)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["v"]: r["rank"]
        for r in pagerank(edges, tol=1e-12, num_iters=500, seeds=[2]).collect()
    }
    g = nx.DiGraph(pairs)
    exp = nx.pagerank(g, alpha=0.85, personalization={2: 1.0}, tol=1e-12, max_iter=500)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-8


def test_personalized_pagerank_seed_guards(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(edges, seeds=[])
    with pytest.raises(ValueError):
        pagerank(edges, seeds=list(range(5000)))


def test_pagerank_uniform_unchanged_by_seeds_param(spark):
    """seeds=None is byte-for-byte the classic teleport path."""
    und = [(0, 1), (1, 2), (2, 0), (2, 3)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["v"]: r["rank"] for r in pagerank(edges, tol=1e-10).collect()}
    exp = pagerank_numpy(pairs, 4)
    for v in range(4):
        assert abs(got[v] - exp[v]) < 1e-6


def test_weighted_pagerank_matches_dense_oracle(spark):
    # weighted digraph with a dangling vertex (4)
    wpairs = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (3, 2, 5.0), (2, 4, 1.0)]
    edges = spark.createDataFrame(wpairs, "src long, dst long, w double")
    got = {
        r["v"]: r["rank"]
        for r in pagerank(
            edges, tol=1e-13, num_iters=500, weight_col="w"
        ).collect()
    }
    n, d = 5, 0.85
    out = {}
    for a, b, w in wpairs:
        out.setdefault(a, []).append((b, w))
    r = np.full(n, 1.0 / n)
    for _ in range(2000):
        nxt = np.full(n, (1 - d) / n)
        dang = 0.0
        for v in range(n):
            ts = out.get(v)
            if ts:
                tw = sum(w for _, w in ts)
                for t, w in ts:
                    nxt[t] += d * r[v] * w / tw
            else:
                dang += r[v]
        nxt += d * dang / n
        if np.abs(nxt - r).sum() < 1e-15:
            break
        r = nxt
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_weighted_pagerank_uniform_weights_equal_unweighted(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    ew = e.selectExpr("src", "dst", "2.5 as w")
    plain = {r["v"]: r["rank"] for r in pagerank(e, tol=1e-12, num_iters=400).collect()}
    weighted = {
        r["v"]: r["rank"]
        for r in pagerank(ew, tol=1e-12, num_iters=400, weight_col="w").collect()
    }
    for v in plain:
        assert abs(plain[v] - weighted[v]) < 1e-12
