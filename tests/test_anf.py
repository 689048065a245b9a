"""HyperANF registers (plans/anf.py) vs a sequential Python replay, plus
estimator sanity against exact BFS ball sizes."""

import hashlib
import random

from parconnect_spark.plans.anf import (
    anf_estimates,
    neighborhood_function,
    neighborhood_registers,
    vertex_registers,
)

P = 6
M = 1 << P
WBITS = 60 - P


def _regs_of(v, salt="anf"):
    h = int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16)
    reg = h % M
    w = h // M
    rho = WBITS + 1 if w == 0 else WBITS - w.bit_length() + 1
    return reg, rho


def anf_brute(und_pairs, hops, salt="anf"):
    """Sequential replay: per-vertex register dicts, max-merged per hop."""
    adj = {}
    for a, b in und_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    regs = {}
    for v in adj:
        reg, rho = _regs_of(v, salt)
        regs[v] = {reg: rho}
    for _ in range(hops):
        nxt = {v: dict(r) for v, r in regs.items()}
        for v in adj:
            for u in adj[v]:
                for reg, rho in regs[u].items():
                    if nxt[v].get(reg, 0) < rho:
                        nxt[v][reg] = rho
        regs = nxt
    return regs


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


def test_hop0_registers_match_replay(spark):
    verts = spark.createDataFrame([(v,) for v in range(40)], "v long")
    got = {
        r["v"]: (r["reg"], r["rho"])
        for r in vertex_registers(verts, p=P).collect()
    }
    assert got == {v: _regs_of(v) for v in range(40)}


def test_register_evolution_matches_replay(spark):
    rng = random.Random(11)
    pairs = set()
    while len(pairs) < 80:
        a, b = rng.randrange(30), rng.randrange(30)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    und = sorted(pairs)
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    for hops in (1, 3):
        regs = neighborhood_registers(edges, hops=hops, p=P)
        got = {}
        for r in regs.collect():
            got.setdefault(r["v"], {})[r["reg"]] = r["rho"]
        assert got == anf_brute(und, hops)


def test_estimates_track_exact_ball_sizes(spark):
    # chain of 80: ball(v, 2) has <= 5 members — small-range linear
    # counting territory, estimates should sit near the exact sizes.
    und = [(i, i + 1) for i in range(79)]
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    regs = neighborhood_registers(edges, hops=2, p=P)
    est = {r["v"]: r["estimate"] for r in anf_estimates(regs, p=P).collect()}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in adj:
        ball = {v} | adj[v] | {w for u in adj[v] for w in adj[u]}
        assert abs(est[v] - len(ball)) / len(ball) < 0.35


def test_neighborhood_function_monotone(spark):
    und = [(i, i + 1) for i in range(30)]
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    curve = neighborhood_function(edges, max_hops=3, p=P)
    assert [t for t, _ in curve] == [0, 1, 2, 3]
    vals = [n for _, n in curve]
    assert all(b >= a * 0.999 for a, b in zip(vals, vals[1:]))


def test_registers_partition_invariant(spark):
    import pyspark.sql.functions as F

    und = [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23]
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    a = neighborhood_registers(edges, hops=2, p=P)
    b = neighborhood_registers(
        edges.orderBy(F.rand(seed=4)).repartition(13), hops=2, p=P
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
