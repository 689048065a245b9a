"""1-WL color refinement (plans/wl.py): EXACT pure-Python replay parity
(the trajectory is a deterministic function of the edge set under the
md5 folds and the mod-2^60 multiset sum), the refinement's symmetry
semantics (orbit-equivalent vertices share labels; the classic regular-
graph blind spot is pinned as documented behavior), and partition
invariance of the commutative multiset hash."""

import hashlib

import pyspark.sql.functions as F
import pytest

from parconnect_spark.plans.wl import MSUM_MOD, wl_refinement


def _md5int(s, chars=15):
    return int(hashlib.md5(s.encode()).hexdigest()[:chars], 16)


def _replay(und_edges, rounds, salt="wl"):
    """Pure-Python 1-WL under the same folds as the Spark plan."""
    adj = {}
    for a, b in und_edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: len(ns) for v, ns in adj.items()}
    for r in range(rounds):
        msum = {
            v: sum(_md5int(f"{salt}n{r}:{lab[u]}") for u in ns) % MSUM_MOD
            for v, ns in adj.items()
        }
        lab = {
            v: _md5int(f"{salt}{r}:{lab[v]}:{msum[v]}") for v in adj
        }
    return lab


def _sym(spark, und):
    rows = und + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src long, dst long")


def _labels(df):
    return {r["v"]: r["wl"] for r in df.collect()}


def test_wl_matches_python_replay(spark):
    # irregular graph: a star glued to a path with a pendant triangle
    und = [(1, 2), (1, 3), (1, 4), (4, 5), (5, 6), (6, 7), (6, 8), (7, 8)]
    for rounds in (0, 1, 3):
        got = _labels(wl_refinement(_sym(spark, und), rounds=rounds))
        assert got == _replay(und, rounds)


def test_wl_orbit_symmetry_and_separation(spark):
    # P4 path: the two ends are orbit-equivalent, the two middles are
    # orbit-equivalent, and ends never merge with middles
    lab = _labels(wl_refinement(_sym(spark, [(1, 2), (2, 3), (3, 4)])))
    assert lab[1] == lab[4] and lab[2] == lab[3] and lab[1] != lab[2]


def test_wl_regular_graph_blind_spot_is_documented_semantics(spark):
    # two triangles vs one hexagon: both 2-regular, so 1-WL gives every
    # vertex of both graphs the SAME label at every depth — the classic
    # refinement limit, pinned here as the operator's declared semantics
    two_tri = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)]
    hexagon = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1)]
    la = set(_labels(wl_refinement(_sym(spark, two_tri))).values())
    lb = set(_labels(wl_refinement(_sym(spark, hexagon))).values())
    assert len(la) == 1 and la == lb


def test_wl_partition_invariance(spark):
    und = [(i, i + 1) for i in range(1, 40)] + [(1, 40), (5, 25)]
    ed = _sym(spark, und)
    a = _labels(wl_refinement(ed))
    b = _labels(wl_refinement(ed.repartition(13, "dst")))
    assert a == b


def test_wl_rejects_negative_rounds(spark):
    with pytest.raises(ValueError):
        wl_refinement(_sym(spark, [(1, 2)]), rounds=-1)
