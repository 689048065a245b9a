import numpy as np
import pyspark.sql.functions as F

from parconnect_spark.plans.eigen import eigencentrality


def _sym(spark, und):
    e = und + [(b, a) for a, b in und]
    return spark.createDataFrame(sorted(set(e)), "src long, dst long")


def _numpy_power(und, iters, nv):
    A = np.zeros((nv, nv))
    for a, b in und:
        A[a, b] = A[b, a] = 1.0
    x = np.full(nv, 1.0 / nv)
    for _ in range(iters):
        x = A @ x
        s = x.sum()
        x = x / s if s > 0 else x * 0.0
    return x


def test_eigen_matches_numpy_power_iteration(spark):
    und = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (5, 6)]
    got = {
        r["v"]: r["score"]
        for r in eigencentrality(_sym(spark, und), num_iters=8).collect()
    }
    exp = _numpy_power(und, 8, 7)
    assert set(got) == set(range(7))
    for v in range(7):
        assert abs(got[v] - exp[v]) < 1e-9


def test_eigen_star_center_dominates(spark):
    und = [(0, i) for i in range(1, 9)] + [(9, 10)]
    got = {
        r["v"]: r["score"]
        for r in eigencentrality(_sym(spark, und), num_iters=10).collect()
    }
    assert got[0] == max(got.values())
    # leaves of the star are symmetric -> identical scores
    leaves = {got[i] for i in range(1, 9)}
    assert len(leaves) == 1


def test_eigen_isolated_and_empty(spark):
    assert (
        eigencentrality(
            spark.createDataFrame([], "src long, dst long")
        ).count()
        == 0
    )


def test_eigen_partition_invariance(spark):
    und = [(i, (i * 3 + 1) % 20) for i in range(40)]
    und = [(a, b) for a, b in und if a != b]
    e = _sym(spark, und)
    a = sorted(
        (r["v"], round(r["score"], 12))
        for r in eigencentrality(e, num_iters=6).collect()
    )
    b = sorted(
        (r["v"], round(r["score"], 12))
        for r in eigencentrality(e.repartition(17), num_iters=6).collect()
    )
    assert a == b and a
