import pytest

from parconnect_spark.plans.temporal import earliest_arrival


def tedges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, t long")


def test_earliest_arrival_respects_time_order(spark):
    # a -> b at t=10; b -> c at t=5 happens BEFORE arrival at b, so c is
    # unreachable through it; b -> c at t=20 works
    e = tedges(
        spark,
        [("a", "b", 10), ("b", "c", 5), ("b", "c", 20), ("c", "d", 15)],
    )
    got = {r["v"]: r["arrival"] for r in earliest_arrival(e, "a").collect()}
    # d needs c first (arr 20) but c->d fires at 15 < 20 -> unreachable
    assert got == {"a": 0, "b": 10, "c": 20}


def test_earliest_arrival_vs_static_reachability_gap(spark):
    # statically a reaches c (a->b->c) but never temporally
    e = tedges(spark, [("a", "b", 10), ("b", "c", 5)])
    got = {r["v"]: r["arrival"] for r in earliest_arrival(e, "a").collect()}
    assert "c" not in got and got["b"] == 10


def test_earliest_arrival_picks_earliest_of_parallel_paths(spark):
    e = tedges(
        spark,
        [("s", "x", 3), ("s", "y", 1), ("y", "x", 2), ("x", "z", 4)],
    )
    got = {r["v"]: r["arrival"] for r in earliest_arrival(e, "s").collect()}
    # x via y: arrive y at 1, y->x at 2 -> x at 2 (beats direct 3)
    assert got["x"] == 2 and got["z"] == 4


def test_earliest_arrival_start_time_and_nonconvergence_guard(spark):
    e = tedges(spark, [("a", "b", 10)])
    got = {
        r["v"]: r["arrival"]
        for r in earliest_arrival(e, "a", start_time=11).collect()
    }
    assert got == {"a": 11}  # edge at 10 already departed
    with pytest.raises(RuntimeError, match="converge"):
        earliest_arrival(e, "a", max_iters=0)
