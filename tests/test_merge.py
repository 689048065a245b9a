import pytest

from parconnect_spark.operators.merge import merge_upsert


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")],
        "k long, ts long, v string",
    )
    upd = spark.createDataFrame(
        [
            (2, 20, "b2"),   # newer -> replaces
            (3, 5, "c_old"), # older -> base survives
            (4, 10, "d"),    # new key -> insert
        ],
        "k long, ts long, v string",
    )
    got = sorted(map(tuple, merge_upsert(base, upd, ["k"], "ts").collect()))
    assert got == [(1, 10, "a"), (2, 20, "b2"), (3, 10, "c"), (4, 10, "d")]


def test_merge_upsert_tie_update_wins_and_multi_update(spark):
    base = spark.createDataFrame([(1, 10, "a")], "k long, ts long, v string")
    upd = spark.createDataFrame(
        [(1, 10, "tie"), (1, 9, "older")], "k long, ts long, v string"
    )
    got = merge_upsert(base, upd, ["k"], "ts").collect()
    assert [tuple(r) for r in got] == [(1, 10, "tie")]


def test_merge_upsert_schema_guard(spark):
    base = spark.createDataFrame([(1, 10)], "k long, ts long")
    upd = spark.createDataFrame([(1, 10, "x")], "k long, ts long, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(base, upd, ["k"], "ts")


def test_merge_upsert_untouched_never_rewritten(spark):
    from parconnect_spark.sources.bucketed import is_shuffle_free

    base = spark.range(1000).selectExpr("id AS k", "10 AS ts", "id AS v")
    upd = spark.createDataFrame([(5, 20, 99)], "k long, ts long, v long")
    out = merge_upsert(base, upd, ["k"], "ts")
    assert out.count() == 1000
    assert out.where("k = 5").collect()[0]["v"] == 99
    # the untouched branch is anti-join + union — no shuffle for the
    # 999 untouched rows (broadcast semi/anti + tiny window side only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_scd2_build_intervals_and_collapse(spark):
    from parconnect_spark.operators.merge import scd2_build

    rows = [
        (1, 10, "gold"),
        (1, 20, "gold"),    # unchanged -> collapsed
        (1, 30, "silver"),
        (1, 40, "gold"),    # back to gold: NEW interval (run-length, not set)
        (2, 10, "bronze"),
    ]
    d = spark.createDataFrame(rows, "k long, ts long, tier string")
    got = sorted(
        map(tuple, scd2_build(d, ["k"], ["ts"], ["tier"]).collect())
    )
    assert got == [
        (1, "gold", 10, 30),
        (1, "gold", 40, None),
        (1, "silver", 30, 40),
        (2, "bronze", 10, None),
    ]


def test_scd2_no_collapse_keeps_every_change_row(spark):
    from parconnect_spark.operators.merge import scd2_build

    d = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "a")], "k long, ts long, v string"
    )
    got = sorted(
        map(
            tuple,
            scd2_build(d, ["k"], ["ts"], ["v"], collapse=False).collect(),
        )
    )
    assert got == [(1, "a", 10, 20), (1, "a", 20, None)]


def test_scd2_null_attr_runs(spark):
    from parconnect_spark.operators.merge import scd2_build

    d = spark.createDataFrame(
        [(1, 10, None), (1, 20, None), (1, 30, "x")],
        "k long, ts long, v string",
    )
    got = sorted(
        map(tuple, scd2_build(d, ["k"], ["ts"], ["v"]).collect()),
        key=lambda t: t[2],
    )
    # NULL==NULL collapses under eqNullSafe; the first row always survives
    assert got == [(1, None, 10, 30), (1, "x", 30, None)]
