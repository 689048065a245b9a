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
