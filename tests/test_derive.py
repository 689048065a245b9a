import pyspark.sql.functions as F

from parconnect_spark.operators.derive import (
    derive_edges,
    derive_string_edges,
    transcripts_to_entity_turns,
    verify_text_invariant,
)
from parconnect_spark.operators.graph import check_bidirectional
from parconnect_spark.sources.transcripts import synth_transcripts


def test_synth_schema_and_determinism(spark):
    t1 = synth_transcripts(spark, n_convs=30)
    t2 = synth_transcripts(spark, n_convs=30).repartition(9)
    assert [f.name for f in t1.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert t1.exceptAll(t2).count() == 0 and t2.exceptAll(t1).count() == 0
    # (conv_id, turn_idx) unique → stable turn ordering
    dup = t1.groupBy("conv_id", "turn_idx").count().where("count > 1")
    assert dup.count() == 0
    # ts monotone within conv
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = t1.withColumn("prev", F.lag("ts").over(w)).where(
        F.col("prev").isNotNull() & (F.col("ts") < F.col("prev"))
    )
    assert bad.count() == 0


def test_hub_conversations_skew(spark):
    t = synth_transcripts(spark, n_convs=50, n_hubs=3, hub_factor=20)
    sizes = {
        r["conv_id"]: r["n"]
        for r in t.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    hub_sizes = [sizes[f"conv_{i}"] for i in range(3)]
    rest = [v for k, v in sizes.items() if k not in ("conv_0", "conv_1", "conv_2")]
    assert min(hub_sizes) > max(rest)


def test_text_invariant_holds(spark):
    t = synth_transcripts(spark, n_convs=40)
    assert verify_text_invariant(t)


def test_entity_turns_sequence(spark):
    rows = [
        ("c1", 0, "user", "hello", None, "2024-01-01T00:00:00"),
        ("c1", 1, "assistant", "hi", "tool_3", "2024-01-01T00:00:05"),
        ("c1", 2, "user", "thanks", None, "2024-01-01T00:00:09"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    turns = {r["turn_idx"]: r for r in transcripts_to_entity_turns(t).collect()}
    assert turns[0]["entity"] == "r:user"
    assert turns[1]["entity"] == "t:tool_3"
    assert turns[0]["next_entity"] == "t:tool_3"
    assert turns[2]["next_entity"] is None
    se = {(r["a"], r["b"]) for r in derive_string_edges(t).collect()}
    assert se == {
        ("r:user", "t:tool_3"),
        ("c:c1", "r:user"),
        ("c:c1", "t:tool_3"),
    }


def test_derive_edges_long_symmetric_contiguous(spark):
    t = synth_transcripts(spark, n_convs=25)
    edges, id_map = derive_edges(t)
    assert check_bidirectional(edges)
    n = id_map.count()
    ids = id_map.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi"), F.countDistinct("id").alias("d")
    ).collect()[0]
    assert ids["lo"] == 0 and ids["hi"] == n - 1 and ids["d"] == n
    # all edge endpoints within [0, n)
    assert edges.where((F.col("src") < 0) | (F.col("src") >= n)).count() == 0


def test_windowed_edges_snapshot_semantics(spark):
    """Per-turn windowing: a boundary-crossing sequential edge lands in the
    EARLIER turn's window with both endpoints tagged by it; membership
    edges follow each turn's own window; windows are disjoint by prefix."""
    import datetime as dt

    from parconnect_spark.operators.derive import derive_windowed_string_edges

    rows = [
        # conv A: two turns in week 2024-01-01, third in week 2024-01-08
        ("A", 0, "user", "t0", None, dt.datetime(2024, 1, 2, 10)),
        ("A", 1, "assistant", "t1", None, dt.datetime(2024, 1, 3, 10)),
        ("A", 2, "user", "t2", "hammer", dt.datetime(2024, 1, 9, 10)),
        # conv B: single week-2 turn
        ("B", 0, "system", "t3", None, dt.datetime(2024, 1, 10, 10)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r["a"], r["b"])
        for r in derive_windowed_string_edges(t, "week").collect()
    }
    exp = {
        # A seq 0->1 inside week 1
        ("2024-01-01|r:assistant", "2024-01-01|r:user"),
        # A seq 1->2 CROSSES into week 2: earlier turn's window tags both
        ("2024-01-01|r:assistant", "2024-01-01|t:hammer"),
        # memberships follow each turn's own window
        ("2024-01-01|c:A", "2024-01-01|r:user"),
        ("2024-01-01|c:A", "2024-01-01|r:assistant"),
        ("2024-01-08|c:A", "2024-01-08|t:hammer"),
        ("2024-01-08|c:B", "2024-01-08|r:system"),
    }
    assert got == exp
    # disjoint snapshots: both endpoints always share the window prefix
    assert all(a.split("|")[0] == b.split("|")[0] for a, b in got)
