"""Structured Streaming smoke tests: parquet source → memory sink,
processAllAvailable drives the batch synchronously (pyspark guide pattern)."""

import pyspark.sql.functions as F
import pytest

from parconnect_spark.sources.transcripts import synth_transcripts
from parconnect_spark.streaming.stream import (
    membership_edge_stream,
    sequential_edge_stream,
    stream_transcripts,
    turn_rate_metrics,
)


@pytest.fixture()
def transcripts_dir(spark, tmp_path):
    path = str(tmp_path / "transcripts")
    synth_transcripts(spark, n_convs=25).write.parquet(path)
    return path


def _run_stream(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_membership_edge_stream(spark, transcripts_dir):
    st = stream_transcripts(spark, transcripts_dir)
    assert st.isStreaming
    _run_stream(membership_edge_stream(st), "mem_edges")
    got = {
        (r["a"], r["b"])
        for r in spark.sql("SELECT DISTINCT a, b FROM mem_edges").collect()
    }
    # batch derivation of the same membership edges
    from parconnect_spark.operators.derive import transcripts_to_entity_turns

    batch = spark.read.parquet(transcripts_dir)
    turns = transcripts_to_entity_turns(batch)
    exp_raw = turns.select(
        F.concat(F.lit("c:"), F.col("conv_id")).alias("x"),
        F.col("entity").alias("y"),
    )
    exp = {
        (r["a"], r["b"])
        for r in exp_raw.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .where("a <> b")
        .distinct()
        .collect()
    }
    assert got == exp


def test_sequential_edge_stream_matches_batch(spark, transcripts_dir):
    st = stream_transcripts(spark, transcripts_dir)
    _run_stream(sequential_edge_stream(st), "seq_edges")
    got = {
        (r["a"], r["b"])
        for r in spark.sql("SELECT DISTINCT a, b FROM seq_edges").collect()
    }
    from parconnect_spark.operators.derive import transcripts_to_entity_turns

    batch = spark.read.parquet(transcripts_dir)
    turns = transcripts_to_entity_turns(batch).where(F.col("next_entity").isNotNull())
    exp = {
        (r["a"], r["b"])
        for r in turns.select(
            F.least("entity", "next_entity").alias("a"),
            F.greatest("entity", "next_entity").alias("b"),
        )
        .where("a <> b")
        .distinct()
        .collect()
    }
    assert got == exp


def test_turn_rate_metrics(spark, transcripts_dir):
    st = stream_transcripts(spark, transcripts_dir)
    _run_stream(turn_rate_metrics(st), "turn_rates")
    rows = spark.sql("SELECT * FROM turn_rates").collect()
    # append mode emits only watermark-closed windows; schema is the check
    assert {c for c in spark.table("turn_rates").columns} == {"window", "role", "turns"}
    assert all(r["turns"] > 0 for r in rows)


def test_entity_turn_counts_stream_equals_batch(spark, tmp_path):
    from parconnect_spark.sources import synth_transcripts
    from parconnect_spark.streaming.stream import (
        entity_turn_counts_stream,
        stream_transcripts,
    )

    t = synth_transcripts(spark, n_convs=40)
    t.write.parquet(str(tmp_path / "transcripts"))
    st = stream_transcripts(spark, str(tmp_path / "transcripts"))
    q = (
        entity_turn_counts_stream(st)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_entity_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["entity"]: r["turns"]
        for r in spark.sql("SELECT * FROM t_entity_counts").collect()
    }
    import pyspark.sql.functions as F

    exp = {
        r["entity"]: r["turns"]
        for r in t.select(
            F.when(
                F.col("tool").isNotNull(), F.concat(F.lit("t:"), F.col("tool"))
            )
            .otherwise(F.concat(F.lit("r:"), F.col("role")))
            .alias("entity")
        )
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("turns"))
        .collect()
    }
    assert got == exp
