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


def _final_sessions(spark, view):
    """max_by(stats, n_events) per (user, session) — the emission contract's
    read-back reduction (n_events strictly increases per touch)."""
    return {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["first_event"], r["last_event"],
            r["duration_sec"], round(r["sum_value"], 4),
        )
        for r in spark.sql(
            f"""SELECT user_id, session_idx, s.* FROM (
                  SELECT user_id, session_idx,
                         max_by(struct(n_events, first_event, last_event,
                                       duration_sec, sum_value), n_events) AS s
                  FROM {view} GROUP BY user_id, session_idx)"""
        ).collect()
    }


def _batch_sessions(spark, events):
    from parconnect_spark.operators.events import session_rollup

    return {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["first_event"], r["last_event"],
            r["duration_sec"], r["sum_value"],
        )
        for r in session_rollup(events, gap_seconds=600).collect()
    }


def _synth_events(spark, n=400, users=7):
    import datetime as dt

    rows = []
    t = dt.datetime(2024, 1, 1)
    for i in range(n):
        # deterministic pseudo-random gaps straddling the 600s boundary,
        # including exactly-600 (the >= contract) and equal timestamps
        step = [30, 599, 600, 601, 1500, 0][i % 6]
        t = t + dt.timedelta(seconds=step)
        rows.append((i, t, i % users, "e", round(0.5 + (i % 13) * 1.25, 2), "{}"))
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_session_stream_equals_batch_single_batch(spark, tmp_path):
    from parconnect_spark.streaming.stream import session_stream, stream_events

    ev = _synth_events(spark)
    ev.write.parquet(str(tmp_path / "events"))
    st = stream_events(spark, str(tmp_path / "events"))
    _run_stream(session_stream(st, gap_seconds=600), "sess_single")
    assert _final_sessions(spark, "sess_single") == _batch_sessions(
        spark, spark.read.parquet(str(tmp_path / "events"))
    )


def test_session_stream_equals_batch_multi_batch(spark, tmp_path):
    """Per-user in-order arrival across micro-batches: time-ordered file
    chunks + maxFilesPerTrigger=1 force sessions to straddle state
    boundaries (continuation merge, re-emission, max_by read-back)."""
    import os
    import time

    from parconnect_spark.streaming.stream import session_stream, stream_events

    ev = _synth_events(spark).orderBy("ts", "event_id").collect()
    src = tmp_path / "events_chunks"
    os.makedirs(src)
    chunks = [ev[:150], ev[150:260], ev[260:]]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(src / f"chunk{i}")
        )
        time.sleep(1.1)  # distinct mtimes: file source replays oldest first
    st = (
        spark.readStream.format("parquet")
        .schema(spark.createDataFrame([], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(str(src / "chunk*"))
    )
    _run_stream(session_stream(st, gap_seconds=600), "sess_multi")
    batch = spark.createDataFrame(ev, schema)
    assert _final_sessions(spark, "sess_multi") == _batch_sessions(spark, batch)


def test_term_counts_stream_equals_batch(spark, tmp_path):
    from parconnect_spark.sources import synth_transcripts
    from parconnect_spark.streaming.stream import (
        stream_transcripts,
        term_counts_stream,
    )

    t = synth_transcripts(spark, n_convs=40)
    t.write.parquet(str(tmp_path / "transcripts"))
    st = stream_transcripts(spark, str(tmp_path / "transcripts"))
    q = (
        term_counts_stream(st)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_term_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["bucket_us"], r["term"]): r["cnt"]
        for r in spark.sql("SELECT * FROM t_term_counts").collect()
    }
    import pyspark.sql.functions as F

    exp = {
        (r["b"], r["term"]): r["cnt"]
        for r in t.select(
            F.expr("unix_micros(ts) div 86400000000 * 86400000000").alias("b"),
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("term"),
        )
        .groupBy("b", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == exp and got


def test_seq_join_edge_stream_equals_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from parconnect_spark.sources import synth_transcripts
    from parconnect_spark.streaming.stream import (
        seq_join_edge_stream,
        stream_transcripts,
    )

    t = synth_transcripts(spark, n_convs=40)
    t.write.parquet(str(tmp_path / "transcripts"))
    # two independent source nodes over the same directory: a self-join
    # needs distinct readStream handles
    st_a = stream_transcripts(spark, str(tmp_path / "transcripts"))
    st_b = stream_transcripts(spark, str(tmp_path / "transcripts"))
    q = (
        seq_join_edge_stream(st_a, st_b)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_seq_join")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["a"], r["b"])
        for r in spark.sql("SELECT a, b FROM t_seq_join").collect()
    )

    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ent = F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("t:"), F.col("tool"))
    ).otherwise(F.concat(F.lit("r:"), F.col("role")))
    exp = sorted(
        (r["a"], r["b"])
        for r in t.select(
            ent.alias("a"), F.lead(ent).over(w).alias("b")
        )
        .where(F.col("b").isNotNull())
        .collect()
    )
    assert got == exp and got


def test_dedup_stream_replayed_files_equals_batch(spark, tmp_path):
    from parconnect_spark.sources import synth_transcripts
    from parconnect_spark.streaming.stream import dedup_stream, stream_transcripts

    t = synth_transcripts(spark, n_convs=30)
    d = str(tmp_path / "tr")
    # at-least-once upstream: the same data lands twice as separate files
    t.write.parquet(d)
    t.write.mode("append").parquet(d)
    st = stream_transcripts(spark, d)
    q = (
        dedup_stream(st)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in spark.sql(
            "SELECT conv_id, turn_idx FROM t_dedup_stream"
        ).collect()
    )
    exp = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in t.select("conv_id", "turn_idx").collect()
    )
    assert got == exp and got


def test_enriched_edge_stream_equals_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from parconnect_spark.sources import synth_transcripts
    from parconnect_spark.streaming.stream import (
        enriched_edge_stream,
        stream_transcripts,
    )

    t = synth_transcripts(spark, n_convs=25)
    t.write.parquet(str(tmp_path / "tr"))
    ent = F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("t:"), F.col("tool"))
    ).otherwise(F.concat(F.lit("r:"), F.col("role")))
    dim = (
        t.select(ent.alias("entity"))
        .distinct()
        .withColumn("attr", F.length("entity"))
    )
    st = stream_transcripts(spark, str(tmp_path / "tr"))
    q = (
        enriched_edge_stream(st, dim)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_enrich")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["entity"], r["attr"])
        for r in spark.sql("SELECT * FROM t_enrich").collect()
    )
    exp = sorted(
        (r["entity"], r["attr"])
        for r in t.select(ent.alias("entity")).join(dim, "entity").collect()
    )
    assert got == exp and got
