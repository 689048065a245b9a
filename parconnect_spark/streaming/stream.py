"""Structured Streaming ingestion: transcripts arriving as files/stream →
incremental edge updates + windowed turn metrics.

The reference is strictly batch (SURVEY.md §2.8); this is the engine's
Spark-native extension for continuous transcript ingestion at production
scale. Three operators:

* ``stream_transcripts`` — file-source readStream with the fixed input
  schema (BASELINE.json input_hint).
* ``membership_edge_stream`` — stateless per-row derivation of the E2
  conversation-membership edges (operators/derive.py semantics) — safe for
  append-mode sinks.
* ``sequential_edge_stream`` — the E1 consecutive-turn edges need the
  previous turn's entity per conversation: a custom stateful operator via
  ``applyInPandasWithState`` keyed by conv_id (state = last turn seen).
  Assumes per-conversation in-order arrival (ts monotone within conv_id —
  the transcripts invariant, FIXTURES.md §1).
* ``turn_rate_metrics`` — watermarked sliding-window turn counts per role
  (the streaming telemetry feed).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_EDGE_OUT = T.StructType(
    [
        T.StructField("a", T.StringType(), False),
        T.StructField("b", T.StringType(), False),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("last_turn_idx", T.IntegerType(), True),
        T.StructField("last_entity", T.StringType(), True),
    ]
)


def stream_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(TRANSCRIPT_SCHEMA).load(path)


def _entity_col() -> F.Column:
    return F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("t:"), F.col("tool"))
    ).otherwise(F.concat(F.lit("r:"), F.col("role")))


def membership_edge_stream(transcripts: DataFrame) -> DataFrame:
    """Stateless E2 edges: c:<conv> — entity(turn), canonical (a<b)."""
    e = transcripts.select(
        F.concat(F.lit("c:"), F.col("conv_id")).alias("x"),
        _entity_col().alias("y"),
    )
    return e.select(
        F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
    ).where(F.col("a") != F.col("b"))


def _seq_edge_fn(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: remembers the last (turn_idx, entity) per conv and
    emits an edge between consecutive entities. Vectorized inside each
    batch; state carries only the boundary row."""
    import numpy as np

    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values("turn_idx")
    tool = rows["tool"]
    ent = pd.Series(
        np.where(
            tool.notna().to_numpy(),
            "t:" + tool.astype(str).to_numpy(dtype=object),
            "r:" + rows["role"].astype(str).to_numpy(dtype=object),
        ),
        index=rows.index,
    )
    prev_idx, prev_ent = (
        state.get if state.exists else (None, None)
    )
    a_side = ([prev_ent] if prev_ent is not None else []) + ent.iloc[:-1].tolist()
    b_side = ent.tolist() if prev_ent is not None else ent.iloc[1:].tolist()
    out = pd.DataFrame({"x": a_side, "y": b_side})
    out = out[out["x"] != out["y"]]
    state.update((int(rows["turn_idx"].iloc[-1]), str(ent.iloc[-1])))
    if len(out):
        x = out["x"].to_numpy(dtype=object)
        y = out["y"].to_numpy(dtype=object)
        yield pd.DataFrame({"a": np.minimum(x, y), "b": np.maximum(x, y)})


def sequential_edge_stream(transcripts: DataFrame) -> DataFrame:
    """Stateful E1 edges via applyInPandasWithState keyed by conv_id."""
    return (
        transcripts.groupBy("conv_id")
        .applyInPandasWithState(
            _seq_edge_fn,
            outputStructType=_EDGE_OUT,
            stateStructType=_STATE,
            outputMode="append",
            # NoTimeout: per-conv state lives for the query's lifetime. A
            # production deployment with unbounded conv churn would use
            # ProcessingTimeTimeout + state.setTimeoutDuration to evict idle
            # conversations — with a timeout pending, Spark keeps firing
            # state-cleanup triggers, which also blocks the synchronous
            # processAllAvailable() pattern tests rely on.
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def seq_join_edge_stream(
    left: DataFrame,
    right: DataFrame,
    max_gap: str = "90 days",
) -> DataFrame:
    """E1 consecutive-turn transitions via a STREAM-STREAM event-time
    interval self-join — the fifth stream≡batch shape (after stateless
    derivation, keyed aggregation, custom session state, and event-time
    windows): state on BOTH join sides, bounded by the watermark + the
    time-interval condition.

    ``left``/``right`` are two independent readStream handles over the
    SAME transcript directory (Spark requires distinct source nodes for a
    self-join). Turn i joins turn i+1 of its conversation when the
    successor arrives within ``max_gap`` of it — the interval bound is
    what lets Spark evict join state instead of holding every turn
    forever, so ``max_gap`` is the deployment's staleness SLA (here
    defaulted far above the fixtures' measured ~4-day max gap; a match
    missed because it exceeds the SLA is the operator's declared
    semantics, same contract as any watermark). Emits one (a, b) entity
    row per transition, self-transitions included (this is the Markov
    transition feed, not the deduplicated edge table); inner-join output
    is a set, so end-of-stream content equals the batch LEAD() derivation
    regardless of micro-batch boundaries."""
    a = left.withWatermark("ts", max_gap).select(
        F.col("conv_id").alias("a_conv"),
        F.col("turn_idx").alias("a_idx"),
        _entity_col().alias("a_ent"),
        F.col("ts").alias("a_ts"),
    )
    b = right.withWatermark("ts", max_gap).select(
        F.col("conv_id").alias("b_conv"),
        F.col("turn_idx").alias("b_idx"),
        _entity_col().alias("b_ent"),
        F.col("ts").alias("b_ts"),
    )
    cond = (
        (F.col("a_conv") == F.col("b_conv"))
        & (F.col("b_idx") == F.col("a_idx") + 1)
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return a.join(b, cond, "inner").select(
        F.col("a_ent").alias("a"), F.col("b_ent").alias("b")
    )


def turn_rate_metrics(
    transcripts: DataFrame, window: str = "5 minutes", slide: str = "1 minute"
) -> DataFrame:
    """Watermarked sliding-window turn counts per role."""
    return (
        transcripts.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window, slide), "role")
        .agg(F.count(F.lit(1)).alias("turns"))
    )


def entity_turn_counts_stream(transcripts: DataFrame) -> DataFrame:
    """Incremental per-entity turn counts over the transcript stream —
    a STATEFUL streaming aggregation (Spark's state store carries the
    running counts across micro-batches; run with outputMode complete or
    update). Entity semantics match operators/derive.turn_entity, so at
    end-of-stream the counts equal the batch GROUP BY — the stream≡batch
    contract the driver hash-checks via the ``streaming_degrees`` query."""
    return (
        transcripts.select(_entity_col().alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("turns"))
    )


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

_SESS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_idx", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("first_event", T.LongType(), False),
        T.StructField("last_event", T.LongType(), False),
        T.StructField("duration_sec", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

_SESS_STATE = T.StructType(
    [
        T.StructField("session_idx", T.LongType(), True),
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("first_event", T.LongType(), True),
        T.StructField("last_event", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)


def stream_events(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(EVENT_SCHEMA).load(path)


def session_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """STREAMING gap sessionization — the canonical custom stateful
    operator (applyInPandasWithState keyed by user_id): state carries the
    open session's running aggregates; each micro-batch extends or closes
    it under the same ``delta >= gap`` rule as the batch operator
    (operators/events.sessionize), on the same exact integer-microsecond
    arithmetic.

    Emission contract: every session TOUCHED by a micro-batch is emitted
    with its stats as of that batch's end. A session touched again later
    re-emits with strictly larger ``n_events``, so the final per-session
    row — the one that equals the batch ``session_rollup`` exactly — is
    ``max_by(stats, n_events)`` per (user_id, session_idx) at read-back
    (every stat is frozen once the session stops being touched; n_events
    strictly increases per touch, so the argmax is unique). Assumes
    per-user in-order arrival ACROSS micro-batches (within a batch the
    kernel sorts), the same invariant as sequential_edge_stream.
    """
    gap_us = int(gap_seconds) * 1_000_000

    def _fn(key, pdfs, state: GroupState):
        import numpy as np

        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        ev = rows["event_id"].to_numpy()
        val = rows["value"].to_numpy(dtype="float64")
        if state.exists:
            (p_idx, p_start, p_last, p_n, p_first, p_last_ev, p_sum) = state.get
        else:
            p_idx = p_start = p_last = p_n = p_first = p_last_ev = None
            p_sum = None
        prev = np.empty(len(us), dtype="int64")
        prev[1:] = us[:-1]
        if p_last is None:
            new = np.empty(len(us), dtype=bool)
            new[0] = True
            new[1:] = (us[1:] - prev[1:]) >= gap_us
        else:
            prev[0] = p_last
            new = (us - prev) >= gap_us
        base = -1 if p_idx is None else int(p_idx)
        sidx = base + np.cumsum(new.astype("int64"))
        out = []
        for s in np.unique(sidx):
            m = sidx == s
            n = int(m.sum())
            first_ev, last_ev = int(ev[m].min()), int(ev[m].max())
            s_start, s_last = int(us[m].min()), int(us[m].max())
            s_sum = float(val[m].sum())
            if p_idx is not None and s == base and not new[0]:
                # batch extends the carried-over open session
                n += int(p_n)
                first_ev = min(first_ev, int(p_first))
                last_ev = max(last_ev, int(p_last_ev))
                s_start = int(p_start)
                s_sum += float(p_sum)
            out.append(
                (
                    int(key[0]), int(s), n, first_ev, last_ev,
                    (s_last - s_start) // 1_000_000, s_sum,
                )
            )
        last = out[-1]
        state.update(
            (last[1], int(us[sidx == last[1]].min())
             if not (p_idx is not None and last[1] == base and not new[0])
             else int(p_start),
             int(us.max()), last[2], last[3], last[4], last[6])
        )
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_idx", "n_events", "first_event",
                "last_event", "duration_sec", "sum_value",
            ],
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=_SESS_OUT,
            stateStructType=_SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def term_counts_stream(
    transcripts: DataFrame, bucket: str = "1 day", watermark: str = "1 day"
) -> DataFrame:
    """EVENT-TIME tumbling-window aggregation over the token stream: per
    (day-window, term) exact counts — the streaming substrate under
    trending_terms/term_bursts (their per-(bucket, term) pre-aggregation,
    maintained incrementally by the state store instead of recomputed per
    batch). With the UTC session timezone (session.py pins it) a
    ``1 day`` tumbling window aligns exactly to the batch side's
    ``epoch_us div 86400e6`` integer buckets, so end-of-stream output ≡
    the batch GROUP BY — the third stream≡batch contract shape
    (derivation: streaming_edges; keyed aggregation: streaming_degrees;
    event-time windows: this).

    Returns streaming DataFrame[bucket_us: long, term, cnt: long]
    (bucket_us = window start in unix µs). The watermark bounds window
    state in append-mode deployments; the contract query reads the
    complete-mode memory sink, where it is inert but still declared —
    production would run append mode with exactly this plan.
    """
    toks = transcripts.withWatermark("ts", watermark).select(
        "ts",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term"),
    )
    return (
        toks.groupBy(F.window("ts", bucket), "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_micros(F.col("window.start")).alias("bucket_us"),
            "term",
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def dedup_stream(
    transcripts: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark: str = "1 day",
) -> DataFrame:
    """Stateful streaming deduplication — the sixth stream≡batch shape:
    at-least-once upstream delivery (replayed files, retried producers)
    made exactly-once by keyed state. ``dropDuplicates`` keeps one state
    entry per key and emits only the FIRST arrival; the event-time
    watermark bounds that state — a duplicate arriving later than
    ``watermark`` after its original may be re-emitted, which is the
    declared trade (the alternative is unbounded state; same contract as
    any watermark). Duplicates from replayed batches carry the original
    event time, so they always fall inside the window and the
    end-of-stream row SET equals the batch ``dropDuplicates`` of the
    unioned input."""
    return transcripts.withWatermark("ts", watermark).dropDuplicates(
        list(keys)
    )


def enriched_edge_stream(
    transcripts: DataFrame, entity_dim: DataFrame
) -> DataFrame:
    """Stream-STATIC enrichment join — the seventh stream≡batch shape:
    the streaming turn feed joins a static dimension (here: an entity
    attribute table) with NO state at all — Spark re-plans the static
    side per micro-batch, so the join is stateless and append-pure. The
    canonical lookup-table pattern (user dims, tool registries,
    blocklists) on the streaming path. Emits (entity, attr) rows, one
    per matching turn; inner-join output is a set, so end-of-stream
    content equals the batch join."""
    turns = transcripts.select(_entity_col().alias("entity"))
    return turns.join(F.broadcast(entity_dim), "entity")
