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
