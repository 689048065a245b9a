"""Training-sequence packing: concatenate-then-chunk a document corpus
into fixed-capacity token sequences.

The last step of an LLM training-data pipeline: after dedup / quality
trim / sampling, the surviving documents are concatenated in a stable
order (each followed by ``sep_tokens`` separator tokens, e.g. one EOS)
into one global token stream, and the stream is chunked every
``seq_len`` tokens. This operator computes, for every document, exactly
where it lands: its global start offset, the first and last sequence it
touches, and its offset inside the first one — the map a downstream
tokenizer shard needs to emit its slice of the packed corpus without
seeing any other shard.

Scale shape (the reduceVertexIds exscan discipline, operators/relabel.py
— reference parity: parconnect's reduceVertexIds sort+exscan relabel,
/root/reference/src/graphGen/common/reduceIds.hpp): ONE range shuffle on
the order key, a per-partition window cumsum in parallel, and a
broadcast exclusive prefix sum of per-partition token totals (one row
per partition — thousands of rows at 10^12 docs, never data-sized). No
single-partition window anywhere, so the plan survives a corpus whose
token stream is 10^14 long. All arithmetic is int64 (offsets reach
2^63-1, i.e. 9e18 tokens, before overflow); sequence ids come from
integer ``div`` so two engines can never disagree on a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_exscan(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "offset",
) -> DataFrame:
    """Exact exclusive prefix sum of ``value_col`` under a total order —
    WITHOUT a single-partition window (the thing that serializes at
    10^12 rows). The cumsum sibling of
    functions/sampling.global_row_number: range-partition on the order
    columns, cumsum within each partition in parallel, add the broadcast
    exclusive prefix sum of per-partition totals. ``order_cols`` must be
    a total order (append a unique id to break ties) or the result is
    nondeterministic."""
    parted = df.repartitionByRange(
        *[F.col(c) for c in order_cols]
    ).withColumn("_pid", F.spark_partition_id())
    in_part = parted.withColumn(
        out_col,
        F.coalesce(
            F.sum(value_col).over(
                Window.partitionBy("_pid")
                .orderBy(*order_cols)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    # per-partition totals: one row per partition — the broadcast side.
    # The window below orders #partitions rows, not data rows.
    sizes = in_part.groupBy("_pid").agg(
        F.sum(value_col).cast("long").alias("_n")
    )
    offsets = sizes.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).cast("long"),
    ).select("_pid", "_off")
    return (
        in_part.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col(out_col) + F.col("_off"))
        .drop("_pid", "_off")
    )


def sequence_pack(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tok_col: str = "n_tokens",
    sep_tokens: int = 1,
) -> DataFrame:
    """Per-document packing map for concatenate-then-chunk sequence
    packing: documents are laid out in ``id_col`` order, each occupying
    ``n_tokens + sep_tokens`` positions of the global stream, and the
    stream is chunked every ``seq_len`` tokens.

    Returns one row per document with:

    * ``start_tok`` — the document's global token offset (exscan),
    * ``seq_first`` / ``seq_last`` — ids of the first and last chunk the
      document (incl. its separator) touches,
    * ``n_seqs`` — how many chunks it spans (1 = no boundary crossing),
    * ``head_offset`` — position inside ``seq_first`` where it starts.

    ``sep_tokens`` must be ≥ 1 (every document occupies at least its
    separator, so ``seq_last`` is well-defined even for empty texts).
    Membership and boundaries are pure int64 ``div``/``%`` — no doubles.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if sep_tokens < 1:
        raise ValueError(f"sep_tokens must be >= 1, got {sep_tokens}")
    eff = docs.withColumn(
        "_eff", (F.col(tok_col) + F.lit(sep_tokens)).cast("long")
    )
    cum = global_exscan(eff, [id_col], "_eff", out_col="start_tok")
    return (
        cum.select(
            id_col,
            F.col(tok_col).cast("long").alias(tok_col),
            "start_tok",
            F.expr(f"start_tok div {seq_len}").alias("seq_first"),
            F.expr(f"(start_tok + _eff - 1) div {seq_len}").alias(
                "seq_last"
            ),
            (F.col("start_tok") % seq_len).alias("head_offset"),
        )
        .withColumn(
            "n_seqs", F.col("seq_last") - F.col("seq_first") + F.lit(1)
        )
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """One-row summary of a packing map: total docs/tokens/sequences and
    how many documents cross a chunk boundary (the fragmentation a
    best-fit packer would try to reduce). Pure aggregate — no shuffle
    beyond the map-side-combined global agg."""
    return packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.max("seq_last") + F.lit(1)).alias("n_seqs"),
        F.sum((F.col("n_seqs") > 1).cast("long")).alias("n_spanning"),
    )
