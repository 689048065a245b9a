"""Explicit skew handling: degree-based hub edge splitting + salted
two-phase aggregation (BASELINE.json: "Skew from hub conversations is
handled explicitly via degree-based edge splitting and two-phase
aggregation").

The reference's anti-skew story is the bijective id permutation + block
re-decomposition (reduceIds.hpp:104-114, labelProp.hpp:337-343) — that
randomizes *placement* but cannot split one hot KEY. These operators do:

* ``hot_keys`` — the degree census: keys whose row count exceeds a
  threshold (hub conversations / hot tools / celebrity vertices).
* ``salt_hot_edges`` — degree-based edge splitting: rows of hot keys get a
  salt in [0, buckets); cold keys salt 0. A downstream groupBy(key, salt)
  spreads each hub across ``buckets`` reducers.
* ``two_phase_agg`` — the exact rewrite for algebraic aggregates:
  groupBy(key, salt) partial → groupBy(key) final. Exact for sum/count/
  min/max (used by PageRank's contribution sum, triangle per-vertex counts,
  degree histograms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys with more than ``threshold`` rows: DataFrame[<key>]."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > threshold)
        .select(key)
    )


def salt_hot_edges(
    df: DataFrame, key: str, threshold: int, buckets: int, salt_col: str = "_salt"
) -> DataFrame:
    """Degree-based split: add ``salt_col`` ∈ [0, buckets) for rows whose
    ``key`` is hot, 0 otherwise. The hot-key set is broadcast (it is tiny by
    construction — only keys above the degree threshold)."""
    hot = hot_keys(df, key, threshold).withColumn("_is_hot", F.lit(True))
    joined = df.join(F.broadcast(hot), key, "left")
    salted = joined.withColumn(
        salt_col,
        F.when(
            F.col("_is_hot").isNotNull(),
            F.pmod(F.xxhash64(*df.columns), F.lit(buckets)),
        ).otherwise(F.lit(0)),
    )
    return salted.drop("_is_hot")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    agg: str = "sum",
    salt_col: str = "_salt",
    out_col: str | None = None,
) -> DataFrame:
    """Exact salted aggregation: partial per (key, salt), final per key.
    ``agg`` ∈ {sum, count, min, max} (algebraic — the rewrite is exact)."""
    out_col = out_col or f"{agg}_{agg_col}"
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    if agg not in fns:
        raise ValueError(f"non-algebraic agg {agg!r}")
    partial = df.groupBy(key, salt_col).agg(fns[agg](agg_col).alias("_p"))
    return partial.groupBy(key).agg(refold[agg]("_p").alias(out_col))
