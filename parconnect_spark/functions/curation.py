"""End-to-end corpus-curation funnel — the composition layer over the
dedup/quality/blocklist operators (SURVEY.md §2.11 scope; no reference
analogue).

A training-data pipeline is not a bag of operators but a staged funnel:
quality gate → exact dedup → near-dup canonicalization → blocklist. This
module wires the package's own primitives into that shape and reports the
per-stage survivor counts — the number every curation run is judged by
("we started with X docs and shipped Y").

Scale shape: each stage's survivor set is scoped-persisted and feeds the
next, so the corpus is scanned once per stage (not once per count), the
near-dup stage inherits the candidate bounding of the pair generator it
composes, and the blocklist stage inherits the Bloom prefilter's
no-shuffle fast path for clean rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.cache import scoped_persist
from parconnect_spark.functions.dedup import (
    bloom_blocklist_filter,
    near_dup_clusters,
    ngram_jaccard_pairs,
)

STAGES = ("input", "quality", "exact_dedup", "near_dedup", "blocklist")


def curation_funnel(
    docs: DataFrame,
    blocklist: DataFrame | None = None,
    min_tokens: int = 20,
    jaccard_threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Runs the four-stage curation funnel and returns
    DataFrame[stage_idx: int, stage: string, n_docs: long] — one row per
    stage (including the input census), counts monotonically
    non-increasing.

    Stages, each over the previous stage's survivors:
      1 input        the raw corpus.
      2 quality      whitespace-token count >= ``min_tokens`` (the
                     functions/text.py tokenization, so the gate matches
                     quality_features' n_tokens exactly).
      3 exact_dedup  one doc per full-text fingerprint (md5 of the
                     lower-cased whitespace-collapsed text), keeping the
                     minimum id — exact_dup_groups' fingerprint.
      4 near_dedup   n-gram Jaccard pairs at ``jaccard_threshold``
                     (df-capped candidates) transitively closed by the CC
                     engine; one canonical doc (min id) per cluster.
      5 blocklist    drop survivors whose fingerprint is on ``blocklist``
                     (DataFrame[fp]) via the Bloom-prefiltered exact
                     anti-join; skipped (count repeats) when ``None``.
    """
    spark = docs.sparkSession
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    n_input = d.count()

    toks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    )
    quality = scoped_persist(d.where(toks >= min_tokens))
    n_quality = quality.count()

    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    fps = quality.withColumn("fp", F.md5(norm))
    keep = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    exact = scoped_persist(
        fps.join(keep, ["fp", "doc_id"], "left_semi").drop("fp")
    )
    n_exact = exact.count()

    pairs = ngram_jaccard_pairs(
        exact, threshold=jaccard_threshold, max_shingle_df=max_shingle_df
    )
    canon = near_dup_clusters(exact, pairs)
    near = scoped_persist(
        exact.join(
            canon.where(F.col("doc_id") == F.col("canonical_id")).select(
                "doc_id"
            ),
            "doc_id",
            "left_semi",
        )
    )
    n_near = near.count()

    if blocklist is not None:
        n_final = bloom_blocklist_filter(near, blocklist).count()
    else:
        n_final = n_near

    return spark.createDataFrame(
        [
            (i + 1, name, n)
            for i, (name, n) in enumerate(
                zip(STAGES, [n_input, n_quality, n_exact, n_near, n_final])
            )
        ],
        "stage_idx int, stage string, n_docs long",
    )
