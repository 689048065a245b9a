"""Bucketed-table layout — shuffle-free co-located joins.

The 100-TB join story the prompt-level docs promise (SURVEY.md §2.3): a
fact table and a dimension repeatedly joined on the same key should not
re-exchange |E| rows per query. Hive-style bucketing persists the hash
partitioning INTO the table layout: both sides written with the same
bucket count and key join bucket-to-bucket with zero Exchange in the
plan — the Spark-native analogue of the reference pre-bucketing its
tuple table by vertex block before each merge pass
(/root/reference/src/coloring/labelProp.hpp:103 block distribution).

Tables are written as EXTERNAL parquet (explicit ``path``) so callers
control placement; only bucketing metadata lives in the session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as a bucketed (and sorted-within-bucket) parquet
    table and return the re-read handle. ``sort_col`` defaults to the
    bucket column — sorted buckets upgrade the co-located join from
    hash to merge without a per-query Sort.

    Bucket count is the co-location contract: two tables join
    shuffle-free iff written with the SAME ``n_buckets`` on the join
    key. Pick it once per subject area (like the reference fixes its
    processor-grid shape per run) and size it so one bucket of the
    BIGGEST table fits an executor: n_buckets ≈ table_bytes / 1 GB."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return df.sparkSession.table(name)


def is_shuffle_free(joined: DataFrame) -> bool:
    """True when the physical plan for ``joined`` contains no shuffle
    Exchange — the observable proof that a bucketed join co-located
    (AQE is transparent here: the check reads the executed plan's
    initial physical form)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: str | list[str]
) -> DataFrame:
    """Join two catalog tables (written via :func:`write_bucketed` with
    matching bucket counts) on their bucket key. Purely a readability
    wrapper — the co-location comes from the table layout, not from this
    call; the same ``spark.table(a).join(spark.table(b), on)`` composed
    by hand gets the identical plan."""
    return spark.table(left).join(spark.table(right), on)
