"""Table IO with Iceberg-when-available, parquet otherwise (SURVEY.md §2.1 S8).

The Iceberg runtime jars are not in this image; the engine is written against
a format-neutral read/write pair so the same call sites work on a real
cluster with ``--packages org.apache.iceberg:iceberg-spark-runtime...``.
Detection is a one-time probe, not an import of any non-public library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_AVAILABLE: bool | None = None


def iceberg_available(spark: SparkSession) -> bool:
    global _ICEBERG_AVAILABLE
    if _ICEBERG_AVAILABLE is None:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.source.IcebergSource"
            )
            _ICEBERG_AVAILABLE = True
        except Exception:
            _ICEBERG_AVAILABLE = False
    return _ICEBERG_AVAILABLE


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read an engine table: Iceberg table path/identifier if the runtime is
    on the classpath, else a parquet directory."""
    if iceberg_available(spark):
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if iceberg_available(df.sparkSession):
        df.write.format("iceberg").mode(mode).save(path)
    else:
        df.write.mode(mode).parquet(path)


def read_table_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet read: ``mergeSchema=true`` unions
    the footers of every file, so batches written before a column existed
    read back with NULLs in that column instead of failing or silently
    truncating to one batch's schema — the additive-evolution contract a
    long-lived 100-TB table needs (Iceberg does this in metadata; the
    parquet fallback pays one footer pass, which is why it is opt-in here
    and not the read_table default)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def table_stats(df: DataFrame) -> DataFrame:
    """ANALYZE-style per-column statistics in ONE aggregate pass:
    (column, n_nulls, n_distinct, min_repr, max_repr) plus a first row
    ('*', row_count, ...). min/max aggregate on the NATIVE type and only
    the result is stringified (casting first would make numeric ranges
    lexicographic), so one report covers heterogenous column types;
    n_distinct is exact.

    This is the planner-facing operator: broadcast-join gates, bucket
    sizing, and zorder bounds all start from exactly these numbers (the
    zorder_key auto-bounds path IS a two-column slice of this)."""
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in df.columns:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_n_{c}"),
            F.countDistinct(F.col(c)).alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [("*", int(row["_rows"]), None, None, None)]
    for c in df.columns:
        out.append(
            (
                c,
                int(row[f"_n_{c}"]),
                int(row[f"_d_{c}"]),
                row[f"_mn_{c}"],
                row[f"_mx_{c}"],
            )
        )
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_nulls long, n_distinct long, "
        "min_repr string, max_repr string",
    )


class PublishBlocked(RuntimeError):
    """Raised when a write-audit-publish run fails its quality gate; the
    staged data is left in place for inspection."""


def publish_with_audit(
    df: DataFrame,
    path: str,
    checks: list[tuple],
    staging_suffix: str = ".staging",
) -> DataFrame:
    """Write-audit-publish: the pattern that keeps a 100-TB table from
    ever serving un-audited data. The frame is written to
    ``path + staging_suffix``, re-read, audited with operators/dq.
    dq_report over the STAGED files (what readers would actually see —
    auditing the in-memory frame would miss write corruption), and only
    on a fully-green report atomically promoted to ``path`` via a
    filesystem rename (the parquet-directory analogue of Iceberg's WAP
    snapshot cherry-pick; rename is atomic per directory on HDFS-like
    stores — on object stores substitute the catalog pointer swap).

    ``checks``: dq_report entries with the DataFrame slot filled by the
    staged table automatically — pass (table_name, kind, column, *extra).
    Returns the audit report with a ``published`` column; raises
    :class:`PublishBlocked` on any failing check, leaving the staging
    directory for inspection."""
    from py4j.java_gateway import java_import

    from parconnect_spark.operators.dq import dq_report

    spark = df.sparkSession
    staged_path = path + staging_suffix
    df.write.mode("overwrite").parquet(staged_path)
    staged = spark.read.parquet(staged_path)
    report = dq_report(
        [(t, staged, kind, col, *extra) for (t, kind, col, *extra) in checks]
    )
    rows = report.collect()
    ok = all(r["passed"] for r in rows)
    if not ok:
        raise PublishBlocked(
            f"audit failed, staging left at {staged_path}: "
            + ", ".join(
                f"{r['check']}({r['column']})={r['violations']}"
                for r in rows
                if not r["passed"]
            )
        )
    jvm = spark.sparkContext._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    dst = jvm.Path(path)
    fs = dst.getFileSystem(conf)
    if fs.exists(dst):
        fs.delete(dst, True)
    fs.rename(jvm.Path(staged_path), dst)
    from pyspark.sql import functions as F

    return report.withColumn("published", F.lit(True))
