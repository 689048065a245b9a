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
