"""Text/binary edge-list IO — the reference's file sources/sinks.

* Reader (S1): parconnect splits the file into per-rank byte ranges and
  hand-realigns to record boundaries
  (/root/reference/src/graphGen/fileIO/graphReader.hpp:50-254, 258 LoC).
  Spark's FileScan does split + boundary alignment natively, so the whole
  reader is a CSV scan with a comment char.

* Text sink (S5): gather-to-rank-0 sequential write
  (/root/reference/src/utils/commonfuncs.hpp:166-184) → coalesce(1) csv.

* Binary sink (S6): per-rank raw u64 pairs with src<dst dedup
  (/root/reference/src/graphGen/common/binaryEdgeListExport.hpp:48-70) →
  parquet (the idiomatic columnar binary form), same src<dst filter.

* DOT sink (S7): /root/reference/src/graphGen/common/dotExport.hpp:47-73.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)


def read_edgelist_text(
    spark: SparkSession,
    path: str,
    add_reverse_edges: bool = True,
    comment: str = "%",
    sep: str = " ",
) -> DataFrame:
    """Parse "u v" lines (with %-comment header lines) into DataFrame[src, dst]."""
    df = (
        spark.read.schema(EDGE_SCHEMA)
        .options(sep=sep, comment=comment, mode="DROPMALFORMED")
        .csv(path)
    )
    if add_reverse_edges:
        df = df.unionByName(
            df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return df


def write_edgelist_text(edges: DataFrame, path: str, single_file: bool = True) -> None:
    out = edges.select(
        F.concat_ws(" ", F.col("src").cast("string"), F.col("dst").cast("string")).alias(
            "value"
        )
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def write_edgelist_binary(edges: DataFrame, path: str) -> None:
    """Each undirected edge once (src<dst), columnar binary (parquet)."""
    edges.where(F.col("src") < F.col("dst")).write.mode("overwrite").parquet(path)


def write_dot(edges: DataFrame, path: str, graph_name: str = "G") -> None:
    body = edges.where(F.col("src") < F.col("dst")).select(
        F.concat(
            F.lit("  "),
            F.col("src").cast("string"),
            F.lit(" -- "),
            F.col("dst").cast("string"),
            F.lit(";"),
        ).alias("value")
    )
    spark = edges.sparkSession
    header = spark.createDataFrame([(f"graph {graph_name} {{",)], "value string")
    footer = spark.createDataFrame([("}",)], "value string")
    header.unionByName(body.coalesce(1)).unionByName(footer).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
