"""JSON-lines transcript ingestion with corrupt-record accounting.

The messy half of S1's file-ingestion story (SURVEY.md §2.1: the
reference's text reader realigns split boundaries and skips malformed
lines, `src/graphGen/fileIO/graphReader.hpp:50-96`): real 100-TB feeds
arrive as JSONL with schema drift and garbage interleaved, and the
ingest layer must (a) never abort on a bad line, (b) never silently
swallow one either. PERMISSIVE mode parks every unparseable line in a
corrupt-record column; the reader returns clean rows and the audit
count, so the pipeline can alert on corruption rate instead of
discovering it downstream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
_CORRUPT = "_corrupt_record"


def read_transcripts_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, corrupt): clean = fully-parsed transcript rows in
    the canonical column order; corrupt = the raw offending lines (one
    string column) for quarantine/alerting. A row is corrupt when JSON
    parsing failed OR the required keys (conv_id, turn_idx, ts) are
    absent — partial schema drift on optional columns (role/text/tool)
    stays clean with NULLs, the additive-evolution stance of
    read_table_evolved."""
    schema = StructType.fromDDL(TRANSCRIPT_DDL).add(_CORRUPT, "string")
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    bad = (
        F.col(_CORRUPT).isNotNull()
        | F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
        | F.col("ts").isNull()
    )
    clean = raw.where(~bad).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    corrupt = raw.where(bad).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct("*"))).alias("line")
    )
    return clean, corrupt
