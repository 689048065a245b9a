from parconnect_spark.sources.transcripts import synth_transcripts
from parconnect_spark.sources.generators import (
    chain_edges,
    kronecker_edges,
    powerlaw_star_edge_list,
    powerlaw_star_edges,
)
from parconnect_spark.sources.edgelist import (
    read_edgelist_text,
    write_edgelist_text,
    write_edgelist_binary,
    write_dot,
)
from parconnect_spark.sources.bucketed import bucketed_join, is_shuffle_free, write_bucketed
from parconnect_spark.sources.jsonl import read_transcripts_jsonl
from parconnect_spark.sources.tables import PublishBlocked, publish_with_audit, read_table, read_table_evolved, table_stats, write_table

__all__ = [
    "synth_transcripts",
    "write_bucketed",
    "bucketed_join",
    "is_shuffle_free",
    "read_table_evolved",
    "read_transcripts_jsonl",
    "table_stats",
    "publish_with_audit",
    "PublishBlocked",
    "chain_edges",
    "kronecker_edges",
    "powerlaw_star_edge_list",
    "powerlaw_star_edges",
    "read_edgelist_text",
    "write_edgelist_text",
    "write_edgelist_binary",
    "write_dot",
    "read_table",
    "write_table",
]
