from parconnect_spark.operators.graph import (
    symmetrize,
    project_bipartite,
    count_butterflies,
    reciprocity,
    canonicalize,
    degrees,
    degree_histogram,
    vertices,
    filter_visited_edges,
    check_bidirectional,
)
from parconnect_spark.operators.relabel import dense_rank_relabel, relabel_edges
from parconnect_spark.operators.derive import (
    transcripts_to_entity_turns,
    derive_edges,
    derive_directed_string_edges,
    derive_weighted_undirected_edges,
    verify_text_invariant,
)
from parconnect_spark.operators.events import (
    sessionize,
    session_rollup,
    asof_join,
    hopping_rollup,
    funnel,
    retention_cohorts,
)

__all__ = [
    "symmetrize",
    "project_bipartite",
    "count_butterflies",
    "reciprocity",
    "canonicalize",
    "degrees",
    "degree_histogram",
    "vertices",
    "filter_visited_edges",
    "check_bidirectional",
    "dense_rank_relabel",
    "relabel_edges",
    "transcripts_to_entity_turns",
    "derive_edges",
    "derive_directed_string_edges",
    "derive_weighted_undirected_edges",
    "verify_text_invariant",
    "sessionize",
    "session_rollup",
    "asof_join",
    "hopping_rollup",
    "funnel",
    "retention_cohorts",
]
