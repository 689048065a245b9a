from parconnect_spark.plans.connectivity import (
    connected_components,
    component_count,
    largest_component_size,
    CCResult,
)
from parconnect_spark.plans.pagerank import pagerank
from parconnect_spark.plans.labelprop import label_propagation, modularity, conductance
from parconnect_spark.plans.triangles import (
    enumerate_triangles,
    triangle_count,
    triangles_per_vertex,
    transitivity,
)
from parconnect_spark.plans.bfs import (
    bfs,
    bfs_peel,
    multi_source_bfs,
    harmonic_centrality,
    closeness_centrality,
    landmark_distance_table,
    estimate_distance,
)
from parconnect_spark.plans.betweenness import betweenness_centrality
from parconnect_spark.plans.sssp import sssp
from parconnect_spark.plans.densest import densest_subgraph
from parconnect_spark.plans.decision import should_run_bfs, powerlaw_ks_distance
from parconnect_spark.plans.eigen import eigencentrality
from parconnect_spark.plans.temporal import earliest_arrival
from parconnect_spark.plans.hits import hits
from parconnect_spark.plans.katz import katz
from parconnect_spark.plans.kcore import kcore, coreness
from parconnect_spark.plans.linkpred import link_prediction
from parconnect_spark.plans.walks import random_walks, walk_skipgram_pairs
from parconnect_spark.plans.msf import boruvka_msf
from parconnect_spark.plans.matching import maximal_matching
from parconnect_spark.plans.louvain import louvain_move
from parconnect_spark.plans.mis import luby_mis
from parconnect_spark.plans.coloring import jones_plassmann_coloring
from parconnect_spark.plans.wl import wl_refinement
from parconnect_spark.plans.dag import dag_layers
from parconnect_spark.plans.scc import strongly_connected_components
from parconnect_spark.plans.anf import (
    neighborhood_registers,
    anf_estimates,
    neighborhood_function,
)

__all__ = [
    "connected_components",
    "component_count",
    "largest_component_size",
    "CCResult",
    "pagerank",
    "label_propagation",
    "modularity",
    "conductance",
    "triangle_count",
    "triangles_per_vertex",
    "transitivity",
    "enumerate_triangles",
    "bfs",
    "bfs_peel",
    "multi_source_bfs",
    "harmonic_centrality",
    "closeness_centrality",
    "betweenness_centrality",
    "sssp",
    "densest_subgraph",
    "should_run_bfs",
    "powerlaw_ks_distance",
    "eigencentrality",
    "earliest_arrival",
    "landmark_distance_table",
    "estimate_distance",
    "walk_skipgram_pairs",
    "hits",
    "katz",
    "kcore",
    "coreness",
    "link_prediction",
    "random_walks",
    "boruvka_msf",
    "maximal_matching",
    "louvain_move",
    "luby_mis",
    "jones_plassmann_coloring",
    "wl_refinement",
    "dag_layers",
    "strongly_connected_components",
    "neighborhood_registers",
    "anf_estimates",
    "neighborhood_function",
]
