"""parconnect_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-creates the semantics of ParBLiSS/parconnect (connected components of huge
undirected graphs via hybrid BFS + label-propagation pointer jumping,
/root/reference/src/coloring/labelProp.hpp, /root/reference/src/bfs/bfsRunner.hpp)
as idiomatic Spark DataFrame dataflow, extended with PageRank, synchronous label
propagation and triangle counting over an edge table derived from multi-turn
transcripts (BASELINE.json north_rule).

Layout:
    sources/    transcripts synthesis + edge-list readers/writers/generators
    operators/  edge derivation, dense-rank relabel, symmetrize, degrees
    plans/      iterative algorithms (CC, BFS, PageRank, LP, triangles, decision)
    functions/  vectorized kernels (invertible hash, text, dedup, similarity)
    streaming/  superstep checkpoint/resume + metrics lineage
"""

from parconnect_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
