"""Graph generators — ports of the reference's test-graph sources.

* ``chain_edges`` — the undirected chain generator
  (/root/reference/src/graphGen/undirectedChain/undirectedChainGen.hpp:56-90):
  per-rank block emission + boundary edge collapses to one ``spark.range``.

* ``kronecker_edges`` — Graph500 RMAT
  (/root/reference/src/graphGen/graph500/graph500Gen.hpp:68-110: scale S,
  edgefactor 16, initiator {.57,.19,.19,.05}, fixed seeds, both directions
  emitted, self-loops dropped). Re-created as a *counter-based* vectorized
  kernel: every (edge i, level l) random draw is splitmix64(seed, i, l)
  mapped to [0,1) — no RNG state, so output is bit-identical at any
  partitioning/parallelism (the portability the reference gets from its
  deterministic generator). numpy inside ``mapInPandas`` — Arrow batches,
  no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def chain_edges(spark: SparkSession, n: int, both_directions: bool = True) -> DataFrame:
    """Path graph 0–1–…–(n-1) as an edge table."""
    fwd = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    if not both_directions:
        return fwd
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 finalizer, vectorized on uint64."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform01(counter: np.ndarray) -> np.ndarray:
    return _splitmix64(counter).astype(np.float64) / float(2**64)


def kronecker_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = 16,
    seed: int = 12,  # stands in for the reference's fixed seed pair {1,2}
    initiator: tuple[float, float, float, float] = (0.57, 0.19, 0.19, 0.05),
    both_directions: bool = True,
    drop_self_loops: bool = True,
) -> DataFrame:
    """RMAT edge table: 2^scale vertices, edgefactor·2^scale sampled edges."""
    n_edges = edgefactor * (1 << scale)
    a, b, c, _ = initiator
    ab = a + b
    abc = a + b + c

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            src = np.zeros(len(ids), dtype=np.uint64)
            dst = np.zeros(len(ids), dtype=np.uint64)
            for level in range(scale):
                ctr = (
                    ids * np.uint64(1_000_003)
                    + np.uint64(level * 2_147_483_647)
                    + np.uint64(seed)
                )
                u = _uniform01(ctr)
                bit_src = (u >= ab).astype(np.uint64)
                bit_dst = (
                    ((u >= a) & (u < ab)) | (u >= abc)
                ).astype(np.uint64)
                src = (src << np.uint64(1)) | bit_src
                dst = (dst << np.uint64(1)) | bit_dst
            yield pd.DataFrame(
                {"src": src.astype(np.int64), "dst": dst.astype(np.int64)}
            )

    edges = spark.range(n_edges).mapInPandas(gen, schema="src long, dst long")
    if drop_self_loops:
        edges = edges.where(F.col("src") != F.col("dst"))
    if both_directions:
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return edges


def powerlaw_star_edge_list(
    n_hubs: int = 500,
    alpha: float = 2.3,
    smax: int = 400,
    giant_hubs: int = 40,
    seed: int = 77,
) -> list[tuple[int, int]]:
    """Deterministic scale-free test graph for the hybrid pipeline: a star
    forest whose hub sizes follow a discrete power law (inverse-CDF over
    counter-based splitmix64 draws — no RNG state, bit-stable forever), with
    the first ``giant_hubs`` hubs chained into one component containing
    vertex 0.

    Purpose-built so the reference's runBFSDecision fires
    (benchmark_parconnect_auto.cpp:194-210: CSN-MLE KS fit < 0.05 — measured
    0.034 at these defaults): the BFS sweep peels vertex 0's chained giant
    component and label-propagation coloring gets the remaining stars, i.e.
    BOTH stages of the shipped binary's hybrid path do real work. Pure
    Python on purpose: the DuckDB oracle embeds exactly these edges as
    literals (like the graph500 oracle), so the driver compares the full
    pipeline against min-reach ground truth on byte-identical input.

    Returns undirected edges once (a < b by construction)."""
    sizes = np.arange(1, smax + 1, dtype=float)
    p = sizes ** -alpha
    p /= p.sum()
    cdf = np.cumsum(p)
    ctr = np.uint64(seed) * np.uint64(0x100000001) + np.arange(
        n_hubs, dtype=np.uint64
    )
    u = _splitmix64(ctr).astype(np.float64) / float(2 ** 64)
    hub_sizes = (np.searchsorted(cdf, u) + 1).tolist()
    edges: list[tuple[int, int]] = []
    hub_ids: list[int] = []
    nxt = 0
    for sz in hub_sizes:
        hub = nxt
        hub_ids.append(hub)
        nxt += 1
        for _ in range(sz):
            edges.append((hub, nxt))
            nxt += 1
    for a, b in zip(hub_ids[: giant_hubs - 1], hub_ids[1:giant_hubs]):
        edges.append((a, b))
    return edges


def powerlaw_star_edges(
    spark: SparkSession,
    n_hubs: int = 500,
    alpha: float = 2.3,
    smax: int = 400,
    giant_hubs: int = 40,
    seed: int = 77,
    both_directions: bool = True,
) -> DataFrame:
    """``powerlaw_star_edge_list`` as a symmetric edge DataFrame."""
    und = powerlaw_star_edge_list(n_hubs, alpha, smax, giant_hubs, seed)
    rows = und + [(b, a) for a, b in und] if both_directions else und
    return spark.createDataFrame(rows, "src long, dst long")
