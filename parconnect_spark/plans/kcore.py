"""k-core extraction by iterative peeling (SURVEY.md §2.10 family; absent
from the reference — the classic web-graph decomposition, built on the same
iterate-until-fixpoint substrate as plans/connectivity.py).

The k-core is the maximal subgraph in which every vertex has degree ≥ k.
Synchronous peel: each round drops every vertex whose degree within the
surviving subgraph is < k; the fixpoint is the k-core (order-independent,
so this computes the same set as the textbook sequential peel).

Physical plan — degrees are maintained INCREMENTALLY, not recomputed:
* round 0 pays one full groupBy(src) count over the (symmetric) edge table.
* each subsequent round broadcasts the just-removed vertex set (typically a
  thin fringe) into a single map-side join against the edge table —
  decrements = count of edges landing on a removed dst, grouped by src.
  The |E|-row table is never shuffled again; per-round cost is one scan +
  one small aggregation. This is the delta formulation that survives 100×
  scale-up: the naive alternative (re-semi-joining edges against the
  survivor set on both endpoints) shuffles all of E twice per round.
* when a round removes more vertices than the broadcast gate (possible in
  round 1 when most of the graph is below k), the plan falls back to one
  full recompute — semi-join both endpoints against the survivors + count —
  and returns to the delta path after. Same hybrid discipline as
  connectivity's broadcast-gated join-backs.
* degree-table lineage is cut per round with a lazy localCheckpoint,
  materialized by the next round's removed-count action (the same O(1)
  plan-depth rule the CC loop uses); convergence is "nothing removed".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BROADCAST_MAX_ROWS = 8_000_000


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int | None = None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> tuple[DataFrame, int]:
    """Vertices of the k-core with their within-core degree.

    ``edges``: distinct symmetric (src, dst) long pairs, both directions
    present, no self-loops (the shape derive_edges/symmetrize emit).
    Returns (DataFrame[v: long, core_deg: long], rounds); the DataFrame is
    empty when the k-core is. ``max_rounds`` bounds the peel (None = run
    to fixpoint); hitting the bound raises, mirroring connectivity's
    refusal to return unconverged labels.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    deg = (
        edges.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("core_deg"))
        .localCheckpoint()
    )
    rounds = 0
    while True:
        removed = deg.where(F.col("core_deg") < k).select("v")
        n_removed = removed.count()  # also materializes this round's deg
        if n_removed == 0:
            return deg, max(rounds, 1)
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(
                f"k-core peel did not converge in {max_rounds} rounds"
            )
        if n_removed <= broadcast_max_rows:
            # Delta path: subtract edges that land on a removed endpoint.
            dec = (
                edges.join(
                    F.broadcast(removed.withColumnRenamed("v", "dst")), "dst"
                )
                .groupBy(F.col("src").alias("v"))
                .agg(F.count("*").alias("_dec"))
            )
            deg = (
                deg.join(
                    F.broadcast(removed), "v", "left_anti"
                )
                .join(dec, "v", "left")
                .select(
                    "v",
                    (
                        F.col("core_deg") - F.coalesce("_dec", F.lit(0))
                    ).alias("core_deg"),
                )
            )
        else:
            # Bulk path: one full recompute against the survivor set.
            surv = deg.where(F.col("core_deg") >= k).select("v")
            deg = (
                edges.join(surv.withColumnRenamed("v", "src"), "src", "left_semi")
                .join(surv.withColumnRenamed("v", "dst"), "dst", "left_semi")
                .groupBy(F.col("src").alias("v"))
                .agg(F.count("*").alias("core_deg"))
            )
        deg = deg.localCheckpoint(eager=False)
        rounds += 1


def coreness(
    edges: DataFrame, max_rounds: int = 128
) -> tuple[DataFrame, int]:
    """Full core decomposition: every vertex's core number, via the
    iterated-H-index fixpoint (Lü et al., "The H-index of a network node",
    2016): start from ``c0(v) = degree(v)`` and repeat

        c_{t+1}(v) = H({c_t(u) : u ~ v}),   H(S) = max k: |{s ∈ S: s ≥ k}| ≥ k

    The sequence is monotone non-increasing per vertex and converges to
    coreness; past the fixpoint every round is a no-op — the property the
    DuckDB oracle's fixed unroll relies on.

    Skew-safe H-index, no per-vertex sort of raw neighbor lists: aggregate
    the neighbor values into a per-vertex HISTOGRAM first (groupBy(v, c) —
    map-side combined, so a 10M-degree hub contributes rows bounded by its
    DISTINCT neighbor-value count, which is bounded by max-coreness, not
    degree), then one window over the compressed histogram:
    ``H = max(min(value, cum_count))`` over values descending. The window
    partition for a hub is therefore O(max_coreness) rows, never O(degree)
    — the same two-phase discipline as the CC hub census.

    Returns (DataFrame[v: long, coreness: long], rounds). Convergence =
    zero changed vertices; per-round lazy localCheckpoints keep the plan
    depth O(1). ``edges`` must be distinct symmetric pairs without
    self-loops (the derive_edges/symmetrize shape).
    """
    from pyspark.sql import Window

    cur = (
        edges.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    rounds = 0
    while True:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"coreness did not converge in {max_rounds} rounds"
            )
        hist = (
            edges.join(cur.withColumnRenamed("v", "dst"), "dst")
            .groupBy(F.col("src").alias("v"), "c")
            .agg(F.count("*").alias("cnt"))
        )
        w = (
            Window.partitionBy("v")
            .orderBy(F.desc("c"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        nxt = (
            hist.withColumn("cum", F.sum("cnt").over(w))
            .groupBy("v")
            .agg(F.max(F.least(F.col("c"), F.col("cum"))).alias("c"))
            .localCheckpoint(eager=False)
        )
        rounds += 1
        changed = (
            nxt.join(cur.withColumnRenamed("c", "_prev"), "v")
            .where(F.col("c") != F.col("_prev"))
            .count()
        )
        cur = nxt
        if changed == 0:
            return cur.withColumnRenamed("c", "coreness"), rounds
