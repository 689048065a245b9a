"""Minimum spanning forest via Borůvka rounds (SURVEY.md §2.10 family;
absent from the reference — the classic companion of its connected-
components engine: Borůvka IS parallel CC with a min-edge selection rule,
so the plan reuses the same grouped-min + contraction substrate as
plans/connectivity.py).

Semantics (deterministic): edge keys are totally ordered by
``(weight, a, b)`` with ``a < b`` canonical endpoints. Under a total order
the minimum spanning forest is UNIQUE (the cycle property: an edge belongs
to the MSF iff its endpoints are not connected by strictly smaller edges),
so any correct MSF algorithm — the engine's Borůvka, the oracle's
cycle-property check, a sequential Kruskal — must produce the identical
edge set. That uniqueness is what makes the operator an exact cross-engine
contract rather than a "some spanning forest" smoke test.

Physical plan, per Borůvka round:
* **min-edge selection** — one map-side-combinable ``min(struct(weight,
  a, b, ca, cb))`` grouped by component, over both orientations of the
  live edge table. Same skew shape as connectivity's grouped min: a hub
  component's partial minima combine map-side, no per-component row
  buffering anywhere.
* **contraction** — the selected edges form a pointer graph over component
  ids (≤ one edge per live component); merged labels are computed by
  :func:`~parconnect_spark.plans.connectivity.connected_components` on that
  (much smaller) graph — min-label semantics keep component ids stable and
  deterministic.
* **relabel** — two hash joins map the live edge table's endpoints through
  the merge map (AQE broadcasts the map when it is small); edges whose
  endpoints collapse into one component drop out.
* lineage is cut per round with a lazy ``localCheckpoint`` materialized by
  the next round's count action — the CC loop's O(1)-plan-depth rule.

Each round at least halves the number of non-isolated components, so the
loop runs O(log V) rounds; per-round cost is dominated by one aggregate +
two joins over the surviving edge set, which only shrinks. At 100 TB this
is the textbook distributed MSF: no per-row Python, no collect beyond the
loop's scalar convergence count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.plans.connectivity import connected_components


def boruvka_msf(
    wedges: DataFrame,
    max_rounds: int = 64,
) -> tuple[DataFrame, int]:
    """Minimum spanning forest of a weighted undirected graph.

    ``wedges``: DataFrame[a: long, b: long, weight: long] — distinct
    canonical undirected edges (``a < b``), integer weights (the
    co-occurrence multiplicity shape ``derive_weighted_undirected_edges``
    emits; any totally-ordered integer weight works).

    Returns ``(msf, rounds)`` where ``msf`` is DataFrame[a, b, weight] —
    the unique MSF under the ``(weight, a, b)`` total order; ``rounds`` is
    the number of Borůvka rounds executed. Raises if ``max_rounds`` is hit
    before the forest is complete (the connectivity loop's refusal to
    return partial results).
    """
    work = (
        wedges.where(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.col("weight").cast("long").alias("weight"),
            F.col("a").alias("ca"),
            F.col("b").alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    picked: list[DataFrame] = []
    rounds = 0
    while True:
        # count() is the materializing action for the lazy checkpoint (a
        # limit-style emptiness probe may compute only one partition and
        # leave the checkpoint torn — the CC loop's discipline).
        if work.count() == 0:
            break
        if rounds >= max_rounds:
            raise RuntimeError(f"Borůvka did not finish in {max_rounds} rounds")
        rounds += 1
        # (weight, a, b) already identifies the edge uniquely (distinct
        # canonical input), so the trailing ca/cb fields ride along without
        # affecting the lexicographic order.
        key = F.struct("weight", "a", "b", "ca", "cb")
        oriented = work.select(F.col("ca").alias("comp"), key.alias("k")).unionByName(
            work.select(F.col("cb").alias("comp"), key.alias("k"))
        )
        sel = (
            oriented.groupBy("comp")
            .agg(F.min("k").alias("k"))
            .select("k.a", "k.b", "k.weight", "k.ca", "k.cb")
            .localCheckpoint(eager=False)
        )
        picked.append(sel.select("a", "b", "weight").distinct())
        # Contract: every live component appears in sel (it has >=1 live
        # edge, hence a minimum); the merge map is CC min-labels over the
        # pointer graph of selected (ca, cb) pairs.
        pointer = sel.select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        merged = connected_components(pointer).labels  # DataFrame[v, label]
        ml_a = merged.select(F.col("v").alias("ca"), F.col("label").alias("_na"))
        ml_b = merged.select(F.col("v").alias("cb"), F.col("label").alias("_nb"))
        work = (
            work.join(ml_a, "ca", "left")
            .join(ml_b, "cb", "left")
            .select(
                "a",
                "b",
                "weight",
                F.coalesce("_na", F.col("ca")).alias("ca"),
                F.coalesce("_nb", F.col("cb")).alias("cb"),
            )
            .where(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=False)
        )
    if not picked:
        spark = wedges.sparkSession
        empty = spark.createDataFrame([], "a long, b long, weight long")
        return empty, rounds
    msf = reduce(lambda x, y: x.unionByName(y), picked).distinct()
    return msf, rounds
