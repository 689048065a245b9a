"""Katz centrality by truncated path counting in exact fixed-point
arithmetic — link-graph family member alongside PageRank and HITS
(SURVEY.md §2.10; absent from the reference, built on the same join+agg
substrate as plans/pagerank.py / plans/hits.py).

    katz(v) = Σ_{k=0..K-1} α^k · |paths of length k ending at v|  (β = 1)

computed as the fixed-point recurrence over DIRECTED edges

    s_1(v) = SCALE
    s_k(v) = SCALE + (Σ_{(u,v)∈E} s_{k-1}(u)) div ALPHA_INV

where SCALE = 10^6 is the fixed-point unit, α = 1/``alpha_inv``, and
``div`` is integer floor division. Every intermediate is a NON-NEGATIVE
int64, so the recurrence is bit-identical across engines, partitionings
and retries — a Σ of int64 is commutative where a Σ of doubles is not,
and floor ≡ truncate on non-negatives (the cross-engine determinism rules
in NOTES.md). The floor loses < 1 fixed-point ulp per hop, a declared
part of the operator's semantics (the DuckDB oracle replays the identical
integer recurrence, so the contract is exact-hash, not allclose).

Overflow bound (caller's contract, mirroring the α < 1/λ_max convergence
condition of real-valued Katz): values grow per hop by at most
max_in_degree/alpha_inv, so int64 is safe while
SCALE · (max_in_degree/alpha_inv)^num_iters < 2^63 — pick ``alpha_inv``
of the order of the hub in-degree, exactly as textbook Katz picks
α ≲ 1/λ_max. The default (1000) covers the transcript entity graph
through sf0.1 (measured max 2.53e6 at K=6, NOTES.md round-5).

Physical plan (one iteration = one half-step of plans/hits.py):
* the |V|-row score table BROADCASTs into the edge join under
  ``broadcast_max_rows`` so the persisted edge table never exchanges;
  above the gate the edge cache is pre-hashed on src and the score side
  arrives shuffle_hash-hinted — no per-iteration |E| re-sort.
* iterations are lazy localCheckpoints materialized in one terminal
  action (plan depth stays O(1); a periodic count bounds the cascade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.plans.pagerank import BROADCAST_MAX_ROWS

#: fixed-point unit: 1.0 of centrality = 10^6 integer units
SCALE = 1_000_000


def katz(
    edges: DataFrame,
    num_iters: int = 6,
    alpha_inv: int = 1000,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Returns DataFrame[v: long, katz6: long, katz: double].

    ``edges`` are directed distinct (src, dst) pairs. ``katz6`` is the
    exact fixed-point score (10^6 units — the hashable contract column);
    ``katz`` is katz6/10^6 for reading (exact in double below 2^53).
    Vertices with no in-edges score exactly SCALE (the β·1 base term).
    """
    if num_iters < 1:
        raise ValueError("num_iters must be >= 1")
    if alpha_inv < 1:
        raise ValueError("alpha_inv must be >= 1")
    spark = edges.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # EAGER localCheckpoint: census + edge cache would otherwise both
    # re-execute the caller's derivation tree (plans/linkpred.py lesson).
    edges = edges.localCheckpoint()
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        verts.unpersist()
        return spark.createDataFrame([], "v long, katz6 long, katz double")
    bcast = n <= broadcast_max_rows

    ed = edges.select("src", "dst")
    if not bcast:
        ed = ed.repartition(parts, "src")
    ed = ed.persist()
    ed.count()

    s = verts.select("v", F.lit(SCALE).cast("long").alias("s")).localCheckpoint()
    for it in range(2, num_iters + 1):
        side = F.broadcast(s) if bcast else s.hint("shuffle_hash")
        raw = (
            ed.join(side, ed["src"] == side["v"])
            .groupBy("dst")
            .agg(F.sum("s").alias("_in"))
        )
        if bcast:
            raw = F.broadcast(raw)
        s = (
            verts.join(raw, verts["v"] == raw["dst"], "left")
            .select(
                "v",
                (
                    F.lit(SCALE).cast("long")
                    + F.expr(f"coalesce(_in, 0L) div {alpha_inv}")
                ).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
        if it % 4 == 0 and it < num_iters:
            # bound the lazy-checkpoint cascade (pagerank's
            # materialize_every discipline)
            s.count()

    out = s.select(
        "v",
        F.col("s").alias("katz6"),
        (F.col("s").cast("double") / SCALE).alias("katz"),
    ).localCheckpoint()
    verts.unpersist()
    ed.unpersist()
    return out
