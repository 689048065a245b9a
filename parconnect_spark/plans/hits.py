"""HITS hubs & authorities (Kleinberg) by power iteration — link-graph
family member alongside PageRank (SURVEY.md §2.10; absent from the
reference, built on the same join+agg substrate as plans/pagerank.py).

    auth_k(v) = Σ_{(u,v)∈E} hub_{k-1}(u)   then L1-normalize
    hub_k(u)  = Σ_{(u,v)∈E} auth_k(v)      then L1-normalize

Edges are DIRECTED (u→v): hubs point at authorities. L1 normalization
(divide by the score sum) is used instead of the textbook L2 — any
per-iteration rescale yields the same fixpoint direction, and a plain SUM
keeps the oracle's unrolled SQL exact (no cross-engine sqrt).

Physical plan (one iteration = two half-steps, same calculus as
plans/pagerank.py):
* the |V|-row score table is BROADCAST into the edge join under
  ``broadcast_max_rows`` so the persisted edge table never exchanges; the
  half-step's only shuffle is the map-side-combined groupBy partial sum.
* above the gate the edge table is cached pre-hashed on the join key and
  the score side arrives shuffle-hash hinted — no per-iteration re-sort
  of |E| rows.
* the normalizer is the materializing action (one scalar aggregate job
  per half-step, doubling as the lazy-localCheckpoint trigger), so plan
  depth stays one half-step regardless of ``num_iters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.plans.pagerank import BROADCAST_MAX_ROWS


def hits(
    edges: DataFrame,
    num_iters: int = 8,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Returns DataFrame[v: long, hub: double, authority: double].

    ``edges`` are directed distinct (src, dst) pairs; vertices with no
    out-edges get hub 0, with no in-edges authority 0 (never dropped).
    """
    if num_iters < 1:
        raise ValueError("num_iters must be >= 1")
    spark = edges.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # EAGER localCheckpoint: the vertex census and the edge cache both
    # execute the caller's derivation tree otherwise (measured: the sf0.1
    # directed derivation is ~8s and ran twice per call) — the
    # plans/linkpred.py discipline.
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
        return spark.createDataFrame([], "v long, hub double, authority double")
    bcast = n <= broadcast_max_rows

    ed = edges.select("src", "dst")
    if not bcast:
        # Pre-hash once on each half-step's join key so the big side never
        # re-exchanges; two cached copies trade memory for zero per-iteration
        # edge shuffles (the same trade plans/pagerank.py makes).
        ed_by_src = ed.repartition(parts, "src").persist()
        ed_by_dst = ed.repartition(parts, "dst").persist()
    else:
        ed_by_src = ed_by_dst = ed.persist()
    ed_by_src.count()

    def _half(scores: DataFrame, score_col: str, join_key: str, out_key: str) -> DataFrame:
        """One half-step: propagate ``score_col`` across edges from
        ``join_key`` onto ``out_key``, L1-normalize over all vertices.

        The normalizer rides the plan as a broadcast one-row cross join
        instead of a driver collect — with every half-step lazy, the whole
        power iteration executes as a handful of jobs at the terminal
        action rather than 2 jobs per half-step (measured 21.1s → wall
        collapse at sf0.1; the collect-per-half-step version was job-
        scheduling-bound, not data-bound)."""
        side = F.broadcast(scores) if bcast else scores.hint("shuffle_hash")
        tbl = ed_by_src if join_key == "src" else ed_by_dst
        raw = (
            tbl.join(side, tbl[join_key] == side["v"])
            .groupBy(out_key)
            .agg(F.sum(score_col).alias("_s"))
            .localCheckpoint(eager=False)
        )
        tot = raw.agg(F.sum("_s").alias("_tot"))
        raw_b = raw.crossJoin(F.broadcast(tot))
        if bcast:
            raw_b = F.broadcast(raw_b)
        norm = F.when(
            F.col("_tot") > 0, F.coalesce("_s", F.lit(0.0)) / F.col("_tot")
        ).otherwise(F.lit(0.0))
        return (
            verts.join(raw_b, verts["v"] == raw_b[out_key], "left")
            .select("v", norm.alias(score_col))
            .localCheckpoint(eager=False)
        )

    hub = verts.select("v", F.lit(1.0 / n).alias("hub")).localCheckpoint()
    auth = None
    for it in range(1, num_iters + 1):
        auth = _half(hub.withColumnRenamed("hub", "authority"), "authority", "src", "dst")
        hub = _half(auth.withColumnRenamed("authority", "hub"), "hub", "dst", "src")
        if it % 4 == 0 and it < num_iters:
            # bound the lazy-checkpoint cascade depth (the nested broadcast
            # subqueries execute recursively at the terminal action — the
            # plans/pagerank.py materialize_every discipline).
            hub.count()

    out = (
        hub.join(auth.withColumnRenamed("v", "_av"), hub["v"] == F.col("_av"))
        .select("v", "hub", "authority")
        # EAGER: materialize the whole lazy cascade while the edge/vertex
        # caches below still exist — the caller's action would otherwise
        # recompute the chain against unpersisted lineage.
        .localCheckpoint()
    )
    verts.unpersist()
    ed_by_src.unpersist()
    if ed_by_dst is not ed_by_src:
        ed_by_dst.unpersist()
    return out
