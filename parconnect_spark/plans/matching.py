"""Maximal matching via locally-minimum edges (SURVEY.md §2.10 family;
absent from the reference — with MIS, the other classic symmetry-breaking
primitive of parallel graph processing, and the pairing step multilevel
graph coarseners are built on).

Round: every live edge draws its key ``(p, a, b)`` — ``p`` the portable
md5 fold of the canonical endpoint pair, the trailing endpoints making the
key a total order — and an edge joins the matching iff its key is the
MINIMUM among the live edges at BOTH endpoints (the "locally dominant
edge" rule). Matched endpoints retire all their other edges; repeat until
no live edge remains — at that point every edge touches a matched vertex,
so the matching is maximal.

Priorities are FIXED across rounds, which buys a strong structural
property: the fixpoint equals the SEQUENTIAL greedy matching taken in
``(p, a, b)`` order (the locally-minimum rule matches an edge exactly when
every smaller conflicting edge has already been eliminated — the parallel
rounds simulate greedy's prefix order). The test suite checks the engine
against exactly that independent sequential algorithm; the driver oracle
replays the rounds.

Physical plan, per round: the per-vertex minimum is one map-side-combined
``min(struct)`` grouped by endpoint over both orientations (the CC
grouped-min shape); the both-endpoints test is two hash joins against that
≤|V|-row aggregate; retirement is two anti joins. Live tables only
shrink; lazy localCheckpoint per round (the CC loop's O(1)-plan-depth
rule). Expected O(log |E|) rounds; the globally minimal live edge always
matches, so progress is guaranteed. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.functions.dedup import md5int

#: widest md5 fold inside signed-64.
PRIORITY_HEX_CHARS = 15


def _edge_key(salt: str) -> F.Column:
    p = md5int(
        F.concat(
            F.lit(f"{salt}:"),
            F.col("a").cast("string"),
            F.lit(":"),
            F.col("b").cast("string"),
        ),
        1,
        PRIORITY_HEX_CHARS,
    )
    return F.struct(p.alias("p"), F.col("a").alias("ka"), F.col("b").alias("kb"))


def maximal_matching(
    edges: DataFrame,
    max_rounds: int = 64,
    salt: str = "match",
) -> tuple[DataFrame, int]:
    """Maximal matching of an undirected graph.

    ``edges``: DataFrame[a: long, b: long] — distinct canonical undirected
    edges (``a < b``, no self-loops; symmetric input is fine too, the
    canonical fold is applied). Returns ``(matching, rounds)`` where
    ``matching`` is DataFrame[a, b, round: int] — the matched edges and
    the round each was taken (deterministic under the fixed priorities).
    Raises if ``max_rounds`` is hit with live edges remaining.
    """
    live = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    picked: list[DataFrame] = []
    rnd = 0
    while True:
        if live.count() == 0:
            break
        if rnd >= max_rounds:
            raise RuntimeError(
                f"matching did not finish in {max_rounds} rounds"
            )
        keyed = live.select("a", "b", _edge_key(salt).alias("k"))
        inc = keyed.select(F.col("a").alias("v"), "k").unionByName(
            keyed.select(F.col("b").alias("v"), "k")
        )
        vmin = inc.groupBy("v").agg(F.min("k").alias("mk"))
        matched = (
            keyed.join(
                vmin.select(F.col("v").alias("a"), F.col("mk").alias("ma")),
                "a",
            )
            .join(
                vmin.select(F.col("v").alias("b"), F.col("mk").alias("mb")),
                "b",
            )
            .where((F.col("k") == F.col("ma")) & (F.col("k") == F.col("mb")))
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        picked.append(matched.select("a", "b", F.lit(rnd).cast("int").alias("round")))
        mv = (
            matched.select(F.col("a").alias("v"))
            .unionByName(matched.select(F.col("b").alias("v")))
            .distinct()
        )
        live = (
            live.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        rnd += 1
    spark = edges.sparkSession
    if not picked:
        return spark.createDataFrame([], "a long, b long, round int"), 0
    out = picked[0]
    for m in picked[1:]:
        out = out.unionByName(m)
    return out, rnd
