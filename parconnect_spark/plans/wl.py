"""1-dimensional Weisfeiler-Leman color refinement — structural vertex
fingerprinting (graph-isomorphism-grade equivalence classes, symmetry/orbit
detection, structural dedup of interaction graphs), on the same fixed-round
join+agg substrate as plans/katz.py (SURVEY.md §2.10 family; absent from
the reference, which stops at connectivity).

Round 0 colors every vertex by its degree; each subsequent round refines

    lab_{r+1}(v) = H_r( lab_r(v), MULTISET{ lab_r(u) : u ∈ N(v) } )

Two vertices share a round-R label iff 1-WL cannot tell their rooted
R-neighborhoods apart — the classic refinement (and its classic limit:
regular graphs of equal degree, e.g. two triangles vs a hexagon, stay
indistinguishable; tested, documented semantics).

Determinism + the skew story (the reason this shape and not collect_list):
the neighbor multiset is hashed COMMUTATIVELY —

    msum_r(v) = ( Σ_{u∈N(v)} md5int("wln<r>:" || lab_r(u)) ) mod 2^60

a plain grouped SUM (map-side combinable, hub-proof: the 10^6-degree hub
costs the same per-row work as anyone else and never materializes a
10^6-element array the way sort-the-neighbor-list WL would), carried in
DECIMAL(38,0) so the pre-mod sum is exact on any partitioning up to
~10^18 neighbors per vertex. The per-round fold

    lab_{r+1}(v) = md5int("wl<r>:" || lab_r(v) || ':' || msum_r(v))

is the portable md5 fold (functions/dedup.md5int, 15 hex digits), so the
whole trajectory is bit-replayable in ANSI SQL — the DuckDB oracle unrolls
the identical rounds. Multiset-hash collisions are the usual 2^-60-grade
event, declared part of the operator's semantics (same contract as the
MinHash/SimHash family).

Physical plan, per round: ONE shuffle (join the |V|-row label table to the
edge table on src, grouped-sum by dst); the label side broadcasts under
the pagerank gate, above it the persisted edge table is pre-hashed on src
and never re-exchanges. Rounds are lazy localCheckpoints materialized by
the terminal action (O(1) plan depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.functions.dedup import md5int
from parconnect_spark.plans.pagerank import BROADCAST_MAX_ROWS

#: modulus of the commutative multiset hash — 2^60, the md5int(…, 1, 15)
#: value range, so every intermediate stays a non-negative int64
MSUM_MOD = 1 << 60

#: default refinement depth: round-R labels separate rooted R-neighborhoods;
#: 3 hops saturate the transcript entity graph's diameter-bounded structure
WL_ROUNDS = 3


def wl_refinement(
    edges: DataFrame,
    rounds: int = WL_ROUNDS,
    salt: str = "wl",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Returns DataFrame[v: long, wl: long] — the round-``rounds`` 1-WL
    label of every vertex.

    ``edges``: distinct symmetric (src, dst) long pairs, both directions
    present, no self-loops (the shape derive_edges/symmetrize emit).
    Vertices sharing a ``wl`` value are 1-WL-equivalent at depth
    ``rounds``; labels themselves are md5-fold hashes (stable across
    partitionings, sessions and engines, not dense ranks).
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    spark = edges.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # EAGER checkpoint: the degree census and every round re-reads the
    # edge table; without it each consumer re-executes the caller's
    # derivation tree (plans/katz.py lesson).
    ed = edges.select("src", "dst").localCheckpoint()

    # round 0: color = degree (symmetric edges: one row per directed copy)
    lab = (
        ed.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").cast("long").alias("lab"))
        .localCheckpoint()
    )
    bcast = lab.count() <= broadcast_max_rows
    if not bcast:
        ed = ed.repartition(parts, "src").persist()
        ed.count()

    for r in range(rounds):
        side = F.broadcast(lab) if bcast else lab.hint("shuffle_hash")
        nh = md5int(
            F.concat(F.lit(f"{salt}n{r}:"), F.col("lab").cast("string")),
            1,
            15,
        )
        msums = (
            ed.join(side, ed["src"] == side["v"])
            .groupBy(F.col("dst").alias("v"))
            .agg(
                F.sum(nh.cast("decimal(38,0)")).alias("_s"),
            )
            .select(
                "v",
                (F.col("_s") % F.lit(MSUM_MOD)).cast("long").alias("_msum"),
            )
        )
        if bcast:
            msums = F.broadcast(msums)
        lab = (
            lab.join(msums, "v", "left")
            .select(
                "v",
                md5int(
                    F.concat(
                        F.lit(f"{salt}{r}:"),
                        F.col("lab").cast("string"),
                        F.lit(":"),
                        F.coalesce(F.col("_msum"), F.lit(0))
                        .cast("long")
                        .cast("string"),
                    ),
                    1,
                    15,
                ).alias("lab"),
            )
            .localCheckpoint(eager=False)
        )

    out = lab.select("v", F.col("lab").alias("wl")).localCheckpoint()
    if not bcast:
        ed.unpersist()
    return out
