"""Connected components — the reference's core computation, Spark-first.

parconnect's coloring phase (/root/reference/src/coloring/labelProp.hpp:266-351)
is a min-label fixpoint over a (Pc, Pn, nId) tuple table: each superstep
sorts by vertex bucket, takes the bucket min (updatePn, labelProp.hpp:358-432),
re-sorts by partition and broadcasts the min down (updatePc,
labelProp.hpp:436-521), with optional pointer doubling via inserted
parent-request tuples (doPointerDoubling, labelProp.hpp:523-629). All of that
is sort-shuffle + grouped-min + join — so here it *is* joins and grouped
mins, and the ~200 LoC of rank-boundary exscan patching
(labelProp.hpp:364-416) vanishes into Spark's shuffle.

Three algorithms, same fixpoint (label(v) = min vertex id in v's component):

* ``two_phase`` (default) — alternating large-star / small-star edge
  rewiring (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14 — a published, public algorithm). O(log^2 n) rounds worst case,
  ~log n in practice; each round is two grouped-min + join passes. This is
  the scale path: edge rewiring keeps per-round state at O(|E|) with no
  label table to re-join, and hub vertices are exactly the skew AQE's
  skew-join splitting handles.

* ``min_label`` — the reference's superstep semantics: label table +
  per-superstep neighborhood min as a DELTA iteration (messages only from
  the changed frontier), with optional pointer doubling
  (label(v) ← label(label(v)), the DOUBLING lever at labelProp.hpp:55).

* ``local_contract`` (plans/csr.py) — Arrow-kernel variant: per-partition
  vectorized numpy union-find, one shuffle per round.

Convergence detection: edge-rewiring algorithms compare an
order-insensitive (count, hash-sum) set fingerprint between supersteps
(one aggregate — the Spark equivalent of the reference's
allreduce(min(converged)), labelProp.hpp:516-520); min_label stops on an
empty delta frontier.

Every superstep optionally checkpoints its working set + metrics through a
SuperstepCheckpoint (streaming/checkpoint.py) so a killed run resumes
mid-iteration; lineage is truncated via localCheckpoint otherwise.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.operators.graph import vertices as vertex_table
from parconnect_spark.streaming.metrics import IoTelemetry


@dataclass
class CCResult:
    labels: DataFrame  # [v: long, label: long] — label = min id in component
    iterations: int
    metrics: list = field(default_factory=list)  # per-superstep dicts


def _checksum(edges: DataFrame) -> tuple[int, int]:
    """(count, sum of row hashes) — an order-insensitive set fingerprint.

    Equal fingerprints on consecutive supersteps ⇒ the (distinct, canonical)
    edge sets are equal, i.e. a fixpoint, up to 64-bit hash-sum collision —
    vanishingly unlikely and why no extra confirmation superstep is needed
    (the reference's allreduce(min(converged)), labelProp.hpp:516-520)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("cnt"),
        # decimal accumulator: full-range 64-bit hashes would overflow a
        # long sum under ANSI mode
        F.sum(F.xxhash64("src", "dst").cast("decimal(20,0)")).alias("s"),
    ).collect()[0]
    return int(row["cnt"]), int(row["s"] or 0)


def _large_star_canonical(canon: DataFrame, parts: int) -> DataFrame:
    """One large-star pass over a canonical (src>dst, distinct) edge set.

    Both orientations of a distinct canonical set are disjoint, so the union
    needs no dedup. The pass is written partition-aware: after the explicit
    ``repartition(parts, src)`` the grouped min, the min-join and the final
    dedup all reuse the same hash distribution (hash(src) co-locates every
    row of a (src, dst) group), so one superstep pass costs exactly one
    shuffle on its input plus one on its (smaller) output — the two
    sample-sorts of the reference's superstep
    (/root/reference/src/coloring/labelProp.hpp:365,451) with the boundary
    patching gone."""
    rev = canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    sym = canon.unionByName(rev).repartition(parts, "src")
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("src", "_mn").alias("_m"))
    )
    out = (
        sym.where(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    # emitted (v, m) pairs are keyed by the NEW src=v: one shuffle, then the
    # dedup is exchange-free on the same distribution
    return out.repartition(parts, "src").dropDuplicates(["src", "dst"])


def _small_star_canonical(canon: DataFrame, parts: int) -> DataFrame:
    """One small-star pass over a canonical (src>dst, distinct) edge set
    already hash-partitioned by src: grouped min + join are exchange-free;
    the rewired output needs one shuffle for its new key. Output stays
    canonical: (x, m) pairs with x > m."""
    mins = canon.groupBy("src").agg(F.min("dst").alias("_m"))
    rewired = (
        canon.join(mins, "src")
        .where(F.col("dst") != F.col("_m"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    )
    selfarc = mins.select("src", F.col("_m").alias("dst"))
    return (
        rewired.unionByName(selfarc)
        .repartition(parts, "src")
        .dropDuplicates(["src", "dst"])
    )


_PACK_MASK = (1 << 32) - 1

#: grouped-min kernel for the packed window round: "window" (min as a
#: window aggregate over the hash(src) exchange — pays a per-partition
#: radix sort) or "shj" (exchange-free groupBy over the SAME reused
#: exchange + shuffled-hash join-back — no sort, two reads of the shuffle
#: files). Overridable via SPARK_GRAFT_CC_GROUPMIN for A/B runs.
#: MEASURED on the 180.5M-edge scaling graph at 8 pinned cores: shj
#: superstep-1 73.7s vs window 58.9-64.9s — the single-long radix sort is
#: cheaper than reading the exchange twice plus the per-row hash probe, so
#: "window" stays the default (kept as a documented, tested A/B lever).
GROUP_MIN_KERNEL = "window"


def _group_min_kernel() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_CC_GROUPMIN", GROUP_MIN_KERNEL)


def _packed_group_min_shj(rows: DataFrame, hubs: list, parts: int) -> DataFrame:
    """Sort-free twin of _packed_group_min: one hash(src) exchange, then an
    exchange-free grouped min over it and a shuffled-hash join-back against
    the SAME exchange (Spark's ReuseExchange dedups the two scans, so the
    shuffle is written once and read twice). Skips the window's per-
    partition radix sort; the per-partition build side is |V|/parts packed
    mins. Hub srcs take the identical split as the window kernel."""
    src = F.shiftright("e", 32)

    def _cold(part_rows: DataFrame) -> DataFrame:
        part = part_rows.repartition(parts, src)
        mins = part.groupBy(src.alias("_v")).agg(
            F.min("e").bitwiseAND(F.lit(_PACK_MASK)).alias("_mn")
        )
        return part.join(
            mins.hint("shuffle_hash"), src == F.col("_v")
        ).select("e", "_mn")

    if not hubs:
        return _cold(rows)
    is_hub = src.isin(hubs)
    cold = _cold(rows.where(~is_hub))
    hot = rows.where(is_hub)
    hot_mins = hot.groupBy(src.alias("_hv")).agg(
        F.min("e").bitwiseAND(F.lit(_PACK_MASK)).alias("_hmn")
    )
    hot_joined = hot.join(
        F.broadcast(hot_mins), src == F.col("_hv")
    ).select("e", F.col("_hmn").alias("_mn"))
    return cold.unionByName(hot_joined)


def _packed_group_min(
    rows: DataFrame, hubs: list, parts: int
) -> DataFrame:
    """min(e) & MASK attached to every row of a packed edge set, grouped by
    the packed src — the shared kernel of both window phases, with DEGREE-
    BASED EDGE SPLITTING (BASELINE.json north_rule): rows whose src is in
    ``hubs`` bypass the hash(src) window (whose single partition would
    buffer/spill the whole hub group in one task) and take a map-side-
    combined aggregate + broadcast join-back instead — the hub min table is
    ≤ len(hubs) rows, so the join-back is a trivial broadcast and no task
    ever holds a hub group. Returns columns [e, _mn]."""
    from pyspark.sql import Window

    src = F.shiftright("e", 32)
    w = Window.partitionBy(src)
    win_min = F.min("e").over(w).bitwiseAND(F.lit(_PACK_MASK))
    if not hubs:
        return rows.repartition(parts, src).select("e", win_min.alias("_mn"))
    is_hub = src.isin(hubs)
    cold = (
        rows.where(~is_hub)
        .repartition(parts, src)
        .select("e", win_min.alias("_mn"))
    )
    hot = rows.where(is_hub)
    hot_mins = hot.groupBy(src.alias("_hv")).agg(
        F.min("e").bitwiseAND(F.lit(_PACK_MASK)).alias("_hmn")
    )
    hot_joined = hot.join(
        F.broadcast(hot_mins), src == F.col("_hv")
    ).select("e", F.col("_hmn").alias("_mn"))
    return cold.unionByName(hot_joined)


def _two_phase_round_window_packed(
    canon: DataFrame, parts: int, hubs: list | None = None,
    caches: list | None = None,
) -> DataFrame:
    """The window round over PACKED single-long edge rows.

    Same rewiring semantics as _two_phase_round_window, but every exchange
    inside the round carries ONE long column (src<<32 | dst) instead of two:
    UnsafeRow layout makes a 1-long row 16 bytes vs 24 for 2 longs, so the
    round's three shuffles shrink by a third (NOTES.md limitation #2 of
    round 2). Callers guarantee 0 <= id < 2^31 for every vertex (checked
    once per run in _cc_two_phase; falls back to the unpacked round
    otherwise — e.g. de Bruijn k-mer ids, which use 62 bits).

    ``hubs`` (vertex ids with straggler-scale symmetric degree, from the
    run census / the per-superstep checksum census) activates degree-based
    edge splitting in BOTH phases — see _packed_group_min.

    Key invariant making this work: within a src group the packed value
    orders exactly like dst (src is the constant high half), so
    min(packed) over the group == src<<32 | min(dst) — the grouped min
    never needs to unpack."""
    if _group_min_kernel() == "shj":
        group_min = _packed_group_min_shj
    else:
        group_min = _packed_group_min
    src = F.shiftright("e", 32)
    dst = F.col("e").bitwiseAND(F.lit(_PACK_MASK))
    fwd = canon.select(
        (F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("e")
    )
    rev = canon.select(
        (F.shiftleft(F.col("dst"), 32) + F.col("src")).alias("e")
    )
    sym = fwd.unionByName(rev)
    # large star: m = min(src, min over N(src)); min(e) over the src group
    # IS (src<<32 | min(dst)) — see invariant above
    mm = group_min(sym, hubs or [], parts).select(
        "e", F.least(src, F.col("_mn")).alias("_m")
    )
    ls = (
        mm.where(dst > src)
        .select((F.shiftleft(dst, 32) + F.col("_m")).alias("e"))
        .where(src != dst)
    )
    if hubs and caches is not None:
        # the split consumes ls three ways (cold window, hub agg — which
        # runs FIRST as a broadcast subquery and populates the cache — and
        # hub join-back); without the lazy persist each consumer would
        # recompute the whole large-star phase past the reused exchange.
        # The caller owns the unpersist via ``caches`` (the loop drops the
        # entries after the round materializes); a caller passing hubs
        # WITHOUT a caches list gets the recompute instead of a persist it
        # could never release — slower, never a leak.
        ls = ls.persist()
        caches.append(ls)
    # small star over the large-star output (rows keep src > dst, so the
    # same packed-min trick applies)
    m2 = group_min(ls, hubs or [], parts).select(
        "e", F.col("_mn").alias("_m")
    )
    pairs = m2.select(
        F.explode(
            F.array(
                F.when(dst != F.col("_m"), F.shiftleft(dst, 32) + F.col("_m")),
                F.shiftleft(src, 32) + F.col("_m"),
            )
        ).alias("e")
    ).where(F.col("e").isNotNull())
    # single-column dedup: no explicit repartition — the aggregate plans as
    # partial(map-side dedup) → exchange(hash(e)) → final, so the round's
    # last shuffle carries only per-partition-distinct packed longs
    deduped = pairs.dropDuplicates(["e"])
    return deduped.select(src.alias("src"), dst.alias("dst"))


def _group_min(rows: DataFrame, hubs: list, parts: int) -> DataFrame:
    """Unpacked twin of _packed_group_min: min(dst) per src group attached
    to every [src, dst] row, hub src groups split out of the window into a
    combine-aggregate + broadcast join-back. Returns [src, dst, _mn]."""
    from pyspark.sql import Window

    w = Window.partitionBy("src")
    win_min = F.min("dst").over(w)
    if not hubs:
        return rows.repartition(parts, "src").select(
            "src", "dst", win_min.alias("_mn")
        )
    is_hub = F.col("src").isin(hubs)
    cold = (
        rows.where(~is_hub)
        .repartition(parts, "src")
        .select("src", "dst", win_min.alias("_mn"))
    )
    hot = rows.where(is_hub)
    hot_mins = hot.groupBy(F.col("src").alias("_hv")).agg(
        F.min("dst").alias("_hmn")
    )
    hot_joined = hot.join(
        F.broadcast(hot_mins), F.col("src") == F.col("_hv")
    ).select("src", "dst", F.col("_hmn").alias("_mn"))
    return cold.unionByName(hot_joined)


def _two_phase_round_window(
    canon: DataFrame, parts: int, hubs: list | None = None,
    caches: list | None = None,
) -> DataFrame:
    """One full large-star + small-star round as a SINGLE linear plan.

    The join-based phases consume their inputs in 2-3 branches each, forcing
    a materialization barrier per phase (multi-branch + unmaterialized input
    = recompute across concurrent stages). Rewriting the grouped min as a
    window aggregate (min over partitionBy(src), no ordering) makes every
    intermediate single-consumer, so the whole round — both phases plus the
    final dedup — is ONE job with 3 exchanges and no cache/checkpoint copy
    in the middle. The sort the window needs rides the same hash(src)
    exchange the grouped min would have taken. ``hubs`` activates
    degree-based edge splitting in both phases (see _packed_group_min).

    Same rewiring semantics as _large_star_canonical/_small_star_canonical
    (Kiveris SoCC'14): large-star input need not be distinct for min() and
    the trailing dedup restores set semantics."""
    rev = canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    sym = canon.unionByName(rev)
    # large star: every neighbor v > u re-points to m = min(u, N(u))
    mm = _group_min(sym, hubs or [], parts).select(
        "src", "dst", F.least(F.col("src"), F.col("_mn")).alias("_m")
    )
    ls = (
        mm.where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    if hubs and caches is not None:
        # three consumers under the split — persist only when the caller
        # can unpersist (see the packed twin's note)
        ls = ls.persist()
        caches.append(ls)
    # small star over the (canonical, possibly duplicated) large-star output:
    # emit (dst, m) for dst != m plus the (src, m) self-arc, in one explode
    m2 = _group_min(ls, hubs or [], parts).select(
        "src", "dst", F.col("_mn").alias("_m")
    )
    pairs = (
        m2.select(
            F.explode(
                F.array(
                    F.when(
                        F.col("dst") != F.col("_m"),
                        F.struct(
                            F.col("dst").alias("src"), F.col("_m").alias("dst")
                        ),
                    ),
                    F.struct(F.col("src").alias("src"), F.col("_m").alias("dst")),
                )
            ).alias("e")
        )
        .where(F.col("e").isNotNull())
        .select("e.src", "e.dst")
    )
    return pairs.repartition(parts, "src").dropDuplicates(["src", "dst"])


def _large_star_noskew(canon: DataFrame, broadcast_mins: bool = True) -> DataFrame:
    """Large-star pass with NO forced hash(src) placement of the edge table.

    The co-located formulation (_large_star_canonical) repartitions the big
    table by src so the grouped min, the min-join and the dedup share one
    exchange — optimal on uniform graphs, pessimal on hub graphs: the
    transcript graph's 'r:user' entity holds 16% of all rows in one src
    group (measured), so hash(src) serializes every superstep into one
    straggler task at any core count. Here instead:

    * the neighborhood min is a plain groupBy(src) — Spark's map-side
      partial aggregation IS the two-phase rewrite (a hub contributes at
      most one partial row per input partition, so the agg shuffle is
      balanced regardless of degree);
    * the min table (|V| rows) joins BACK to the unshuffled edge table —
      broadcast when it fits (no big-side exchange at all), AQE skew-split
      sort-merge otherwise;
    * nothing pins the big table to hash(src).

    ``broadcast_mins``: the min table is |V'| rows of the ACTIVE working
    set, which contracts every round. The broadcast hint is size-gated by
    the caller (_cc_two_phase counts the vertex set once per run): forced
    only when it fits executor memory; past the gate the join degrades to a
    plain sort-merge with AQE skew-split instead of a broadcast OOM. NB:
    without the hint a hub partition UNDER AQE's 256MB skew threshold is
    one straggler task (measured pathological on the 16%-hub transcript
    graph at sf0.1) — above the threshold AQE splits it, which is exactly
    the giant-|V| regime the gate targets."""
    rev = canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    sym = canon.unionByName(rev)
    mins = sym.groupBy("src").agg(F.min("dst").alias("_mn")).select(
        "src", F.least(F.col("src"), F.col("_mn")).alias("_m")
    )
    if broadcast_mins:
        mins = F.broadcast(mins)
    return (
        sym.where(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )


def _small_star_noskew(
    ls: DataFrame, parts: int, broadcast_mins: bool = True, packed: bool = False
) -> DataFrame:
    """Small-star pass, same skew-oblivious shape; the round's only
    full-size shuffle is the final dedup, keyed by the WHOLE edge —
    balanced even when hash(src) alone is hub-skewed. With ``packed``
    (ids < 2^31, checked by the caller) that dedup exchanges a single
    packed long per row instead of two — a third less shuffle volume."""
    mins = ls.groupBy("src").agg(F.min("dst").alias("_m"))
    rewired = (
        ls.join(F.broadcast(mins) if broadcast_mins else mins, "src")
        .where(F.col("dst") != F.col("_m"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    )
    selfarc = mins.select("src", F.col("_m").alias("dst"))
    both = rewired.unionByName(selfarc)
    if packed:
        packed_col = (F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("e")
        deduped = both.select(packed_col).dropDuplicates(["e"])
        return deduped.select(
            F.shiftright("e", 32).alias("src"),
            F.col("e").bitwiseAND(F.lit(_PACK_MASK)).alias("dst"),
        )
    return (
        both.repartition(parts, "src", "dst")
        .dropDuplicates(["src", "dst"])
    )


def _two_phase_round_salted_fused(
    canon: DataFrame, packed: bool
) -> DataFrame:
    """Both noskew phases fused into ONE linear plan (no mid-round
    materialization): the per-phase min tables are broadcast subqueries, so
    the round's only exchanges are the two map-side-combined min aggregates
    plus the final whole-edge dedup — every one of them balanced under hub
    skew (no hash(src) placement of the big table anywhere, no window sort
    of a hub group). The large-star intermediate is consumed twice (the
    mins2 aggregate and the small-star rewire) and recomputed rather than
    checkpointed — both consumers are narrow scans over the working set's
    cached blocks probing a broadcast hash table, and the mins1 exchange is
    shared between them via Spark's ReusedExchange. Callers must have
    verified the broadcast gate (|V'| <= broadcast_max_rows)."""
    rev = canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    sym = canon.unionByName(rev)
    mins1 = F.broadcast(
        sym.groupBy("src").agg(F.min("dst").alias("_mn")).select(
            "src", F.least(F.col("src"), F.col("_mn")).alias("_m")
        )
    )
    ls = (
        sym.where(F.col("dst") > F.col("src"))
        .join(mins1, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    mins2 = F.broadcast(ls.groupBy("src").agg(F.min("dst").alias("_m")))
    pairs = (
        ls.join(mins2, "src")
        .select(
            F.explode(
                F.array(
                    F.when(
                        F.col("dst") != F.col("_m"),
                        F.struct(
                            F.col("dst").alias("src"), F.col("_m").alias("dst")
                        ),
                    ),
                    F.struct(F.col("src").alias("src"), F.col("_m").alias("dst")),
                )
            ).alias("e")
        )
        .where(F.col("e").isNotNull())
        .select("e.src", "e.dst")
    )
    if packed:
        packed_col = (F.shiftleft(F.col("src"), 32) + F.col("dst")).alias("e")
        deduped = pairs.select(packed_col).dropDuplicates(["e"])
        return deduped.select(
            F.shiftright("e", 32).alias("src"),
            F.col("e").bitwiseAND(F.lit(_PACK_MASK)).alias("dst"),
        )
    return pairs.dropDuplicates(["src", "dst"])


def _canonical(edges: DataFrame) -> DataFrame:
    """(max, min) orientation, self-loops dropped, distinct."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .distinct()
    )


def _both_orientations(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev).distinct()


#: `materialize="auto"` picks the salted round over the window round when
#: hub_frac >= max(AUTO_MIN_HUB_FRAC, AUTO_STRAGGLER_FACTOR / parallelism)
#: AND the broadcast join-back fits. Rationale: the window round serializes
#: the largest src group into one task, capping superstep speedup at
#: ~1/hub_frac, while the salted round is fully parallel but carries a
#: measured ~2.5-4x per-edge constant (extra job + join-back). The
#: crossover is therefore a function of execution width, not of the graph
#: alone. Measured on this box (see NOTES.md round-3): 16%-hub transcript
#: graph — window wins at 2 and 8 pinned cores, salted wins at 32 cores
#: (median 30.9s vs 38.2s); 42%-hub star graph — window still wins at 8
#: cores (135s vs 158s with broadcast, 295s without). Those bracket the
#: constant to (3.4, 5.1); 4.0 reproduces every measured winner. On a
#: 1000-core cluster the same rule sends any hub >0.4% of rows (above the
#: floor) down the salted path — the 100-TB regime the rule exists for.
AUTO_STRAGGLER_FACTOR = 4.0

#: floor under which no src group can dominate a task at any width —
#: stays on the single-job window round even at extreme parallelism.
AUTO_MIN_HUB_FRAC = 0.02

#: size gate for the salted round's forced broadcast of the per-vertex min
#: table: |V'| rows above this fall through to a plain join (AQE picks
#: sort-merge + skew split) instead of an executor-memory OOM. 8M rows ≈
#: 250 MB as a broadcast hash relation — comfortably under the 8 GB hard
#: limit and typical executor memory; raise it on fat-executor clusters.
BROADCAST_MAX_ROWS = 8_000_000

#: hub-census refresh cadence (supersteps per hub-census refresh). The refresh
#: exists to catch NEWLY-emerged stragglers (the giant component's min
#: vertex, whose star doubles per round under pointer halving); the merged
#: list never drops previously-seen hubs, so staleness only delays a NEW
#: hub's split by census_every-1 rounds. DEFAULT 1 — amortization (=2) was
#: tried in round 5 and MEASURED-REJECTED at cluster-realistic superstep
#: sizes: on the 180.5M-edge scaling graph (2 supersteps) K=2 never
#: refreshes mid-run, the superstep-2 giant-component hub goes unsplit,
#: and one serialized WindowExec partition drags 8-core throughput
#: 3.81M→2.99M edges/s/superstep while the skipped census job flatters the
#: 2-core level (1.15M→1.24M) — N→4N efficiency 0.83→0.60, a double
#: distortion. The 240k-conv A/B that motivated K=2 (8.65s vs 9.19s) was
#: measuring the census job's fixed cost, which amortizes to noise exactly
#: where the missing refresh becomes catastrophic. Keep 1 unless supersteps
#: are short AND plentiful; the knob stays for experiments.
CENSUS_EVERY = 1


def connected_components(
    edges: DataFrame,
    algorithm: str = "two_phase",
    pointer_doubling: bool = True,
    max_iterations: int = 100,
    checkpoint=None,
    checkpoint_every: int = 1,
    materialize: str = "auto",
    opt_level: str = "stable_removed",
    auto_straggler_factor: float = AUTO_STRAGGLER_FACTOR,
    auto_min_hub_frac: float = AUTO_MIN_HUB_FRAC,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    hub_mode: str = "census",
    census_every: int = CENSUS_EVERY,
) -> CCResult:
    """Compute per-vertex component labels (= min vertex id in component).

    edges: DataFrame[src: long, dst: long]; self-loops ignored; orientation
    irrelevant (symmetrized internally). Matches the reference's outputs:
    exact component count and per-vertex membership
    (/root/reference/src/coloring/labelProp.hpp:122-139 component count;
    BASELINE.json exact-membership rule).

    ``materialize`` picks the two_phase superstep's physical strategy —
    every choice computes identical labels:

    * ``"auto"`` (default): one degree-census aggregate over the input
      decides ``window`` vs ``salted`` from the measured hub fraction AND
      the execution width: salted iff the broadcast join-back fits
      (``broadcast_max_rows``) and hub_frac >= max(``auto_min_hub_frac``,
      ``auto_straggler_factor`` / defaultParallelism) — the same
      statistics-driven strategy selection the reference applies with its
      power-law fit (degreeDistInfo.hpp:167-194), aimed at the physical
      plan instead of the algorithm. See AUTO_STRAGGLER_FACTOR for the
      measured calibration.
    * ``"window"``: single-job round, grouped min as a window aggregate;
      fastest on uniform-degree graphs, serializes on dominant hubs.
    * ``"salted"``: skew-oblivious two-phase minima (map-side combine) +
      size-gated broadcast/AQE join-back; no hash(src) placement of the
      edge table anywhere.
    * ``"salted_fused"``: both noskew phases in ONE linear plan with
      broadcast-subquery min tables (requires the gate open; falls back to
      salted). Measured: the per-superstep |V|-row broadcasts serialize —
      keep for genuinely small min tables only.
    * ``"persist"`` / ``"local_checkpoint"``: join-based rounds with fused
      lazy / eager per-phase checkpoints (conservative baselines).

    ``hub_mode`` controls the window round's degree-based edge splitting
    (straggler src groups bypass the hash(src) window for a combined
    aggregate + tiny broadcast join-back — see _packed_group_min):

    * ``"census"`` (default): hub list seeds from the run-start degree
      census and refreshes every ``census_every`` supersteps with a
      one-aggregate dst-frequency census over the new working set (hub
      drift: the giant component's min vertex becomes the late-round
      straggler; measured 15s single-task stages without the refresh).
    * ``"static"``: run-start hubs for the whole run (no per-round job).
    * ``"off"``: plain window round (pre-split behavior).

    ``census_every`` amortizes the refresh job (see CENSUS_EVERY for the
    staleness-cost argument); 1 restores the refresh-every-superstep
    behavior. Labels are identical for any value — the hub list only
    steers the physical split.
    """
    if algorithm not in ("two_phase", "min_label", "local_contract"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if materialize not in (
        "auto", "window", "salted", "salted_fused", "persist", "local_checkpoint"
    ):
        raise ValueError(f"unknown materialize strategy {materialize!r}")
    if hub_mode not in ("census", "static", "off"):
        raise ValueError(f"unknown hub_mode {hub_mode!r}")
    if census_every < 1:
        raise ValueError(f"census_every must be >= 1, got {census_every}")
    if checkpoint is not None and getattr(checkpoint, "identity", None) is None:
        # Identity-stamp the checkpoint so a rerun with the same dir but a
        # different algorithm (different working-set schema) or a different
        # input graph fails loudly instead of silently resuming foreign
        # state. One extra aggregate job, only on checkpointed runs.
        cnt, s = _checksum(_canonical(edges))
        schema = {
            "two_phase": "src:long,dst:long",
            "min_label": "v:long,label:long",
            "local_contract": "src:long,dst:long",
        }[algorithm]
        checkpoint.bind_identity(
            {
                "algorithm": algorithm,
                "working_set_schema": schema,
                "input_edges": cnt,
                "input_checksum": str(s),
            }
        )
    if algorithm == "two_phase":
        return _cc_two_phase(
            edges, max_iterations, checkpoint, checkpoint_every, materialize,
            auto_straggler_factor, auto_min_hub_frac, broadcast_max_rows,
            hub_mode, census_every,
        )
    if algorithm == "min_label":
        return _cc_min_label(
            edges, pointer_doubling, max_iterations, checkpoint, checkpoint_every,
            opt_level,
        )
    from parconnect_spark.plans.csr import local_contract_cc

    return local_contract_cc(edges, max_iterations, checkpoint, checkpoint_every)


def _resume(checkpoint, default_df: DataFrame) -> tuple[int, DataFrame]:
    if checkpoint is None:
        return 0, default_df
    step, df = checkpoint.latest()
    if step is None:
        return 0, default_df
    return step, df


#: hub-split threshold: a src group is split out of the window round when
#: its symmetric degree exceeds total_rows / (margin × execution width) — a
#: group that would occupy one core for ≥1/margin of the stage's ideal
#: parallel wall-clock is a straggler. 4 ⇒ split anything above 25%.
HUB_SPLIT_MARGIN = 4

#: never split groups smaller than this (WindowExec buffers up to 4096 rows
#: in memory before spilling — below it the window path has no cliff), and
#: never carry more than HUB_SPLIT_MAX_HUBS ids as plan literals (a graph
#: with thousands of simultaneous stragglers belongs to the salted path).
HUB_SPLIT_MIN_ROWS = 4096
HUB_SPLIT_MAX_HUBS = 256


def _hub_threshold(tot: int, width: int) -> int:
    return max(tot // (HUB_SPLIT_MARGIN * max(width, 1)), HUB_SPLIT_MIN_ROWS)


def _degree_census(canon: DataFrame, width: int = 0) -> tuple[int, int, int, list]:
    """(max degree, total rows, distinct vertices, hub ids) over the
    symmetrized view of a canonical edge set. The Spark-side analogue of the
    reference's degree-distribution decision input
    (degreeDistInfo.hpp:92-166): the three scalars drive the physical-
    strategy choice, and the hub id list (symmetric degree above
    ``_hub_threshold``) seeds the window round's degree-based edge
    splitting. Two jobs, the second over the cached per-vertex counts."""
    rev = canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    g = (
        canon.unionByName(rev)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("_c"))
        .persist()
    )
    row = g.agg(
        F.max("_c").alias("mx"),
        F.sum("_c").alias("tot"),
        F.count(F.lit(1)).alias("nv"),
    ).collect()[0]
    mx, tot, nv = int(row["mx"] or 0), int(row["tot"] or 0), int(row["nv"] or 0)
    hubs: list = []
    if width > 0 and mx > _hub_threshold(tot, width):
        hubs = [
            int(r["src"])
            for r in g.where(F.col("_c") > _hub_threshold(tot, width))
            .orderBy(F.desc("_c"))
            .limit(HUB_SPLIT_MAX_HUBS)
            .collect()
        ]
    g.unpersist()
    return mx, tot, nv, hubs


def _start_census(
    canon_all: DataFrame, width: int
) -> tuple[int, int, int, list, bool, DataFrame | None]:
    """Run-start census over the LAZILY-checkpointed canonical set (self-loop
    rows retained as (v, v)): ONE full-pass job materializes the checkpoint
    blocks and computes everything the old three-job preamble (eager
    checkpoint pass + _degree_census + _ids_fit_packed) collected
    separately — measured 2-core cost on the 180.5M-edge scaling graph was
    ~5 min of run wall outside the superstep loop, most of it these
    redundant passes plus the eager vertex-table distinct this census now
    also makes unnecessary:

    * per-vertex symmetric degree over non-self rows (max degree, total
      symmetric rows, distinct active vertices, hub ids — the strategy
      inputs of _degree_census, bit-identical);
    * the packed-id bounds check (min/max over every vertex id, self-loop
      vertices included — conservative and exact);
    * the self-loop-only vertex set (vertices whose every edge is a
      self-loop): the one set the final star-forest label extraction cannot
      see, counted here in the same aggregate so the common no-self-loop
      case costs zero extra jobs.

    Returns (mx, tot, nv, hubs, ids_packed, selfloop_only) where
    selfloop_only is None when no such vertex exists (the common case) and
    otherwise an eagerly-checkpointed DataFrame[v] collected while the
    grouped counts are still cached."""
    is_self = F.col("src") == F.col("dst")
    g = (
        canon_all.select(
            F.explode(F.array("src", "dst")).alias("v"), is_self.alias("_sl")
        )
        .groupBy("v")
        .agg(
            F.count_if(~F.col("_sl")).alias("_c"),
            F.max(F.col("_sl")).alias("_any_sl"),
        )
        .persist()
    )
    row = g.agg(
        F.max("_c").alias("mx"),
        F.sum("_c").alias("tot"),
        F.count_if(F.col("_c") > 0).alias("nv"),
        F.min("v").alias("mn_id"),
        F.max("v").alias("mx_id"),
        F.count_if((F.col("_c") == 0) & F.col("_any_sl")).alias("n_sl_only"),
    ).collect()[0]
    mx, tot, nv = int(row["mx"] or 0), int(row["tot"] or 0), int(row["nv"] or 0)
    ids_packed = row["mn_id"] is None or (
        int(row["mn_id"]) >= 0 and int(row["mx_id"]) < (1 << 31)
    )
    hubs: list = []
    if width > 0 and mx > _hub_threshold(tot, width):
        hubs = [
            int(r["v"])
            for r in g.where(F.col("_c") > _hub_threshold(tot, width))
            .orderBy(F.desc("_c"))
            .limit(HUB_SPLIT_MAX_HUBS)
            .collect()
        ]
    sl_only = None
    if int(row["n_sl_only"] or 0) > 0:
        # eager: materialize the (small) rescue set while g is still cached;
        # a lazy plan here would recompute g's whole lineage after unpersist
        sl_only = (
            g.where((F.col("_c") == 0) & F.col("_any_sl"))
            .select("v")
            .localCheckpoint()
        )
    g.unpersist()
    return mx, tot, nv, hubs, ids_packed, sl_only


def _sampled_hubs(edges: DataFrame, width: int, tot: int) -> list:
    """Run-start hub seeds from a DETERMINISTIC 1% pseudo-sample of the raw
    input (xxhash64(src,dst) % 100 == 0 — no rand(), so retries resample
    identically). A hub must carry > tot/(HUB_SPLIT_MARGIN·width) of the
    symmetric rows to matter (12.5%+ at width 2, ~3% at width 8) — a 1.8M-
    row sample cannot miss one; a borderline hub flipping in or out only
    changes the physical split, never a label, and the superstep-1 fused
    census refreshes the list exactly. Used only on the explicit-"window"
    fast preamble, where the full exact census would be the single most
    expensive remaining run-start job."""
    thr = _hub_threshold(tot, width)
    rate = 100
    sample = edges.where(F.pmod(F.xxhash64("src", "dst"), F.lit(rate)) == 0)
    g = (
        sample.select(F.explode(F.array("src", "dst")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # Factor 2: this engine's edge tables carry BOTH orientations of every
    # undirected edge, so per-endpoint appearances in the raw table are 2x
    # the canonical symmetric degree the exact census thresholds on —
    # without the halving the test admits every vertex above thr/2, and the
    # borderline hubs it drags in measurably SLOW the round (8-core A/B on
    # the 180.5M-edge graph: 7 hubs -> superstep loop 100s vs 4 hubs ->
    # 81s; splitting a group that is not a straggler pays the hot/cold
    # split overhead for nothing). For a one-orientation input the halving
    # is merely 2x conservative — a missed borderline hub degrades to the
    # pre-split window behavior, and the superstep-1 exact refresh
    # corrects it a round later.
    return [
        int(r["v"])
        for r in g.where(F.col("_c") * rate > 2 * thr)
        .orderBy(F.desc("_c"))
        .limit(HUB_SPLIT_MAX_HUBS)
        .collect()
    ]


def _checksum_with_dst_census(
    nxt: DataFrame, width: int, prev_hubs: list
) -> tuple[int, int, list]:
    """The convergence checksum and the next round's hub-census refresh in
    ONE pass over the just-materialized working set (replacing the former
    _checksum + _dst_census pair, which scanned it twice per superstep):
    the per-dst grouped aggregate delivers both the global (count,
    hash-sum) fingerprint — as sums of the per-group partials,
    bit-identical to _checksum's — and the dst-frequency hub refresh. The
    grouped table is |V'|-sized, so the follow-up scalar aggregate and the
    hub filter are near-free jobs over its cached blocks.

    Why dst only: after a two_phase round the working set is (v, m) star
    rows, so next round's straggler groups are the component minima — which
    appear as the DST of nearly every row of their star, while src
    multiplicities stay O(1). A vertex hub on the src side only happens in
    the INPUT graph, which the run-start census already covered. Missing a
    borderline hub degrades to the pre-split behavior, never to a wrong
    answer. The fresh list is unioned with the previous one (stale entries
    are harmless ≤HUB_SPLIT_MAX_HUBS literals; vanished hubs match
    nothing) so a hub persisting across rounds is never dropped mid-run.

    Margin note: the threshold is calibrated on the UNSYMMETRIZED
    working-set row count (the checksum's cnt), while the run-start census
    calibrated on the symmetrized total (2x rows) — so refresh thresholds
    deliberately run at HALF the stated 25% margin. That bias is the right
    direction for a refresh: its whole job is catching the newly-emerged
    straggler (the giant component's min vertex — measured 15s single-task
    stages when missed), an un-split borderline hub costs a serialized
    window partition, and an over-split one costs only a
    ≤HUB_SPLIT_MAX_HUBS-row broadcast join-back."""
    grouped = (
        nxt.groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(20,0)")).alias("_s"),
        )
        .persist()
    )
    row = grouped.agg(F.sum("_c").alias("cnt"), F.sum("_s").alias("s")).collect()[0]
    cnt, s = int(row["cnt"] or 0), int(row["s"] or 0)
    thr = _hub_threshold(cnt, width)
    fresh = [
        int(r["dst"])
        for r in grouped.where(F.col("_c") > thr)
        .orderBy(F.desc("_c"))
        .limit(HUB_SPLIT_MAX_HUBS)
        .collect()
    ]
    grouped.unpersist(blocking=False)
    merged = fresh + [h for h in prev_hubs if h not in fresh]
    return cnt, s, merged[:HUB_SPLIT_MAX_HUBS]



def _execution_width(spark) -> int:
    """Concurrent task slots — the width the straggler crossover cares
    about. defaultParallelism is unreliable here (session.py pins
    spark.default.parallelism to the shuffle-partition count, so on a
    1000-core cluster built via get_spark it would read 32 and the auto
    rule would under-salt hubs by ~30x), so: local masters are parsed
    directly; cluster masters are sized from the submit conf
    (executor.instances × executor.cores) or, under dynamic allocation,
    from the live executor registry; the pinned defaultParallelism is only
    the last-resort fallback."""
    import os

    master = spark.sparkContext.master
    if master == "local":  # bare 'local' = exactly one task slot
        return 1
    if master.startswith("local[") and master.endswith("]"):
        inner = master[len("local["):-1].split(",")[0]
        if inner == "*":
            return os.cpu_count() or 1
        try:
            return max(int(inner), 1)
        except ValueError:
            pass

    def _conf_int(key: str) -> int:
        try:
            return int(spark.conf.get(key))
        except Exception:
            return 0

    cores = _conf_int("spark.executor.cores")
    instances = _conf_int("spark.executor.instances")
    if instances > 0 and cores > 0:
        return instances * cores
    if cores > 0:
        # dynamic allocation: count live executors (block-manager registry
        # minus the driver's own entry)
        try:
            n_exec = (
                spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
            )
            if n_exec > 0:
                return n_exec * cores
        except Exception:
            pass
    return max(int(spark.sparkContext.defaultParallelism), 1)


def _ids_fit_packed(canon: DataFrame) -> bool:
    """True iff every vertex id fits an unsigned 31-bit value, making the
    packed (src<<32 | dst) single-long edge representation exact."""
    row = canon.agg(
        F.max(F.greatest("src", "dst")).alias("mx"),
        F.min(F.least("src", "dst")).alias("mn"),
    ).collect()[0]
    if row["mx"] is None:
        return True
    return int(row["mn"]) >= 0 and int(row["mx"]) < (1 << 31)


def _prescan_packed_bounds(edges: DataFrame) -> bool | None:
    """True/False when the packed-id bounds (0 <= id < 2^31) can be decided
    METADATA-ONLY — the input is a bare parquet relation whose src/dst
    row-group statistics bound every id (driver-side footer read, no Spark
    job) — None when they cannot (non-parquet or transformed input:
    deciding would cost a full scan, so the caller keeps the unpacked
    canonical and learns the bounds from the census as before). Knowing the
    bounds BEFORE the canonical distinct lets that first full shuffle carry
    one packed long per row instead of a two-long pair (−33% exchange
    volume) and the checkpoint cache store 8-byte rows."""
    # Only 64-bit integer columns: the packed representation shifts src by
    # 32, which is exact on LongType and silently degenerate on narrower
    # types (Java's int<<32 masks the shift to 0), and footer stats of
    # non-integer physical types are not comparable bounds at all.
    if dict(edges.dtypes).get("src") != "bigint" or dict(edges.dtypes).get(
        "dst"
    ) != "bigint":
        return None
    try:
        analyzed = edges._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None
    # Exactly a bare parquet relation with src/dst as stored columns — any
    # Project/Filter/renaming on top and the file statistics may not be the
    # statistics of THESE values, so bail to the census-derived bounds.
    first = analyzed.strip().splitlines()[0]
    if not (first.startswith("Relation") and " parquet" in first):
        return None
    if "src#" not in first or "dst#" not in first:
        return None
    files = edges.inputFiles()
    if not files:
        return None
    try:
        import pyarrow.parquet as pq

        lo, hi = None, None
        for f in files:
            path = f[len("file:"):] if f.startswith("file:") else f
            md = pq.ParquetFile(path).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if "src" not in idx or "dst" not in idx:
                return None
            for rg in range(md.num_row_groups):
                for col in ("src", "dst"):
                    c = md.row_group(rg).column(idx[col])
                    if c.physical_type != "INT64":
                        return None
                    st = c.statistics
                    if st is None or not st.has_min_max:
                        return None
                    lo = st.min if lo is None else min(lo, int(st.min))
                    hi = st.max if hi is None else max(hi, int(st.max))
        if lo is None:
            return True
        return int(lo) >= 0 and int(hi) < (1 << 31)
    except Exception:
        return None


def _cc_two_phase(
    edges: DataFrame,
    max_iterations: int,
    checkpoint,
    checkpoint_every: int,
    materialize: str = "auto",
    auto_straggler_factor: float = AUTO_STRAGGLER_FACTOR,
    auto_min_hub_frac: float = AUTO_MIN_HUB_FRAC,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    hub_mode: str = "census",
    census_every: int = CENSUS_EVERY,
) -> CCResult:
    import os as _os
    import sys as _sys

    # opt-in phase timestamps on stderr (enter / preamble done / loop done)
    # for wall-budget audits of the scaling bench — see OPTIMIZATION_r06.md
    _phase_debug = _os.environ.get("SPARK_GRAFT_CC_PHASE_DEBUG") == "1"
    if _phase_debug:
        print(f"[cc-phase] enter t={time.monotonic():.3f}", file=_sys.stderr)

    parts = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    census_strategy = materialize in ("auto", "window", "salted", "salted_fused")

    # Canonical working set. On the census strategies (every default path)
    # self-loops are RETAINED through the distinct as (v, v) rows and
    # filtered out of the iterated view afterwards: the run-start census can
    # then see self-loop-only vertices without a second pass over the input,
    # which is what lets the final label extraction skip the old eager
    # vertex-table distinct (a full shuffle over 2|E| pair rows — measured
    # the single most expensive fixed job of a scaling-bench run).
    canon_all = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    start_step, resumed_df = _resume(checkpoint, None)
    resumed = resumed_df is not None
    sl_only = None
    pre_packed = None
    if not resumed and census_strategy:
        # metadata-only when the input is a parquet scan (see the probe);
        # None = undecidable cheaply, keep the two-long canonical.
        pre_packed = _prescan_packed_bounds(edges)
    if resumed:
        # resumed working sets carry no self-loop information; the label
        # extraction below falls back to the vertex-join path.
        work = resumed_df.localCheckpoint()
    elif census_strategy:
        # LAZY checkpoint: the single-consumer census job below materializes
        # the distinct's blocks and computes the whole preamble in one pass.
        if pre_packed:
            # ids proven < 2^31 before the first shuffle: the canonical
            # distinct dedups a single packed long per row (16-byte unsafe
            # rows instead of 24) and the checkpoint caches 8-byte values.
            packed_all = (
                edges.select(
                    (
                        F.shiftleft(F.greatest("src", "dst"), 32)
                        + F.least("src", "dst")
                    ).alias("e")
                )
                .dropDuplicates(["e"])
                .localCheckpoint(eager=False)
            )
            work_all = packed_all.select(
                F.shiftright("e", 32).alias("src"),
                F.col("e").bitwiseAND(F.lit(_PACK_MASK)).alias("dst"),
            )
        else:
            work_all = canon_all.localCheckpoint(eager=False)
        work = work_all.where(F.col("src") != F.col("dst"))
    else:
        # join-based strategies consume the working set in multiple branches
        # with no census job in between — keep the eager checkpoint so the
        # distinct is not recomputed per branch.
        work = canon_all.where(F.col("src") != F.col("dst")).localCheckpoint()

    # Strategy resolution (once per run, on the working set actually being
    # iterated). The window/salted choice is a heuristic on the
    # INPUT degree distribution, not an invariant of every superstep:
    # two_phase convergence drives each component toward a star on its min
    # vertex, so LATE supersteps are maximally hub-skewed by construction —
    # but by then the working set has contracted to ~|V'| rows, so the
    # window round's serialized hub group is small in absolute terms. The
    # broadcast gate needs no re-check at all: its quantity (|V'| = the
    # min-table rows) is a run INVARIANT — see the proof note at the bottom
    # of the loop — so the round-0 census decides it exactly, for good.
    strategy = materialize
    broadcast_mins = True
    width = _execution_width(edges.sparkSession)
    hubs: list = []
    ids_packed = True
    if census_strategy:
        if resumed:
            mx, tot, nv, hubs = _degree_census(work, width)
            ids_packed = _ids_fit_packed(work)
        elif materialize == "window" and pre_packed is not None:
            # FAST PREAMBLE for the explicit window strategy over a parquet
            # relation: the window round never reads nv/mx/tot (no
            # broadcast gate, no auto decision), so the only exact
            # quantities needed are the working-set count (hub threshold
            # calibration + self-loop detection, from ONE scalar aggregate
            # that doubles as the lazy checkpoint's materializer) and the
            # packed bounds (already footer-proven). Hub seeds come from a
            # deterministic 1% sample; per-superstep refreshes stay exact.
            # Inputs that DO contain self-loops fall back to the exact
            # census for the rescue set (rare; one extra pass).
            ids_packed = pre_packed
            mx = tot = nv = 0
            row = work_all.agg(
                F.count(F.lit(1)).alias("cnt"),
                F.count_if(F.col("src") == F.col("dst")).alias("n_self"),
            ).collect()[0]
            n_self = int(row["n_self"] or 0)
            tot = 2 * (int(row["cnt"] or 0) - n_self)
            if n_self > 0:
                mx, tot, nv, hubs, _ip, sl_only = _start_census(
                    work_all, width
                )
            elif width > 0:
                hubs = _sampled_hubs(edges, width, tot)
        else:
            mx, tot, nv, hubs, ids_packed, sl_only = _start_census(
                work_all, width
            )
        broadcast_mins = nv <= broadcast_max_rows
        if materialize == "auto":
            hub_frac = (mx / tot) if tot else 0.0
            # Width-aware crossover (see AUTO_STRAGGLER_FACTOR): salted
            # only pays when the window's hub straggler would cap more
            # concurrent width than salted's constant overhead costs, and
            # only with the broadcast join-back available (the gate-shut
            # salted round measured ~2x slower than window everywhere).
            threshold = max(auto_min_hub_frac, auto_straggler_factor / width)
            strategy = (
                "salted"
                if (broadcast_mins and hub_frac >= threshold)
                else "window"
            )
    if strategy == "salted_fused" and not broadcast_mins:
        # the fused round's join-backs are broadcast by construction; above
        # the gate fall back to the checkpointed salted path (AQE join-back)
        strategy = "salted"
    packed = strategy in ("window", "salted", "salted_fused") and ids_packed

    if _phase_debug:
        print(
            f"[cc-phase] preamble done strategy={strategy} packed={packed} "
            f"hubs={len(hubs)} t={time.monotonic():.3f}",
            file=_sys.stderr,
        )

    metrics: list = []
    prev = None
    it = start_step
    converged = False
    hubs_used = 0
    since_census = 0  # supersteps since the last hub-census refresh
    census_ran = False
    io_tel = IoTelemetry(edges.sparkSession)
    while it < max_iterations:
        t0 = time.monotonic()
        # The phase boundary must materialize BEFORE small-star consumes its
        # input in three branches (grouped min, rewire join, self-arcs):
        # Spark neither reuses user-specified repartition exchanges across
        # branches nor shares an unmaterialized cache between concurrently
        # scheduled stages of one job — without the cut the whole large-star
        # phase runs up to 3×.
        if strategy == "salted":
            # Skew-proof path, 2 jobs/superstep: map-side-combined minima
            # (two-phase aggregation) + runtime-chosen join-back; no
            # full-size hash(src) shuffle anywhere (hub groups would
            # serialize it — see _large_star_noskew). ls feeds small-star
            # twice → lazily checkpointed, count() materializes.
            ls = _large_star_noskew(work, broadcast_mins).localCheckpoint(
                eager=False
            )
            ls.count()
            nxt = _small_star_noskew(
                ls, parts, broadcast_mins, packed
            ).localCheckpoint(eager=False)
            cnt, s = _checksum(nxt)
        elif strategy == "salted_fused":
            # Skew-proof AND single-job: both phases in one linear plan,
            # min tables as broadcast subqueries, the lazy checkpoint
            # materialized by the convergence checksum. Only balanced
            # exchanges (two combined min aggs + whole-edge dedup).
            nxt = _two_phase_round_salted_fused(work, packed).localCheckpoint(
                eager=False
            )
            cnt, s = _checksum(nxt)
        elif strategy == "window" and hub_mode == "off":
            round_fn = (
                _two_phase_round_window_packed if packed
                else _two_phase_round_window
            )
            nxt = round_fn(work, parts).localCheckpoint(eager=False)
            cnt, s = _checksum(nxt)
        elif strategy == "window":
            # Fastest path, 1 main job/superstep: the whole round is a
            # single linear plan (window-aggregate phases, single-consumer
            # intermediates), lazily checkpointed so the convergence
            # checksum materializes it and truncates lineage in one action.
            # Packed variant (ids < 2^31) shuffles single-long edge rows —
            # a third less exchange volume per superstep. Hub src groups
            # (from the census, refreshed each superstep by the checksum
            # census below) are split out of both windows into combined
            # aggregates + tiny broadcast join-backs — degree-based edge
            # splitting, so no task ever buffers a hub group.
            round_fn = (
                _two_phase_round_window_packed if packed
                else _two_phase_round_window
            )
            round_caches: list = []
            hubs_used = len(hubs)
            nxt = round_fn(work, parts, hubs, round_caches).localCheckpoint(
                eager=False
            )
            since_census += 1
            census_ran = hub_mode == "census" and since_census >= census_every
            if census_ran:
                # convergence checksum + hub-list refresh fused into one
                # pass over the new working set (hub drift: the giant
                # component's min vertex becomes the next round's straggler
                # group — measured 15s single-task stages when the static
                # list misses it); "static" keeps run-start hubs. Every
                # census_every supersteps only: see CENSUS_EVERY.
                cnt, s, hubs = _checksum_with_dst_census(nxt, width, hubs)
                since_census = 0
            else:
                cnt, s = _checksum(nxt)
            for c in round_caches:
                c.unpersist(blocking=False)
        elif strategy == "persist":
            # Fused path, 2 jobs/superstep: LAZY localCheckpoint truncates
            # the logical plan immediately (no nested-cache plan blowup),
            # while the actual block materialization rides existing jobs —
            # (1) count() materializes large-star before its three
            # consumers; (2) the convergence checksum doubles as the
            # small-star materializer. vs the eager path's 3 jobs (two
            # checkpoint copies + the checksum pass).
            ls = _large_star_canonical(work, parts).localCheckpoint(eager=False)
            ls.count()
            nxt = _small_star_canonical(ls, parts).localCheckpoint(eager=False)
            cnt, s = _checksum(nxt)
        else:  # "local_checkpoint": the conservative 3-jobs/superstep path
            ls = _large_star_canonical(work, parts).localCheckpoint()
            nxt = _small_star_canonical(ls, parts).localCheckpoint()
            cnt, s = _checksum(nxt)
        dt = time.monotonic() - t0
        it += 1
        m = {
            "superstep": it,
            "algorithm": "two_phase",
            "strategy": strategy,
            "packed": packed,
            "broadcast_mins": broadcast_mins,
            "edges": cnt,
            "checksum": s,
            "hubs_split": hubs_used if strategy == "window" else 0,
            "census_ran": census_ran if strategy == "window" else False,
            "seconds": dt,
        }
        # per-superstep shuffle volume (delta of session-cumulative totals;
        # the frontier/shuffle half of the telemetry rule)
        io_tel.record(m)
        metrics.append(m)
        # No per-round broadcast-gate re-check — it is PROVABLY dead code,
        # not an omission (NOTES.md round-4): the gated quantity is the
        # min-table row count = |V'| of the working set, and every vertex of
        # the input persists in the two_phase working set forever (non-roots
        # as star members (v, m), roots as those stars' dst — verified
        # empirically: nv exactly constant across all rounds on chain/star/
        # transcript graphs). The round-0 census is therefore exact for the
        # life of the run. Any cheap per-round witness is weaker: nv ≤ 2|E'|
        # always, so "2·cnt ≤ gate" firing would imply the round-0 gate was
        # already open. Revisit only if an active/stable working-set split
        # (reference opt P4) lands for two_phase — THAT would shrink |V'|.
        if checkpoint is not None and it % checkpoint_every == 0:
            nxt = checkpoint.save(it, nxt, m)
        if prev == (cnt, s):
            work = nxt
            converged = True
            break
        prev = (cnt, s)
        work = nxt

    if _phase_debug:
        print(f"[cc-phase] loop done t={time.monotonic():.3f}", file=_sys.stderr)

    # work is now a canonical star forest (v, component-min); roots are
    # vertices never appearing on the big side.
    star = work.groupBy("src").agg(F.min("dst").alias("_m"))
    if converged and census_strategy and not resumed:
        # At a FIXPOINT the star forest is exact: every non-root vertex is
        # one src row, every root (= component min) appears only as a dst,
        # and the two sets are disjoint (a min with an edge to something
        # smaller would not be a min). Labels therefore come straight off
        # the final |V'|-row working set — star rows for non-roots, the
        # distinct label set for roots, plus the census's self-loop-only
        # rescue — with no pass over the input at all (the old path paid a
        # full 2|E|-row vertex-table distinct plus a |V|-row join here).
        labels = star.select(F.col("src").alias("v"), F.col("_m").alias("label"))
        roots = (
            star.select(F.col("_m").alias("v"))
            .distinct()
            .select("v", F.col("v").alias("label"))
        )
        labels = labels.unionByName(roots)
        if sl_only is not None:
            labels = labels.unionByName(
                sl_only.select("v", F.col("v").alias("label"))
            )
    else:
        # Non-converged (max_iterations hit), resumed, or join-strategy
        # runs: the disjointness argument above does not apply — fall back
        # to the conservative vertex-table join (one distinct over the
        # input's endpoint columns; cheaper than the old pair-distinct but
        # semantically identical).
        verts = (
            edges.select(F.col("src").alias("v"))
            .unionByName(edges.select(F.col("dst").alias("v")))
            .distinct()
        )
        star2 = star.select(F.col("src").alias("v"), F.col("_m").alias("label"))
        labels = (
            verts.join(star2, "v", "left")
            .select("v", F.coalesce("label", "v").alias("label"))
        )
    return CCResult(labels=labels, iterations=it, metrics=metrics)


def _cc_min_label(
    edges: DataFrame,
    pointer_doubling: bool,
    max_iterations: int,
    checkpoint,
    checkpoint_every: int,
    opt_level: str = "stable_removed",
) -> CCResult:
    """Min-label propagation with pointer doubling, as a DELTA iteration.

    ``opt_level`` mirrors the reference's lever (labelProp.hpp:56-72):

    * ``"stable_removed"`` (default, = opt_level::stable_partition_removed):
      only vertices whose label changed last superstep can lower a
      neighbor's label next superstep (min-propagation is monotone), so the
      message join runs over the changed frontier instead of the full label
      table — stable tuples leave the active range; here stable vertices
      leave the message side, while staying joinable as targets.
    * ``"naive"`` (= opt_level::naive): every vertex messages every
      superstep — the reference's baseline mode, kept for A/B measurement
      of the working-set optimization (identical fixpoint, more work)."""
    if opt_level not in ("naive", "stable_removed"):
        raise ValueError(f"unknown opt_level {opt_level!r}")
    sym = _both_orientations(edges).persist()
    labels = vertex_table(sym).select("v", F.col("v").alias("label"))
    start_step, labels = _resume(checkpoint, labels)
    labels = labels.localCheckpoint()
    changed = labels  # superset on fresh start and on resume — always sound
    metrics: list = []
    it = start_step
    io_tel = IoTelemetry(edges.sparkSession)
    while it < max_iterations:
        t0 = time.monotonic()
        # updatePn/updatePc (labelProp.hpp:358-521): neighborhood min —
        # messages from the changed frontier (stable_removed) or from every
        # vertex (naive, the reference's baseline for A/B).
        msg_side = labels if opt_level == "naive" else changed
        nbr = (
            sym.join(msg_side, sym["dst"] == msg_side["v"])
            .groupBy(F.col("src").alias("v2"))
            .agg(F.min("label").alias("_nmin"))
        )
        new = labels.join(nbr, labels["v"] == nbr["v2"], "left").select(
            "v",
            F.col("label").alias("_old"),
            F.least(F.col("label"), F.coalesce("_nmin", "label")).alias("label"),
        )
        if pointer_doubling:
            # doPointerDoubling (labelProp.hpp:523-629): label ← label(label).
            parent = new.select(
                F.col("v").alias("_pv"), F.col("label").alias("_plabel")
            )
            new = new.join(parent, new["label"] == parent["_pv"], "left").select(
                "v", "_old", F.coalesce("_plabel", "label").alias("label")
            )
        new = new.localCheckpoint()
        changed = new.where(F.col("label") < F.col("_old")).select("v", "label")
        n_changed = changed.count()
        dt = time.monotonic() - t0
        it += 1
        m = {
            "superstep": it,
            "algorithm": "min_label",
            "doubling": pointer_doubling,
            "active": n_changed,
            "seconds": dt,
        }
        io_tel.record(m)
        metrics.append(m)
        labels = new.select("v", "label")
        if checkpoint is not None and it % checkpoint_every == 0:
            labels = checkpoint.save(it, labels, m)
        # empty frontier ⇒ fixpoint (allreduce(min(converged)) equivalent,
        # labelProp.hpp:516-520).
        if n_changed == 0:
            break
    sym.unpersist()
    return CCResult(labels=labels, iterations=it, metrics=metrics)


def component_count(labels: DataFrame) -> int:
    """Exact distinct-label count (labelProp.hpp:122-139; exactness required
    by BASELINE.json — no approx_count_distinct here)."""
    return labels.agg(F.countDistinct("label").alias("n")).collect()[0]["n"]


def largest_component_size(labels: DataFrame) -> int:
    """labelProp.hpp:146-224 in one line (vertex count, not doubled-edge)."""
    row = (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.max("sz").alias("m"))
        .collect()[0]
    )
    return int(row["m"])


def incremental_cc(labels: DataFrame, delta_edges: DataFrame, **cc_kwargs) -> CCResult:
    """Update an existing component labeling with a batch of NEW edges
    without touching the old edge set — the ingest path a 100-TB corpus
    actually runs (daily edge deltas over a trillion-edge base graph that
    must not be rescanned).

    ``labels`` is a prior ``connected_components(...).labels``
    (DataFrame[v, label], label = min vertex id of the component);
    ``delta_edges`` is any [src, dst] batch (orientation irrelevant,
    self-loops ignored, vertices never seen before welcome).

    Correctness: the old labeling is a contraction certificate — every old
    component is represented by its min-id label, so reachability through
    old edges equals reachability through representatives. Mapping each
    delta endpoint to its representative (left join; unseen vertices
    represent themselves) yields a contracted delta graph with at most
    2·|delta| vertices REGARDLESS of |V| or |E|; min-label CC over it gives
    each touched representative its merged component's min id (each
    representative IS the min of its old members, so the min over merged
    representatives is the global min). Vertices whose representative the
    delta never touches fall through the final left join unchanged.
    Equals a full recompute on the edge union — the pytest and driver
    oracles assert exactly that.

    Physical shape: two label joins over the delta (AQE-planned), one CC
    run sized by the DELTA (not the graph), one left join to publish. No
    job touches the old edge table.
    """
    dv = delta_edges.select("src", "dst")
    ls = labels.select(F.col("v").alias("_sv"), F.col("label").alias("_sl"))
    ld = labels.select(F.col("v").alias("_dv"), F.col("label").alias("_dl"))
    contracted = (
        dv.join(ls, dv["src"] == F.col("_sv"), "left")
        .join(ld, dv["dst"] == F.col("_dv"), "left")
        .select(
            F.coalesce("_sl", "src").alias("src"),
            F.coalesce("_dl", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    # Base cover: old labels plus self-representatives for first-seen
    # vertices (anti join keeps the delta side small; the old table is
    # probed, not scanned twice).
    new_verts = (
        dv.select(F.col("src").alias("v"))
        .unionByName(dv.select(F.col("dst").alias("v")))
        .distinct()
        .join(labels.select("v"), "v", "left_anti")
        .select("v", F.col("v").alias("label"))
    )
    base = labels.select("v", "label").unionByName(new_verts)
    if contracted.limit(1).isEmpty():
        # every delta edge was a self-loop inside one old component —
        # nothing merges, but first-seen vertices still join the cover.
        return CCResult(labels=base, iterations=0, metrics=[])
    meta = connected_components(contracted, **cc_kwargs)
    mm = meta.labels.select(
        F.col("v").alias("_rep"), F.col("label").alias("_final")
    )
    out = base.join(mm, base["label"] == F.col("_rep"), "left").select(
        "v", F.coalesce("_final", "label").alias("label")
    )
    return CCResult(labels=out, iterations=meta.iterations, metrics=meta.metrics)
