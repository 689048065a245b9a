"""Transcripts → edge-table derivation (BASELINE.json north_rule / input_hint).

Input: the Iceberg-shaped transcripts table
    (conv_id: string, turn_idx: int, role: string, text: string,
     tool: string, ts: timestamp)

This plays the role the de Bruijn builder plays in the reference — domain
payload → edge table (/root/reference/src/graphGen/deBruijn/deBruijnGraphGen.hpp:52-142)
— but over conversation structure instead of k-mers.

Edge semantics (documented contract, deterministic):
  Entity of a turn   = ``t:<tool>`` when tool is non-null else ``r:<role>``.
  Conversation node  = ``c:<conv_id>``.
  E1 sequential edge = entity(turn i) — entity(turn i+1) for consecutive
                       turn_idx within a conv_id (stable turn ordering via
                       a window over (conv_id, turn_idx)).
  E2 membership edge = c:<conv_id> — entity(turn) for every turn.
Self-loops dropped, edges symmetrized (both directions — the reference's
bidirectionality invariant, /root/reference/src/graphGen/common/utils.hpp:61-101),
string entities dense-rank-relabeled to contiguous longs
(operators/relabel.py ≙ reduceIds.hpp:125-231).

Per-row invariant vs the reference (BASELINE.json:15): the derivation never
touches ``text``; ``verify_text_invariant`` proves byte-equality by joining
derived turn rows back on (conv_id, turn_idx).

Scale notes: the window is partitioned by conv_id — at 10^12 turns this is
the natural parallel unit; hub conversations with millions of turns stay in
one partition only for the lead() pass (linear scan), while the resulting
edges hash-shuffle freely. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from parconnect_spark.operators.relabel import relabel_edges


def turn_entity() -> F.Column:
    """Entity expression for one turn row."""
    return F.when(
        F.col("tool").isNotNull(), F.concat(F.lit("t:"), F.col("tool"))
    ).otherwise(F.concat(F.lit("r:"), F.col("role")))


def transcripts_to_entity_turns(transcripts: DataFrame) -> DataFrame:
    """Stably-ordered turns annotated with their entity and the next turn's.

    Returns DataFrame[conv_id, turn_idx, entity, next_entity, text].
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "text",
        turn_entity().alias("entity"),
    ).withColumn("next_entity", F.lead("entity").over(w))


def derive_string_edges(transcripts: DataFrame) -> DataFrame:
    """Distinct undirected string-keyed edges DataFrame[a, b] (a < b)."""
    turns = transcripts_to_entity_turns(transcripts)
    seq = turns.where(F.col("next_entity").isNotNull()).select(
        F.col("entity").alias("a"), F.col("next_entity").alias("b")
    )
    member = turns.select(
        F.concat(F.lit("c:"), F.col("conv_id")).alias("a"),
        F.col("entity").alias("b"),
    )
    both = seq.unionByName(member)
    return (
        both.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def derive_directed_string_edges(transcripts: DataFrame) -> DataFrame:
    """Distinct DIRECTED string-keyed edges DataFrame[a, b].

    Same pair sources as :func:`derive_string_edges` (E1 sequential,
    E2 membership) but keeping the natural direction — turn i → turn i+1,
    conversation → member entity — instead of least/greatest folding.
    This is the input shape for direction-sensitive link analysis
    (plans/hits.py); the reference's CC engine only ever symmetrizes, so
    this operator has no C++ counterpart.
    """
    turns = transcripts_to_entity_turns(transcripts)
    seq = turns.where(F.col("next_entity").isNotNull()).select(
        F.col("entity").alias("a"), F.col("next_entity").alias("b")
    )
    member = turns.select(
        F.concat(F.lit("c:"), F.col("conv_id")).alias("a"),
        F.col("entity").alias("b"),
    )
    return (
        seq.unionByName(member)
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def derive_weighted_directed_edges(transcripts: DataFrame) -> DataFrame:
    """DIRECTED co-occurrence-weighted edges DataFrame[a, b, weight].

    Same pair sources as :func:`derive_directed_string_edges` but keeping
    MULTIPLICITY as the edge weight — weight(a→b) = number of times entity
    a's turn was immediately followed by b's (E1) or member b took a turn
    in conversation a (E2). The natural input for weighted link analysis
    (weighted PageRank rank flow ∝ co-occurrence strength); one grouped
    count, no windows beyond the turn-ordering lead."""
    turns = transcripts_to_entity_turns(transcripts)
    seq = turns.where(F.col("next_entity").isNotNull()).select(
        F.col("entity").alias("a"), F.col("next_entity").alias("b")
    )
    member = turns.select(
        F.concat(F.lit("c:"), F.col("conv_id")).alias("a"),
        F.col("entity").alias("b"),
    )
    return (
        seq.unionByName(member)
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def derive_weighted_undirected_edges(transcripts: DataFrame) -> DataFrame:
    """UNDIRECTED co-occurrence-weighted edges DataFrame[a, b, weight]
    with ``a < b`` canonical.

    Same pair sources as :func:`derive_string_edges` but keeping
    MULTIPLICITY as the edge weight — both orientations of a pair fold
    into one canonical edge whose weight is the total co-occurrence count.
    The input shape for weighted undirected algorithms (plans/msf.py's
    Borůvka minimum spanning forest, where the ``(weight, a, b)`` total
    order makes the MSF unique). One grouped count, no windows beyond the
    turn-ordering lead."""
    turns = transcripts_to_entity_turns(transcripts)
    seq = turns.where(F.col("next_entity").isNotNull()).select(
        F.col("entity").alias("a"), F.col("next_entity").alias("b")
    )
    member = turns.select(
        F.concat(F.lit("c:"), F.col("conv_id")).alias("a"),
        F.col("entity").alias("b"),
    )
    return (
        seq.unionByName(member)
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def derive_windowed_string_edges(
    transcripts: DataFrame, granularity: str = "week"
) -> DataFrame:
    """Window-tagged undirected string edges — the hypertable-rollup
    variant of :func:`derive_string_edges` for temporal link analysis.

    Every TURN is bucketed by its own timestamp
    (``date_trunc(granularity, ts)``), and both endpoints of each derived
    edge carry that turn's window prefix ``<yyyy-mm-dd>|`` (a sequential
    edge belongs to its EARLIER turn's window; a membership edge to its
    turn's). Per-window graphs are therefore disjoint temporal snapshots —
    an entity active in k windows appears as k distinct vertices, and
    conversations spanning windows contribute to each — so a single
    connectivity/centrality run labels every window at once instead of a
    driver loop over windows. At 100-TB scale that is the difference
    between one shuffle keyed by (window, entity) and hundreds of
    sequential per-window jobs.

    Zero extra jobs vs the untagged derivation: the tag is a projection of
    the row's own ``ts``; the lead() window is unchanged.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = transcripts.select(
        "conv_id",
        "turn_idx",
        F.date_trunc(granularity, F.col("ts"))
        .cast("date")
        .cast("string")
        .alias("_w"),
        turn_entity().alias("entity"),
    ).withColumn("next_entity", F.lead("entity").over(w))

    def tag(col: F.Column) -> F.Column:
        return F.concat(F.col("_w"), F.lit("|"), col)

    seq = turns.where(F.col("next_entity").isNotNull()).select(
        tag(F.col("entity")).alias("a"), tag(F.col("next_entity")).alias("b")
    )
    member = turns.select(
        tag(F.concat(F.lit("c:"), F.col("conv_id"))).alias("a"),
        tag(F.col("entity")).alias("b"),
    )
    both = seq.unionByName(member)
    return (
        both.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def derive_edges(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full derivation: transcripts → (symmetric long edges, id_map).

    edges: DataFrame[src: long, dst: long], both directions present.
    id_map: DataFrame[name: string, id: long] for mapping labels back.
    """
    string_edges = derive_string_edges(transcripts)
    long_edges, id_map = relabel_edges(string_edges, "a", "b")
    # Both-orientation expansion WITHOUT symmetrize()'s dedup shuffle:
    # string_edges is distinct canonical (a < b, a != b) and relabel_edges
    # maps names injectively, so the forward and reverse long rows are
    # disjoint, self-loop-free and already unique — the union's distinct (a
    # full 2|E|-row exchange) is provably a no-op here. The expansion is ONE
    # explode pass instead of unionByName(select, select): the relabel join
    # tree executes once, not twice, and the two orientations of every edge
    # land ADJACENTLY in each output partition, so a downstream
    # canonicalizing dedup (connected components' first shuffle) collapses
    # them map-side and exchanges half the rows. Row SET and count are
    # identical to symmetrize(long_edges).
    sym = long_edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    return sym, id_map


def verify_text_invariant(transcripts: DataFrame) -> bool:
    """Per-turn text byte-equality under stable ordering (BASELINE.json:15).

    Runs the derivation's turn pass and joins back to the source on
    (conv_id, turn_idx); any row whose text differs (or fails to join)
    violates the invariant.
    """
    derived = transcripts_to_entity_turns(transcripts).select(
        "conv_id", "turn_idx", F.col("text").alias("derived_text")
    )
    joined = transcripts.join(derived, ["conv_id", "turn_idx"], "full_outer")
    bad = joined.where(
        F.col("text").isNull()
        | F.col("derived_text").isNull()
        | (F.col("text") != F.col("derived_text"))
    )
    return bad.limit(1).count() == 0


def conversation_features(transcripts: DataFrame) -> DataFrame:
    """Per-conversation feature vector straight off the input table
    (BASELINE.json input_hint shape) — the transcript-analytics rollup a
    conversation-data pipeline filters and samples on:

      n_turns, n_user / n_assistant / n_tool (tool turns counted by the
      ``tool`` column, the same precedence the entity derivation uses),
      n_distinct_tools, total_chars, avg_turn_chars (6dp),
      assistant_user_char_ratio (assistant chars / user chars, 6dp, NULL
      when no user chars), max_gap_seconds (longest wait between
      consecutive turns, whole seconds).

    One pass: a single groupBy with conditional aggregates; the only
    window is the per-conversation lag for the gap — bounded by turns
    per conversation. Returns one row per conv_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = tsu - F.lag(tsu).over(w)
    base = transcripts.withColumn("_gap", gap)
    is_tool = F.col("tool").isNotNull()
    user_chars = F.sum(
        F.when(~is_tool & (F.col("role") == "user"), F.length("text")).otherwise(0)
    )
    asst_chars = F.sum(
        F.when(~is_tool & (F.col("role") == "assistant"), F.length("text")).otherwise(
            0
        )
    )
    return base.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((~is_tool & (F.col("role") == "user")).cast("long")).alias("n_user"),
        F.sum((~is_tool & (F.col("role") == "assistant")).cast("long")).alias(
            "n_assistant"
        ),
        F.sum(is_tool.cast("long")).alias("n_tool"),
        F.countDistinct("tool").alias("n_distinct_tools"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.avg(F.length("text")), 6).alias("avg_turn_chars"),
        F.round(
            asst_chars / F.nullif(user_chars, F.lit(0)), 6
        ).alias("assistant_user_char_ratio"),
        (F.max("_gap") / F.lit(1_000_000)).cast("long").alias("max_gap_seconds"),
    )


def derive_temporal_edges(transcripts: DataFrame) -> DataFrame:
    """DIRECTED TIMED transition edges DataFrame[src, dst, t]: entity of
    turn i → entity of turn i+1, stamped with the SUCCESSOR turn's
    epoch-us timestamp (the moment the transition completes). Distinct
    (src, dst, t) triples, self-transitions dropped. The input shape for
    time-respecting graph analytics (plans/temporal.py) where an edge is
    traversable only at its timestamp — the temporal dimension the
    static derivations fold away."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ent = turn_entity()
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            ent.alias("src"),
            F.lead(ent).over(w).alias("dst"),
            F.lead(tsu).over(w).alias("t"),
        )
        .where(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select("src", "dst", "t")
        .distinct()
    )


def conversation_paths(transcripts: DataFrame, top_k: int = 20) -> DataFrame:
    """Top-k conversation FLOW PATTERNS: each conversation's full ordered
    entity sequence rendered as one path string
    ("r:user>r:assistant>t:search>..."), counted corpus-wide — the
    path-mining rollup that surfaces dominant interaction shapes and
    their frequencies.

    The collect_list is grouped BY CONVERSATION — bounded by turns per
    conversation (the one place collecting a list is safe; a per-entity
    or corpus-wide collect would be the hub mistake). sort_array on the
    (turn_idx, entity) structs makes the order deterministic regardless
    of partitioning; the path census is a map-side-combined count and
    the final top-k is a TakeOrdered, not a window. Ties break by path
    string. Returns (path, n_convs, n_turns)."""
    paths = (
        transcripts.select(
            "conv_id", F.struct("turn_idx", turn_entity().alias("e")).alias("s")
        )
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda x: x["e"]
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
    return (
        paths.groupBy("path", "n_turns")
        .agg(F.count(F.lit(1)).alias("n_convs"))
        .select("path", "n_convs", "n_turns")
        .orderBy(F.desc("n_convs"), "path")
        .limit(top_k)
    )


def transition_latency(transcripts: DataFrame) -> DataFrame:
    """Exact response-latency percentiles per entity transition: for
    every (a → b) consecutive-turn pair, the count plus the exact p50
    and p95 of the inter-turn gap in WHOLE SECONDS — the latency SLO
    readout per interaction edge ("how fast does the assistant follow
    the user", "how slow is the search tool").

    Exactness discipline = group_quantile_filter's: percentiles are
    rationals over integer second-resolution gaps, the rank window runs
    over the per-(pair, gap) COUNT table (bounded by distinct gap
    values, not turn count — the second quantization is what bounds the
    domain), and p_q = the smallest gap whose inclusive cumulative count
    reaches ceil(q·n) — no interpolation, bit-identical on any engine.

    Returns (a, b, n, p50_s, p95_s)."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ent = turn_entity()
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            ent.alias("b"),
            F.lag(ent).over(w).alias("a"),
            ((tsu - F.lag(tsu).over(w)) / F.lit(1_000_000))
            .cast("long")
            .alias("gap_s"),
        )
        .where(F.col("a").isNotNull())
        .select("a", "b", "gap_s")
    )
    cnt = gaps.groupBy("a", "b", "gap_s").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wp = Window.partitionBy("a", "b")
    wcum = (
        Window.partitionBy("a", "b")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = cnt.select(
        "a",
        "b",
        "gap_s",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wp).alias("_n"),
    )
    def pick(num: int, den: int) -> F.Column:
        return F.min(
            F.when(
                F.lit(den) * F.col("_cum") >= F.lit(num) * F.col("_n"),
                F.col("gap_s"),
            )
        )
    return ranked.groupBy("a", "b").agg(
        F.max("_n").alias("n"),
        pick(1, 2).alias("p50_s"),
        pick(19, 20).alias("p95_s"),
    )


def transition_entropy(transcripts: DataFrame) -> DataFrame:
    """Per-state conditional entropy of the entity transition chain —
    the conversation-predictability readout: H(next | a) = −Σ_b P(b|a)
    ln P(b|a). Low entropy = scripted flows, high = branching behavior;
    the distribution-level companion to markov_stationary's long-run
    mix. Transition census = one bounded per-conversation lag + one
    aggregate. Returns (entity, n_out, entropy) at 6dp."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ent = turn_entity()
    tr = (
        transcripts.select(
            F.lag(ent).over(w).alias("a"), ent.alias("b")
        )
        .where(F.col("a").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tr.groupBy("a").agg(F.sum("n").alias("_tot"))
    p = F.col("n") / F.col("_tot")
    return (
        tr.join(tot, "a")
        .groupBy("a", "_tot")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
        .select(
            F.col("a").alias("entity"),
            F.col("_tot").alias("n_out"),
            "entropy",
        )
    )
