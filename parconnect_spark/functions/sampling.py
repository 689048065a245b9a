"""Deterministic sampling operators for training-data pipelines.

A 100-TB corpus is never trained on wholesale: pipelines draw per-stratum
quotas (per language, per source domain, per quality bucket) with a
deterministic, reproducible rule — re-running the job, or running it on a
differently-partitioned copy of the data, must select the SAME rows. These
operators key every random choice off a portable md5-derived hash of the
row id (the same ``md5int`` family the dedup operators use), so a DuckDB
oracle can replicate the selection bit-for-bit.

Scale shape of ``stratified_sample``: the only full-data operations are a
map-side-combined per-stratum count (tiny result) and a hash-threshold
FILTER (pure map, no shuffle of the big table). The exact-quota rank runs
only on pre-filtered survivors — bounded at ~``oversample``·quota rows per
stratum regardless of corpus size — so the per-stratum window never sees a
giant stratum. No collect()s; the rates table is a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from parconnect_spark.functions.dedup import md5int

# md5int with the default 8 hex chars is uniform on [0, 2^32)
_HASH_SPAN = float(2**32)


def uniform_hash(col: F.Column) -> F.Column:
    """Deterministic uniform in [0, 1) from any column (cast to string —
    int ids stringify identically in Spark and DuckDB)."""
    return (md5int(col.cast("string")) / F.lit(_HASH_SPAN)).alias("u")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str = "doc_id",
    oversample: float = 4.0,
) -> DataFrame:
    """Exact per-stratum quota sample, deterministic and order-invariant.

    Selection rule: within each stratum, keep the ``quota`` rows with the
    smallest md5-derived uniform hash of ``id_col`` (ties broken by id).
    Equivalent to a seeded uniform draw, but reproducible across runs,
    partitionings, and engines.

    Two-phase plan: (1) per-stratum counts (one map-side-combined agg on a
    tiny key space), giving each stratum a prefilter threshold
    tau = min(1, oversample*quota/n) on the hash value; (2) the big table
    is FILTERED map-side to u < tau — at most ~oversample*quota expected
    survivors per stratum — and only the survivors enter the per-stratum
    rank window. The prefilter is part of the operator's definition (the
    oracle applies the same tau), so results are exact-by-construction;
    with the default oversample=4 the probability that a stratum with
    n >= quota yields fewer than quota survivors is negligible
    (Chernoff: < exp(-quota) for quota >= 10).

    Returns the sampled rows: all input columns plus ``sample_rank``
    (1..quota within the stratum).
    """
    u = uniform_hash(F.col(id_col))
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    rates = counts.select(
        strata_col,
        F.least(F.lit(1.0), F.lit(float(oversample * quota)) / F.col("_n")).alias(
            "_tau"
        ),
    )
    survivors = (
        df.withColumn("_u", u)
        .join(F.broadcast(rates), strata_col)
        .where(F.col("_u") < F.col("_tau"))
    )
    w = Window.partitionBy(strata_col).orderBy(F.col("_u").asc(), F.col(id_col).asc())
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= quota)
        .drop("_u", "_tau")
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    holdout_frac: float = 0.05,
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, holdout) split by salted id hash — the
    standard leakage-safe corpus split (a document lands on the same side
    on every run and every machine; duplicate ids land together). Returns
    (train_df, holdout_df). Pure map-side filters, no shuffle."""
    u = md5int(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) / F.lit(
        _HASH_SPAN
    )
    return (
        df.where(u >= F.lit(holdout_frac)),
        df.where(u < F.lit(holdout_frac)),
    )


def cluster_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    holdout_frac: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/holdout ASSIGNMENT: near-duplicate clusters land
    wholesale on one side.

    ``hash_split`` keeps equal ids together but lets two near-duplicate
    documents with different ids straddle the boundary — the classic
    train/test leakage mode. Here each document is assigned by the salted
    hash of its CLUSTER's canonical id (connected components over the
    near-dup pair graph, functions/dedup.near_dup_clusters), so an entire
    duplicate cluster moves as one unit and no near-dup of a holdout doc
    can appear in train.

    Scale shape: the clustering is the CC engine (hub-split two_phase —
    a boilerplate page duplicated millions of times is exactly the hub
    case it handles); the assignment itself is a pure map over the
    |docs|-row canonical table — no extra shuffle.

    Returns DataFrame[<id_col>, canonical_id, side: 'train'|'holdout'].
    """
    from parconnect_spark.functions.dedup import near_dup_clusters

    canon = near_dup_clusters(docs, pairs, id_col)
    u = md5int(
        F.concat(F.lit(salt + ":"), F.col("canonical_id").cast("string"))
    ) / F.lit(_HASH_SPAN)
    return canon.select(
        id_col,
        "canonical_id",
        F.when(u < F.lit(holdout_frac), F.lit("holdout"))
        .otherwise(F.lit("train"))
        .alias("side"),
    )


def global_row_number(
    df: DataFrame, order_cols: list[str], out_col: str = "rn"
) -> DataFrame:
    """Exact 0-based global row number under a total order — WITHOUT a
    single-partition window (the thing that serializes at 10^12 rows).

    Two-phase distributed rank (the reduceVertexIds exscan discipline,
    operators/relabel.py): range-partition on the order columns, rank
    within each partition in parallel, add the broadcast exclusive prefix
    sum of partition sizes. ``order_cols`` must be a total order (append a
    unique id column to break ties) or the result is nondeterministic.
    """
    from pyspark.sql import Window

    parted = df.repartitionByRange(*[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    in_part = parted.withColumn(
        out_col,
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(*order_cols)
        )
        - 1,
    )
    sizes = in_part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = sizes.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_offset")
    return (
        in_part.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col(out_col) + F.col("_offset")).cast("long"))
        .drop("_pid", "_offset")
    )


def quantile_trim(
    df: DataFrame,
    score_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the rows whose exact global rank under (score, id) lies in the
    [lo, hi) percentile band: rank ∈ [floor(lo·n), ceil(hi·n)) — the
    corpus-quality trim (drop the worst and best tails by ORDER STATISTIC,
    not by an interpolated threshold value, so membership is integer-exact
    and engine-independent).

    The band boundaries are computed as the SAME double expression any
    re-implementation would write (floor(lo·n) on IEEE doubles) — never
    pre-rounded driver-side — so two engines agree bit-for-bit. Adds the
    ``rank`` column. Distributed cost: one range shuffle + one broadcast
    (the rank), one scalar count join."""
    ranked = global_row_number(df, [score_col, id_col], out_col="rank")
    n = df.select(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .where(
            (F.col("rank") >= F.floor(F.lit(lo) * F.col("_n")))
            & (F.col("rank") < F.ceil(F.lit(hi) * F.col("_n")))
        )
        .drop("_n")
    )


def deterministic_sample_k(
    df: DataFrame, k: int, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Exactly-k deterministic sample: the k rows with the smallest
    md5(id:salt) priority — the distributed replacement for reservoir
    sampling when the sample must be REPRODUCIBLE across runs, engines,
    partitionings, and retries (a reservoir's content depends on arrival
    order; a hash-priority top-k depends only on the data). Change
    ``salt`` to draw an independent sample.

    Physically a top-k, not a sort: Spark's TakeOrderedAndProject keeps k
    rows per partition and merges — no global shuffle of the corpus.
    Ties are impossible (md5 over distinct ids is injective in practice;
    the id itself is the final tiebreak)."""
    pri = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    ).alias("_pri")
    return (
        df.select("*", pri)
        .orderBy("_pri", id_col)
        .limit(k)
        .drop("_pri")
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly-k WEIGHTED sample without replacement — the
    Efraimidis–Spirakis exponential race, made deterministic: row i is
    kept iff its key ``-ln(u_i)/w_i`` is among the k smallest, where
    ``u_i`` is a uniform derived from ``md5(id:salt)`` instead of an RNG.
    P(row wins) is proportional to its weight, and because the race is a
    pure function of (id, salt, weight), the sample is identical across
    runs, engines, partitionings, and retries. This is the training-data
    mixing primitive: ``weight_col = token count`` makes document
    sampling uniform at the TOKEN level; a per-domain multiplier
    implements mixture reweighting — all without a shuffle of the corpus.

    Engine-exact ordering (the lm_score/tfidf discipline): ``u`` is built
    from 13 md5 hex chars — 52 bits, so both u and the quantized key are
    exactly representable doubles — and the race key is the INTEGER
    ``round(-ln(u)/w * 1e6)`` (non-negative, so Spark HALF_UP ≡ DuckDB
    half-away-from-zero) with ``id`` as the final tiebreak, so a last-ulp
    ``ln`` difference between engines cannot flip the selection.

    Rows with NULL or non-positive weight are excluded (a zero-weight row
    has selection probability 0; a negative weight is meaningless in a
    race). Physically a top-k, never a sort: TakeOrderedAndProject keeps
    k rows per partition and merges, like :func:`deterministic_sample_k`.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = md5int(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)), 1, 13
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**52))
    pri = (
        F.round(-F.log(u) / w.cast("double") * F.lit(1e6))
        .cast("long")
        .alias("_pri")
    )
    return (
        df.where(w.isNotNull() & (w > 0))
        .select("*", pri)
        .orderBy("_pri", id_col)
        .limit(k)
        .drop("_pri")
    )


def group_quantile_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q_num: int,
    q_den: int,
) -> DataFrame:
    """Keep, within each group, the smallest score-closed top set holding
    at least ``floor(n_g * q_num / q_den)`` rows — the per-group quality
    cutoff ("top 30% by quality per source/language") that corpus
    curation applies after :func:`quantile_trim`'s global pass.

    Exactness: the quantile is a RATIONAL (q_num/q_den) and every rank
    comparison is integer arithmetic (``(n*q_num) div q_den``), so
    membership is bit-identical on any engine — no interpolated
    threshold, no double rounding. Ties share a fate: the kept set is
    ``score >= thr_g`` where ``thr_g`` is the largest score whose
    inclusive descending count reaches the required rank, so the result
    is closed under score equality (≥ the required count, never an
    arbitrary tie split). Groups too small for one row
    (``floor(n*q/den) == 0``) are dropped entirely.

    Scale shape: the window runs over the per-(group, score) COUNT table
    — bounded by score cardinality, not corpus rows, so a billion-row
    group with integer scores costs the same window as a thousand-row
    one — and the threshold table (one row per group) broadcasts back
    into a map-side filter. The raw corpus is shuffled exactly once, by
    the count aggregate's hash exchange.
    """
    if q_den < 1 or q_num < 0 or q_num > q_den:
        raise ValueError(f"need 0 <= q_num <= q_den, got {q_num}/{q_den}")
    counts = df.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc(score_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        group_col, score_col, F.sum("_c").over(w).alias("_cge")
    )
    tot = counts.groupBy(group_col).agg(F.sum("_c").alias("_n"))
    thr = (
        cum.join(tot, group_col)
        .where(
            (F.expr(f"(_n * {q_num}) div {q_den}") > 0)
            & (F.col("_cge") >= F.expr(f"(_n * {q_num}) div {q_den}"))
        )
        .groupBy(group_col)
        .agg(F.max(score_col).alias("_thr"))
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .where(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )


def range_splits(
    df: DataFrame,
    col: str,
    n_ranges: int,
) -> DataFrame:
    """EXACT equi-depth range boundaries: the (i/n)-quantiles of ``col``
    for i = 1..n-1 — precisely the splitters a range partitioner wants
    (Spark samples to approximate these; this computes them exactly,
    which is also the equi-depth histogram and the SORTED-output file
    plan). Same rank discipline as group_quantile_filter: the cumulative
    window runs over the per-VALUE count table (bounded by value
    cardinality, not rows), boundary i = the smallest value whose
    inclusive cumulative count reaches ceil(i·n_rows/n_ranges), all
    integer arithmetic. Returns (split_idx 1..n-1, boundary)."""
    from pyspark.sql import Window

    if n_ranges < 2:
        raise ValueError("n_ranges must be >= 2")
    cnt = df.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cnt.select(
        "v",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(Window.partitionBy()).alias("_n"),
    )
    picks = [
        F.min(
            F.when(
                F.lit(n_ranges) * F.col("_cum") >= F.lit(i) * F.col("_n"),
                F.col("v"),
            )
        ).alias(f"_b{i}")
        for i in range(1, n_ranges)
    ]
    row = ranked.agg(*picks).collect()[0]
    return df.sparkSession.createDataFrame(
        [(i, row[f"_b{i}"]) for i in range(1, n_ranges)],
        f"split_idx int, boundary long",
    )
