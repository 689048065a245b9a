"""Event-stream pipeline operators: gap sessionization and as-of join.

These are the two time-series primitives a transcript/event pipeline needs
that Spark's DataFrame API lacks as built-ins (pandas has them as
``merge_asof`` / groupby-gap idioms; DuckDB ships ASOF JOIN natively —
which is exactly what makes the driver oracle independent of this code).

Both are expressed as single-shuffle window plans:

* :func:`sessionize` — one hash shuffle on the user key, one ordered
  window pass per user (lag → gap flag → running sum). The window
  partition is the per-user event history — the natural parallel unit;
  at 10^12 events a pathological bot user serializes only its own
  partition (the same inherent bound as the transcript derivation's
  per-conversation window, operators/derive.py).
* :func:`asof_join` — the union-and-window formulation: tag both sides,
  union on (key, ts), one ordered window per key carries the most recent
  right-side payload forward (``last(..., ignorenulls=True)``). This is
  ONE shuffle on the join key — no range-join explosion, no per-row
  Python — and it is the shape that survives 100 TB: both sides stream
  through the same hash partitioning, and the window state per key is a
  single payload struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _ts_us(df: DataFrame, col: str):
    """Exact int64 microseconds for a timestamp column (numeric columns
    pass through scaled). Integer time arithmetic is what keeps gap/lag
    comparisons bit-identical across engines — double-seconds epochs round
    differently between DuckDB's epoch()/epoch_ms() and a JVM cast."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp"):
        # TIMESTAMP_NTZ (what parquet scans yield) casts to TIMESTAMP
        # value-identically under the session's pinned UTC timezone
        # (session.py sets spark.sql.session.timeZone=UTC)
        return F.unix_micros(F.col(col).cast("timestamp"))
    return (F.col(col).cast("double") * 1_000_000).cast("long")


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session indices: a new session starts at the first
    event of a user and at every event ≥ ``gap_seconds`` after its
    predecessor (strictly-greater gaps stay in-session at exactly the
    boundary: ``delta > gap`` splits, ``delta == gap`` splits too — the
    contract is ``delta >= gap_seconds`` opens a new session, matching the
    common web-analytics definition).

    Returns the input columns plus ``session_idx`` (0-based per user, in
    time order). Ordering inside a user is (ts, id_col) so duplicate
    timestamps are deterministic across engines and partitionings.

    One shuffle (hash on ``user_col``), one window pass. No collect.
    """
    us = _ts_us(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_us = F.lag(us).over(w)
    new_sess = F.when(
        prev_us.isNull() | (us - prev_us >= F.lit(int(gap_seconds) * 1_000_000)),
        1,
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_idx", (F.sum(new_sess).over(run) - F.lit(1)).cast("long")
    )


def session_rollup(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session summary over :func:`sessionize`:
    DataFrame[user_col, session_idx, n_events, first_event, last_event,
    duration_sec, sum_value]. Timestamps leave as an integer duration so
    the output is engine-hash-stable. One extra map-side-combined hash
    aggregate on (user, session_idx) — already co-partitioned with the
    sessionize shuffle, so AQE usually elides the second exchange."""
    s = sessionize(events, gap_seconds, user_col, ts_col, id_col)
    us = _ts_us(s, ts_col)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(id_col).alias("first_event"),
            F.max(id_col).alias("last_event"),
            (F.max(us) - F.min(us)).alias("_span_us"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        # integer-microsecond span, INTEGER-divided (div, not /): exact on
        # any engine — a double quotient's ulp approaches 1e-6 at
        # century-scale spans and could round across a second boundary
        .withColumn("duration_sec", F.expr("_span_us div 1000000"))
        .select(
            user_col,
            "session_idx",
            "n_events",
            "first_event",
            "last_event",
            "duration_sec",
            "sum_value",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the right row with the
    LARGEST ``right_ts`` ≤ its ``left_ts`` within the same key group
    (inclusive match at equality; left rows with no prior right row keep
    nulls — LEFT-join semantics).

    ``right_cols`` selects the right payload (default: every right column
    except the keys); the matched columns come back as ``<col><suffix>``.
    ``tolerance_seconds`` nulls out matches older than the window, like
    ``pandas.merge_asof(tolerance=...)``.

    Determinism: ties on (key, right_ts) are broken by the LAST right
    payload in (right_ts, payload-struct) order — callers wanting a
    specific winner should pre-dedupe the right side to one row per
    (key, ts), which is also what DuckDB's native ASOF JOIN assumes.

    Physical shape (the reason this exists instead of a range join): tag
    each side, union, ONE window per key ordered by (ts, side) carrying
    ``last(payload, ignorenulls=True)`` forward. One hash shuffle total;
    per-key window state is one struct. A range join would rewrite to a
    broadcast-nested-loop or an O(|L|·|R|) partition product under skew —
    this never does.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    payload = F.struct(
        _ts_us(right, right_ts).alias("__rts_us"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # _side orders right rows BEFORE left rows at equal ts → inclusive match
    r = right.select(
        *[F.col(k) for k in keys],
        _ts_us(right, right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__pay"),
    )
    lrow = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l = left.select(
        *[F.col(k) for k in keys],
        _ts_us(left, left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        lrow.alias("__lrow"),
    )
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType))
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side", "__pay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__pay", ignorenulls=True).over(w)
    # window BEFORE the side filter — the right rows must still be in the
    # partition when the carry-forward evaluates
    out = u.withColumn("__match", matched).where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.col("__match.__rts_us")
                >= F.col("__ts") - F.lit(int(tolerance_seconds) * 1_000_000),
                F.col("__match"),
            ),
        )
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def hopping_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    size_us: int = 86_400_000_000,
    slide_us: int = 43_200_000_000,
    key_cols: tuple = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Hopping (overlapping) window aggregation — the sliding-window
    staple tumbling GROUP BYs can't express: every event lands in
    ``size_us / slide_us`` windows.

    Returns DataFrame[window_start_us: long, *key_cols, n: long,
    sum_value: double] — one row per (window, keys) with the event count
    and ROUND(SUM(value), 4).

    Determinism (NOTES.md round-5 rules): window assignment is pure int64
    microsecond arithmetic — ``i = t div slide`` indexes the latest
    window containing t and the explode walks the ``m = size/slide``
    covering indices, so engines can never disagree on membership.
    Timestamps must be non-negative epochs (true of any real event table)
    so integer division is floor division in every engine — the
    shift-positive rule, stated instead of reasoning about
    truncate-vs-floor on negatives.

    Physical plan: one narrow explode (m rows per event, m is small — 2
    for the classic half-overlap) + one map-side-combined hash aggregate.
    No windows, no range joins: a viral (window, key) cell is an
    AQE-splittable aggregation key, never a serialized window partition.
    ``size_us`` must be a multiple of ``slide_us``.
    """
    if size_us <= 0 or slide_us <= 0 or size_us % slide_us != 0:
        raise ValueError("size_us must be a positive multiple of slide_us")
    m = size_us // slide_us
    df = events.withColumn("_tus", _ts_us(events, ts_col))
    idx = F.expr(f"_tus div {slide_us}")
    df = df.withColumn(
        "_wi", F.explode(F.array(*[idx - F.lit(j) for j in range(m)]))
    )
    return (
        df.groupBy(
            (F.col("_wi") * F.lit(slide_us)).alias("window_start_us"),
            *[F.col(k) for k in key_cols],
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col(value_col).cast("double")), 4).alias(
                "sum_value"
            ),
        )
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Period-over-period retention — the product-analytics rollup behind
    "weekly active users, and how many were here last week".

    Returns DataFrame[bucket_start_us: long, n_active: long,
    n_retained: long, retention_rate: double] — per activity bucket, the
    distinct active users, how many of them were also active in the
    IMMEDIATELY PRECEDING bucket, and retained / previous-bucket-active
    rounded to 6dp (NULL for a bucket with no predecessor in the data).

    Determinism: bucket membership is int64 µs floor division on
    non-negative epochs (the hopping_rollup rule); counts are exact; the
    rate is the one rounded double.

    Physical plan: one distinct over (user, bucket) — map-side combined —
    then a self equi-join on (user, bucket+1) and two hash aggregates.
    No windows: a viral bucket is an AQE-splittable join/aggregation key.
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    df = events.withColumn("_tus", _ts_us(events, ts_col))
    active = (
        df.select(
            F.col(user_col).alias("u"),
            F.expr(f"_tus div {bucket_us}").alias("b"),
        )
        .distinct()
    )
    n_active = active.groupBy("b").agg(F.count(F.lit(1)).alias("n_active"))
    prev = active.select("u", (F.col("b") + 1).alias("b"))
    retained = (
        active.join(prev, ["u", "b"], "left_semi")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    n_prev = n_active.select(
        (F.col("b") + 1).alias("b"), F.col("n_active").alias("_n_prev")
    )
    return (
        n_active.join(retained, "b", "left")
        .join(n_prev, "b", "left")
        .select(
            (F.col("b") * F.lit(bucket_us)).alias("bucket_start_us"),
            "n_active",
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
            F.round(
                F.coalesce("n_retained", F.lit(0)) / F.col("_n_prev"), 6
            ).alias("retention_rate"),
        )
    )


def funnel(
    events: DataFrame,
    steps: tuple = ("signup", "view", "click", "purchase"),
    within_seconds: int | None = 7 * 86_400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-touch funnel analysis — the product-analytics sequence query
    ("of the users who signed up, how many then viewed, then clicked,
    then purchased — in that order, within a week of signup?").

    A user reaches step k if they have an event of type ``steps[k]``
    STRICTLY AFTER their step-(k-1) completion time, where each step's
    completion time is the EARLIEST qualifying event (first-touch
    semantics — the standard product-analytics definition, and the one
    that makes the result order-deterministic). ``within_seconds`` (None
    = unbounded) anchors a deadline at the FIRST step's completion: every
    later step must land at or before ``t_1 + within``.

    Returns DataFrame[step_idx: int, step: string, n_users: long,
    conversion: double] — one row per step, ``conversion`` =
    n_users(step)/n_users(step 1) rounded to 6dp.

    Determinism: all time comparisons are exact int64 µs
    (the sessionize/asof rule); counts are exact; the conversion ratio is
    the one rounded double.

    Physical plan: step k is one equi-join of the (small, shrinking)
    per-user step-(k-1) table against the type-filtered event scan plus a
    map-side-combined MIN aggregate — K-1 joins total for a K-step
    funnel, never a per-user ordered window over the full history (a bot
    user's events hash-partition across the join; nothing serializes).
    The per-step tables shrink monotonically, so AQE upgrades the later
    joins to broadcasts on its own.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("_ty"),
        _ts_us(events, ts_col).alias("_us"),
    )
    dl_expr = (
        (F.min("_us") + within_seconds * 1_000_000)
        if within_seconds is not None
        else F.lit(None).cast("long")
    )
    cur = (
        ev.where(F.col("_ty") == steps[0])
        .groupBy("u")
        .agg(F.min("_us").alias("_t"), dl_expr.alias("_dl"))
    )
    counts = [cur.groupBy().agg(F.count(F.lit(1)).alias("n_users"))]
    for st in steps[1:]:
        nxt = ev.where(F.col("_ty") == st).withColumnsRenamed(
            {"_us": "_eus"}
        )
        cond = nxt["u"] == cur["u"]
        joined = nxt.join(cur, cond).where(F.col("_eus") > F.col("_t"))
        if within_seconds is not None:
            joined = joined.where(F.col("_eus") <= F.col("_dl"))
        cur = joined.groupBy(nxt["u"].alias("u")).agg(
            F.min("_eus").alias("_t"), F.min("_dl").alias("_dl")
        )
        counts.append(cur.groupBy().agg(F.count(F.lit(1)).alias("n_users")))
    rows = counts[0].select(
        F.lit(1).alias("step_idx"), F.lit(steps[0]).alias("step"), "n_users"
    )
    for i, c in enumerate(counts[1:], start=2):
        rows = rows.unionByName(
            c.select(
                F.lit(i).alias("step_idx"),
                F.lit(steps[i - 1]).alias("step"),
                "n_users",
            )
        )
    base = counts[0].select(F.col("n_users").alias("_n1"))
    return rows.crossJoin(F.broadcast(base)).select(
        "step_idx",
        "step",
        "n_users",
        F.round(F.col("n_users") / F.col("_n1"), 6).alias("conversion"),
    )


def profile_numeric(
    df: DataFrame,
    value_col: str,
    id_col: str,
    quant: int = 1_000_000,
) -> DataFrame:
    """One-row exact profile of a numeric column — the data-quality
    summary every ingestion pipeline runs first: row/null counts, min,
    max, mean, population variance, and the EXACT median (lower order
    statistic, not an interpolation).

    Cross-engine determinism is the whole design: floating-point SUMs are
    shuffle-order-dependent, so every moment is computed over the
    ``round(value · quant)`` int64 quantization with DECIMAL(38,0)
    accumulators — Σq and Σq² are exact integers on any engine, and the
    derived mean/variance doubles come from ONE division expression each
    (rounded 6dp). The median is the value whose (quantized value, id)
    rank is (n−1)/2 — order-statistic membership, the quality_trim
    discipline, via one TakeOrderedAndProject-sized window-free path:
    rank = count of rows strictly below + tie id ordering, computed with
    the same two-phase global rank used by quantile_trim.

    Returns DataFrame[n, n_null, vmin, vmax, mean, variance, median]
    (vmin/vmax/median in original units at ``quant`` resolution).
    """
    from parconnect_spark.functions.sampling import global_row_number

    v = F.col(value_col)
    q = F.round(v * F.lit(quant)).cast("long")
    nn = df.where(v.isNotNull()).select(
        q.alias("_q"), F.col(id_col).alias("_id")
    )
    moments = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
    ).crossJoin(
        nn.agg(
            F.min("_q").alias("_qmin"),
            F.max("_q").alias("_qmax"),
            F.sum(F.col("_q").cast("decimal(38,0)")).alias("_s1"),
            F.sum(
                (F.col("_q").cast("decimal(38,0)") * F.col("_q")).cast(
                    "decimal(38,0)"
                )
            ).alias("_s2"),
            F.count(F.lit(1)).alias("_nv"),
        )
    )
    ranked = global_row_number(nn, ["_q", "_id"], out_col="_r")
    # aggregate form so an all-null column still yields the one profile
    # row (a filter-then-crossJoin would yield zero rows instead)
    med = (
        ranked.crossJoin(F.broadcast(nn.agg(F.count(F.lit(1)).alias("_n"))))
        .where(F.col("_r") == F.expr("(_n - 1) div 2"))
        .agg(F.max("_q").alias("_qmed"))
    )
    return moments.crossJoin(med).select(
        "n",
        "n_null",
        (F.col("_qmin") / quant).alias("vmin"),
        (F.col("_qmax") / quant).alias("vmax"),
        F.round(F.col("_s1").cast("double") / F.col("_nv") / quant, 6).alias(
            "mean"
        ),
        F.round(
            (
                F.col("_s2").cast("double") * F.col("_nv")
                - F.col("_s1").cast("double") * F.col("_s1").cast("double")
            )
            / (F.col("_nv").cast("double") * F.col("_nv"))
            / (float(quant) * quant),
            6,
        ).alias("variance"),
        (F.col("_qmed") / quant).alias("median"),
    )


def adoption_curve(events: DataFrame, ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Daily adoption: per UTC epoch-day, the count of users whose FIRST
    event falls on that day, plus the cumulative user count — the
    first-seen growth curve every product/corpus dashboard carries.

    Scale shape: "running distinct" is NOT computed as running state —
    each user's first day is one map-side-combined MIN aggregate, the
    per-day census is a second small aggregate, and the cumulative sum
    runs a window over the DAY table (rows = distinct days, thousands at
    most — the one place a global-order window is safe). Returns
    (day, new_users, cum_users), day = epoch days as long."""
    from pyspark.sql import Window

    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(86_400_000_000)
    )
    first = (
        events.select(F.col(user_col).alias("u"), day.alias("d"))
        .groupBy("u")
        .agg(F.min("d").alias("d0"))
    )
    per_day = first.groupBy("d0").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d0").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


def type_correlations(
    events: DataFrame,
    types: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Pairwise Pearson correlation between per-user total ``value`` of
    each event type (missing type → 0.0, so every user contributes to
    every pair): the behavioral-correlation matrix ("do users who click
    also purchase?").

    One pivot aggregate builds the per-user type vector (types is a
    FIXED list — the pivot never scans for distinct values), then each
    of the |types|·(|types|−1)/2 pairs is one F.corr aggregate over the
    same cached vector table; all map-side combinable, nothing scales
    with user count but the two aggregate passes. Returns
    (type_a, type_b, corr) for type_a < type_b, 6dp."""
    from parconnect_spark.cache import scoped_persist

    wide = scoped_persist(
        events.groupBy(F.col(user_col).alias("u")).pivot(
            type_col, types
        ).agg(F.coalesce(F.sum(value_col), F.lit(0.0)))
        .na.fill(0.0, types)
    )
    pairs = [(a, b) for i, a in enumerate(types) for b in types[i + 1 :]]
    aggs = [
        F.round(F.corr(F.col(a), F.col(b)), 6).alias(f"_c{i}")
        for i, (a, b) in enumerate(pairs)
    ]
    row = wide.agg(*aggs).collect()[0]
    return events.sparkSession.createDataFrame(
        [(a, b, float(row[f"_c{i}"])) for i, (a, b) in enumerate(pairs)],
        "type_a string, type_b string, corr double",
    )


def cube_rollup(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Multi-dimensional CUBE over (event_type, epoch-day): counts and
    value sums for every grouping set — (type, day), (type), (day), ()
    — in ONE pass (Catalyst expands the cube map-side; no per-set
    rescan). NULL dimension = the rolled-up margin, exactly the
    SQL GROUP BY CUBE semantics; the grand-total row doubles as the
    census. 6dp on the float sum."""
    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(86_400_000_000)
    ).alias("day")
    return (
        events.select("event_type", day, "value")
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str | None = "event_type",
) -> DataFrame:
    """CUSUM change-point detection over daily counts: per group, the
    day where the cumulative deviation from the series mean peaks in
    magnitude — the classic "when did the level shift" readout
    (complements term_bursts' trailing-baseline spike detector: CUSUM
    finds sustained shifts, bursts finds spikes).

    S_t = Σ_{i≤t} (x_i − x̄); the |S| argmax splits the series at the
    most likely level change. Per-group daily census is one aggregate;
    the cumulative window runs over the DAY table per group (bounded by
    distinct days). Ties break to the earliest day. Returns
    (group, change_day, cusum_peak, series_mean) at 6dp."""
    from pyspark.sql import Window

    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(86_400_000_000)
    )
    g = F.col(group_col) if group_col else F.lit("all")
    daily = (
        events.select(g.alias("group"), day.alias("d"))
        .groupBy("group", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wg = Window.partitionBy("group")
    wcum = (
        Window.partitionBy("group")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = daily.select(
        "group",
        "d",
        F.avg("n").over(wg).alias("_mean"),
        F.sum("n").over(wcum).alias("_cum"),
        F.row_number()
        .over(Window.partitionBy("group").orderBy("d"))
        .alias("_t"),
    ).select(
        "group",
        "d",
        "_mean",
        (F.col("_cum") - F.col("_t") * F.col("_mean")).alias("_s"),
    )
    wbest = Window.partitionBy("group").orderBy(
        F.desc(F.abs(F.col("_s"))), F.asc("d")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(wbest))
        .where("_rk = 1")
        .select(
            "group",
            F.col("d").alias("change_day"),
            F.round("_s", 6).alias("cusum_peak"),
            F.round("_mean", 6).alias("series_mean"),
        )
    )


def ewma_forecast(
    events: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 4,
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Next-day EWMA forecast of daily counts per group, CLOSED FORM:
    EWMA after the last of T days = Σ_i α(1−α)^(T−i) x_i + (1−α)^T x_1
    (the recursive definition unrolled, seeding at the first
    observation), so the whole forecast is one weighted sum — no
    sequential state, no driver loop, exact at any parallelism. α is a
    RATIONAL (num/den) so the weights are exact powers. Missing days
    count 0 (the honest daily-series semantics — gaps decay the
    average). Returns (group, last_day, forecast) at 6dp."""
    from pyspark.sql import Window

    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(86_400_000_000)
    )
    daily = (
        events.select(F.col(group_col).alias("group"), day.alias("d"))
        .groupBy("group", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wg = Window.partitionBy("group")
    alpha = alpha_num / alpha_den
    # full day range per group: min..max with missing days as 0
    spans = daily.groupBy("group").agg(
        F.min("d").alias("_d0"), F.max("d").alias("_d1")
    )
    grid = spans.select(
        "group",
        "_d1",
        F.explode(F.sequence("_d0", "_d1")).alias("d"),
    )
    filled = grid.join(daily, ["group", "d"], "left").select(
        "group",
        "_d1",
        "d",
        F.coalesce("n", F.lit(0)).alias("n"),
    )
    # weight for day d: alpha*(1-alpha)^(d1-d), plus the seed term
    # (1-alpha)^(T-1) extra weight on the FIRST day (T = d1-d0+1)
    w0 = Window.partitionBy("group")
    t = F.col("_d1") - F.min("d").over(w0) + 1
    is_first = F.col("d") == F.min("d").over(w0)
    weight = F.lit(alpha) * F.pow(
        F.lit(1 - alpha), F.col("_d1") - F.col("d")
    ) + F.when(
        is_first, F.pow(F.lit(1 - alpha), t - 1) * F.lit(1 - alpha)
    ).otherwise(0.0)
    # note: seed weight folds the recursion EWMA_1 = x_1: total first-day
    # weight = alpha*(1-a)^(T-1) + (1-a)^(T-1)*(1-a) ... see test for the
    # replayed recursive definition this equals.
    contrib = filled.select(
        "group", "_d1", (F.col("n") * weight).alias("_c")
    )
    return (
        contrib.groupBy("group", "_d1")
        .agg(F.round(F.sum("_c"), 6).alias("forecast"))
        .select("group", F.col("_d1").alias("last_day"), "forecast")
    )


def markov_stationary(
    events: DataFrame,
    iters: int = 16,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain:
    consecutive-event transition counts (per user, ordered by ts with
    event_id tiebreak), row-normalized into P, then π = uniform·P^iters
    — the long-run behavioral mix ("where do users end up"). The
    distributed work is the transition count (one bounded per-user lag
    window + one aggregate); the |types|² chain iteration runs on the
    driver over the collected count table, closed-form and replayable.
    Returns (event_type, pi) at 6dp."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col("event_id")
    )
    trans = (
        events.select(
            F.lag(type_col).over(w).alias("a"), F.col(type_col).alias("b")
        )
        .where(F.col("a").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    types = sorted({r["a"] for r in trans} | {r["b"] for r in trans})
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    P = [[0.0] * k for _ in range(k)]
    totals = [0] * k
    for r in trans:
        totals[idx[r["a"]]] += r["n"]
    for r in trans:
        P[idx[r["a"]]][idx[r["b"]]] = r["n"] / totals[idx[r["a"]]]
    pi = [1.0 / k] * k
    for _ in range(iters):
        pi = [
            sum(pi[i] * P[i][j] for i in range(k)) for j in range(k)
        ]
    return events.sparkSession.createDataFrame(
        [(t, round(pi[idx[t]], 6)) for t in types],
        "event_type string, pi double",
    )


def activity_gini(
    events: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Gini coefficient of per-user event counts — the activity-
    concentration readout ("do 1% of users generate 90% of events"),
    the same shape engagement and abuse dashboards track.

    Exact closed form over counts sorted ascending with row_number:
    G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n. The global sort ranks |users|
    rows (report scale — same cost class as any leaderboard); ties are
    irrelevant to the sum (any order of equal x_i gives the same Σi·x_i
    ... shifted consistently, so a (count, user) total order keeps the
    value engine-stable anyway). One row (n_users, total, gini)."""
    from pyspark.sql import Window

    cnt = events.groupBy(F.col(user_col).alias("u")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w = Window.orderBy(F.asc("x"), F.asc("u"))
    ranked = cnt.select(
        "x", F.row_number().over(w).alias("i")
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("total"),
        F.round(
            2.0
            * F.sum(F.col("i") * F.col("x"))
            / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


def dow_seasonality(
    events: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Day-of-week seasonality per event type: counts per epoch-derived
    weekday (0 = Thursday, the 1970-01-01 anchor — calendar-library-free
    and engine-identical) and the chi-square statistic against the
    uniform-day null, zero-count weekdays included via an explicit 7-row
    grid (dropping them would understate the statistic). High chi2 =
    the type has a weekly rhythm. Returns (event_type, n, chi2) at
    6dp."""
    dow = (
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(86_400_000_000)
        )
        % 7
    )
    daily = (
        events.select(F.col(type_col).alias("t"), dow.alias("dw"))
        .groupBy("t", "dw")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    grid = (
        daily.select("t")
        .distinct()
        .select("t", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("dw"))
    )
    filled = grid.join(daily, ["t", "dw"], "left").select(
        "t", "dw", F.coalesce("o", F.lit(0)).alias("o")
    )
    tot = filled.groupBy("t").agg(F.sum("o").alias("n"))
    e = F.col("n") / 7.0
    return (
        filled.join(tot, "t")
        .groupBy("t", "n")
        .agg(
            F.round(
                F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6
            ).alias("chi2")
        )
        .select(F.col("t").alias("event_type"), "n", "chi2")
    )


def leave_last_out_split(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Leave-last-out temporal split: per user, the LAST event (by ts,
    id-tiebroken) goes to ``test``, everything else to ``train`` — the
    canonical recsys/next-event evaluation split, leakage-free by
    construction (the model never sees the future it is scored on;
    contrast random splits, which leak temporal context). One bounded
    per-user window. Returns the events with a ``split`` column."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.desc(ts_col), F.desc(id_col)
    )
    return events.withColumn(
        "split",
        F.when(F.row_number().over(w) == 1, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def survival_curve(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Retention survival curve: S(d) = fraction of users whose LAST
    activity is ≥ d days after their FIRST — "how many users were still
    alive at day d", the Kaplan-Meier-style readout over fully-observed
    lifetimes (no censoring model: the observation window is the data's
    own span, declared). Per-user lifetime = one min/max aggregate; the
    curve is a cumulative count over the lifetime histogram (bounded by
    distinct lifetime lengths). Returns (day, n_surviving, frac) for
    d = 0..max lifetime at 6dp."""
    from pyspark.sql import Window

    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(86_400_000_000)
    )
    life = (
        events.select(F.col(user_col).alias("u"), day.alias("d"))
        .groupBy("u")
        .agg((F.max("d") - F.min("d")).alias("_life"))
    )
    hist = life.groupBy("_life").agg(F.count(F.lit(1)).alias("_c"))
    spark = events.sparkSession
    mx_row = hist.agg(F.max("_life").alias("m"), F.sum("_c").alias("n")).collect()[0]
    mx, n = int(mx_row["m"]), int(mx_row["n"])
    days = spark.range(0, mx + 1).select(F.col("id").alias("day"))
    w = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    joined = days.join(
        hist.withColumnRenamed("_life", "day"), "day", "left"
    ).select("day", F.coalesce("_c", F.lit(0)).alias("_c"))
    return joined.select(
        "day",
        F.sum("_c").over(w).alias("n_surviving"),
        F.round(F.sum("_c").over(w) / F.lit(n), 6).alias("frac"),
    )
