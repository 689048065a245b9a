"""Deterministic streaming-friendly sketches: count–min and HyperLogLog.

At 100 TB, exact per-key counts and exact distinct counts are full
shuffles; a sketch is one map-side-combined aggregate whose OUTPUT is a
few KB, mergeable across partitions/days/streams by construction (counter
sum / register max are associative+commutative — exactly what Spark's
partial aggregation needs; the same property makes the sketches unionable
across separately-built corpora without touching raw data again).

Unlike library sketches (whose seeds/mixing are implementation-defined),
every hash here is the engine's md5-fold (``functions/dedup.md5int`` —
positional hex fold of md5 digits), so a second engine can replicate the
sketch BIT-FOR-BIT: the DuckDB driver oracle rebuilds the same counters /
registers and must agree on every integer. Determinism is what turns a
probabilistic structure into a testable contract.

Count–min: d×w integer counter grid; point estimate = min over rows of
the addressed counter — an upper bound on the true count (never under),
within εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

HyperLogLog: 2^p registers, register = max over items of 1 + the number
of leading zero bits of the non-register hash bits; estimate =
α_m·m²/Σ 2^(−reg) with the standard small-range linear-counting
correction. The register sum is computed in EXACT integer arithmetic
(Σ 2^(RMAX−reg) as a BIGINT) — a double Σ 2^(−reg) needs more mantissa
than a double has at m=1024 and its value would depend on summation
order, i.e. on partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.functions.dedup import md5int

#: md5 hex digits folded into the hash integer: 15 digits = 60 bits,
#: the widest fold that stays inside signed-64 (16^15 < 2^63).
HASH_HEX_CHARS = 15
HASH_BITS = 4 * HASH_HEX_CHARS


def _cms_slot(col: F.Column, row: int, width: int) -> F.Column:
    return F.pmod(md5int(F.concat(F.lit(f"cms{row}:"), col)), F.lit(width))


def count_min_sketch(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d×w counter grid: DataFrame[row: int, slot: long,
    cnt: long] (absent (row, slot) ⇒ 0). One explode to d rows per item +
    one map-side-combined sum — shuffle volume is bounded by d·w rows per
    map partition regardless of input size."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_slot(F.col(key_col), i, width).alias("slot"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rs"),
        w.alias("w"),
    )
    return rows.groupBy("rs.row", "rs.slot").agg(F.sum("w").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each query key: est = min over rows of the addressed
    counter (0 when the slot is absent). The sketch side is d·w rows at
    most — broadcast it; the query side never shuffles."""
    q = queries.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_slot(F.col(key_col), i, width).alias("slot"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rs"),
    ).select(key_col, "rs.row", "rs.slot")
    joined = q.join(F.broadcast(sketch), ["row", "slot"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def heavy_hitters(
    items: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """EXACT heavy hitters — every key occurring ≥ ``min_count`` times,
    with its exact count — computed the way a 100-TB corpus must: the
    count–min sketch prunes the shuffle, not the answer.

    Physical plan:

    1. one map-side-combined aggregate builds the d×w counter grid
       (:func:`count_min_sketch` — output ≤ d·w rows no matter the input);
    2. the grid (≤ d·w ints, a few KB) is collected and embedded as d
       array literals, so each row's CM estimate
       ``est = min_i grid_i[slot_i(key)]`` is ONE zero-shuffle projection
       (``element_at`` lookups + ``least`` — no join, no window);
    3. rows with ``est < min_count`` are dropped BEFORE the exact
       ``groupBy`` — CM never underestimates, so no true heavy hitter is
       lost — and the exact count over the survivors removes the false
       positives. The only shuffle keyed on raw keys carries candidate
       rows only; with a Zipf-shaped corpus that is a small fraction of
       the input, and the surviving key cardinality is ≤ N/min_count by
       pigeonhole, so the final aggregate is always tiny.

    The RESULT is exactly ``{key: count(key) ≥ min_count}`` — the sketch
    is a physical optimization, not a semantic approximation, which is
    why the driver oracle is the plain ``GROUP BY … HAVING`` SQL (this is
    the same approximate-filter / exact-verify discipline as the MinHash
    and ANN paths: candidates from a sketch, truth from an exact pass).

    Returns DataFrame[key_col, cnt: long]. Parallels the reference's
    exact grouped aggregates (A1/A4 family,
    /root/reference/src/coloring/labelProp.hpp:122-139) with the
    bounded-communication discipline its MPI allreduce enforces.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    sketch_rows = count_min_sketch(items, key_col, depth, width).collect()
    grids = [[0] * width for _ in range(depth)]
    for r in sketch_rows:
        grids[r["row"]][r["slot"]] = r["cnt"]
    key = F.col(key_col)
    est = F.least(
        *[
            F.element_at(F.lit(grids[i]), (_cms_slot(key, i, width) + 1).cast("int"))
            for i in range(depth)
        ]
    )
    candidates = items.where(est >= F.lit(min_count))
    return (
        candidates.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def hll_registers(
    items: DataFrame, key_col: str, p: int = 10, group_cols: tuple = ()
) -> DataFrame:
    """DataFrame[*group_cols, reg: long, rho: int] — the 2^p occupied HLL
    registers and their max rank (per group when ``group_cols`` is given —
    the pre-aggregated per-bucket sketch shape that rolling merges build
    on). reg = h mod m; rho = 1 + leading zeros of the remaining
    ``HASH_BITS − p`` hash bits. One map-side-combined max aggregate over
    ≤ m groups per group key."""
    m = 1 << p
    h = md5int(F.col(key_col), 1, HASH_HEX_CHARS)
    wbits = HASH_BITS - p
    # bit_length(w) via base-2 string length (conv/bin agree across engines
    # for w > 0); w == 0 means all wbits bits are zero -> rho = wbits + 1.
    # w = h div m must be INTEGER division: h is up to 16^15-1 ~ 1.15e18,
    # beyond double's 2^53 — a float quotient truncates wrong.
    bitlen = F.length(F.conv(F.col("w").cast("string"), 10, 2))
    return (
        items.select(
            *[F.col(c) for c in group_cols],
            F.pmod(h, F.lit(m)).alias("reg"),
            h.alias("_h"),
        )
        .withColumn("w", F.expr(f"_h div {m}"))
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(wbits + 1)).otherwise(
                F.lit(wbits) - bitlen + 1
            ),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """One-row DataFrame[m, nonzero_regs, raw_sum, estimate] from the
    occupied-register table.

    raw_sum = Σ 2^(RMAX − rho) over ALL m registers (absent ⇒ rho 0) — an
    EXACT bigint, so the estimate is one deterministic double expression:
    α_m·m²·2^RMAX / raw_sum, with the standard linear-counting correction
    (m·ln(m/V) when est ≤ 2.5·m and V empty registers remain)."""
    m = 1 << p
    rmax = HASH_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("nonzero_regs"),
        F.sum(F.pow(F.lit(2.0), F.lit(rmax) - F.col("rho")).cast("long")).alias(
            "_s_occ"
        ),
    )
    # absent registers contribute 2^RMAX each (rho = 0)
    raw_sum = F.col("_s_occ") + (F.lit(m) - F.col("nonzero_regs")) * F.lit(
        1 << rmax
    )
    est_raw = F.lit(alpha * m * m * float(1 << rmax)) / F.col("raw_sum")
    zeros = F.lit(m) - F.col("nonzero_regs")
    corrected = F.when(
        (est_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(est_raw)
    return (
        agg.withColumn("raw_sum", raw_sum.cast("long"))
        .select(
            F.lit(m).alias("m"),
            F.col("nonzero_regs").cast("long").alias("nonzero_regs"),
            "raw_sum",
            corrected.alias("estimate"),
        )
    )


def hll_rolling_distinct(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = 86_400_000_000,
    window_buckets: int = 7,
    p: int = 10,
) -> DataFrame:
    """Trailing-window distinct counting by HLL register MERGE — the
    rolling "7-day distinct users as of each day" rollup, computed the way
    a 100-TB pipeline must: raw events are scanned ONCE into per-bucket
    register tables (the pre-aggregation a daily batch job would persist),
    and every trailing window is then a register-max merge over ≤
    window_buckets × 2^p tiny rows — never a re-scan of the raw data, and
    never a distinct over the window's raw keys (which a GROUP BY over
    overlapping windows would recount window_buckets times).

    Window wd (labeled by its LAST bucket: "as of day wd, the trailing
    ``window_buckets`` days") covers buckets wd−window_buckets+1 … wd;
    every window touched by at least one occupied bucket is emitted.

    Returns DataFrame[asof_bucket_us: long, n_buckets: long,
    nonzero_regs: long, raw_sum: long, estimate: double]: ``raw_sum`` is
    the exact bigint Σ 2^(RMAX−rho) over all m registers (the pinnable
    sketch state — the mergeability contract), ``estimate`` the one
    derived double (identical expression to :func:`hll_estimate`,
    linear-counting correction included).

    Scale shape: one map-side-combined (bucket, reg) max over the raw
    scan, one bounded explode (window_buckets rows per REGISTER, not per
    event), one (window, reg) max merge, one per-window aggregate."""
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    m = 1 << p
    rmax = HASH_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    keyed = events.select(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {bucket_us}"
        ).alias("b"),
        F.col(key_col).cast("string").alias("_k"),
    )
    per_bucket = hll_registers(keyed, "_k", p=p, group_cols=("b",))
    win = F.expr(f"sequence(b, b + {window_buckets - 1})")
    merged = (
        per_bucket.select(F.explode(win).alias("wd"), "reg", "rho")
        .groupBy("wd", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    nb = (
        keyed.select("b")
        .distinct()
        .select(F.explode(win).alias("wd"))
        .groupBy("wd")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
    )
    agg = merged.groupBy("wd").agg(
        F.count(F.lit(1)).alias("nonzero_regs"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(rmax) - F.col("rho")).cast("long")
        ).alias("_s_occ"),
    )
    raw_sum = F.col("_s_occ") + (F.lit(m) - F.col("nonzero_regs")) * F.lit(
        1 << rmax
    )
    est_raw = F.lit(alpha * m * m * float(1 << rmax)) / F.col("raw_sum")
    zeros = F.lit(m) - F.col("nonzero_regs")
    corrected = F.when(
        (est_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(est_raw)
    return (
        agg.withColumn("raw_sum", raw_sum.cast("long"))
        .join(nb, "wd")
        .select(
            (F.col("wd") * bucket_us).alias("asof_bucket_us"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("nonzero_regs").cast("long").alias("nonzero_regs"),
            "raw_sum",
            corrected.alias("estimate"),
        )
    )
