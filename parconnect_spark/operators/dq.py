"""Declarative data-quality checks — the expectations layer a 100-TB
ingest runs before anything downstream trusts a table (SURVEY.md scope
extension; the reference's analogue is its hard input invariants —
edge bidirectionality `src/graphGen/common/utils.hpp:61-101`, which
operators/graph.check_bidirectional already covers for the graph layer).

Four check kinds, each a single aggregate or anti-join — nothing scans a
table more than once per check, everything map-side combinable:

  not_null          violations = rows where the column IS NULL
  unique            violations = rows beyond the first per value
  accepted_values   violations = rows outside the literal allow-list
  referential       violations = rows whose key misses the reference
                    table (anti-join; broadcast when the reference is a
                    dimension)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dq_check(
    df: DataFrame,
    kind: str,
    column: str,
    values: list | None = None,
    ref: tuple[DataFrame, str] | None = None,
) -> int:
    """Violation count for one check (see module docstring for kinds)."""
    if kind == "not_null":
        return df.where(F.col(column).isNull()).count()
    if kind == "unique":
        total = df.count()
        distinct = df.select(column).distinct().count()
        return total - distinct
    if kind == "accepted_values":
        if not values:
            raise ValueError("accepted_values requires a values list")
        return df.where(
            ~F.col(column).isin(values) | F.col(column).isNull()
        ).count()
    if kind == "referential":
        if ref is None:
            raise ValueError("referential requires (ref_df, ref_column)")
        ref_df, ref_col = ref
        keys = F.broadcast(ref_df.select(F.col(ref_col).alias(column)).distinct())
        return df.select(column).join(keys, column, "left_anti").count()
    raise ValueError(f"unknown check kind: {kind}")


def dq_report(
    checks: list[tuple],
) -> DataFrame:
    """Run ``checks`` and return one row each:
    (table, check, column, violations, passed).

    Each entry: (table_name, df, kind, column[, values | (ref_df, ref_col)]).
    passed = violations == 0. Counts are exact; the report is the
    gate — wire it before publish and fail the run on any passed=False
    row the contract declares blocking."""
    rows = []
    spark = None
    for entry in checks:
        table, df, kind, column, *extra = entry
        spark = spark or df.sparkSession
        values = ref = None
        if kind == "accepted_values":
            values = extra[0]
        elif kind == "referential":
            ref = extra[0]
        v = dq_check(df, kind, column, values=values, ref=ref)
        rows.append((table, kind, column, v, v == 0))
    return spark.createDataFrame(
        rows,
        "table string, check string, column string, "
        "violations long, passed boolean",
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: every row must
    be indistinguishable from ≥ k−1 others on ``quasi_cols``. One row:
    (k, n_groups, n_below_k, min_group_size, rows_at_risk, frac_at_risk)
    — rows_at_risk = rows in groups smaller than k (the re-identifiable
    population a release gate blocks on). One grouped count + one
    aggregate over the (much smaller) group table; map-side combinable,
    NULLs form their own equivalence class (SQL GROUP BY semantics)."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    row = groups.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum((F.col("_n") < k).cast("long")).alias("b"),
        F.min("_n").alias("mn"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)).alias("r"),
        F.sum("_n").alias("t"),
    ).collect()[0]
    return df.sparkSession.createDataFrame(
        [
            (
                k,
                int(row["g"]),
                int(row["b"]),
                int(row["mn"]),
                int(row["r"]),
                round(row["r"] / row["t"], 6) if row["t"] else 0.0,
            )
        ],
        "k int, n_groups long, n_below_k long, min_group_size long, "
        "rows_at_risk long, frac_at_risk double",
    )


def dp_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private group counts via the Laplace mechanism
    with a SEEDED, replayable noise stream: noise_g = Lap(1/ε) drawn by
    inverse-CDF from a uniform derived from md5(seed ‖ group). One row
    contributes 1 to one count (sensitivity 1), so Lap(1/ε) gives
    ε-DP for the counts release — the third member of the governance
    family next to the DQ gates and the k-anonymity audit.

    The determinism is deliberate and documented: a production release
    would draw fresh randomness per release, but a TESTABLE DP pipeline
    pins the stream by seed so the release is reproducible and
    auditable (change ``seed`` per release). Never release the true
    counts next to the noisy ones. Returns (group, noisy_count) with
    noise at 6dp; counts can go negative — clamping would bias the
    release and is left to the consumer's declared post-processing."""
    from parconnect_spark.functions.dedup import md5int

    # uniform in (0,1): md5 48-bit fold / 2^48, nudged off 0 and 1;
    # computed over the aggregated "group" column (one draw per group)
    u = (
        md5int(
            F.concat(F.lit(seed + ":"), F.col("group").cast("string")),
            1,
            12,
        )
        + F.lit(0.5)
    ) / F.lit(float(1 << 48))
    b = 1.0 / epsilon
    lap = F.when(
        u < 0.5, F.lit(b) * F.log(2.0 * u)
    ).otherwise(-F.lit(b) * F.log(2.0 * (1.0 - u)))
    return (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "group",
            F.round(F.col("_n") + lap, 6).alias("noisy_count"),
        )
    )


def ab_test(
    events: DataFrame,
    arm_col,
    success_col,
) -> DataFrame:
    """Two-proportion z-test between arms 0 and 1: per-arm trials and
    successes, pooled-variance z statistic — the experimentation
    readout. ``arm_col``/``success_col`` are Column expressions (arm ∈
    {0,1}, success boolean). One conditional aggregate; z at 6dp, NULL
    when either arm is empty or the pooled variance is 0."""
    r = events.select(
        arm_col.alias("arm"), success_col.cast("long").alias("s")
    ).groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("s")).otherwise(0)).alias("s0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("s")).otherwise(0)).alias("s1"),
    )
    p0 = F.col("s0") / F.col("n0")
    p1 = F.col("s1") / F.col("n1")
    pp = (F.col("s0") + F.col("s1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return r.select(
        "n0",
        "s0",
        "n1",
        "s1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(
            F.when(se > 0, (p1 - p0) / se), 6
        ).alias("z"),
    )


def schema_diff(df: DataFrame, expected_ddl: str) -> DataFrame:
    """Schema-contract check: the actual DataFrame schema against an
    expected DDL string — one row per column with status ``ok`` /
    ``type_mismatch`` / ``missing`` (contracted but absent) / ``extra``
    (present but uncontracted). The data-contract companion to the
    row-level dq checks: a producer bumping a column type breaks
    consumers BEFORE any value is wrong, so the gate must read schemas,
    not data. Pure metadata — no job is run. Returns
    (column, expected_type, actual_type, status) ordered by column."""
    from pyspark.sql.types import StructType

    exp = {f.name: f.dataType.simpleString() for f in StructType.fromDDL(expected_ddl).fields}
    act = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows = []
    for c in sorted(set(exp) | set(act)):
        e, a = exp.get(c), act.get(c)
        status = (
            "ok"
            if e == a
            else "missing"
            if a is None
            else "extra"
            if e is None
            else "type_mismatch"
        )
        rows.append((c, e, a, status))
    return df.sparkSession.createDataFrame(
        rows, "column string, expected_type string, actual_type string, status string"
    )


# Inverse-CDF thresholds for Poisson(1): cumulative e^-1 * sum 1/k!
_POIS1_CDF = [
    0.36787944117144233,  # k = 0
    0.7357588823428847,   # k = 1
    0.9196986029286058,   # k = 2
    0.9810118431238462,   # k = 3
    0.9963401531726563,   # k = 4
    0.9994058151824183,   # k = 5
    0.9999167588507119,   # k = 6
    0.9999897508033253,   # k = 7
]


def poisson_bootstrap_mean(
    df: DataFrame,
    value_col: str,
    n_resamples: int = 32,
    seed: str = "boot",
    id_col: str | None = None,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean of
    ``value_col`` — THE distributed bootstrap: classical resampling
    needs n draws with replacement per replicate (a shuffle per
    replicate); the Poisson trick gives every row an independent
    Poisson(1) weight per replicate, which converges to the same
    resampling distribution while needing only a row-local weight draw
    — one explode by n_resamples, one aggregate, zero extra shuffles
    of the data.

    Weights are SEEDED (md5(seed:replicate:row) uniform through the
    Poisson(1) inverse CDF, capped at 8 — P(k>7) < 1.1e-5, a declared
    truncation), so the interval is reproducible and oracle-replayable,
    the dp_counts discipline. ``id_col``: a unique row key for the
    draw stream (required — positional ids would break partition
    invariance). Returns one row
    (n_rows, mean, ci_lo, ci_hi, n_resamples) with the 2.5%/97.5%
    replicate-mean percentiles by the min-rank convention, 6dp."""
    from parconnect_spark.functions.dedup import md5int

    if id_col is None:
        raise ValueError("id_col is required (deterministic draw stream)")
    b = F.explode(F.sequence(F.lit(1), F.lit(n_resamples))).alias("b")
    u = (
        md5int(
            F.concat(
                F.lit(seed + ":"),
                F.col("b").cast("string"),
                F.lit(":"),
                F.col(id_col).cast("string"),
            ),
            1,
            12,
        )
        + F.lit(0.5)
    ) / F.lit(float(1 << 48))
    w = F.lit(8)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    weighted = df.select(F.col(id_col), F.col(value_col).alias("x"), b).select(
        "b", "x", w.alias("w")
    )
    means = weighted.groupBy("b").agg(
        (F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("m")
    )
    rows = sorted(r["m"] for r in means.collect())
    import math

    lo = rows[max(0, math.ceil(0.025 * len(rows)) - 1)]
    hi = rows[max(0, math.ceil(0.975 * len(rows)) - 1)]
    base = df.agg(
        F.count(F.lit(1)).alias("n"), F.avg(value_col).alias("mean")
    ).collect()[0]
    return df.sparkSession.createDataFrame(
        [
            (
                int(base["n"]),
                round(float(base["mean"]), 6),
                round(float(lo), 6),
                round(float(hi), 6),
                n_resamples,
            )
        ],
        "n_rows long, mean double, ci_lo double, ci_hi double, "
        "n_resamples int",
    )
