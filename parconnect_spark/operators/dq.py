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
