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
