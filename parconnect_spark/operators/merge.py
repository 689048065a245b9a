"""Latest-wins upsert merge — the MERGE INTO / CDC-compaction semantics
of a lakehouse table, built from pure relational ops (no Delta/Iceberg
runtime needed; SURVEY.md scope extension alongside the S8 table layer).

At 100 TB the shape matters: a change batch is orders of magnitude
smaller than the base table, and the merge must not rewrite what didn't
change. The implementation splits the base into touched/untouched by an
(ideally broadcast) semi-join on the update keys, resolves winners only
over the touched sliver + updates, and unions the untouched rows back
verbatim — the untouched path is a pass-through scan, never a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
) -> DataFrame:
    """One surviving row per key: the row with the greatest ``order_col``
    across base ∪ updates; on exact ``order_col`` ties the UPDATE wins
    (the CDC convention — a same-timestamp correction replaces the base
    row). Updates may also carry brand-new keys (inserts). Columns =
    ``base``'s columns; updates must carry the same schema.

    The per-key window runs only over touched keys (|updates| + their
    base matches — each key's group is tiny), so a billion-row base with
    a thousand-row change batch pays one semi-join and a thousand-row
    window, not a base-wide shuffle."""
    cols = base.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: base {sorted(cols)} vs updates "
            f"{sorted(updates.columns)}"
        )
    upd_keys = updates.select(*keys).distinct()
    untouched = base.join(F.broadcast(upd_keys), keys, "left_anti")
    touched = base.join(F.broadcast(upd_keys), keys, "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.desc("_prio")
    )
    winners = (
        touched.withColumn("_prio", F.lit(0))
        .unionByName(updates.select(*cols).withColumn("_prio", F.lit(1)))
        .withColumn("_rk", F.row_number().over(w))
        .where("_rk = 1")
        .select(*cols)
    )
    return untouched.unionByName(winners)


def scd2_build(
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    attrs: list[str],
    collapse: bool = True,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change feed: one
    validity interval per attribute state, per key —
    (keys…, attrs…, valid_from, valid_to) with valid_to NULL on the
    current row. The history-table twin of :func:`merge_upsert` (which
    keeps only latest-wins): SCD2 is how a 100-TB pipeline answers
    "what did this dimension say at event time" without storing a
    snapshot per day.

    ``order_cols`` defines the change order within a key (include a
    unique tiebreaker when timestamps can collide — determinism is the
    caller's contract). With ``collapse=True`` (default) consecutive
    rows with identical ``attrs`` merge into one interval — the
    idempotent-feed case where sources re-emit unchanged state. All
    windows partition by key and are bounded by changes-per-key."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    d = changes.select(*keys, *order_cols, *attrs)
    if collapse:
        same = None
        for a in attrs:
            eq = F.lag(F.col(a)).over(w).eqNullSafe(F.col(a))
            same = eq if same is None else (same & eq)
        # first row per key has lag NULL on every attr -> eqNullSafe only
        # true if attr is also NULL; guard with an explicit row marker
        first = F.row_number().over(w) == 1
        d = d.withColumn("_keep", first | ~same).where("_keep").drop("_keep")
    vfrom = F.col(order_cols[0])
    vto = F.lag(vfrom, -1).over(w)  # lead: next change's start
    return d.select(
        *keys,
        *attrs,
        vfrom.alias("valid_from"),
        vto.alias("valid_to"),
    )
