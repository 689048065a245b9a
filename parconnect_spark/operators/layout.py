"""Z-order (Morton) data-layout clustering — multi-dimensional file
pruning for lakehouse tables.

No reference analogue (SURVEY.md scope extension; the reference's layout
concern — block redistribution, `mxx::distribute_inplace` — is
one-dimensional). At 100 TB the dominant read cost is files scanned, and
parquet min/max pruning only prunes on the sort prefix: a table laid out
by (user_id) answers time-range queries with a full scan and vice versa.
Z-ordering interleaves the bits of k quantized dimensions into one Morton
key and range-partitions on it, so every output file covers a small
HYPERCUBE of the key space — min/max stats prune on EVERY dimension at
once (the Delta Lake / Iceberg `zorder by` semantics, rebuilt here from
integer arithmetic so an ANSI oracle can replay it bit-for-bit).

Everything is Catalyst bit-twiddling on longs — no UDF, no shuffle beyond
the final repartitionByRange (which is the point of the operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bin_col(name: str, lo: int, hi: int, bits: int) -> F.Column:
    """Integer-exact fixed-bounds quantization to [0, 2^bits):
    ((clamp(x) - lo) * 2^bits) div (hi - lo + 1). All long arithmetic
    (`div` = long floor division) — replicable in any ANSI engine, no
    float rounding anywhere."""
    span = hi - lo + 1
    return F.expr(
        f"((GREATEST(CAST({lo} AS BIGINT), LEAST(CAST({hi} AS BIGINT), "
        f"CAST(`{name}` AS BIGINT))) - CAST({lo} AS BIGINT)) "
        f"* {1 << bits}) div {span}"
    )


def _interleave(bins: list[F.Column], bits: int) -> F.Column:
    """Morton key: bit i of dim j lands at position i*d + j (LSB-first).
    d*bits <= 62 keeps the key in signed-64. Pure shift/and/or terms —
    whole-stage-codegen folds them into straight-line JVM code."""
    d = len(bins)
    z = F.lit(0).cast("long")
    for j, b in enumerate(bins):
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    return z


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: list[tuple[int, int]] | None = None,
    out_col: str = "zval",
) -> DataFrame:
    """Adds ``out_col``: the Morton key over ``cols`` (long-castable
    columns — timestamps should be pre-converted with unix_micros).

    ``bounds``: per-column (lo, hi) quantization bounds. Pass them from
    domain knowledge (the 100-TB path: bounds are catalog metadata, zero
    extra scans); ``None`` computes exact min/max in ONE aggregate scan.
    Values outside bounds clamp to the edge bins — layout degrades at the
    boundary, correctness doesn't (the key orders files, never filters
    rows). Each span must stay under 2^(63-bits) so the binning product
    cannot overflow signed-64; violated bounds raise loudly."""
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} dims x {bits} bits exceeds signed-64")
    if bounds is None:
        row = df.select(
            *[F.min(F.col(c).cast("long")).alias(f"_lo{i}") for i, c in enumerate(cols)],
            *[F.max(F.col(c).cast("long")).alias(f"_hi{i}") for i, c in enumerate(cols)],
        ).collect()[0]
        bounds = [(row[f"_lo{i}"], row[f"_hi{i}"]) for i in range(len(cols))]
    for c, (lo, hi) in zip(cols, bounds):
        if hi < lo:
            raise ValueError(f"bounds for {c} inverted: ({lo}, {hi})")
        if hi - lo >= 1 << (63 - bits):
            raise ValueError(
                f"span of {c} ({hi - lo}) overflows the {bits}-bit binning "
                f"product; widen bins or pre-scale the column"
            )
    bins = [_bin_col(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    return df.withColumn(out_col, _interleave(bins, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    bounds: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Range-partition by the Morton key into ``n_files`` partitions (one
    output file each under a standard parquet write): consecutive key
    ranges are small hypercubes of the dimension space, so every file's
    min/max footprint is tight on all of ``cols`` simultaneously. Write
    with ``.write.parquet(...)`` downstream; the key column is kept so
    stats land in the footer (drop it post-write if undesired)."""
    return zorder_key(df, cols, bits, bounds).repartitionByRange(
        n_files, "zval"
    )


def zorder_sql(cols: list[str], bounds: list[tuple[int, int]], bits: int = 16) -> str:
    """The EXACT SQL expression for the same Morton key (for oracles and
    engine-independent replay): mirrors _bin_col/_interleave term by term."""
    d = len(cols)
    terms = []
    for j, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        span = hi - lo + 1
        b = (
            f"(((GREATEST({lo}, LEAST({hi}, {c})) - {lo}) * {1 << bits}) "
            f"// {span})"
        )
        for i in range(bits):
            terms.append(f"((({b} >> {i}) & 1) << {i * d + j})")
    return " | ".join(terms)
