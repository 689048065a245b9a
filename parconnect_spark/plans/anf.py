"""Approximate neighborhood function via per-vertex HLL registers —
the HyperANF scheme (Boldi, Rosa & Vigna, "HyperANF: approximating the
neighbourhood function of very large graphs on a budget", WWW 2011;
SURVEY.md §2.10 family, absent from the reference).

Each vertex carries a HyperLogLog sketch of its distance-≤t ball; one hop
of "my ball ∪= my neighbours' balls" is a register MAX-merge, so the whole
iteration is a join + one map-side-combinable max aggregate per hop —
the shape that computes effective-diameter/centrality statistics of a
100-TB graph in O(diameter) passes where exact per-vertex BFS balls
(plans/bfs.multi_source_bfs) cost O(|V|·|ball|) state. Registers live as
plain rows ``(v, reg, rho)`` (≤ |V|·2^p of them), not arrays — max-merge
is a groupBy, hub vertices combine map-side, and the state table is just
another DataFrame to checkpoint.

Determinism (the cross-engine contract): the per-vertex seed hash is the
engine's portable md5 fold (functions/sketch conventions: 15 hex digits =
60 bits, reg = h mod m, rho = leading-zero rank of the remaining bits),
and register evolution is max-merge — order- and partition-independent.
A DuckDB oracle replays every hop bit-for-bit; the per-vertex estimate is
the standard HLL estimator over exact-bigint register sums, one
deterministic double expression (the functions/sketch.hll_estimate math,
per vertex)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.functions.dedup import md5int
from parconnect_spark.functions.sketch import HASH_BITS, HASH_HEX_CHARS


def vertex_registers(
    verts: DataFrame, p: int = 6, salt: str = "anf"
) -> DataFrame:
    """Hop-0 register table: DataFrame[v, reg, rho] — each vertex's sketch
    of {itself}. One row per vertex; same hash layout as
    functions/sketch.hll_registers with the vertex id as the item."""
    m = 1 << p
    wbits = HASH_BITS - p
    h = md5int(
        F.concat(F.lit(f"{salt}:"), F.col("v").cast("string")),
        1,
        HASH_HEX_CHARS,
    )
    bitlen = F.length(F.conv(F.col("w").cast("string"), 10, 2))
    return (
        verts.select("v", F.pmod(h, F.lit(m)).alias("reg"), h.alias("_h"))
        .withColumn("w", F.expr(f"_h div {m}"))
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(wbits + 1)).otherwise(
                F.lit(wbits) - bitlen + 1
            ),
        )
        .select("v", "reg", F.col("rho").cast("int").alias("rho"))
    )


def neighborhood_registers(
    edges: DataFrame, hops: int, p: int = 6, salt: str = "anf"
) -> DataFrame:
    """Register table after ``hops`` max-merge rounds: each vertex's HLL
    sketch of its distance-≤hops ball.

    ``edges``: distinct symmetric (src, dst) long pairs (directed works
    too — balls then follow out-edges). Per hop: one join gathering
    neighbour registers + one grouped max; lazy localCheckpoint keeps the
    plan depth O(1) (the CC loop's rule)."""
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    regs = vertex_registers(verts, p, salt).localCheckpoint(eager=False)
    for _ in range(hops):
        gathered = edges.join(
            regs.withColumnRenamed("v", "dst"), "dst"
        ).select(F.col("src").alias("v"), "reg", "rho")
        regs = (
            regs.unionByName(gathered)
            .groupBy("v", "reg")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=False)
        )
    return regs


def anf_estimates(regs: DataFrame, p: int = 6) -> DataFrame:
    """Per-vertex ball-size estimates from a register table:
    DataFrame[v, nonzero_regs, raw_sum, estimate].

    raw_sum = Σ 2^(RMAX − rho) over ALL m registers (absent ⇒ rho 0) as an
    EXACT bigint (per vertex it fits comfortably in int64); estimate is
    the standard α_m·m²·2^RMAX / raw_sum with the linear-counting
    correction, rounded to 4dp — the functions/sketch.hll_estimate math
    applied per vertex."""
    m = 1 << p
    rmax = HASH_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy("v").agg(
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
        .select(
            "v",
            F.col("nonzero_regs").cast("long").alias("nonzero_regs"),
            "raw_sum",
            F.round(corrected, 4).alias("estimate"),
        )
    )


def neighborhood_function(
    edges: DataFrame, max_hops: int = 4, p: int = 6, salt: str = "anf"
) -> list[tuple[int, float]]:
    """The neighbourhood function N(t) = Σ_v |ball(v, t)| estimate for
    t = 0..max_hops — the HyperANF headline curve (effective diameter is
    read off it). Driver-side floats (the sum of per-vertex estimates is a
    reporting convenience, not a contract value — contracts pin the
    registers, see anf_estimates)."""
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    regs = vertex_registers(verts, p, salt).localCheckpoint(eager=False)
    out: list[tuple[int, float]] = []
    for t in range(max_hops + 1):
        if t > 0:
            gathered = edges.join(
                regs.withColumnRenamed("v", "dst"), "dst"
            ).select(F.col("src").alias("v"), "reg", "rho")
            regs = (
                regs.unionByName(gathered)
                .groupBy("v", "reg")
                .agg(F.max("rho").alias("rho"))
                .localCheckpoint(eager=False)
            )
        total = (
            anf_estimates(regs, p).agg(F.sum("estimate")).first()[0]
        )
        out.append((t, float(total)))
    return out
