"""Lloyd k-means over integer-quantized embeddings — the clustering step
of a training-data curation pipeline (corpus bucketing, domain balancing,
diversity sampling), built so two engines agree on every assignment.

Cross-engine determinism is the whole design (NOTES.md round-5 rules):
* vectors quantize to a NON-NEGATIVE integer grid —
  ``q_d = floor(x_d·scale + 0.5) + shift`` (round-half-up as an explicit
  IEEE floor, the quantize_int8 rule; the shift makes every value
  positive so integer division below is floor division in every engine —
  truncation vs floor never diverges on non-negatives).
* distances are EXACT int64 squared-L2 sums (64 dims × (2·10⁶)² ≈ 2.6e14,
  far inside signed-64); the argmin tie-breaks by centroid index via one
  lexicographic ``array_min`` over (dist, j) structs.
* centroid updates stay on the integer grid: per dimension
  ``c_d = (2·Σq + n) div (2·n)`` — round-half-up of the mean as pure
  integer arithmetic, no float mean whose value would depend on partition
  summation order.
* seeds are the k lowest-id vectors (the IVF-flat convention —
  replicable in plain SQL, no RNG). A cluster that loses all its points
  drops out (deterministic empty-cluster rule, matched by the oracle).

Physical plan, per Lloyd iteration: assignment is a narrow map (centroids
ride the plan as k·d literals — no shuffle, no UDF; the same gate as
ivf_topk's literal path, fine for k ≤ O(100); above that the Arrow-kernel
assignment of functions/similarity applies); the update is one posexplode
+ map-side-combined integer aggregate with k·d output rows, collected as
driver scalars (the standard Lloyd broadcast — k·d longs per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: quantization grid: floor(x·SCALE + 0.5) + SHIFT; SHIFT > SCALE·max|x|
#: keeps every grid value positive (embeddings are unit-ish floats).
QUANT_SCALE = 1_000_000
QUANT_SHIFT = 2_000_000


def quantize_grid(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = QUANT_SCALE,
    shift: int = QUANT_SHIFT,
) -> DataFrame:
    """(id, qv: array<long>) — embeddings on the shared non-negative
    integer grid. Pure Catalyst ``transform``; per-row work, no shuffle."""
    q = F.transform(
        F.col(vec_col),
        lambda v: F.floor(
            v.cast("double") * F.lit(float(scale)) + F.lit(0.5)
        ).cast("long")
        + F.lit(shift),
    )
    return embeddings.select(F.col(id_col), q.alias("qv"))


def _sq_dist(centroid: list[int]) -> F.Column:
    lits = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(F.col("qv"), lits, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_quantized(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = QUANT_SCALE,
    shift: int = QUANT_SHIFT,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Fixed-iteration Lloyd k-means on the integer grid.

    Returns ``(assignment, centroids)``: assignment is
    DataFrame[<id_col>, cluster: int, dist: long] — each vector's final
    cluster (seed index) and its EXACT squared grid distance; centroids is
    the final [(j, grid_vector)] list. Compared at fixed ``iters`` like
    the contract's pagerank/labelprop (the oracle unrolls the same
    recurrence)."""
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    pts = quantize_grid(embeddings, vec_col, id_col, scale, shift)
    pts = pts.localCheckpoint()  # eager: consumed every iteration
    seed_rows = pts.orderBy(id_col).limit(k).collect()
    centroids = [(j, list(r["qv"])) for j, r in enumerate(seed_rows)]
    asg = None
    for _ in range(iters):
        arr = F.array(
            *[
                F.struct(_sq_dist(c).alias("d"), F.lit(j).alias("j"))
                for j, c in centroids
            ]
        )
        best = F.array_min(arr)
        asg = pts.select(
            F.col(id_col),
            "qv",
            best["d"].alias("dist"),
            best["j"].cast("int").alias("cluster"),
        )
        upd = (
            asg.select("cluster", F.posexplode("qv").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cluster",
                "dim",
                F.expr("(2 * s + n) div (2 * n)").alias("val"),
            )
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in upd.collect():
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["val"]
        centroids = [
            (j, [dims[d] for d in sorted(dims)])
            for j, dims in sorted(by_cluster.items())
        ]
    return asg.select(id_col, "cluster", "dist"), centroids
