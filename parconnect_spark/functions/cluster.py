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


def embedding_gram(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = QUANT_SCALE,
    shift: int = QUANT_SHIFT,
) -> DataFrame:
    """Exact corpus second-moment (Gram) matrix over the quantized grid —
    the one aggregate PCA / whitening / covariance estimation needs from
    a 10^12-vector corpus (the 64×64 eigendecomposition afterwards is a
    driver-side triviality; THIS pass is the distributed work).

    Returns the upper triangle (dim_i ≤ dim_j): ``(dim_i, dim_j, n, s_i,
    s_j, s_ij)`` with Σq_i, Σq_j and Σq_i·q_j as DECIMAL(38,0) — exact on
    any engine and any partitioning (int64 would overflow past ~10^5
    vectors: q ≈ 3·10^6, so q_i·q_j ≈ 10^13 per row). Covariance/
    correlation are derived caller-side by exact integer algebra
    (n·s_ij − s_i·s_j).

    Physical shape: one ``mapInPandas`` pass emits a d×d int64 partial
    Gram per Arrow batch (a numpy ``MᵀM`` — the vectorized-UDF hot loop,
    §2.9: no per-row Python), safe while batch_rows·q² < 2^63 (≈5·10^5
    rows/batch at d=64 — Arrow batches default to 10^4); the global sum
    over batch partials is a map-side-combined DECIMAL aggregate of
    d(d+1)/2 rows per batch. Column sums ride a posexplode aggregate
    (d·n rows mapped, d rows shuffled). Nothing data-sized crosses an
    exchange."""
    import numpy as np
    import pandas as pd

    qdf = quantize_grid(embeddings, vec_col, id_col, scale, shift)
    d_probe = len(embeddings.select(vec_col).first()[0])
    iu = np.triu_indices(d_probe)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            g = m.T @ m
            yield pd.DataFrame(
                {
                    "dim_i": iu[0].astype("int32"),
                    "dim_j": iu[1].astype("int32"),
                    "partial": g[iu],
                }
            )

    gram = (
        qdf.mapInPandas(gen, schema="dim_i int, dim_j int, partial long")
        .groupBy("dim_i", "dim_j")
        .agg(F.sum(F.col("partial").cast("decimal(38,0)")).alias("s_ij"))
    )
    sums = (
        qdf.select(F.posexplode("qv").alias("dim", "q"))
        .groupBy("dim")
        .agg(F.sum(F.col("q").cast("decimal(38,0)")).alias("s"))
    )
    n = qdf.agg(F.count(F.lit(1)).alias("n"))
    return (
        gram.join(
            F.broadcast(sums.select(F.col("dim").alias("dim_i"),
                                    F.col("s").alias("s_i"))),
            "dim_i",
        )
        .join(
            F.broadcast(sums.select(F.col("dim").alias("dim_j"),
                                    F.col("s").alias("s_j"))),
            "dim_j",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "dim_i", "dim_j", "n",
            F.col("s_i").cast("decimal(38,0)").alias("s_i"),
            F.col("s_j").cast("decimal(38,0)").alias("s_j"),
            F.col("s_ij").cast("decimal(38,0)").alias("s_ij"),
        )
    )


def pca_project(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    iters: int = 8,
) -> DataFrame:
    """First-principal-component projection, end to end: Gram matrix by
    Arrow-batched partials (one X'X per batch, summed map-side — the
    same one-pass shape as embedding_gram, double precision here where
    that operator keeps the exact-integer 10^12-vector path), then the
    UNNORMALIZED power iteration v = G^iters · 1 (no per-step rescale —
    doubles hold the growth comfortably and the L2 normalization at the
    end makes the scale irrelevant; every step is a closed-form sum an
    ANSI oracle replays), then one dot product per vector against the
    normalized direction. Returns (id, pc1) at 6dp.

    Sign convention: G^k·1 is deterministic (no eigensolver sign
    ambiguity) — reproducibility is the contract, orientation is not."""
    import numpy as np
    import pandas as pd

    def gram_partials(batches):
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            G = X.T @ X
            p, q = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pd.DataFrame(
                {"p": p.ravel(), "q": q.ravel(), "g": G.ravel()}
            )

    gram_rows = (
        embeddings.select(vec_col)
        .mapInPandas(gram_partials, schema="p int, q int, g double")
        .groupBy("p", "q")
        .agg(F.sum("g").alias("g"))
        .collect()
    )
    G = np.zeros((dim, dim))
    for r in gram_rows:
        G[r["p"], r["q"]] = r["g"]
    v = np.ones(dim)
    for _ in range(iters):
        v = G @ v
    v = v / np.sqrt(float(v @ v))
    vec_lit = F.array(*[F.lit(float(x)) for x in v])
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col), vec_lit, lambda x, y: x.cast("double") * y
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return embeddings.select(
        F.col(id_col).alias("id"), F.round(dot, 6).alias("pc1")
    )


def jl_project(
    embeddings: DataFrame,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dim: int = 64,
    seed: str = "jl",
) -> DataFrame:
    """Johnson–Lindenstrauss sign-matrix random projection to
    ``out_dim`` — the cheap dimensionality reduction ahead of ANN /
    clustering when even PCA's Gram pass is too much: y_j = Σ_i s_ij·x_i
    / √out_dim with s_ij ∈ {−1, +1} drawn from md5(seed:j:i), so the
    matrix is REPLAYABLE (any engine, any session — the
    functions/similarity hyperplane-LSH discipline) and never
    materialized: it folds into one Catalyst expression per output
    dimension, a narrow zero-shuffle projection.

    Returns (id, y: array<double>) with each coordinate at 6dp."""
    import math

    from parconnect_spark.functions.dedup import md5int

    inv = 1.0 / math.sqrt(out_dim)
    cols = []
    for j in range(out_dim):
        terms = None
        for i in range(in_dim):
            sign = (
                F.when(
                    md5int(F.lit(f"{seed}:{j}:{i}")) % 2 == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
            )
            t = sign * F.col(vec_col)[i].cast("double")
            terms = t if terms is None else terms + t
        cols.append(F.round(terms * F.lit(inv), 6))
    return embeddings.select(
        F.col(id_col).alias("id"), F.array(*cols).alias("y")
    )
