"""Integer-grid Lloyd k-means (functions/cluster.py) vs a sequential
numpy-free replay of the identical integer recurrence."""

import math
import random

import pytest

from parconnect_spark.functions.cluster import (
    QUANT_SCALE,
    QUANT_SHIFT,
    kmeans_quantized,
    quantize_grid,
)


def _grid(vec, scale=QUANT_SCALE, shift=QUANT_SHIFT):
    return [math.floor(x * scale + 0.5) + shift for x in vec]


def kmeans_brute(rows, k, iters):
    """Sequential replay: same grid, same (dist, j) argmin, same
    (2s+n)//(2n) integer centroid update, same empty-cluster drop."""
    pts = {vid: _grid(vec) for vid, vec in rows}
    seeds = sorted(pts)[:k]
    cents = [(j, pts[v]) for j, v in enumerate(seeds)]
    asg = {}
    for _ in range(iters):
        asg = {}
        for vid, q in pts.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(q, c)), j) for j, c in cents
            )
            asg[vid] = (best[1], best[0])
        by_j = {}
        for vid, (j, _d) in asg.items():
            by_j.setdefault(j, []).append(pts[vid])
        cents = [
            (
                j,
                [
                    (2 * sum(v[d] for v in vs) + len(vs)) // (2 * len(vs))
                    for d in range(len(vs[0]))
                ],
            )
            for j, vs in sorted(by_j.items())
        ]
    return {vid: (j, d) for vid, (j, d) in asg.items()}, cents


def _mk(spark, rows):
    return spark.createDataFrame(
        [(vid, vec) for vid, vec in rows], "vec_id long, embedding array<float>"
    )


def test_kmeans_matches_replay(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(60)
    ]
    df = _mk(spark, rows)
    asg, cents = kmeans_quantized(df, k=4, iters=3)
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in asg.collect()}
    # replay on the engine's own grid values (float32 storage rounds the
    # inputs; read them back so both sides quantize identical doubles)
    stored = {
        r["vec_id"]: list(r["embedding"]) for r in df.collect()
    }
    want, want_cents = kmeans_brute(sorted(stored.items()), k=4, iters=3)
    assert got == want
    assert [(j, list(c)) for j, c in cents] == [
        (j, list(c)) for j, c in want_cents
    ]


def test_kmeans_separated_blobs(spark):
    # two well-separated blobs, k=2: the partition must match the blobs.
    rng = random.Random(7)
    rows = [(i, [0.4 + rng.uniform(-0.01, 0.01)] * 4) for i in range(10)] + [
        (100 + i, [-0.4 + rng.uniform(-0.01, 0.01)] * 4) for i in range(10)
    ]
    asg, _ = kmeans_quantized(_mk(spark, rows), k=2, iters=3)
    got = {r["vec_id"]: r["cluster"] for r in asg.collect()}
    assert len({got[i] for i in range(10)}) == 1
    assert len({got[100 + i] for i in range(10)}) == 1
    assert got[0] != got[100]


def test_kmeans_partition_invariant(spark):
    import pyspark.sql.functions as F

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-0.5, 0.5) for _ in range(6)]) for i in range(40)]
    df = _mk(spark, rows)
    a, _ = kmeans_quantized(df, k=3, iters=2)
    b, _ = kmeans_quantized(df.orderBy(F.rand(seed=2)).repartition(7), k=3, iters=2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_kmeans_rejects_bad_params(spark):
    df = _mk(spark, [(0, [0.1, 0.2])])
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=0)
    with pytest.raises(ValueError):
        kmeans_quantized(df, k=1, iters=0)


def test_embedding_gram_matches_pure_python(spark):
    import math

    rows = [(i, [0.1 * i - 0.25, -0.5 + 0.07 * i, 0.33]) for i in range(9)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    from parconnect_spark.functions.cluster import (
        QUANT_SCALE,
        QUANT_SHIFT,
        embedding_gram,
    )

    got = {
        (r["dim_i"], r["dim_j"]): r.asDict()
        for r in embedding_gram(emb.repartition(4)).collect()
    }

    # replay: float32-widened values, same floor(x*scale+0.5)+shift grid
    import numpy as np

    qs = []
    for _, v in rows:
        v32 = np.array(v, dtype=np.float32).astype(float)
        qs.append(
            [int(math.floor(x * QUANT_SCALE + 0.5)) + QUANT_SHIFT for x in v32]
        )
    d = 3
    for i in range(d):
        for j in range(i, d):
            w = got[(i, j)]
            assert int(w["n"]) == 9
            assert int(w["s_i"]) == sum(q[i] for q in qs)
            assert int(w["s_j"]) == sum(q[j] for q in qs)
            assert int(w["s_ij"]) == sum(q[i] * q[j] for q in qs)
    assert len(got) == d * (d + 1) // 2


def test_embedding_gram_partition_invariant(spark):
    rows = [(i, [0.01 * ((i * 7) % 13), 0.5 - 0.02 * i]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    from parconnect_spark.functions.cluster import embedding_gram

    a = sorted(map(tuple, embedding_gram(emb.repartition(1)).collect()))
    b = sorted(map(tuple, embedding_gram(emb.repartition(7)).collect()))
    assert a == b


def test_pca_project_matches_numpy(spark):
    import numpy as np

    from parconnect_spark.functions.cluster import pca_project

    rng_rows = []
    # deterministic anisotropic cloud in 4-d: dominant axis = (1,1,0,0)
    for i in range(40):
        a = ((i * 37) % 19 - 9) / 3.0          # large variance
        b = ((i * 11) % 7 - 3) / 10.0          # small variance
        rng_rows.append((i, [a + b, a - b, b, 0.1]))
    d = spark.createDataFrame(rng_rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r["pc1"] for r in pca_project(d, dim=4, iters=8).collect()}

    X = np.array([r[1] for r in rng_rows], dtype=np.float32).astype(np.float64)
    G = X.T @ X
    v = np.ones(4)
    for _ in range(8):
        v = G @ v
    v /= np.sqrt(v @ v)
    exp = X @ v
    for i in range(40):
        assert abs(got[i] - round(float(exp[i]), 6)) <= 2e-6
    # the dominant direction is ~(1,1,0,0)/sqrt(2): check alignment
    assert abs(abs(v[0]) - abs(v[1])) < 0.05 and abs(v[2]) < 0.2


def test_pca_project_partition_invariant_at_6dp(spark):
    from parconnect_spark.functions.cluster import pca_project

    rows = [(i, [float((i * 13) % 11), float(i % 5), 1.0, 0.0]) for i in range(60)]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(map(tuple, pca_project(d, dim=4).collect()))
    b = sorted(map(tuple, pca_project(d.repartition(9), dim=4).collect()))
    assert a == b and a


def test_jl_project_matches_pure_python_and_preserves_norms(spark):
    import hashlib
    import math

    from parconnect_spark.functions.cluster import jl_project

    rows = [(i, [float((i * 7 + d) % 5 - 2) for d in range(8)]) for i in range(12)]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r["y"] for r in jl_project(d, out_dim=4, in_dim=8, seed="t").collect()}

    def sign(j, i):
        h = int(hashlib.md5(f"t:{j}:{i}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 0 else -1.0

    for vid, vec in rows:
        exp = [
            round(sum(sign(j, i) * vec[i] for i in range(8)) / math.sqrt(4), 6)
            for j in range(4)
        ]
        assert all(abs(a - b) < 2e-6 for a, b in zip(got[vid], exp))
