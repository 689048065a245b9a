"""Per-community conductance (plans/labelprop.conductance): hand cases on
known cuts, the whole-graph zero branch, and a brute-force replay."""

from parconnect_spark.plans.labelprop import conductance


def _sym(spark, und):
    rows = und + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src long, dst long")


def _labels(spark, m):
    return spark.createDataFrame(list(m.items()), "v long, label long")


def _rows(df):
    return {
        r["label"]: (r["cut"], r["volume"], r["conductance"])
        for r in df.collect()
    }


def test_two_triangles_one_bridge(spark):
    # triangles {0,1,2} and {3,4,5} joined by edge (2,3): each community
    # has vol = 2*3 + 1 = 7, cut = 1, 2m = 14 -> phi = 1/7
    und = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    got = _rows(conductance(_sym(spark, und), _labels(spark, labels)))
    assert got == {0: (1, 7, 1 / 7), 3: (1, 7, 1 / 7)}


def test_whole_graph_community_scores_zero(spark):
    und = [(0, 1), (1, 2)]
    got = _rows(conductance(_sym(spark, und), _labels(spark, {0: 9, 1: 9, 2: 9})))
    assert got == {9: (0, 4, 0.0)}


def test_singleton_vertex_community(spark):
    # vertex 2 alone: vol = deg(2) = 1, cut = 1 -> phi = 1
    und = [(0, 1), (1, 2)]
    labels = {0: 0, 1: 0, 2: 2}
    got = _rows(conductance(_sym(spark, und), _labels(spark, labels)))
    assert got[2] == (1, 1, 1.0)
    # community {0,1}: vol 3, but 2m - vol = 1 is the smaller side -> 1/1
    assert got[0] == (1, 3, 1.0)


def _brute(und, labels):
    sym = und + [(b, a) for a, b in und]
    two_m = len(sym)
    out = {}
    for c in set(labels.values()):
        vol = sum(1 for (a, _) in sym if labels[a] == c)
        cut = sum(1 for (a, b) in sym if labels[a] == c and labels[b] != c)
        d = min(vol, two_m - vol)
        out[c] = (cut, vol, cut / d if d > 0 else 0.0)
    return out


def test_brute_force_parity(spark):
    import random

    rng = random.Random(5)
    und = list({tuple(sorted((rng.randrange(12), rng.randrange(12)))) for _ in range(30)})
    und = [e for e in und if e[0] != e[1]]
    labels = {v: rng.randrange(3) for v in range(12)}
    verts = {v for e in und for v in e}
    labels = {v: labels[v] for v in verts}
    got = _rows(conductance(_sym(spark, und), _labels(spark, labels)))
    assert got == _brute(und, labels)
