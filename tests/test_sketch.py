import pyspark.sql.functions as F
import pytest

from parconnect_spark.functions.sketch import (
    cms_estimate,
    count_min_sketch,
    heavy_hitters,
    hll_estimate,
    hll_registers,
)


def _tokens(spark, n=3000, keys=40):
    return spark.createDataFrame(
        [(f"k{i % keys}",) for i in range(n)], "term string"
    )


def test_cms_never_undercounts_and_exact_at_low_load(spark):
    items = _tokens(spark)
    sk = count_min_sketch(items, "term", depth=4, width=256)
    qs = spark.createDataFrame(
        [("k0",), ("k39",), ("absent",)], "term string"
    )
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(sk, qs, "term", depth=4, width=256).collect()
    }
    assert est["k0"] >= 75 and est["k39"] >= 75  # CMS property: est >= true
    assert est["absent"] == 0
    # 40 keys in a 4x256 grid: collisions are essentially impossible to
    # saturate all 4 rows -> the min recovers the exact count
    assert est["k0"] == 75 and est["k39"] == 75


def test_cms_partition_invariance(spark):
    items = _tokens(spark)
    a = count_min_sketch(items, "term", depth=2, width=64)
    b = count_min_sketch(items.repartition(13), "term", depth=2, width=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cms_weighted(spark):
    items = spark.createDataFrame(
        [("x", 5), ("x", 2), ("y", 1)], "term string, w int"
    )
    sk = count_min_sketch(items, "term", depth=3, width=32, weight_col="w")
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(
            sk, items.select("term").distinct(), "term", depth=3, width=32
        ).collect()
    }
    assert est == {"x": 7, "y": 1}


def test_hll_accuracy_and_partition_invariance(spark):
    items = spark.range(20000).selectExpr("concat('key_', id) AS term")
    e = hll_estimate(hll_registers(items, "term", p=10), p=10).collect()[0]
    # standard error ~ 1.04/sqrt(1024) ~ 3.3%; 10% is a safe determinism band
    assert abs(e["estimate"] - 20000) / 20000 < 0.10
    e2 = hll_estimate(
        hll_registers(items.repartition(17), "term", p=10), p=10
    ).collect()[0]
    assert (e["raw_sum"], e["estimate"]) == (e2["raw_sum"], e2["estimate"])


def test_hll_duplicates_dont_move_registers(spark):
    base = spark.range(500).selectExpr("concat('k', id) AS term")
    dup = base.union(base).union(base)
    a = hll_estimate(hll_registers(base, "term", p=8), p=8).collect()[0]
    b = hll_estimate(hll_registers(dup, "term", p=8), p=8).collect()[0]
    assert tuple(a) == tuple(b)


def test_hll_small_range_linear_counting(spark):
    # 51 distinct keys in 1024 registers -> the linear-counting branch
    items = spark.createDataFrame(
        [(f"k{i}",) for i in range(51)], "term string"
    )
    e = hll_estimate(hll_registers(items, "term", p=10), p=10).collect()[0]
    assert e["nonzero_regs"] <= 51
    assert abs(e["estimate"] - 51) / 51 < 0.15


def test_hll_merge_via_register_max(spark):
    """Sketch mergeability — the property that makes it a 100-TB tool:
    registers built on two halves, merged by per-register MAX, equal the
    registers built on the union."""
    a = spark.range(0, 1000).selectExpr("concat('k', id) AS term")
    b = spark.range(700, 2000).selectExpr("concat('k', id) AS term")
    ra = hll_registers(a, "term", p=9)
    rb = hll_registers(b, "term", p=9)
    merged = (
        ra.unionByName(rb)
        .groupBy("reg")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    full = hll_registers(a.unionByName(b), "term", p=9)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_heavy_hitters_exact_vs_brute_force(spark):
    # Zipf-ish: key i appears 200//(i+1) times
    rows = [(f"k{i}",) for i in range(40) for _ in range(200 // (i + 1))]
    items = spark.createDataFrame(rows, "term string")
    got = {
        (r["term"], r["cnt"])
        for r in heavy_hitters(items, "term", min_count=25).collect()
    }
    import collections

    cnt = collections.Counter(t for t, in rows)
    want = {(k, c) for k, c in cnt.items() if c >= 25}
    assert got == want


def test_heavy_hitters_collisions_cannot_add_false_positives(spark):
    """A deliberately tiny grid (width=2) makes every CM estimate wildly
    inflated — the exact-verify pass must still return exactly the true
    heavy set."""
    rows = [("hot",)] * 50 + [(f"cold{i}",) for i in range(60)]
    items = spark.createDataFrame(rows, "term string")
    out = heavy_hitters(items, "term", min_count=10, depth=2, width=2).collect()
    assert [(r["term"], r["cnt"]) for r in out] == [("hot", 50)]


def test_heavy_hitters_partition_invariance_and_threshold_edge(spark):
    rows = [("a",)] * 10 + [("b",)] * 9 + [("c",)] * 11
    items = spark.createDataFrame(rows, "term string")
    a = sorted(map(tuple, heavy_hitters(items, "term", 10).collect()))
    b = sorted(
        map(tuple, heavy_hitters(items.repartition(7), "term", 10).collect())
    )
    # >= is inclusive: a (exactly 10) is in, b (9) is out
    assert a == b == [("a", 10), ("c", 11)]


def test_heavy_hitters_prunes_before_the_exact_aggregate(spark):
    """The scale claim itself: the candidate filter must drop light rows
    BEFORE the exact groupBy. Verified on the physical plan — the
    pre-aggregate Filter contains the least(element_at(...)) estimate."""
    rows = [("hot",)] * 64 + [(f"cold{i}",) for i in range(64)]
    items = spark.createDataFrame(rows, "term string")
    df = heavy_hitters(items, "term", min_count=32, depth=2, width=512)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "least(" in plan and "element_at" in plan
    assert [(r["term"], r["cnt"]) for r in df.collect()] == [("hot", 64)]


def test_heavy_hitters_rejects_bad_min_count(spark):
    items = spark.createDataFrame([("a",)], "term string")
    with pytest.raises(ValueError):
        heavy_hitters(items, "term", 0)
