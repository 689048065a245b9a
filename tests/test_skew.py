import pyspark.sql.functions as F

from parconnect_spark.operators.skew import hot_keys, salt_hot_edges, two_phase_agg
from parconnect_spark.plans.pagerank import pagerank


def skewed_df(spark):
    # key 0 has 500 rows (hub); keys 1..9 have 5 each
    rows = [(0, i, float(i % 7)) for i in range(500)]
    rows += [(k, i, float(i)) for k in range(1, 10) for i in range(5)]
    return spark.createDataFrame(rows, "k long, payload long, val double")


def test_hot_keys(spark):
    df = skewed_df(spark)
    assert {r["k"] for r in hot_keys(df, "k", 100).collect()} == {0}
    assert {r["k"] for r in hot_keys(df, "k", 4).collect()} == set(range(10))


def test_salt_hot_edges_spreads_only_hubs(spark):
    df = skewed_df(spark)
    salted = salt_hot_edges(df, "k", 100, buckets=8)
    per_key = (
        salted.groupBy("k").agg(F.countDistinct("_salt").alias("n")).collect()
    )
    n = {r["k"]: r["n"] for r in per_key}
    assert n[0] > 1  # hub spread across buckets
    assert all(n[k] == 1 for k in range(1, 10))  # cold keys untouched


def test_two_phase_agg_exact(spark):
    df = skewed_df(spark)
    salted = salt_hot_edges(df, "k", 100, buckets=8)
    got = {
        r["k"]: r["sum_val"]
        for r in two_phase_agg(salted, "k", "val", "sum", out_col="sum_val").collect()
    }
    exp = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(F.sum("val").alias("s")).collect()
    }
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9


def test_pagerank_hub_salting_matches_plain(spark):
    und = [(0, j) for j in range(1, 40)] + [(i, i + 1) for i in range(40, 50)]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    plain = {
        r["v"]: r["rank"] for r in pagerank(edges, num_iters=10, tol=None).collect()
    }
    hubbed = {
        r["v"]: r["rank"]
        for r in pagerank(
            edges, num_iters=10, tol=None, salt_buckets=8, hub_degree_threshold=20
        ).collect()
    }
    for v in plain:
        assert abs(plain[v] - hubbed[v]) < 1e-12
