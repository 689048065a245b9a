import pytest
from pyspark.sql import functions as F

from parconnect_spark.functions.dedup import contamination_check
from parconnect_spark.functions.sampling import (
    cluster_split,
    hash_split,
    stratified_sample,
    uniform_hash,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    header = [f"h{j}" for j in range(8)]  # boilerplate shared by ALL docs
    for i in range(200):
        lang = ["en", "es", "fr"][i % 3]
        # every 10th doc (>=10) verbatim-copies doc (i-5)'s text — the
        # planted contamination positive (i-5 is never itself a copy)
        base = i - 5 if (i % 10 == 0 and i >= 10) else i
        body = [f"b{base}_{j}" for j in range(22)]
        rows.append((i, " ".join(header + body), lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stratified_sample_exact_quota(spark, docs):
    out = stratified_sample(docs, "lang", quota=15, id_col="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 15, "es": 15, "fr": 15}
    ranks = [r["sample_rank"] for r in out.where("lang = 'en'").orderBy("sample_rank").collect()]
    assert ranks == list(range(1, 16))


def test_stratified_sample_order_invariance(spark, docs):
    a = stratified_sample(docs, "lang", quota=15).select("doc_id", "sample_rank")
    b = stratified_sample(docs.repartition(7), "lang", quota=15).select(
        "doc_id", "sample_rank"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stratified_sample_small_stratum_keeps_all(spark):
    tiny = spark.createDataFrame(
        [(i, "x", "en") for i in range(5)] + [(10 + i, "y", "de") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    out = stratified_sample(tiny, "lang", quota=10)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 5, "de": 10}  # quota > n keeps the whole stratum


def test_hash_split_deterministic_partition(spark, docs):
    train, hold = hash_split(docs, holdout_frac=0.2)
    nt, nh = train.count(), hold.count()
    assert nt + nh == 200
    assert 10 <= nh <= 70  # ~40 expected; loose deterministic band
    # disjoint and reproducible
    assert train.join(hold, "doc_id").count() == 0
    t2, h2 = hash_split(docs.repartition(5), holdout_frac=0.2)
    assert h2.exceptAll(hold).count() == 0 and hold.exceptAll(h2).count() == 0
    # different salt gives a different (still deterministic) split
    _, h3 = hash_split(docs, holdout_frac=0.2, salt="other")
    assert h3.select("doc_id").exceptAll(hold.select("doc_id")).count() > 0


@pytest.mark.slow
def test_cluster_split_no_cluster_straddles(spark, docs):
    # near-dup pairs: chain 0~1~2 (one cluster) plus 10~11; everything else
    # singleton. The WHOLE chain must land on one side.
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = cluster_split(docs, pairs, holdout_frac=0.3)
    assert out.count() == 200
    rows = {r["doc_id"]: (r["canonical_id"], r["side"]) for r in out.collect()}
    assert rows[0][0] == rows[1][0] == rows[2][0] == 0
    assert rows[10][0] == rows[11][0] == 10
    # cluster integrity: one side per canonical id
    sides = (
        out.groupBy("canonical_id")
        .agg(F.countDistinct("side").alias("n"))
        .where("n > 1")
        .count()
    )
    assert sides == 0
    # deterministic under repartition
    out2 = cluster_split(docs.repartition(7), pairs, holdout_frac=0.3)
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0
    # both sides populated at this frac on 200 docs
    ns = {r["side"]: r["n"] for r in out.groupBy("side").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert ns.get("holdout", 0) > 0 and ns.get("train", 0) > 0


def test_uniform_hash_range(spark, docs):
    us = docs.select(uniform_hash(F.col("doc_id")).alias("u")).collect()
    assert all(0.0 <= r["u"] < 1.0 for r in us)
    assert len({round(r["u"], 9) for r in us}) > 190  # essentially all distinct


def test_contamination_finds_planted_copies(spark, docs):
    # benchmark = every 10th doc (>=10); each verbatim-copies train doc k-5
    bench = docs.where("doc_id % 10 = 0 and doc_id >= 10")
    train = docs.where("doc_id % 10 <> 0 or doc_id < 10")
    out = contamination_check(
        train, bench, n=4, min_overlap_frac=0.9, max_shingle_df=None
    ).collect()
    got = {(r["train_id"], r["bench_id"]) for r in out}
    expected = {(k - 5, k) for k in range(10, 200, 10)}
    assert expected <= got
    for r in out:
        if (r["train_id"], r["bench_id"]) in expected:
            assert r["overlap_frac"] == 1.0
    # boilerplate-only pairs (5 shared header shingles of ~27) stay below 0.9
    assert all(pair in expected for pair in got)


def test_contamination_df_cap_drops_boilerplate(spark, docs):
    """The df cap drops the all-docs header shingles from BOTH sides:
    boilerplate-only pairs vanish while planted copies stay at 1.0."""
    bench = docs.where("doc_id % 10 = 0 and doc_id >= 10")
    train = docs.where("doc_id % 10 <> 0 or doc_id < 10")
    out = contamination_check(
        train, bench, n=4, min_overlap_frac=0.05, max_shingle_df=3
    ).collect()
    assert all(0.0 <= r["overlap_frac"] <= 1.0 for r in out)
    expected = {(k - 5, k) for k in range(10, 200, 10)}
    got = {(r["train_id"], r["bench_id"]) for r in out}
    # pure-header shingles (df=181 train docs) are gone, so only pairs
    # sharing doc-specific body/boundary shingles remain: the planted ones
    assert got == expected
    assert all(r["overlap_frac"] == 1.0 for r in out)


def test_global_row_number_total_order(spark):
    import pyspark.sql.functions as F

    from parconnect_spark.functions.sampling import global_row_number

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7919 % 100).alias("score")
    )
    rows = sorted(
        (r["rn"], r["score"], r["doc_id"])
        for r in global_row_number(df, ["score", "doc_id"]).collect()
    )
    assert [r[0] for r in rows] == list(range(500))
    assert rows == sorted(rows, key=lambda x: (x[1], x[2]))
    # partition invariance
    rows2 = sorted(
        (r["rn"], r["score"], r["doc_id"])
        for r in global_row_number(
            df.repartition(11), ["score", "doc_id"]
        ).collect()
    )
    assert rows == rows2


def test_quantile_trim_band(spark):
    import pyspark.sql.functions as F

    from parconnect_spark.functions.sampling import quantile_trim

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7919 % 1000).alias("score")
    )
    t = quantile_trim(df, "score", 0.05, 0.95)
    ranks = sorted(r["rank"] for r in t.collect())
    assert len(ranks) == 900 and ranks[0] == 50 and ranks[-1] == 949


def test_quantile_trim_empty_and_degenerate(spark):
    import pyspark.sql.functions as F

    from parconnect_spark.functions.sampling import quantile_trim

    empty = spark.createDataFrame([], "doc_id long, score long")
    assert quantile_trim(empty, "score").count() == 0
    one = spark.createDataFrame([(1, 5)], "doc_id long, score long")
    # floor(0.05*1)=0, ceil(0.95*1)=1 -> the single row stays
    assert quantile_trim(one, "score").count() == 1


def test_deterministic_sample_k(spark):
    from parconnect_spark.functions.sampling import deterministic_sample_k

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = sorted(r["doc_id"] for r in deterministic_sample_k(df, 25).collect())
    # reproducible across partitionings; different salt -> different draw
    b = sorted(
        r["doc_id"]
        for r in deterministic_sample_k(df.repartition(7), 25).collect()
    )
    c = sorted(
        r["doc_id"] for r in deterministic_sample_k(df, 25, salt="x").collect()
    )
    assert a == b and len(a) == 25 and a != c
    # physically a top-k, not a global sort
    plan = (
        deterministic_sample_k(df, 25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # k > n returns everything
    small = spark.range(3).withColumnRenamed("id", "doc_id")
    assert deterministic_sample_k(small, 10).count() == 3


def test_weighted_sample_k_matches_pure_python_race(spark):
    """The race is a pure function of (id, salt, weight): recomputing the
    exact documented formula with hashlib/math must select the same rows —
    the engine-independence claim as an executable fact."""
    import hashlib
    import math

    from parconnect_spark.functions.sampling import weighted_sample_k

    rows = [(i, (i % 10) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(
        r["doc_id"] for r in weighted_sample_k(df, 20, "w", salt="s").collect()
    )

    def pri(i, w):
        h = int(hashlib.md5(f"{i}:s".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / 2**52
        return (round(-math.log(u) / w * 1e6), i)

    want = sorted(i for i, w in sorted(rows, key=lambda t: pri(*t))[:20])
    assert got == want


def test_weighted_sample_k_weights_drive_inclusion(spark):
    from parconnect_spark.functions.sampling import weighted_sample_k

    # one row with overwhelming weight is in essentially every draw
    rows = [(0, 10**9)] + [(i, 1) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    for salt in ("a", "b", "c"):
        ids = {r["doc_id"] for r in weighted_sample_k(df, 5, "w", salt=salt).collect()}
        assert 0 in ids
    # across many salts, heavy keys win more often than light ones
    heavy_light = [(i, 50 if i < 20 else 1) for i in range(200)]
    df2 = spark.createDataFrame(heavy_light, "doc_id long, w long")
    wins = {"heavy": 0, "light": 0}
    for salt in map(str, range(8)):
        for r in weighted_sample_k(df2, 10, "w", salt=salt).collect():
            wins["heavy" if r["doc_id"] < 20 else "light"] += 1
    assert wins["heavy"] > wins["light"]


def test_weighted_sample_k_partition_invariance_and_guards(spark):
    import pytest

    from parconnect_spark.functions.sampling import weighted_sample_k

    rows = [(i, float(i % 7) - 1.0) for i in range(100)]  # some <=0 weights
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = sorted(map(tuple, weighted_sample_k(df, 15, "w").collect()))
    b = sorted(map(tuple, weighted_sample_k(df.repartition(9), 15, "w").collect()))
    assert a == b and len(a) == 15
    # non-positive / NULL weights never selected
    assert all(w > 0 for _, w in a)
    nul = spark.createDataFrame([(1, None), (2, 3.0)], "doc_id long, w double")
    assert [r["doc_id"] for r in weighted_sample_k(nul, 5, "w").collect()] == [2]
    # physically a top-k
    plan = weighted_sample_k(df, 15, "w")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        weighted_sample_k(df, 0, "w")


def test_group_quantile_filter_vs_brute_force(spark):
    from parconnect_spark.functions.sampling import group_quantile_filter

    rows = [
        (f"g{g}", i, (i * 7 + g) % 13) for g in range(4) for i in range(30 + g * 17)
    ]
    df = spark.createDataFrame(rows, "grp string, rid long, score long")
    got = sorted(
        (r["grp"], r["rid"]) for r in group_quantile_filter(df, "grp", "score", 3, 10).collect()
    )

    # brute force: smallest score-closed top set with >= floor(n*3/10) rows
    import collections

    by_g = collections.defaultdict(list)
    for g, i, s in rows:
        by_g[g].append((s, i))
    want = []
    for g, items in by_g.items():
        needed = len(items) * 3 // 10
        if needed == 0:
            continue
        scores = sorted({s for s, _ in items}, reverse=True)
        cge = 0
        thr = None
        for s in scores:
            cge += sum(1 for x, _ in items if x == s)
            if cge >= needed:
                thr = s
                break
        want += [(g, i) for s, i in items if s >= thr]
    assert got == sorted(want)
    # every group keeps at least its required count and the set is tie-closed
    kept = collections.Counter(g for g, _ in got)
    for g, items in by_g.items():
        needed = len(items) * 3 // 10
        assert kept[g] >= needed


def test_group_quantile_filter_ties_and_small_groups(spark):
    from parconnect_spark.functions.sampling import group_quantile_filter

    rows = [("a", i, 5) for i in range(10)] + [("tiny", 99, 7)]
    df = spark.createDataFrame(rows, "grp string, rid long, score long")
    out = group_quantile_filter(df, "grp", "score", 1, 2).collect()
    # all of group a ties at 5 -> the whole group survives; tiny has
    # floor(1*1/2)=0 -> dropped
    assert sorted(r["rid"] for r in out) == list(range(10))


def test_group_quantile_filter_partition_invariance_and_guards(spark):
    import pytest

    from parconnect_spark.functions.sampling import group_quantile_filter

    rows = [("g", i, i % 11) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, rid long, score long")
    a = sorted(r["rid"] for r in group_quantile_filter(df, "grp", "score", 1, 4).collect())
    b = sorted(
        r["rid"]
        for r in group_quantile_filter(df.repartition(13), "grp", "score", 1, 4).collect()
    )
    assert a == b and len(a) >= 50
    with pytest.raises(ValueError):
        group_quantile_filter(df, "grp", "score", 5, 4)
    with pytest.raises(ValueError):
        group_quantile_filter(df, "grp", "score", 1, 0)


def test_range_splits_exact_quantile_boundaries(spark):
    import pytest

    from parconnect_spark.functions.sampling import range_splits

    # values 1..100, 4 ranges -> boundaries at ceil(25/50/75%) = 25,50,75
    d = spark.range(1, 101).selectExpr("id AS v")
    got = {r["split_idx"]: r["boundary"] for r in range_splits(d, "v", 4).collect()}
    assert got == {1: 25, 2: 50, 3: 75}
    # duplicates: 50x value 7, 50x value 9 -> both boundaries land on values
    d2 = spark.createDataFrame([(7,)] * 50 + [(9,)] * 50, "v long")
    got2 = {r["split_idx"]: r["boundary"] for r in range_splits(d2, "v", 2).collect()}
    assert got2 == {1: 7}
    with pytest.raises(ValueError):
        range_splits(d, "v", 1)
