import pytest

from parconnect_spark.operators.dq import dq_check, dq_report


def test_dq_checks_each_kind(spark):
    d = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (4, "zz")], "k long, v string"
    )
    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    assert dq_check(d, "not_null", "v") == 1
    assert dq_check(d, "unique", "k") == 1          # k=2 twice
    assert dq_check(d, "accepted_values", "v", values=["a", "b"]) == 2
    assert dq_check(d, "referential", "k", ref=(ref, "rk")) == 1  # k=4


def test_dq_report_rows_and_passed(spark):
    d = spark.createDataFrame([(1,), (2,)], "k long")
    rep = dq_report(
        [
            ("t", d, "not_null", "k"),
            ("t", d, "unique", "k"),
        ]
    )
    rows = {r["check"]: (r["violations"], r["passed"]) for r in rep.collect()}
    assert rows == {"not_null": (0, True), "unique": (0, True)}


def test_dq_guards(spark):
    d = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="unknown check kind"):
        dq_check(d, "bogus", "k")
    with pytest.raises(ValueError, match="accepted_values"):
        dq_check(d, "accepted_values", "k")
    with pytest.raises(ValueError, match="referential"):
        dq_check(d, "referential", "k")


def test_k_anonymity_audit(spark):
    from parconnect_spark.operators.dq import k_anonymity

    rows = [
        ("NY", 30), ("NY", 30), ("NY", 30),   # group of 3
        ("SF", 40), ("SF", 40),               # group of 2 (below k=3)
        ("LA", 50),                           # singleton
    ]
    d = spark.createDataFrame(rows, "city string, age int")
    r = k_anonymity(d, ["city", "age"], 3).collect()[0]
    assert (
        r["n_groups"], r["n_below_k"], r["min_group_size"],
        r["rows_at_risk"], r["frac_at_risk"],
    ) == (3, 2, 1, 3, 0.5)


def test_dp_counts_replayable_and_bounded(spark):
    import hashlib
    import math

    from parconnect_spark.operators.dq import dp_counts

    rows = [("a",)] * 10 + [("b",)] * 5
    d = spark.createDataFrame(rows, "g string")
    got = {
        r["group"]: r["noisy_count"]
        for r in dp_counts(d, "g", epsilon=1.0, seed="t").collect()
    }

    def lap(group):
        h = int(hashlib.md5(f"t:{group}".encode()).hexdigest()[:12], 16)
        u = (h + 0.5) / (1 << 48)
        return (
            math.log(2 * u) if u < 0.5 else -math.log(2 * (1 - u))
        )

    assert got["a"] == round(10 + lap("a"), 6)
    assert got["b"] == round(5 + lap("b"), 6)
    # different seed -> different noise
    got2 = {
        r["group"]: r["noisy_count"]
        for r in dp_counts(d, "g", seed="u").collect()
    }
    assert got2 != got


def test_ab_test_known_z(spark):
    import math

    import pyspark.sql.functions as F

    from parconnect_spark.operators.dq import ab_test

    # arm 0: 100 trials 40 successes; arm 1: 100 trials 55
    rows = [(0, i < 40) for i in range(100)] + [
        (1, i < 55) for i in range(100)
    ]
    d = spark.createDataFrame(rows, "arm int, ok boolean")
    r = ab_test(d, F.col("arm"), F.col("ok")).collect()[0]
    pp = 95 / 200
    se = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert (r["n0"], r["s0"], r["n1"], r["s1"]) == (100, 40, 100, 55)
    assert r["z"] == round((0.55 - 0.40) / se, 6)


def test_schema_diff_statuses(spark):
    from parconnect_spark.operators.dq import schema_diff

    d = spark.createDataFrame([(1, "x", 2.0)], "k long, v string, z double")
    got = {
        r["column"]: r["status"]
        for r in schema_diff(d, "k bigint, v int, w string").collect()
    }
    assert got == {
        "k": "ok",            # long == bigint
        "v": "type_mismatch",
        "w": "missing",
        "z": "extra",
    }


def test_poisson_bootstrap_mean_properties(spark):
    import pytest

    from parconnect_spark.operators.dq import poisson_bootstrap_mean

    d = spark.range(200).selectExpr("id AS k", "CAST(id % 10 AS DOUBLE) AS v")
    r = poisson_bootstrap_mean(d, "v", n_resamples=32, id_col="k").collect()[0]
    assert r["n_rows"] == 200 and r["mean"] == 4.5
    # the interval brackets the mean and is sane for n=200
    assert r["ci_lo"] <= 4.5 <= r["ci_hi"]
    assert 0.05 < r["ci_hi"] - r["ci_lo"] < 2.0
    # deterministic: same seed -> same interval; different seed -> differs
    r2 = poisson_bootstrap_mean(d, "v", n_resamples=32, id_col="k").collect()[0]
    assert (r["ci_lo"], r["ci_hi"]) == (r2["ci_lo"], r2["ci_hi"])
    r3 = poisson_bootstrap_mean(
        d, "v", n_resamples=32, id_col="k", seed="other"
    ).collect()[0]
    assert (r3["ci_lo"], r3["ci_hi"]) != (r["ci_lo"], r["ci_hi"])
    with pytest.raises(ValueError):
        poisson_bootstrap_mean(d, "v")
