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
